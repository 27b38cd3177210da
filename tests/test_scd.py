"""Type-2 SCD builds (operators/scd.py): run collapse of no-op changes,
interval chaining, is_current, ts-tie determinism, NULL attributes,
point-in-time snapshots, and the key-partitioned plan shape."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.scd import scd2_as_of, scd2_build


def _d(s):
    return datetime.date.fromisoformat(s)


def _dim(spark, rows):
    df = spark.createDataFrame(rows, "k long, ts date, attr string, seq long")
    return scd2_build(df, ["k"], "ts", ["attr"], tiebreak_cols=["seq"])


def test_run_collapse_and_interval_chain(spark):
    rows = [
        (1, _d("2024-01-01"), "a", 1),
        (1, _d("2024-02-01"), "a", 2),   # no-op: collapses into v1
        (1, _d("2024-03-01"), "b", 3),   # v2
        (1, _d("2024-04-01"), "a", 4),   # v3: back to 'a' is a NEW version
        (2, _d("2024-01-15"), "x", 5),
    ]
    out = {(r["k"], r["version"]): r for r in _dim(spark, rows).collect()}
    assert len(out) == 4
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1["attr"], v1["valid_from"], v1["valid_to"]) == (
        "a", _d("2024-01-01"), _d("2024-03-01"))
    assert (v2["attr"], v2["valid_from"], v2["valid_to"]) == (
        "b", _d("2024-03-01"), _d("2024-04-01"))
    assert v3["attr"] == "a" and v3["valid_to"] is None and v3["is_current"]
    assert not v1["is_current"] and not v2["is_current"]
    assert out[(2, 1)]["is_current"]


def test_ts_tie_is_deterministic_by_tiebreak(spark):
    rows = [
        (1, _d("2024-01-01"), "a", 2),
        (1, _d("2024-01-01"), "b", 1),  # same ts: seq orders b before a
    ]
    out = sorted(_dim(spark, rows).collect(), key=lambda r: r["version"])
    assert [r["attr"] for r in out] == ["b", "a"]
    # degenerate interval for the earlier tied change, documented semantics
    assert out[0]["valid_from"] == out[0]["valid_to"] == _d("2024-01-01")
    assert out[1]["is_current"]


def test_null_attr_opens_and_collapses(spark):
    rows = [
        (1, _d("2024-01-01"), None, 1),  # first version with NULL attr
        (1, _d("2024-02-01"), None, 2),  # no-op (NULL == NULL nullsafe)
        (1, _d("2024-03-01"), "a", 3),
    ]
    out = sorted(_dim(spark, rows).collect(), key=lambda r: r["version"])
    assert len(out) == 2
    assert out[0]["attr"] is None and out[0]["valid_to"] == _d("2024-03-01")
    assert out[1]["attr"] == "a" and out[1]["is_current"]


def test_as_of_snapshot(spark):
    rows = [
        (1, _d("2024-01-01"), "a", 1),
        (1, _d("2024-03-01"), "b", 2),
        (2, _d("2024-02-01"), "x", 3),
    ]
    dim = _dim(spark, rows)
    at = {r["k"]: r["attr"] for r in scd2_as_of(dim, _d("2024-02-15")).collect()}
    assert at == {1: "a", 2: "x"}
    # boundary: half-open [from, to) — at exactly the change date the NEW
    # version is in force
    at2 = {r["k"]: r["attr"] for r in scd2_as_of(dim, _d("2024-03-01")).collect()}
    assert at2[1] == "b"
    # before any version: key absent
    assert scd2_as_of(dim, _d("2023-12-31")).count() == 0


def test_requires_attrs(spark):
    df = spark.createDataFrame([(1, _d("2024-01-01"))], "k long, ts date")
    with pytest.raises(ValueError, match="attr_cols"):
        scd2_build(df, ["k"], "ts", [])


def test_plan_is_single_key_exchange_no_global_window(spark):
    from carto_etl_spark.plans.inspect import explain_str, unpartitioned_windows

    rows = [(i % 5, _d("2024-01-01"), f"a{i % 3}", i) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, ts date, attr string, seq long")
    out = scd2_build(df, ["k"], "ts", ["attr"], tiebreak_cols=["seq"])
    assert not unpartitioned_windows(out)
    plan = explain_str(out)
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
