"""Time-series resampling (operators/timeseries.py): gap materialization,
forward-fill semantics, the dense-grid guard, and the plan-shape contract —
the raw stream is scanned once and only small post-aggregate sides shuffle."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from carto_etl_spark.operators import timeseries as ts
from carto_etl_spark.plans.inspect import explain_str


def _stream(spark):
    rows = [
        # key "a": events in hours 0, 1, 4 (gap at 2 and 3)
        Row(k="a", ts=datetime(2024, 1, 1, 0, 10), v=1.0),
        Row(k="a", ts=datetime(2024, 1, 1, 0, 50), v=2.0),
        Row(k="a", ts=datetime(2024, 1, 1, 1, 5), v=10.0),
        Row(k="a", ts=datetime(2024, 1, 1, 4, 59), v=100.0),
        # key "b": single event -> single-cell grid, no gaps
        Row(k="b", ts=datetime(2024, 1, 1, 9, 30), v=7.0),
    ]
    return spark.createDataFrame(rows)


def test_resample_densifies_per_key_bounds(spark):
    out = ts.resample(
        _stream(spark), "ts", 3600, ["k"], {"s": F.sum("v")}
    ).collect()
    a = sorted((r["bucket_s"], r["s"]) for r in out if r["k"] == "a")
    base = int(datetime(2024, 1, 1).timestamp())
    assert [b - base for b, _ in a] == [0, 3600, 7200, 10800, 14400]
    assert [s for _, s in a] == [3.0, 10.0, None, None, 100.0]
    b = [(r["bucket_s"], r["s"]) for r in out if r["k"] == "b"]
    assert len(b) == 1 and b[0][1] == 7.0  # no cross-key bleed


def test_resample_filled_forward_fills_and_flags(spark):
    out = ts.resample_filled(
        _stream(spark), "ts", 3600, ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v")}, fill_cols=["s"],
    ).collect()
    a = sorted(
        (r["bucket_s"], r["s"], r["n"], r["filled"])
        for r in out
        if r["k"] == "a"
    )
    assert [x[1] for x in a] == [3.0, 10.0, 10.0, 10.0, 100.0]  # LOCF
    assert [x[2] for x in a] == [2, 1, None, None, 1]  # unfilled col keeps NULL
    assert [x[3] for x in a] == [False, False, True, True, False]


def test_filled_flag_survives_allnull_aggregate(spark):
    # an occupied bucket whose sum is NULL (all values NULL) is NOT a gap:
    # it keeps its own NULL aggregate (observed data), and only synthesized
    # gap cells carry the most recent occupied bucket's value
    df = spark.createDataFrame(
        [
            Row(k="a", ts=datetime(2024, 1, 1, 0, 0), v=1.0),
            Row(k="a", ts=datetime(2024, 1, 1, 1, 0), v=None),
            Row(k="a", ts=datetime(2024, 1, 1, 3, 0), v=5.0),
        ]
    )
    out = sorted(
        ts.resample_filled(df, "ts", 3600, ["k"], {"s": F.sum("v")}).collect(),
        key=lambda r: r["bucket_s"],
    )
    assert [r["filled"] for r in out] == [False, False, True, False]
    # the hour-2 gap cell carries its carrier's (NULL) sum — carrier
    # semantics, not reach-back-further LOCF
    assert [r["s"] for r in out] == [1.0, None, None, 5.0]


def test_fill_cols_validation(spark):
    with pytest.raises(ValueError, match="fill_cols"):
        ts.resample_filled(
            _stream(spark), "ts", 3600, ["k"], {"s": F.sum("v")},
            fill_cols=["nope"],
        )


def test_forward_fill_leading_nulls_stay(spark):
    df = spark.createDataFrame(
        [Row(k="a", o=1, v=None), Row(k="a", o=2, v=3.0), Row(k="a", o=3, v=None)]
    )
    out = sorted(
        ts.forward_fill(df, ["k"], "o", ["v"]).collect(), key=lambda r: r["o"]
    )
    assert [r["v"] for r in out] == [None, 3.0, 3.0]


def test_dense_grid_guard_raises(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", ts=datetime(2024, 1, 1), v=1.0),
            Row(k="a", ts=datetime(2025, 1, 1), v=2.0),
        ]
    )
    dense = ts.resample(
        df, "ts", 1, ["k"], {"s": F.sum("v")}, max_cells_per_key=1000
    )
    with pytest.raises(Exception, match="grid cells"):
        dense.collect()


def test_interval_validation(spark):
    with pytest.raises(ValueError):
        ts.resample(_stream(spark), "ts", 0, ["k"], {"s": F.sum("v")})


def test_plan_scans_raw_stream_once(spark, tmp_path):
    p = str(tmp_path / "ev.parquet")
    _stream(spark).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(
        ts.resample_filled(df, "ts", 3600, ["k"], {"s": F.sum("v")})
    )
    # join-free densify: ONE scan, exactly two exchanges (bucket aggregate,
    # lead-window re-key), no join operator, nothing falls to Python
    assert plan.count("+- Scan parquet") == 1
    assert plan.count("Exchange ") == 2
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
