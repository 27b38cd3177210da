"""Dataset mixture planning (operators/mixing.py): plan arithmetic vs a
python replay, budget conservation, expansion counts bounded by the plan,
determinism, and the scan-stage shape of the expansion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from carto_etl_spark.operators.mixing import (
    epoch_plan,
    materialize_epoch,
)
from carto_etl_spark.operators.sampling import LEHMER_M

WEIGHTS = {"a": 6.0, "b": 2.0}


def _docs(spark):
    rows = [
        (i, ["a", "b", "c"][i % 3], 10 + (i % 5))
        for i in range(90)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def _py_plan(rows, weights, default, k):
    have, wts = {}, {}
    for _, src, n in rows:
        have[src] = have.get(src, 0) + n
    for src in have:
        wts[src] = weights.get(src, default)
    total, sum_w = sum(have.values()), sum(wts.values())
    out = {}
    for src in have:
        target = (wts[src] / sum_w) * float(k * total)
        rpt = target / float(have[src])
        out[src] = (
            have[src],
            target,
            int(math.floor(rpt)),
            int(math.floor((rpt - math.floor(rpt)) * LEHMER_M)),
        )
    return out


def test_plan_matches_python_replay(spark):
    df = _docs(spark)
    rows = [tuple(r) for r in df.collect()]
    want = _py_plan(rows, WEIGHTS, 1.0, 3)
    got = {
        r["source"]: (
            r["have"],
            r["target_size"],
            r["full_copies"],
            r["frac_threshold"],
        )
        for r in epoch_plan(df, "source", "n_chars", WEIGHTS).collect()
    }
    assert got == want
    # budget conservation: targets sum to k x corpus size exactly
    total = sum(h for h, _, _, _ in want.values())
    assert abs(sum(t for _, t, _, _ in want.values()) - 3 * total) < 1e-6


def test_expansion_counts_bounded_and_weighted(spark):
    df = _docs(spark)
    plan = epoch_plan(df, "source", "n_chars", WEIGHTS)
    epoch = materialize_epoch(df, plan, "source", "doc_id")
    per_src = {"a": 30, "b": 30, "c": 30}
    got = {
        r["source"]: r["n"]
        for r in epoch.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fc = {r["source"]: r["full_copies"] for r in plan.collect()}
    for src, n in got.items():
        assert fc[src] * per_src[src] <= n <= (fc[src] + 1) * per_src[src]
    # heavier weight -> more epoch rows per source row
    assert got["a"] > got["b"] > 0


def test_expansion_deterministic_and_copy_ids_dense(spark):
    df = _docs(spark)
    plan = epoch_plan(df, "source", "n_chars", WEIGHTS)
    a = sorted(
        map(tuple, materialize_epoch(df, plan, "source", "doc_id").collect())
    )
    b = sorted(
        map(tuple, materialize_epoch(df, plan, "source", "doc_id").collect())
    )
    assert a == b
    fc = {r["source"]: r["full_copies"] for r in plan.collect()}
    epoch = materialize_epoch(df, plan, "source", "doc_id")
    for r in epoch.select("source", "copy_id").distinct().collect():
        assert 0 <= r["copy_id"] <= fc[r["source"]]
    # every full copy is complete
    counts = {
        (r["source"], r["copy_id"]): r["n"]
        for r in epoch.groupBy("source", "copy_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for (src, cid), n in counts.items():
        if cid < fc[src]:
            assert n == 30


def test_expansion_is_scan_stage(spark):
    from carto_etl_spark.plans.inspect import explain_str

    df = _docs(spark)
    plan = epoch_plan(df, "source", "n_chars", WEIGHTS)
    epoch = materialize_epoch(df, plan, "source", "doc_id")
    s = explain_str(epoch)
    assert "CartesianProduct" not in s and "BatchEvalPython" not in s
    # the corpus side joins the plan via broadcast — no corpus exchange
    assert "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s


def test_null_sources_excluded_everywhere(spark):
    rows = [(1, "a", 100), (2, "a", 100), (3, None, 1000), (4, "b", 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    plan = epoch_plan(df, "source", "n_chars", {"a": 2.0})
    got = {r["source"]: r for r in plan.collect()}
    assert None not in got
    # totals exclude the NULL row's 1000 chars: total=300, sum_w=3
    assert got["a"]["target_size"] == (2.0 / 3.0) * 900.0
    epoch = materialize_epoch(df, plan, "source", "doc_id")
    assert epoch.where(F.col("source").isNull()).count() == 0


def test_string_key_rejected(spark):
    import pytest

    df = spark.createDataFrame(
        [("k1", "a", 10)], "doc_id string, source string, n_chars long"
    )
    plan = epoch_plan(df, "source", "n_chars", {})
    with pytest.raises(ValueError, match="integral"):
        materialize_epoch(df, plan, "source", "doc_id")
