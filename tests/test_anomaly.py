"""Robust outlier detection (operators/anomaly.py): exact lower-median rank
selection, MAD scoring, NULL/degenerate-key handling, and the no-collect
scale contract."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from carto_etl_spark.operators import anomaly as an
from carto_etl_spark.plans.inspect import explain_str


def test_lower_median_odd_and_even(spark):
    df = spark.createDataFrame(
        [Row(k="odd", v=float(x)) for x in [5, 1, 9]]
        + [Row(k="even", v=float(x)) for x in [1, 2, 3, 10]]
    )
    out = {r["k"]: r["m"] for r in an._lower_median(df, ["k"], "v", "m").collect()}
    assert out["odd"] == 5.0     # true median
    assert out["even"] == 2.0    # LOWER of the two middle values, no interp


def test_mad_scores_flag_the_planted_outlier(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame([Row(k="a", v=v) for v in vals])
    rows = {r["v"]: r for r in an.with_mad_scores(df, ["k"], "v").collect()}
    # n=6 -> lower median = 12; devs = [2,1,0,1,2,988] -> lower MAD = 1
    assert rows[1000.0]["med"] == 12.0 and rows[1000.0]["mad"] == 1.0
    assert rows[1000.0]["score"] == 988.0
    out = an.mad_outliers(df, ["k"], "v", threshold=3.5).collect()
    assert [r["v"] for r in out] == [1000.0]


def test_constant_key_has_null_score(spark):
    df = spark.createDataFrame([Row(k="c", v=5.0)] * 4)
    rows = an.with_mad_scores(df, ["k"], "v").collect()
    assert all(r["mad"] == 0.0 and r["score"] is None for r in rows)
    assert an.mad_outliers(df, ["k"], "v").count() == 0


def test_null_values_excluded_from_stats_but_kept(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=1.0), Row(k="a", v=2.0), Row(k="a", v=3.0),
         Row(k="a", v=None)]
    )
    rows = an.with_mad_scores(df, ["k"], "v").collect()
    assert len(rows) == 4
    nul = [r for r in rows if r["v"] is None][0]
    assert nul["score"] is None and nul["med"] == 2.0  # stats from non-nulls


def test_keys_scored_independently(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=float(x)) for x in [1, 2, 3, 4, 100]]
        + [Row(k="b", v=float(x)) for x in [100, 101, 102, 103, 1]]
    )
    out = {(r["k"], r["v"]) for r in
           an.mad_outliers(df, ["k"], "v", 3.5).collect()}
    assert out == {("a", 100.0), ("b", 1.0)}


def test_zscore_variant(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=0.0), Row(k="a", v=0.0), Row(k="a", v=4.0),
         Row(k="a", v=4.0)]
    )
    rows = {r["v"]: r["zscore"] for r in an.with_zscores(df, ["k"], "v").collect()}
    assert rows[0.0] == -1.0 and rows[4.0] == 1.0  # mean 2, pop-std 2


def test_plan_stays_distributed(spark, tmp_path):
    # no per-key array materialization, nothing falls to Python
    p = str(tmp_path / "v.parquet")
    spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.rand(7).alias("v")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(an.with_mad_scores(df, ["k"], "v"))
    assert "collect_list" not in plan  # no per-key array materialization
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
