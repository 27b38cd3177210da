"""Pivot / unpivot (operators/reshape.py): deterministic schema, explicit vs
discovered values, the domain cap, round-trip, and the plan contracts
(explicit-values pivot = ONE aggregate pass; unpivot = map-side Expand)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from carto_etl_spark.operators import reshape as rs
from carto_etl_spark.plans.inspect import explain_str


def _frame(spark):
    return spark.createDataFrame(
        [
            Row(k="a", p="x", v=1.0),
            Row(k="a", p="y", v=2.0),
            Row(k="b", p="x", v=3.0),
            Row(k="b", p="x", v=4.0),
        ]
    )


def test_pivot_explicit_values_and_missing_combo_null(spark):
    out = rs.pivot_table(
        _frame(spark), ["k"], "p", {"s": F.sum("v")}, values=["x", "y", "z"]
    )
    assert out.columns == ["k", "x", "y", "z"]
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["x"] == 1.0 and rows["a"]["y"] == 2.0
    assert rows["b"]["x"] == 7.0 and rows["b"]["y"] is None
    assert rows["a"]["z"] is None  # declared value absent from data


def test_pivot_discovers_sorted_values_and_prefix(spark):
    out = rs.pivot_table(
        _frame(spark), ["k"], "p", {"s": F.sum("v")}, prefix="p_"
    )
    assert out.columns == ["k", "p_x", "p_y"]  # sorted, deterministic


def test_pivot_multi_agg_column_names(spark):
    out = rs.pivot_table(
        _frame(spark), ["k"], "p",
        {"s": F.sum("v"), "n": F.count(F.lit(1))},
    )
    assert set(out.columns) == {"k", "x_s", "x_n", "y_s", "y_n"}
    rows = {r["k"]: r for r in out.collect()}
    assert rows["b"]["x_n"] == 2 and rows["b"]["x_s"] == 7.0


def test_pivot_domain_cap(spark):
    df = spark.range(0, 50).select(
        F.lit("k").alias("k"), F.col("id").alias("p"), F.lit(1.0).alias("v")
    )
    with pytest.raises(ValueError, match="max_values"):
        rs.pivot_table(df, ["k"], "p", {"s": F.sum("v")}, max_values=10)


def test_pivot_explicit_values_single_pass(spark, tmp_path):
    p = str(tmp_path / "f.parquet")
    _frame(spark).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(
        rs.pivot_table(df, ["k"], "p", {"s": F.sum("v")}, values=["x", "y"])
    )
    assert plan.count("+- Scan parquet") == 1
    # Catalyst's pivot is a two-level aggregate (keys+pivot partial, then
    # keys final): two exchanges, both over already-reduced rows — and NO
    # third pass for value discovery when values are explicit
    assert plan.count("Exchange ") == 2


def test_unpivot_round_trip(spark):
    wide = rs.pivot_table(
        _frame(spark), ["k"], "p", {"s": F.sum("v")}, values=["x", "y"]
    )
    long = rs.unpivot(wide, ["k"], ["x", "y"], "p", "s")
    got = {(r["k"], r["p"], r["s"]) for r in long.collect()}
    assert got == {
        ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 7.0), ("b", "y", None)
    }


def test_unpivot_is_mapside(spark, tmp_path):
    p = str(tmp_path / "w.parquet")
    spark.createDataFrame([Row(k="a", x=1.0, y=2.0)]).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(rs.unpivot(df, ["k"], ["x", "y"]))
    assert "Exchange" not in plan and "Expand" in plan
