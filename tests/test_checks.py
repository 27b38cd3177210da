"""Data-quality constraint suite (operators/checks.py): semantics on
hand-built frames plus the plan-shape property that makes it scale — every
scalar constraint shares ONE aggregation over ONE scan, and referential
checks broadcast the (distinct) key domain instead of shuffling the fact."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from carto_etl_spark.operators import checks as ck
from carto_etl_spark.plans.inspect import explain_str, has_broadcast_join


def _frame(spark):
    return spark.createDataFrame(
        [
            Row(id=1, status="O", price=10.0, code="1-URGENT"),
            Row(id=2, status="F", price=-5.0, code="2-HIGH"),
            Row(id=2, status="X", price=None, code="bad"),
            Row(id=None, status="O", price=25.0, code="3-MEDIUM"),
        ]
    )


def _report(spark, checks, refs=None):
    rows = ck.run_checks(_frame(spark), checks, refs).collect()
    return {r["check"]: r for r in rows}


def test_scalar_checks_semantics(spark):
    rep = _report(
        spark,
        [
            ck.not_null("id"),
            ck.unique("id"),
            ck.in_range("price", lo=0.0),
            ck.in_set("status", ["O", "F", "P"]),
            ck.matches("code", r"^[1-5]-[A-Z]+$"),
            ck.satisfies("price_covers_id", "price >= id"),
        ],
    )
    assert rep["not_null(id)"]["violations"] == 1
    # ids: [1, 2, 2, NULL] -> 3 non-null, 2 distinct -> 1 duplicate
    assert rep["unique(id)"]["violations"] == 1
    assert rep["in_range(price)"]["violations"] == 1        # -5.0 only; NULL exempt
    assert rep["in_set(status)"]["violations"] == 1         # "X"
    assert rep["matches(code)"]["violations"] == 1          # "bad"
    # satisfies: non-TRUE counts as violation -> row 2 (false) plus the two
    # NULL-predicate rows (price NULL; id NULL)
    assert rep["price_covers_id"]["violations"] == 3
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert not rep["unique(id)"]["passed"]


def test_tolerance_fraction(spark):
    rep = _report(spark, [ck.not_null("id", tolerance=0.25)])
    assert rep["not_null(id)"]["violations"] == 1 and rep["not_null(id)"]["passed"]
    rep = _report(spark, [ck.not_null("id", tolerance=0.1)])
    assert not rep["not_null(id)"]["passed"]


def test_unique_multi_column_ignores_null_tuples(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=1), Row(a=1, b=1), Row(a=1, b=2), Row(a=None, b=1)]
    )
    rep = {r["check"]: r for r in ck.run_checks(df, [ck.unique("a", "b")]).collect()}
    assert rep["unique(a,b)"]["violations"] == 1  # the (1,1) pair; NULL tuple exempt


def test_in_range_both_bounds_and_validation(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=5), Row(x=9)])
    rep = {r["check"]: r for r in ck.run_checks(df, [ck.in_range("x", 2, 8)]).collect()}
    assert rep["in_range(x)"]["violations"] == 2
    with pytest.raises(ValueError):
        ck.in_range("x")


def test_foreign_key_orphans_and_refs_required(spark):
    fact = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=9), Row(k=None)])
    dim = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    rep = {
        r["check"]: r
        for r in ck.run_checks(
            fact, [ck.foreign_key("k", "dim", "pk")], refs={"dim": dim}
        ).collect()
    }
    row = rep["foreign_key(k->dim.pk)"]
    assert row["violations"] == 1 and not row["passed"]  # 9 orphan; NULL exempt
    with pytest.raises(ValueError):
        ck.run_checks(fact, [ck.foreign_key("k", "dim", "pk")])


def test_assert_checks_raises_with_names(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match=r"not_null\(id\)"):
        ck.assert_checks(df, [ck.not_null("id")])
    ck.assert_checks(df, [ck.in_set("status", ["O", "F", "X"])])  # passes


def test_scalar_suite_plans_single_scan(spark, tmp_path):
    # the scale contract: N scalar constraints -> ONE scan, ONE aggregate
    p = str(tmp_path / "t.parquet")
    _frame(spark).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(
        ck.run_checks(
            df,
            [
                ck.not_null("id"),
                ck.unique("id"),
                ck.in_range("price", lo=0.0),
                ck.matches("code", r"^[1-5]-"),
            ],
        )
    )
    assert plan.count("+- Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_foreign_key_broadcasts_key_domain(spark, tmp_path):
    pf = str(tmp_path / "fact.parquet")
    pd_ = str(tmp_path / "dim.parquet")
    spark.range(0, 1000).withColumnRenamed("id", "k").write.parquet(pf)
    spark.range(0, 100).withColumnRenamed("id", "pk").write.parquet(pd_)
    fact, dim = spark.read.parquet(pf), spark.read.parquet(pd_)
    rep = ck.run_checks(fact, [ck.foreign_key("k", "dim", "pk")], refs={"dim": dim})
    assert has_broadcast_join(rep)
    row = rep.collect()[0]
    assert row["violations"] == 900 and row["n_rows"] == 1000
