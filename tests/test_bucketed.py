"""Bucketed tables must make keyed joins shuffle-free (no Exchange in the
physical plan) while producing identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.bucketed import BucketedTable, colocated_join
from carto_etl_spark.plans.inspect import explain_str


@pytest.fixture()
def bucketed_pair(spark):
    a = BucketedTable(spark, "bt_orders", "k", num_buckets=4)
    b = BucketedTable(spark, "bt_items", "k", num_buckets=4)
    a.create_from(
        spark.createDataFrame([(i % 50, float(i)) for i in range(1000)], ["k", "v"])
    )
    b.create_from(
        spark.createDataFrame([(i % 50, f"x{i}") for i in range(500)], ["k", "t"])
    )
    yield a, b
    a.drop()
    b.drop()


def test_colocated_join_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    # force the join path (broadcast would hide the bucketing win)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(a, b)
        plan = explain_str(joined)
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # results identical to a plain join of the underlying data
        n = joined.count()
        assert n == 1000 * 10  # each k matches 10 right rows
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_mismatched_buckets_rejected(spark, bucketed_pair):
    a, _ = bucketed_pair
    other = BucketedTable(spark, "bt_other", "k", num_buckets=8)
    with pytest.raises(ValueError, match="identical bucket"):
        colocated_join(a, other)
