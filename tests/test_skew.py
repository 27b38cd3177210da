"""Skew-mitigation operators must be semantics-preserving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.skew import (
    salted_join,
    top_hot_keys,
    two_stage_count_distinct,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows
    rows = [("hot", i) for i in range(900)] + [
        (f"k{i % 10}", i) for i in range(100)
    ]
    big = spark.createDataFrame(rows, ["k", "v"])
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "X")],
        ["k", "label"],
    )
    return big, small


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equivalence(skewed):
    big, small = skewed
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", salt_factor=4)
    assert _norm(plain.select("k", "v", "label")) == _norm(
        salted.select("k", "v", "label")
    )


def test_salted_left_join_equivalence(skewed):
    big, small = skewed
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", salt_factor=4, how="left")
    assert _norm(plain.select("k", "v", "label")) == _norm(
        salted.select("k", "v", "label")
    )


def test_two_stage_count_distinct(skewed):
    big, _ = skewed
    plain = big.groupBy("k").agg(F.countDistinct("v").alias("n"))
    staged = two_stage_count_distinct(big, "k", "v")
    assert _norm(plain) == _norm(
        staged.withColumnRenamed("n_distinct_v", "n")
    )


def test_top_hot_keys(skewed):
    big, _ = skewed
    hot = top_hot_keys(big, "k", threshold_ratio=0.5)
    assert [r["k"] for r in hot.collect()] == ["hot"]
