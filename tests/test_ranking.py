"""operators/ranking.py: distributed global rank / prefix sums / ntile
arithmetic — value parity with the single-partition window spellings they
replace, plus the plan property that motivated them (no Window over an
Exchange SinglePartition anywhere in their plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from carto_etl_spark.operators.ranking import (
    ntile_from_rank,
    range_boundaries,
    with_global_rank,
    with_keyed_row_index,
    with_prefix_sums,
)
from carto_etl_spark.plans.inspect import unpartitioned_windows


def test_global_rank_matches_row_number(spark):
    df = spark.range(500).withColumn("v", (F.col("id") * 37) % 1000)
    got = {
        (r["id"], r["rank"])
        for r in with_global_rank(df, ["v", "id"], name="rank").collect()
    }
    exp = {
        (r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == exp


def test_global_rank_plan_has_no_single_partition_window(spark):
    df = spark.range(500).withColumn("v", (F.col("id") * 37) % 1000)
    ranked = with_global_rank(df, ["v", "id"])
    assert unpartitioned_windows(ranked) == []
    # ...while the naive spelling IS flagged (detector positive control)
    naive = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id"))
    )
    assert unpartitioned_windows(naive) != []
    # partitioned windows stay unflagged (detector negative control)
    part = df.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(F.col("id") % 5).orderBy("v")),
    )
    assert unpartitioned_windows(part) == []


def test_keyed_row_index_contiguous_zero_based(spark):
    df = spark.range(300).withColumn("v", 299 - F.col("id"))
    got = sorted(
        (r["v"], r["row_idx"])
        for r in with_keyed_row_index(df, ["v"]).collect()
    )
    assert got == [(i, i) for i in range(300)]


def test_rank_ignores_bucket_count_and_handles_string_keys(spark):
    rows = [(f"k{i:03d}", i) for i in range(97)]
    df = spark.createDataFrame(rows, ["k", "i"])
    for nb in (1, 3, 200):
        got = sorted(
            (r["i"], r["rank"])
            for r in with_global_rank(
                df, ["k"], name="rank", n_buckets=nb
            ).collect()
        )
        assert got == [(i, i + 1) for i in range(97)]


def test_null_first_key_ranks_first(spark):
    df = spark.createDataFrame(
        [(None, 1), (5, 2), (1, 3)], "v int, id int"
    )
    got = {
        (r["id"], r["rank"])
        for r in with_global_rank(df, ["v", "id"]).collect()
    }
    assert got == {(1, 1), (3, 2), (2, 3)}


@pytest.mark.parametrize(
    "n,k", [(100, 10), (25, 10), (5, 10), (103, 7), (1, 1), (7, 7)]
)
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    df = spark.range(n).withColumn("v", F.col("id"))
    exp = [
        r["t"]
        for r in df.withColumn("t", F.ntile(k).over(Window.orderBy("v")))
        .orderBy("v")
        .collect()
    ]
    ranked = with_global_rank(df, ["v"], name="rk")
    got = [
        r["t"]
        for r in ranked.withColumn(
            "t", ntile_from_rank(F.col("rk"), n, k)
        )
        .orderBy("v")
        .collect()
    ]
    assert got == exp


def test_prefix_sums_inclusive_and_exclusive(spark):
    df = spark.range(200).withColumn("v", F.col("id")).withColumn(
        "one", F.lit(1)
    )
    inc = sorted(
        (r["id"], r["cum_one"])
        for r in with_prefix_sums(df, ["v"], ["one"]).collect()
    )
    assert inc == [(i, i + 1) for i in range(200)]
    exc = sorted(
        (r["id"], r["cum_one"])
        for r in with_prefix_sums(
            df, ["v"], ["one"], inclusive=False
        ).collect()
    )
    assert exc == [(i, i) for i in range(200)]


def test_prefix_sums_multiple_columns(spark):
    df = (
        spark.range(100)
        .withColumn("v", F.col("id"))
        .withColumn("a", F.lit(2))
        .withColumn("b", (F.col("id") % 3).cast("long"))
    )
    out = {
        r["id"]: (r["cum_a"], r["cum_b"])
        for r in with_prefix_sums(df, ["v"], ["a", "b"]).collect()
    }
    run_a = run_b = 0
    for i in range(100):
        run_a += 2
        run_b += i % 3
        assert out[i] == (run_a, run_b)


def test_range_boundaries_sorted_dedup_and_small_input(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "v int")
    bounds = range_boundaries(df, "v", 8)
    assert bounds == sorted(set(bounds))
    empty = spark.createDataFrame([], "v int")
    assert range_boundaries(empty, "v", 8) == []


def test_global_rank_with_heavy_first_key_ties(spark):
    # first key has only 7 distinct values over 700 rows, far fewer than
    # the requested bucket count — equal keys must never straddle a bucket
    # boundary, and the tiebreak key orders within them
    df = spark.range(700).withColumn("v", (F.col("id") % 7)).select(
        F.col("v"), F.col("id")
    )
    got = {
        (r["id"], r["rank"])
        for r in with_global_rank(
            df, ["v", "id"], name="rank", n_buckets=32
        ).collect()
    }
    exp = {
        (r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == exp


def test_prefix_sums_with_duplicate_keys_total_is_exact(spark):
    # ties on the ordering key: cumulative values within a tie group are
    # order-ambiguous by contract, but the LAST row of each group (and the
    # grand total) must be exact
    df = (
        spark.range(300)
        .withColumn("v", F.col("id") % 5)
        .withColumn("one", F.lit(1))
    )
    out = with_prefix_sums(df, ["v"], ["one"]).collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r["v"], []).append(r["cum_one"])
    running = 0
    for v in sorted(by_v):
        group = sorted(by_v[v])
        running += len(group)
        assert group[-1] == running  # last of each tie group exact
        assert group[0] > running - len(group)  # all within the group range


def test_with_global_ranks_multi_axis_matches_single_axis(spark):
    from carto_etl_spark.operators.ranking import with_global_ranks

    df = (
        spark.range(400)
        .withColumn("a", (F.col("id") * 37) % 97)
        .withColumn("b", (F.col("id") * 13) % 11)  # heavy ties
        .withColumn("s", F.concat(F.lit("k"), (F.col("id") % 50)))
    )
    got = with_global_ranks(
        df,
        {"ra": ["a", "id"], "rb": ["b", "id"], "rs": ["s", "id"]},
    )
    assert unpartitioned_windows(got) == []
    rows = {r["id"]: (r["ra"], r["rb"], r["rs"]) for r in got.collect()}
    for i, axis in enumerate([["a", "id"], ["b", "id"], ["s", "id"]]):
        exp = {
            r["id"]: r["r"]
            for r in df.withColumn(
                "r", F.row_number().over(Window.orderBy(*axis))
            ).collect()
        }
        assert {k: v[i] for k, v in rows.items()} == exp


def test_with_global_ranks_reserved_name_collision_raises(spark):
    from carto_etl_spark.operators.ranking import with_global_ranks

    df = spark.range(10).withColumn("__bucket_0", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        with_global_ranks(df, {"r": ["id"]})


def test_with_global_rank_reserved_name_collision_raises(spark):
    df = spark.range(10).withColumn("__bucket", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        with_global_rank(df, ["id"])
    df2 = spark.range(10).withColumn("__rn", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        with_global_rank(df2, ["id"])


def test_with_prefix_sums_reserved_name_collision_raises(spark):
    df = spark.range(10).withColumn("__bucket", F.lit(1)).withColumn(
        "one", F.lit(1)
    )
    with pytest.raises(ValueError, match="reserved"):
        with_prefix_sums(df, ["id"], ["one"])


def test_sql_lit_roundtrips_exactly(spark):
    """The F.expr fast path must produce literals bit-identical to F.lit."""
    import datetime
    from decimal import Decimal

    from carto_etl_spark.operators.ranking import _sql_lit

    cases = [
        1.5,
        -0.1,
        1e-300,
        12345.678901234567,
        7,
        -(2**62),
        "O'Brien \\ backtick`",
        "plain",
        Decimal("12345.67"),
        datetime.date(2020, 2, 29),
        datetime.datetime(2021, 12, 31, 23, 59, 58),
        True,
    ]
    for v in cases:
        rendered = _sql_lit(v)
        assert rendered is not None, v
        got = spark.sql(f"SELECT {rendered} AS x").collect()[0]["x"]
        if isinstance(v, datetime.datetime):
            assert got == v
        elif isinstance(v, datetime.date):
            assert got == v
        else:
            assert got == v and type(got) is type(v) or got == v
    # unrenderable types decline instead of guessing
    assert _sql_lit(b"bytes") is None
    assert _sql_lit("nul\x00byte") is None
