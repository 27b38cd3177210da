"""Pareto frontier (operators/skyline.py): equality with a brute-force
python dominance check under many bucket counts (including degenerate
bucketing), duplicate collapse, NULL exclusion, tie handling, and a
no-single-partition-window plan gate."""

from __future__ import annotations

import random

from carto_etl_spark.operators.skyline import pareto_frontier


def _brute(points):
    pts = sorted(set(points))
    out = []
    for p in pts:
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
        ):
            out.append(p)
    return sorted(out)


def _run(spark, points, n_buckets):
    df = spark.createDataFrame(points, "x double, y double")
    got = pareto_frontier(df, "x", "y", n_buckets=n_buckets)
    return sorted(map(tuple, got.collect()))


def test_matches_brute_force_across_bucketings(spark):
    rng = random.Random(7)
    points = [
        (float(rng.randint(0, 50)), float(rng.randint(0, 50)))
        for _ in range(300)
    ]
    want = _brute(points)
    for n_buckets in (1, 2, 7, 32):
        assert _run(spark, points, n_buckets) == want, n_buckets


def test_duplicates_collapse_and_ties(spark):
    # duplicate frontier point appears once; same-x points keep min y only;
    # same-y points keep min x only
    points = [(1.0, 5.0), (1.0, 5.0), (1.0, 7.0), (3.0, 5.0), (2.0, 4.0)]
    assert _run(spark, points, 4) == [(1.0, 5.0), (2.0, 4.0)]


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (2.0, None), (3.0, 3.0)], "x double, y double"
    )
    got = sorted(map(tuple, pareto_frontier(df, "x", "y", 4).collect()))
    assert got == [(3.0, 3.0)]


def test_single_point_and_empty(spark):
    assert _run(spark, [(1.0, 1.0)], 4) == [(1.0, 1.0)]
    df = spark.createDataFrame([], "x double, y double")
    assert pareto_frontier(df, "x", "y", 4).count() == 0


def test_no_single_partition_window(spark):
    from carto_etl_spark.plans.inspect import unpartitioned_windows
    from carto_etl_spark.queries import q_pareto_parts

    df = q_pareto_parts(spark, "/root/testdata/sf0.001")
    assert not unpartitioned_windows(df)
