"""Ordered-funnel analysis (operators/funnel.py): strictly-after step
semantics, partial depths, and the one-shuffle plan contract for the whole
window chain."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.funnel import funnel_report, funnel_times
from carto_etl_spark.plans.inspect import shuffle_count


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        ["user_id", "ts", "event_type"],
    )


def test_funnel_strictly_after_ordering(spark):
    df = _events(spark, [
        # user 1 completes in order
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # user 2 clicked BEFORE viewing: click must not count
        (2, 5, "click"), (2, 10, "view"), (2, 20, "purchase"),
        # user 3 views only
        (3, 0, "view"),
    ])
    t = {r.user_id: r for r in funnel_times(df, ["view", "click", "purchase"]).collect()}
    assert t[1].depth == 3
    assert t[2].depth == 1 and t[2].t_2 is None  # pre-view click ignored
    assert t[3].depth == 1
    # a later click by user 2 would still count: strictly after t1
    df2 = df.unionByName(_events(spark, [(2, 15, "click")]))
    t2 = {r.user_id: r for r in funnel_times(df2, ["view", "click", "purchase"]).collect()}
    assert t2[2].depth == 3  # view@10 -> click@15 -> purchase@20


def test_funnel_equal_timestamp_does_not_advance(spark):
    # strictly-after: a click at exactly t1 does not complete step 2
    df = _events(spark, [(1, 5, "view"), (1, 5, "click")])
    r = funnel_times(df, ["view", "click"]).collect()[0]
    assert r.depth == 1 and r.t_2 is None


def test_funnel_report_counts(spark):
    df = _events(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (2, 0, "view"), (2, 1, "click"),
        (3, 0, "view"),
        (4, 0, "click"),  # never viewed: reaches nothing
    ])
    rep = {r.step: r for r in funnel_report(df, ["view", "click", "purchase"]).collect()}
    assert [rep[i].n_users for i in (1, 2, 3)] == [3, 2, 1]
    assert rep[1].event_type == "view"


def test_funnel_single_shuffle_for_window_chain(spark):
    df = _events(spark, [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase")])
    out = funnel_times(df, ["view", "click", "purchase"])
    # all three step windows share the user partitioning: one exchange
    assert shuffle_count(out) == 1


def test_funnel_rejects_empty_steps(spark):
    df = _events(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        funnel_times(df, [])


def test_cohort_retention_semantics(spark):
    from carto_etl_spark.operators.funnel import cohort_retention

    # 2024-01-01 is a Monday: week boundaries are unambiguous
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 9)),   # w0, w+1
            (2, datetime(2024, 1, 2)), (2, datetime(2024, 1, 3)),   # w0 twice
            (3, datetime(2024, 1, 10)),                             # cohort w1
        ],
        ["user_id", "ts"],
    )
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)] == 2      # users 1+2 active in their week 0
    assert out[("2024-01-01", 1)] == 1      # only user 1 returns next week
    assert out[("2024-01-08", 0)] == 1      # user 3's own cohort
    assert len(out) == 3
