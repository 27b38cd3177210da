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


# ---------------------------------------------------------------------------
# Transition matrix
# ---------------------------------------------------------------------------

def test_transitions_counts_and_probabilities(spark):
    from datetime import datetime
    from carto_etl_spark.operators.funnel import transitions

    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, datetime(2024, 1, 1, 0), 1, "a"),
        (1, datetime(2024, 1, 1, 1), 2, "b"),
        (1, datetime(2024, 1, 1, 2), 3, "a"),
        (2, datetime(2024, 1, 1, 0), 4, "a"),
        (2, datetime(2024, 1, 1, 1), 5, "b"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, state string")
    out = {(r["from_state"], r["to_state"]): (r["n"], r["p"]) for r in
           transitions(df, "user_id", "ts", "state", "event_id").collect()}
    assert out[("a", "b")] == (2, 1.0)   # a always goes to b
    # user2's terminal b emits no pair, so P(a|b) conditions on the one
    # observed b-transition: 1/1
    assert out[("b", "a")] == (1, 1.0)
    assert ("b", None) not in out        # terminal events emit no pair
    assert len(out) == 2


def test_transitions_tiebreak_pins_equal_timestamps(spark):
    from datetime import datetime
    from carto_etl_spark.operators.funnel import transitions

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 10, "x"), (1, t, 20, "y"), (1, t, 30, "z")],
        "user_id long, ts timestamp, event_id long, state string",
    )
    out = {(r["from_state"], r["to_state"]) for r in
           transitions(df, "user_id", "ts", "state", "event_id").collect()}
    assert out == {("x", "y"), ("y", "z")}  # event_id order, deterministic


def test_transitions_single_shuffle_before_agg(spark, tmp_path):
    from carto_etl_spark.operators.funnel import transitions
    from carto_etl_spark.plans.inspect import explain_str

    p = str(tmp_path / "ev.parquet")
    spark.range(0, 100).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("state"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = explain_str(transitions(df, "user_id", "ts", "state", "event_id"))
    # lead window (1 exchange) + pair aggregate (1) + prob window (1)
    assert plan.count("Exchange ") == 3
    assert plan.count("+- Scan parquet") == 1
