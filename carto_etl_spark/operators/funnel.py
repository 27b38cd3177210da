"""Ordered-funnel analysis over an event stream: for each user, the earliest
time each step of an event-type sequence completes, requiring strictly
increasing timestamps between steps (view -> click -> purchase and friends).

Not in the reference (scope ends at SQL-text DML, /root/reference/etl/etl.py);
a standard analytics-engine capability over the driver `events` table.

Plan shape: one window pass per step, all over the SAME user partitioning —
Spark plans a single hash-partition shuffle and chains the window operators
in one sort pipeline, so an N-step funnel costs one shuffle, not N.  Step
times are staged columns because step i's condition references step i-1's
result (``ts > t_{i-1}``).  No UDFs, no driver state; per-user cardinality
reduction happens in the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user with ``t_1..t_n`` — the earliest completion time of
    each funnel step, where step i counts only events strictly after
    ``t_{i-1}`` — and ``depth`` (number of completed steps)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(_col(user_col))
    staged = df
    t_cols = []
    for i, step in enumerate(steps):
        cond = _col(type_col) == step
        if i:
            cond = cond & (_col(ts_col) > F.col(t_cols[-1]))
        name = f"t_{i + 1}"
        staged = staged.withColumn(
            name, F.min(F.when(cond, _col(ts_col))).over(w)
        )
        t_cols.append(name)
    depth = F.lit(0)
    for i, name in enumerate(t_cols):
        depth = F.when(F.col(name).isNotNull(), F.lit(i + 1)).otherwise(depth)
    # t_i is constant within a user partition; min() just collapses the rows
    return (
        staged.groupBy(_col(user_col))
        .agg(
            *[F.min(n).alias(n) for n in t_cols],
            F.min(depth).alias("depth"),
        )
    )


def funnel_report(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step conversion counts: (step index, step name, users reaching the
    step) — the classic funnel chart input."""
    times = funnel_times(df, steps, user_col, ts_col, type_col)
    # ONE aggregation pass computes every step count; the single result row
    # is then exploded into the per-step report shape
    agg_row = times.agg(
        *[
            F.count(F.col(f"t_{i + 1}")).alias(f"__n_{i + 1}")
            for i in range(len(steps))
        ]
    )
    entries = [
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"__n_{i + 1}").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return agg_row.select(F.explode(F.array(*entries)).alias("r")).select("r.*")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their FIRST
    event, counted distinctly in each subsequent activity week.

    Returns (cohort_week, week_offset, n_users).  Two inherent shuffles: the
    first-event window on the user partitioning, then the distinct-count
    aggregate on (cohort, offset) — countDistinct's expand handles the
    dedup, no driver state."""
    w = Window.partitionBy(_col(user_col))
    cohort = F.date_trunc("week", F.min(_col(ts_col)).over(w))
    activity = F.date_trunc("week", _col(ts_col))
    staged = df.select(
        _col(user_col).alias("__user"),
        F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff(activity, cohort) / 7).cast("int").alias("week_offset"),
    )
    return (
        staged.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("__user").alias("n_users"))
    )


def transitions(
    df: DataFrame,
    user: Column | str,
    ts: Column | str,
    state: Column | str,
    tiebreak: Column | str | None = None,
) -> DataFrame:
    """State-transition matrix (first-order Markov counts) over an event
    stream: per user, order events by timestamp and count each consecutive
    (from_state, to_state) pair, then attach the per-from transition
    probability.  The page-flow / event-flow report product analytics teams
    ask first.

    Plan shape: one lead window over the user partitioning (one shuffle, the
    same exchange funnel_times uses), one aggregate on (from, to) whose
    input is already pair-per-row, and a from-state window over the TINY
    |states|² matrix for the probabilities.  ``tiebreak`` makes the order
    within equal timestamps deterministic (pass the event id); the last
    event of each user emits no pair.

    Output: (from_state, to_state, n, p) with p = n / Σ n over from_state.
    """
    u, t, s = _col(user), _col(ts), _col(state)
    order = [t] + ([] if tiebreak is None else [_col(tiebreak)])
    w = Window.partitionBy(u).orderBy(*order)
    paired = df.select(
        s.alias("from_state"),
        F.lead(s).over(w).alias("to_state"),
    ).where(F.col("to_state").isNotNull())
    counts = paired.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy("from_state")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(total), 6)
    )
