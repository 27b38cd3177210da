"""Time-series resampling: regular-interval bucketing with per-key gap
materialization and forward fill — turning an irregular event stream into the
dense grid that rolling models, dashboards, and anomaly detectors expect.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star analytics operator.

Plan shape — why this survives 100 TB:
- the raw stream is touched EXACTLY ONCE, by the bucketing aggregate
  (map-side partial sums, one shuffle on (keys, bucket)); everything after
  operates on the aggregated grid, whose size is keys x buckets — orders of
  magnitude below the raw row count.
- densification is join-free: a ``lead`` window gives each occupied bucket
  its successor, and a map-side ``sequence``/``explode`` emits the bucket
  plus every missing cell up to (not including) the next occupied one.  A
  naive grid-densify (bounds table -> generate_series -> left join back)
  either scans the raw table twice or checkpoints the aggregate; this shape
  needs one extra exchange (the window's re-key from (keys, bucket) to
  keys) and nothing else.
- forward fill is free: a gap cell is emitted BY the most recent occupied
  bucket, so last-observation-carried-forward is "keep the carrier's value",
  not a second window pass.
- a dense-grid guard: one gap spanning years at 1 s resolution would expand
  to ~10^8 cells; ``max_cells_per_key`` raises (executor-side, via
  ``raise_error``) instead of silently materializing it.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _densified(
    df: DataFrame,
    ts_col: str,
    interval_sec: int,
    keys: list[str],
    aggs: Mapping[str, Column],
    max_cells_per_key: int,
) -> DataFrame:
    """Aggregate into buckets and explode gap cells.  Output: keys,
    ``bucket_s`` (the cell), agg columns (the CARRIER's values on gap
    cells), and ``__gap`` (true on emitted gap cells)."""
    if interval_sec <= 0:
        raise ValueError("interval_sec must be positive")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_sec) * interval_sec
    ).cast("long")
    binned = df.groupBy(
        *[F.col(k) for k in keys], bucket.alias("__b")
    ).agg(*[expr.alias(name) for name, expr in aggs.items()])

    w = Window.partitionBy(*keys).orderBy("__b")
    # the window result must be materialized in its own projection: a window
    # expression cannot appear inside the Generate (explode) operator
    binned = binned.withColumn("__nxt", F.lead("__b").over(w))
    # emit [bucket, next - interval]; the run's last bucket emits only itself
    hi = F.coalesce(F.col("__nxt") - interval_sec, F.col("__b"))
    n_cells = (hi - F.col("__b")) / interval_sec + 1
    hi_guarded = F.when(
        n_cells > max_cells_per_key,
        F.raise_error(
            F.concat(
                F.lit(
                    f"resample: a gap expands to more than "
                    f"{max_cells_per_key} grid cells at interval="
                    f"{interval_sec}s; coarsen the interval or raise "
                    f"max_cells_per_key (gap bounds: "
                ),
                F.col("__b").cast("string"),
                F.lit(".."),
                hi.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(hi)
    out = binned.withColumn(
        "bucket_s",
        F.explode(F.sequence(F.col("__b"), hi_guarded, F.lit(interval_sec))),
    )
    return (
        out.withColumn("__gap", F.col("bucket_s") != F.col("__b"))
        .drop("__b", "__nxt")
    )


def resample(
    df: DataFrame,
    ts_col: str,
    interval_sec: int,
    keys: list[str],
    aggs: Mapping[str, Column],
    max_cells_per_key: int = 10_000_000,
) -> DataFrame:
    """Aggregate ``df`` into fixed ``interval_sec`` buckets per key and
    densify: one output row per (key, bucket) for EVERY bucket between each
    key's first and last event — missing buckets carry NULL aggregates.

    Returns columns: keys..., ``bucket_s`` (epoch seconds), ``bucket_ts``
    (timestamp), then one column per ``aggs`` entry."""
    dense = _densified(df, ts_col, interval_sec, keys, aggs, max_cells_per_key)
    gap = F.col("__gap")
    out = dense.select(
        *keys,
        "bucket_s",
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket_ts"),
        *[F.when(~gap, F.col(n)).alias(n) for n in aggs],
    )
    return out


def resample_filled(
    df: DataFrame,
    ts_col: str,
    interval_sec: int,
    keys: list[str],
    aggs: Mapping[str, Column],
    fill_cols: list[str] | None = None,
    max_cells_per_key: int = 10_000_000,
) -> DataFrame:
    """``resample`` + a ``filled`` flag (true on gap rows) + forward fill of
    ``fill_cols`` (default: every aggregate column).  Fill is free: a gap
    cell is emitted by its most recent occupied bucket and simply keeps that
    carrier's value."""
    fill = set(fill_cols if fill_cols is not None else aggs.keys())
    unknown = fill - set(aggs)
    if unknown:
        raise ValueError(f"fill_cols not in aggs: {sorted(unknown)}")
    dense = _densified(df, ts_col, interval_sec, keys, aggs, max_cells_per_key)
    gap = F.col("__gap")
    return dense.select(
        *keys,
        "bucket_s",
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket_ts"),
        *[
            (F.col(n) if n in fill else F.when(~gap, F.col(n))).alias(n)
            for n in aggs
        ],
        gap.alias("filled"),
    )


def forward_fill(
    df: DataFrame, keys: list[str], order_col: str, cols: list[str]
) -> DataFrame:
    """Per key, in ``order_col`` order, replace NULLs in each of ``cols``
    with the most recent non-NULL value (classic last-observation-carried-
    forward) — the generic helper for frames that are already dense.
    Leading NULLs (before the first observation) stay NULL."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def max_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    partition_cols: list[str],
) -> DataFrame:
    """Peak interval overlap (occupancy) per partition via the classic
    +1/-1 boundary sweep: every interval contributes +1 at its start and
    -1 at its end, and the running sum over the time-ordered boundary
    stream is the live concurrency — its max is the answer.  Equal-time
    convention: starts sort BEFORE ends (touching intervals count as
    overlapping), pinned by the (t, delta DESC) ordering.

    All-integer (counts and epoch micros), so exact and replayable in SQL.
    The ordered window is PARTITIONED (one per key), and boundaries are
    2 rows per interval — the sweep shuffles exactly once on the partition
    keys.  Returns (*partition_cols, n_intervals, peak)."""
    starts = df.select(
        *partition_cols,
        F.col(start_col).cast("timestamp").alias("t"),
        F.lit(1).alias("delta"),
    )
    ends = df.select(
        *partition_cols,
        F.col(end_col).cast("timestamp").alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col("t"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = starts.union(ends).select(
        *partition_cols, F.sum("delta").over(w).alias("live")
    )
    return swept.groupBy(*partition_cols).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        F.max("live").cast("long").alias("peak"),
    )


def max_concurrency_oracle_sql(
    intervals_sql: str, partition_cols: list[str]
) -> str:
    """Mirror of `max_concurrency`: ``intervals_sql`` must yield the
    partition columns plus (t_start, t_end) timestamps."""
    keys = ", ".join(partition_cols)
    return f"""
WITH iv AS ({intervals_sql}),
bounds AS (
  SELECT {keys}, t_start AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT {keys}, t_end AS t, -1 AS delta FROM iv
),
swept AS (
  SELECT {keys},
         sum(delta) OVER (PARTITION BY {keys}
                          ORDER BY t, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS live
  FROM bounds
)
SELECT {keys}, CAST(count(*) / 2 AS BIGINT) AS n_intervals,
       CAST(max(live) AS BIGINT) AS peak
FROM swept GROUP BY {keys}
"""
