"""Slowly-changing-dimension (Type 2) builds: turn a change feed into
versioned validity intervals, and answer point-in-time lookups.

The reference's update path (etl/etl.py UPDATE jobs) overwrites in place —
Type 1.  A training-data/analytics warehouse usually needs Type 2 instead:
every attribute change opens a new version row with ``valid_from`` /
``valid_to``, so facts can join the dimension AS OF their event time and
backfills are reproducible.

Plan shape (100 TB): everything is key-partitioned window work — ONE hash
exchange on the dimension key, then lag/lead inside each partition.  No
global sort, no unpartitioned window, no driver state; skew is bounded by
versions-per-key, which is small by construction for real dimensions.
Point-in-time reads are a range predicate (valid_from <= t < valid_to)
that parquet row-group stats prune when the table is written clustered by
key (operators/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build the Type-2 dimension from a change feed.

    ``changes`` holds one row per observed state (key, ts, attrs).  Output
    is one row per VERSION: consecutive observations with identical
    attributes collapse into one interval (the no-op-update case every
    CDC feed produces), ``valid_from`` = first ts of the run,
    ``valid_to`` = ts of the next differing version (NULL while current),
    ``version`` = 1-based per key, ``is_current`` flags the open row.

    ``tiebreak_cols`` must make (key, ts, tiebreak) unique so the version
    order — and therefore the collapse — is deterministic under ts ties
    (two changes in one batch).  Tied changes with different attributes
    produce a degenerate [t, t) interval for the earlier one — inherent to
    the feed's timestamp granularity, not hidden.
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    tiebreak_cols = tiebreak_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    same_as_prev = None
    for c in attr_cols:
        eq = F.col(c).eqNullSafe(F.lag(c).over(w))
        same_as_prev = eq if same_as_prev is None else (same_as_prev & eq)
    # first row per key has lag NULL -> eqNullSafe False unless attr NULL;
    # guard with a explicit first-row test so an all-NULL first attr row
    # still opens a version
    is_first = F.lag(ts_col).over(w).isNull() & (
        F.row_number().over(w) == 1
    )
    opens = (~same_as_prev) | is_first

    runs = changes.withColumn("__open", opens).withColumn(
        "__version", F.sum(F.col("__open").cast("int")).over(w)
    )
    per_version = runs.groupBy(*key_cols, "__version").agg(
        F.min_by(F.struct(*[F.col(c) for c in attr_cols]), F.struct(*order)).alias("__attrs"),
        F.min(F.struct(*order)).alias("__start"),
    )
    wv = Window.partitionBy(*key_cols).orderBy(F.col("__version"))
    out = per_version.select(
        *key_cols,
        F.col("__version").alias("version"),
        *[F.col(f"__attrs.{c}").alias(c) for c in attr_cols],
        F.col(f"__start.{ts_col}").alias("valid_from"),
        F.lead(f"__start.{ts_col}").over(wv).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def scd2_as_of(dim: DataFrame, ts, ts_col_from: str = "valid_from",
               ts_col_to: str = "valid_to") -> DataFrame:
    """The dimension snapshot AS OF ``ts``: the version whose interval
    covers it (half-open [from, to))."""
    t = F.lit(ts)
    return dim.where(
        (F.col(ts_col_from) <= t)
        & (F.col(ts_col_to).isNull() | (t < F.col(ts_col_to)))
    )
