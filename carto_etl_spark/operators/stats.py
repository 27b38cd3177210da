"""Table profiling: per-column row/null/distinct counts and min/max in ONE
aggregation pass — the stats screen every data tool needs before touching a
new table, and the sanity check a 100 TB ingest runs after landing.

Not in the reference (its scope ends at SQL-text DML,
/root/reference/etl/etl.py); a north-star utility operator.

Plan shape: a single global aggregate computes every column's statistics
simultaneously (count/min/max collapse map-side; the distinct counts expand
inside one Expand+Aggregate pair), then the one result row explodes into the
per-column report — so profiling N columns costs one pass over the bytes,
not N table scans.  min/max are rendered as strings so heterogeneous column
types share one report schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — strings for min/max, NULL on all-null columns.
    ``n_distinct`` is the exact count (nulls excluded, SQL semantics)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{i}"))
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            F.col(f"__mn_{i}").alias("min_value"),
            F.col(f"__mx_{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*entries)).alias("r")).select("r.*")


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Equi-width histogram with COMPLETE bins: one row per bin 0..nbins-1
    even when empty — the report shape plotting layers need (a missing bar
    and a zero bar are different things).  Values land in
    [lo + i·w, lo + (i+1)·w) with w = (hi-lo)/nbins; x = hi joins the last
    bin (closed top edge, the numpy convention); values outside [lo, hi]
    and NULLs are excluded — run ``profile`` first for min/max.

    Plan shape: one scan + one aggregate over at most nbins groups; the
    dense bin spine is ``spark.range(nbins)`` (no data scan) left-joined to
    the aggregate, which broadcasts — the dense side costs nothing at any
    table size.  Bin assignment is a single subtract/divide/floor, identical
    IEEE-754 arithmetic on any engine."""
    if nbins <= 0:
        raise ValueError(f"nbins must be positive, got {nbins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / nbins
    c = F.col(col)
    binned = (
        df.where(c.isNotNull() & (c >= lo) & (c <= hi))
        .select(
            F.least(
                F.floor((c - lo) / width).cast("long"), F.lit(nbins - 1)
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(0, nbins).select(F.col("id").alias("bin"))
    return (
        spine.join(binned, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
