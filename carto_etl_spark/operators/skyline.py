"""Pareto frontier (2D skyline): the points not dominated by any other —
``q`` dominates ``p`` iff ``q.x <= p.x AND q.y <= p.y`` with at least one
strict (Borzsony/Kossmann's skyline operator; minimize-minimize form —
negate a column upstream to maximize it).

Not in the reference (no multi-criteria queries); a classic analytics
operator whose naive spellings both die at 100 TB: the brute dominance
anti-join is O(n²), and the textbook sort-scan needs a GLOBAL order —
i.e. a single-partition window.  This module uses the sort-scan
equivalence — after ordering by (x ASC, y ASC), a point is on the skyline
iff its y is strictly below the running minimum y of ALL preceding points
— and distributes the prefix-min with the same two-level trick as
operators/ranking.py: literal x-range buckets (ties share a bucket by
construction), per-bucket minima cumulated on the driver (O(n_buckets)
rows), within-bucket window prefix-min (partitioned — parallel), broadcast
bucket offsets.  Two point-table shuffles (distinct, bucket window) and
nothing single-partition; dominance is pure comparisons (no arithmetic —
exact for any numeric type).

Duplicate (x, y) points collapse to one frontier row (`distinct` first):
mutual non-domination would keep every copy, which is never what a
frontier query wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from carto_etl_spark.operators.ranking import _bucket_expr, range_boundaries
from carto_etl_spark.session import local_df


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Distinct non-dominated (x, y) points, minimizing both columns.
    NULL coordinates are excluded (NULL is not comparable, so such a point
    can neither dominate nor sit on a frontier)."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # persist across the THREE driver-side jobs (count, boundary sample,
    # bucket minima) so each doesn't re-execute the distinct exchange; the
    # cache is explicitly dropped below — Spark's CacheManager holds SQL
    # caches strongly, so relying on GC would leak one cached point table
    # per call for the session lifetime.  The caller's final query then
    # recomputes the distinct once, exactly as it would have uncached.
    pts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .distinct()
        .persist()
    )
    bounds = range_boundaries(pts, "x", n_buckets, total=pts.count())
    bucketed = pts.withColumn("__bucket", _bucket_expr("x", bounds))

    # per-bucket minima -> exclusive prefix-min across buckets (driver side,
    # O(n_buckets) rows — the same shape as ranking.py's offset cumulation)
    minima = bucketed.groupBy("__bucket").agg(F.min("y").alias("my")).collect()
    pts.unpersist()
    offsets, running = [], None
    for row in sorted(minima, key=lambda r: r["__bucket"]):
        offsets.append((row["__bucket"], running))
        running = row["my"] if running is None else min(running, row["my"])
    ytype = dict(pts.dtypes)["y"]
    offsets_df = local_df(
        spark, offsets or [(0, None)], f"__bucket int, __prev {ytype}"
    )

    w = (
        Window.partitionBy("__bucket")
        .orderBy("x", "y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = bucketed.join(F.broadcast(offsets_df), "__bucket").withColumn(
        "__pm", F.least(F.min("y").over(w), F.col("__prev"))
    )
    # least() skips NULLs, so __pm is NULL only for the global first point
    keep = F.col("__pm").isNull() | (F.col("y") < F.col("__pm"))
    return staged.where(keep).select(
        F.col("x").alias(x_col), F.col("y").alias(y_col)
    )


def pareto_frontier_sql(source_sql: str, x_col: str, y_col: str) -> str:
    """Independent DuckDB derivation: brute-force dominance anti-join over
    the distinct points — deliberately NOT the prefix-min algorithm, so the
    oracle checks the operator's semantics, not its mechanism."""
    return f"""
WITH pts AS (
  SELECT DISTINCT {x_col} AS x, {y_col} AS y FROM ({source_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
)
SELECT x AS {x_col}, y AS {y_col} FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y))
"""
