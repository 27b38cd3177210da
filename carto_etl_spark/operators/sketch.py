"""Count-min sketch: fixed-size, mergeable frequency state for heavy-hitter
queries over unbounded key cardinality.

The reference's tier-A surface has no sketch operators; this is a north-star
LLM-pipeline extension (BASELINE.json) in the family of the HLL/approx-
percentile entries (queries.py q_approx_stats).  The point at 100 TB: an
exact per-token groupBy shuffles one row per DISTINCT token (fine — that is
how `repeated_lines` et al. work), but maintaining a *streaming / cross-
batch* frequency state that way grows without bound.  A CMS is ``depth x
width`` counters regardless of input size, merges by cell-wise addition
(partial aggregation IS the merge), and answers point queries with a
one-sided error: est(x) >= true(x), over-counting by at most
``2N/width`` with probability ``1 - 2^-depth`` (Cormode & Muthukrishnan
2005).

Hashing is md5-prefix mod width (engine-reproducible — the same reason
``hashed_features`` uses it): both Spark and DuckDB render md5 identically,
so every cell and every estimate is value-checkable by the oracle, not just
"close".
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(item, seed: int, width: int):
    """Row of the seed-th hash: first 15 md5 hex chars of 'seed:item' as a
    60-bit int, mod width.  15 hex digits keep conv() inside a positive
    long, so % has no sign pitfall in either engine."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), item)), 1, 15),
            16,
            10,
        ).cast("long")
        % width
    ).cast("int")


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch as a SPARSE cell table: one row per touched
    (seed, bucket) with its count — at most ``depth * width`` rows out.

    Plan shape: each input row fans out to ``depth`` (seed, bucket) pairs
    (an array explode, no shuffle), then ONE groupBy whose partial
    aggregation collapses everything map-side — the shuffle carries at most
    ``depth * width`` rows per input partition no matter how many trillions
    of items went in.  That partial-agg collapse is exactly the sketch's
    cell-wise merge, so distributing the build IS merging per-partition
    sketches."""
    item = F.col(item_col)
    cells = (
        df.where(item.isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("seed"),
                            _bucket_expr(item, s, width).alias("bucket"),
                        )
                        for s in range(depth)
                    ]
                )
            ).alias("c")
        )
        .select("c.seed", "c.bucket")
    )
    return cells.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    The merged sketch of two corpora equals the sketch of their union —
    the property that makes CMS state maintainable across ingest batches
    (same shape as bloom.merge_blooms for membership)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("seed", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: est = min over the
    ``depth`` rows of the item's cell counts (an untouched cell counts 0).
    Returns ``items``' columns plus ``cms_estimate`` — one output row per
    INPUT row (duplicates in ``items`` are preserved, keyed by a per-row
    surrogate id, not by value), and all probe bookkeeping lives in
    ``__cms_``-prefixed columns so a caller column named ``seed``/``bucket``
    /``n`` can never collide with the join.

    The sketch side is at most depth*width rows — always broadcast — so
    estimating any number of candidates is a map-side join plus a groupBy
    on the surrogate row id."""
    reserved = [c for c in items.columns if c.startswith("__cms_")]
    if reserved:
        raise ValueError(
            f"items columns {reserved} collide with cms_estimate "
            "bookkeeping (the __cms_ prefix is reserved)"
        )
    item = F.col(item_col)
    tagged = items.withColumn("__cms_row", F.monotonically_increasing_id())
    probes = tagged.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _bucket_expr(item, s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("__p"),
    ).select(
        "*",
        F.col("__p.seed").alias("__cms_seed"),
        F.col("__p.bucket").alias("__cms_bucket"),
    ).drop("__p")
    cells = sketch.select(
        F.col("seed").alias("__cms_seed"),
        F.col("bucket").alias("__cms_bucket"),
        F.col("n").alias("__cms_n"),
    )
    est = (
        probes.join(
            F.broadcast(cells), on=["__cms_seed", "__cms_bucket"], how="left"
        )
        .groupBy("__cms_row")
        .agg(
            *[F.first(c).alias(c) for c in items.columns],
            F.min(F.coalesce("__cms_n", F.lit(0))).alias("cms_estimate"),
        )
        .drop("__cms_row")
    )
    return est


def cms_cells_oracle_sql(items_sql: str, depth: int = 4, width: int = 512) -> str:
    """DuckDB twin of ``cms_build``: ``items_sql`` must yield one column
    named ``item``; output is the same sparse (seed, bucket, n) table."""
    return f"""
SELECT s.s AS seed,
       CAST(CAST(('0x' || substr(md5(CAST(s.s AS VARCHAR) || ':' || item),
                  1, 15)) AS BIGINT) % {width} AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM ({items_sql}) r, unnest(range(0, {depth})) AS s(s)
GROUP BY 1, 2
"""
