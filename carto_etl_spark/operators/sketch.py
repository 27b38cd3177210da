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


# ---------------------------------------------------------------------------
# HyperLogLog: fixed-size, mergeable DISTINCT-COUNT state — the third leg of
# the sketch triad (bloom.py = membership, cms_* above = multiplicity, this
# = cardinality).  Registers, not a scalar, are the state: merging two
# corpora's registers bucket-wise by max equals the registers of their union
# (partial aggregation IS the merge, exactly as in cms_build), and the
# estimate is derived from registers on demand.  Spark's built-in
# approx_count_distinct is HLL++ too but exposes only the scalar — no
# mergeable, persistable state across ingest batches.
#
# Hashing follows the module convention: 60-bit md5-prefix int, identical in
# Spark and DuckDB, so the REGISTER TABLE is value-checkable by the oracle
# (bucket = h mod 2^p, sub-hash w = h >> p, rho = leading zeros of w in its
# (60-p)-bit window + 1 = 61 - p - bitlength(w); both engines render
# bin(w) minimal-length).  The final estimate involves an FP harmonic sum
# (order-dependent), so the ORACLE checks registers exactly and the
# estimate's accuracy is asserted in-engine against exact distinct counts.
# ---------------------------------------------------------------------------


def hll_build(df: DataFrame, item_col: str, p: int = 10) -> DataFrame:
    """HLL register table for ``item_col``: one row per touched bucket,
    ``(bucket int, max_rho int)``, at most ``2^p`` rows out regardless of
    input size.  Plan: pure column math + ONE groupBy whose map-side
    partial max collapses every partition to <= 2^p rows before the
    exchange."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    item = F.col(item_col)
    h = F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(61 - p)).otherwise(
        F.lit(61 - p) - F.length(F.bin(w))
    )
    return (
        df.where(item.isNotNull())
        .select(
            (h % m).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables built with the same ``p``: bucket-wise max.
    merge(build(A), build(B)) == build(A union B) — the property that makes
    the state maintainable across ingest batches."""
    if not registers:
        raise ValueError("need at least one register table")
    unioned = reduce(lambda a, b: a.unionByName(b), registers)
    return unioned.groupBy("bucket").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """Cardinality estimate from a register table (classic Flajolet et al.
    2007 with the small-range linear-counting correction): one row
    ``(n_buckets_used long, estimate double)``.  Standard error ~1.04/sqrt(2^p)
    (~3.3% at p=10).  The harmonic sum runs over PRESENT buckets only;
    absent registers contribute 2^0 = 1 each, added as a closed form."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).cast("long").alias("v_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("z_present"),
    )
    z = F.col("z_present") + (F.lit(m) - F.col("v_used"))
    raw = F.lit(alpha * m * m) / z
    zeros = F.lit(m) - F.col("v_used")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.col("v_used").alias("n_buckets_used"),
        corrected.alias("estimate"),
    )


def hll_registers_oracle_sql(items_sql: str, p: int = 10) -> str:
    """DuckDB twin of ``hll_build``: ``items_sql`` must yield one column
    named ``item`` (pre-cast to VARCHAR for cross-engine md5 equality)."""
    m = 1 << p
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(item), 1, 15))::BIGINT AS hv
  FROM ({items_sql}) r WHERE item IS NOT NULL
), reg AS (
  SELECT CAST(hv % {m} AS INT) AS bucket,
         CAST(CASE WHEN (hv >> {p}) = 0 THEN {61 - p}
              ELSE {61 - p} - length(bin(hv >> {p})) END AS INT) AS rho
  FROM h
)
SELECT bucket, CAST(max(rho) AS INT) AS max_rho
FROM reg GROUP BY bucket
"""


def hll_build_grouped(
    df: DataFrame, group_cols: list[str], item_col: str, p: int = 10
) -> DataFrame:
    """Per-group HLL register tables — the groupBy form of ``hll_build``
    (distinct users per day/segment at 100 TB without a count-distinct
    shuffle of raw keys).  One row per (group, touched bucket); the
    map-side partial max collapses every partition to <= groups * 2^p rows
    before the exchange, so shuffle volume is sketch-sized per group
    regardless of row count.  Merge across batches = the same groupBy max
    over a union (bucket-wise max is associative/idempotent per group)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    item = F.col(item_col)
    h = F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(61 - p)).otherwise(
        F.lit(61 - p) - F.length(F.bin(w))
    )
    return (
        df.where(item.isNotNull())
        .select(
            *group_cols,
            (h % m).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Per-group cardinality estimates from grouped registers (same
    Flajolet estimator + linear-counting correction as ``hll_estimate``,
    applied per group)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("v_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("z_present"),
    )
    z = F.col("z_present") + (F.lit(m) - F.col("v_used"))
    raw = F.lit(alpha * m * m) / z
    zeros = F.lit(m) - F.col("v_used")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("v_used").alias("n_buckets_used"),
        corrected.alias("estimate"),
    )


def hll_grouped_registers_oracle_sql(
    items_sql: str, group_sql: str = "g", p: int = 10
) -> str:
    """DuckDB twin of ``hll_build_grouped``: ``items_sql`` must yield
    columns ``{group_sql}`` and ``item`` (pre-cast to VARCHAR)."""
    m = 1 << p
    return f"""
WITH h AS (
  SELECT {group_sql} AS g, ('0x' || substr(md5(item), 1, 15))::BIGINT AS hv
  FROM ({items_sql}) r WHERE item IS NOT NULL
), reg AS (
  SELECT g, CAST(hv % {m} AS INT) AS bucket,
         CAST(CASE WHEN (hv >> {p}) = 0 THEN {61 - p}
              ELSE {61 - p} - length(bin(hv >> {p})) END AS INT) AS rho
  FROM h
)
SELECT g, bucket, CAST(max(rho) AS INT) AS max_rho
FROM reg GROUP BY g, bucket
"""
