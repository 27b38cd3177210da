"""Deterministic global shuffle for training-data prep: shard + position.

Not in the reference (row order there is whatever the HTTP client sent,
/root/reference/etl/etl.py:103-131); a north-star training-data operator —
before training, a corpus is globally shuffled and split into shards, and
the shuffle must be DETERMINISTIC (same seed -> same order) so runs are
reproducible and resumable.

The classic mistake at 100 TB is `orderBy(rand())`: non-deterministic
under retries AND a global range sort.  This operator instead derives a
cryptographic sort key ``md5(seed:key)`` per row, buckets rows into shards
by key prefix, and sorts ONLY within each shard — one hash-partition
exchange plus a partition-local sort, no global range exchange, no sampled
range boundaries, plan-gated.  Shards are balanced by the uniformity of
md5 regardless of input skew, and every (shard, position) is a pure
function of (seed, key), reproducible by any engine with md5 — which is
exactly how the DuckDB oracle re-derives it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sort_key(key_col: str, seed: int):
    """64-hex md5 of ``seed:key`` — the shuffle order, engine-portable."""
    return F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))


def md5_prefix_long(col, salt: str = ""):
    """First 8 hex chars of ``md5(salt || key-as-string)`` as int64 — the
    engine-portable content-checksum idiom shared by the export manifest
    and the streaming batch fingerprint.  NULL keys propagate to NULL
    (plain concat, not concat_ws), so SUMs of this checksum skip NULL keys
    in both engines."""
    keyed = F.col(col) if isinstance(col, str) else col
    keyed = keyed.cast("string")
    if salt:
        keyed = F.concat(F.lit(salt), keyed)
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def range_shard_expr(md5_hex, n_shards: int):
    """Monotone range shard from a digest's top 32 bits:
    ``floor(h32 * n / 2^32)`` — shared by global_shuffle and the JSONL
    export sink so the two shard assignments can never drift.  h32 * n <
    2^53 keeps the double division exact (n_shards is int32), and md5
    uniformity balances the ranges regardless of key skew."""
    h32 = F.conv(F.substring(md5_hex, 1, 8), 16, 10).cast("long")
    return F.floor((h32 * F.lit(n_shards)) / F.lit(2**32)).cast("int")


def global_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Append ``shard`` (0..n_shards-1) and ``position`` (0-based rank of
    the row inside its shard under the md5 order, key as tiebreak for the
    astronomically-unlikely digest collision).

    One exchange keyed by shard; the per-shard rank is a window sort local
    to the shard's partition.  Shard count chooses the parallelism/file
    granularity — at 100 TB pick n_shards >= cluster cores so no shard
    outgrows an executor, exactly like choosing output file counts."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _sort_key(key_col, seed)
    # RANGE-shard on the top 32 digest bits (range_shard_expr): monotonic
    # in the digest, so shard boundaries agree with the global md5 order
    # and concatenating shards 0..n-1 in position order IS the global
    # shuffle order.
    staged = df.withColumn("__h", h).withColumn(
        "shard", range_shard_expr(F.col("__h"), n_shards)
    )
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (
        staged.repartition(max(n_shards, 1), "shard")
        .withColumn("position", F.row_number().over(w) - F.lit(1))
        .drop("__h")
    )


def shuffle_oracle_sql(source_sql: str, key_col: str, n_shards: int, seed: int = 0) -> str:
    """DuckDB replay of global_shuffle over ``source_sql`` rows."""
    return f"""
WITH src AS ({source_sql}), hashed AS (
  SELECT *, md5('{seed}' || ':' || {key_col}) AS h FROM src
), sharded AS (
  SELECT *,
         CAST(floor((('0x' || substr(h, 1, 8))::BIGINT * {n_shards})
                    / 4294967296.0) AS INTEGER) AS shard
  FROM hashed
)
SELECT * EXCLUDE (h),
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, {key_col})
            - 1 AS INTEGER) AS position
FROM sharded
"""
