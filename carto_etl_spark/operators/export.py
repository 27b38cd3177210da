"""Sharded JSONL export — the dataset-egress sink of a training pipeline.

The reference's only egress is SQL text POSTed at a database
(/root/reference/etl/etl.py:103-131); a training corpus instead ships as
deterministic JSONL shards (one line per document, fixed shard count or
target shard size) plus a manifest, so downstream loaders can resume,
verify, and stream shard-by-shard.

Design:

* Shard assignment reuses the md5 range-sharding of operators/shuffle.py:
  ``shard = floor(top32(md5(seed:key)) * n / 2^32)`` — a pure function of
  (seed, key), balanced by digest uniformity regardless of input skew, and
  replayable in any engine with md5 (which is how the oracle re-derives
  it).  No global sort, no sampled range boundaries.
* The write is ``repartition(n_shards, shard)`` + ``partitionBy(shard)``
  text: one exchange keyed by shard, then each task streams its shard's
  JSON lines straight to its own file — at 100 TB the shard count chooses
  file granularity exactly like choosing output partitions, and no task
  ever holds more than its shard.
* Each line is ``to_json(struct(*))``: newlines and quotes inside fields
  are JSON-escaped, so the file is valid line-delimited JSON by
  construction and the read-back parse restores the exact column values
  (the catalog entry proves this round-trip value-by-value via md5
  content checksums, not just row counts).
* ``write_manifest`` records per-shard row counts and key checksums from
  the SAME DataFrame lineage that fed the write, giving loaders an
  integrity check that any engine can recompute.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from carto_etl_spark.operators.shuffle import (
    _sort_key,
    md5_prefix_long,
    range_shard_expr,
)

SHARD_COL = "shard"


def assign_shards(
    df: DataFrame, n_shards: int, key_col: str, seed: int = 0
) -> DataFrame:
    """Append a deterministic ``shard`` column in [0, n_shards) — the same
    md5 range shard as operators/shuffle.py (shared expression, cannot
    drift).  Refuses input that already carries a ``shard`` column:
    silently overwriting it would export the synthetic id in place of the
    user's values."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if SHARD_COL in df.columns:
        raise ValueError(
            f"input already has a {SHARD_COL!r} column; rename it before "
            "export (the sink reserves that name for the shard id)"
        )
    return df.withColumn(
        SHARD_COL, range_shard_expr(_sort_key(key_col, seed), n_shards)
    )


def shards_for_bytes(
    df: DataFrame, target_bytes: int, size_col: str
) -> int:
    """Shard count so the average shard carries ~``target_bytes`` of
    ``size_col`` (one map-side-combined aggregate; at 100 TB this is the
    knob that keeps every output file loader-sized)."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    total = df.select(F.sum(F.col(size_col).cast("long"))).first()[0] or 0
    return max(1, -(-int(total) // int(target_bytes)))


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    seed: int = 0,
) -> None:
    """Write ``df`` as JSONL under ``path/shard=K/`` — one exchange, one
    file per shard, every row's destination a pure function of its key."""
    staged = assign_shards(df, n_shards, key_col, seed)
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    (
        staged.repartition(n_shards, SHARD_COL)
        .select(F.col(SHARD_COL), line)
        .write.partitionBy(SHARD_COL)
        .mode("overwrite")
        .text(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read an export back: text lines -> typed columns + the ``shard``
    partition column recovered from the directory layout.

    (Spark logs a WARN FileStreamSink/FileNotFoundException for the glob
    path while probing for streaming-sink metadata — cosmetic, the batch
    read proceeds normally.)"""
    raw = spark.read.option("basePath", path).text(f"{path}/{SHARD_COL}=*")
    parsed = raw.select(
        F.col(SHARD_COL).cast("int").alias(SHARD_COL),
        F.from_json("value", schema).alias("r"),
    )
    return parsed.select(SHARD_COL, "r.*")


def manifest_df(staged: DataFrame, key_col: str) -> DataFrame:
    """Per-shard manifest: row count and an order-independent key checksum
    (sum of md5-prefix ints — exact int64 arithmetic, recomputable by any
    engine)."""
    key_ck = md5_prefix_long(key_col)
    return staged.groupBy(SHARD_COL).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(key_ck).alias("key_checksum"),
    )


def _write_text_file(spark: SparkSession, path_str: str, content: str) -> None:
    """Write a small text file through the Hadoop FileSystem of the target
    path, so the manifest lands beside the shards on ANY filesystem the
    shard write itself supports (local, hdfs://, s3a://, gs://) — a plain
    ``open()`` would fail or silently write to the driver's local disk for
    non-local URIs."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def write_manifest(
    df: DataFrame, path: str, n_shards: int, key_col: str, seed: int = 0
) -> None:
    """Write ``manifest.json`` beside the shards (shard stats are tiny —
    n_shards rows — so one small file is the right container)."""
    rows = (
        manifest_df(assign_shards(df, n_shards, key_col, seed), key_col)
        .orderBy(SHARD_COL)
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "seed": seed,
        "shards": [
            {
                "shard": r[SHARD_COL],
                "n_rows": r["n_rows"],
                "key_checksum": r["key_checksum"],
            }
            for r in rows
        ],
    }
    _write_text_file(
        df.sparkSession,
        os.path.join(path, "manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
