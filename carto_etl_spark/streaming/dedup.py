"""Streaming ingest dedup: every micro-batch is deduplicated against ALL
previously ingested keys before landing — the incremental form of the batch
``bloom_anti_join`` (operators/bloom.py), which is how a 100 TB corpus grows
without ever re-deduping itself.

State is two on-disk pieces, both bounded and append-cheap:

* ``<state>/keys`` — parquet of every ingested key (append-only; the exact
  side of the decision, read only for the bloom-hit sliver of each batch);
* ``<state>/bloom`` — the one-row Bloom bitmap of those keys, merged with
  each batch's bitmap in O(num_bits) (``merge_blooms``), never rebuilt from
  the key table.

Per batch: rows missing the persisted bloom are provably new and skip the
key-table read entirely; bloom hits (true dups + ~1% fp) verify against the
keys parquet with an exact anti-join, so results equal re-running the plain
anti-join against the full history.  Keys of survivors append to both
pieces.

Replay semantics: the pipeline is idempotent PER KEY — a micro-batch
replayed after a crash (the at-least-once hole of plain ``foreachBatch``)
finds its keys already in state and contributes zero rows, so the target
never holds a key twice regardless of delivery count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.bloom import (
    _BLOOM_COL,
    build_bloom,
    load_bloom,
    merge_blooms,
    might_contain,
    numeric_key_expr,
    save_bloom,
)
from carto_etl_spark.operators.jobs import TargetTable


def insert_stream_deduped(
    stream_df: DataFrame,
    target: TargetTable,
    key: str,
    state_dir: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the deduplicating ingest.  ``num_bits`` is fixed at state
    creation (bitmaps only merge shape-to-shape); size it for the EVENTUAL
    corpus (~10 bits per expected lifetime key)."""
    keys_path = os.path.join(state_dir, "keys")
    bloom_path = os.path.join(state_dir, "bloom")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([key]).where(F.col(key).isNotNull())
        have_state = os.path.exists(os.path.join(bloom_path, "_SUCCESS"))
        if have_state:
            bloom = load_bloom(spark, bloom_path)
            tagged = batch.join(F.broadcast(bloom), how="cross")
            maybe = might_contain(
                numeric_key_expr(batch, key), F.col(_BLOOM_COL),
                num_bits, num_hashes,
            )
            definite_new = tagged.where(~maybe).drop(_BLOOM_COL)
            seen = spark.read.parquet(keys_path).select(key)
            candidates = (
                tagged.where(maybe)
                .drop(_BLOOM_COL)
                .join(seen, on=key, how="left_anti")
            )
            fresh = definite_new.unionByName(candidates)
        else:
            fresh = batch
        # three consumers (target append, key append, bitmap build): pin the
        # survivors once instead of replaying the dedup plan per consumer
        fresh = fresh.localCheckpoint(eager=True)
        target.append(fresh)
        fresh.select(key).write.mode("append").parquet(keys_path)
        batch_bloom = build_bloom(
            fresh, numeric_key_expr(fresh, key), num_bits, num_hashes
        )
        if have_state:
            batch_bloom = merge_blooms(load_bloom(spark, bloom_path), batch_bloom)
        # one-row state: rewrite to a temp dir, then atomically promote, so a
        # crash mid-write never truncates the bitmap the next batch reads
        tmp = bloom_path + ".tmp"
        save_bloom(batch_bloom, tmp)
        swap = bloom_path + ".old"
        if os.path.exists(bloom_path):
            os.rename(bloom_path, swap)
        os.rename(tmp, bloom_path)
        if os.path.exists(swap):
            import shutil

            shutil.rmtree(swap)

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_keys_state(spark, state_dir: str, target_files: int = 8) -> int:
    """Rewrite the append-only keys parquet into ``target_files`` files.

    Every micro-batch appends one small file; over thousands of batches the
    key table becomes a small-files swamp whose open/footer overhead
    dominates the exact-verify reads.  Run this periodically (it is safe
    between streaming runs — state is only read inside foreachBatch).
    Returns the compacted key count.  The rewrite lands in a temp dir and is
    promoted by rename, so a crash never loses keys."""
    import os
    import shutil

    keys_path = os.path.join(state_dir, "keys")
    df = spark.read.parquet(keys_path)
    n = df.count()
    tmp = keys_path + ".tmp"
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    old = keys_path + ".old"
    os.rename(keys_path, old)
    os.rename(tmp, keys_path)
    shutil.rmtree(old)
    return n
