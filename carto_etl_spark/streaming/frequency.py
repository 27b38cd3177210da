"""Streaming heavy-hitter state: maintain a count-min sketch across
micro-batches — the incremental form of the batch ``cms_build``
(operators/sketch.py), and the frequency twin of the bloom-state dedup
(streaming/dedup.py): membership there, multiplicity here.

Per batch: build the batch's sketch (depth x width cells, the map-side
partial agg collapsing arbitrarily many rows), merge it cell-wise into the
persisted sketch (``cms_merge`` — O(depth*width) regardless of history),
and promote the new state atomically.

Exactly-once counting: counting, unlike key-dedup, is NOT naturally
idempotent — a replayed batch would double every count.  The state
therefore carries a content-addressed ledger of applied batches (md5 of the
batch's sorted cell table); a batch whose fingerprint is already present is
skipped.  Crucially the ledger and the sketch live in ONE state directory
promoted by ONE rename, so no crash point can leave "counted but not
recorded" or "recorded but not counted" — the state is always a consistent
(sketch, ledger) pair, and replay after any crash converges to
exactly-once.  The content-addressing survives checkpoint resets (where
``batch_id`` restarts and an id-keyed ledger would double-count); the
documented trade-off is that two DISTINCT batches with byte-identical item
multisets dedupe — if that is a real case upstream, add a batch sequence
column to the payload.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.sketch import cms_build, cms_merge
from carto_etl_spark.session import local_df

_CELLS = "cells"
_APPLIED = "applied"


def _sketch_fingerprint(cells: list) -> str:
    body = ";".join(f"{s}:{b}:{n}" for s, b, n in sorted(cells))
    return hashlib.md5(body.encode()).hexdigest()


def _current(state_dir: str) -> str:
    return os.path.join(state_dir, "current")


def _recover(state_dir: str) -> None:
    """If a crash landed between the two promote renames (current moved to
    .old, replacement not yet moved in), the previous state is intact under
    .old — restore it.  Every reader/writer calls this first."""
    cur = _current(state_dir)
    old = cur + ".old"
    if not os.path.exists(cur) and os.path.exists(old):
        os.rename(old, cur)


def _promote(tmp: str, cur: str) -> None:
    swap = cur + ".old"
    if os.path.exists(swap):  # leftover from a crash after the final rename
        shutil.rmtree(swap)
    if os.path.exists(cur):
        os.rename(cur, swap)
    os.rename(tmp, cur)
    if os.path.exists(swap):
        shutil.rmtree(swap)


def load_frequency_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the current sketch cell table (seed, bucket, n); point-query it
    with ``operators.sketch.cms_estimate``."""
    _recover(state_dir)
    return spark.read.parquet(os.path.join(_current(state_dir), _CELLS))


def track_frequencies(
    stream_df: DataFrame,
    item_col: str,
    state_dir: str,
    depth: int = 4,
    width: int = 512,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the frequency tracker.  ``depth``/``width`` are fixed at state
    creation (sketches only merge shape-to-shape); width bounds the
    overcount at ~2N/width, so size it for the EVENTUAL stream volume."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(state_dir)
        batch_sketch = cms_build(batch_df, item_col, depth, width)
        # sketch-sized collect (<= depth*width cells) — the same budget
        # save_bloom spends on its one-row bitmap
        cells = [
            (int(r["seed"]), int(r["bucket"]), int(r["n"]))
            for r in batch_sketch.collect()
        ]
        if not cells:
            return
        fp = _sketch_fingerprint(cells)
        cur = _current(state_dir)
        have_state = os.path.exists(cur)
        if have_state:
            applied = spark.read.parquet(os.path.join(cur, _APPLIED))
            if applied.where(applied.fp == fp).limit(1).count() > 0:
                return  # replayed batch: already applied
            merged = cms_merge(
                spark.read.parquet(os.path.join(cur, _CELLS)),
                local_df(spark, cells, "seed int, bucket int, n long"),
            )
            fps = [r["fp"] for r in applied.collect()] + [fp]
        else:
            merged = local_df(spark, cells, "seed int, bucket int, n long")
            fps = [fp]
        tmp = cur + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        merged.coalesce(1).write.parquet(os.path.join(tmp, _CELLS))
        local_df(spark, [(f,) for f in fps], "fp string").coalesce(
            1
        ).write.parquet(os.path.join(tmp, _APPLIED))
        _promote(tmp, cur)

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
