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

Storage mechanics (recover / two-rename promote / ledger) come from the
shared ``streaming.state.SnapshotState`` — this module owns only the
sketch-merge logic.
"""

from __future__ import annotations

import hashlib
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.sketch import cms_build
from carto_etl_spark.streaming.state import SnapshotState

_CELLS = "cells"


def _sketch_fingerprint(cells: list) -> str:
    body = ";".join(f"{s}:{b}:{n}" for s, b, n in sorted(cells))
    return hashlib.md5(body.encode()).hexdigest()


def load_frequency_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the current sketch cell table (seed, bucket, n); point-query it
    with ``operators.sketch.cms_estimate``."""
    return SnapshotState(state_dir).read(spark, _CELLS)


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
        state = SnapshotState(state_dir)
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
        # cell state is <= depth*width rows: merge (cell-wise sum — the
        # same rule as cms_merge, associative) on the driver and write
        # through the Arrow fast path instead of paying three more Spark
        # jobs per batch for a KB-sized table
        merged = {(s, b): n for s, b, n in cells}
        if state.exists():
            if state.ledger_contains(spark, fp):
                return  # replayed batch: already applied
            prior = state.read_arrow(spark, _CELLS)
            for s, b, n in zip(
                prior.column("seed").to_pylist(),
                prior.column("bucket").to_pylist(),
                prior.column("n").to_pylist(),
            ):
                key = (int(s), int(b))
                merged[key] = merged.get(key, 0) + int(n)
            fps = state.ledger_fps(spark) + [fp]
        else:
            fps = [fp]
        import pyarrow as pa

        keys = sorted(merged)
        tmp = state.begin_tmp()
        state.write_arrow(
            spark, tmp, _CELLS,
            pa.table(
                {
                    "seed": pa.array([k[0] for k in keys], pa.int32()),
                    "bucket": pa.array([k[1] for k in keys], pa.int32()),
                    "n": pa.array([merged[k] for k in keys], pa.int64()),
                }
            ),
        )
        state.write_ledger(spark, tmp, fps)
        state.promote()

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
