"""Incremental MinHash-LSH near-dup index: match each micro-batch against
ALL previously ingested documents by SIMILARITY, not just key equality —
the third leg of the streaming-dedup triad (``streaming/dedup.py`` bloom =
exact membership, ``streaming/frequency.py`` count-min = multiplicity,
this = near-duplication), and the incremental form of the batch
``minhash_dedup`` (operators/dedup.py): a 100 TB corpus grows without ever
re-LSH-ing its own history.

State is an append-only parquet tree, ``<state>/buckets`` with columns
``(band, bucket, doc_id)`` — ~rows x bands rows, each a (long, long, id)
triple, a few dozen bytes: sketch-sized relative to the corpus.  Bucket
values come from the SAME ``band_struct_expr`` the batch operator uses, so
state written yesterday and a batch hashed today can never disagree.

Crash-safety (single sequential writer — the foreachBatch handler):

- **Appends are atomic.**  Each batch's bucket rows are written to a
  staging directory OUTSIDE the read path and committed with one
  ``os.rename`` into ``buckets/batch-<token>/``.  A crash mid-write leaves
  only an orphaned staging dir (swept by recovery), never a partially
  visible batch — without this, a replayed batch would see its id as
  'seen' (the per-id anti-join) and never complete its bands, permanently
  losing LSH recall for those documents.
- **Compaction is recoverable.**  ``compact_index`` promotes via the
  rename pair (buckets -> buckets.old, buckets.tmp -> buckets); a crash
  between the two renames leaves no ``buckets`` dir, and recovery —
  run first by every reader/writer — restores ``buckets.old``.  Without
  it the handler's have-state probe would silently skip near-dup matching
  and start a fresh index while the full history sat orphaned.

Both recipes come from the shared ``streaming.state.AppendOnlyState``
(this module's hand-rolled predecessors are where the r4 crash-window
bugs lived).

Per batch:

1. signature + band buckets for the batch (map-only);
2. candidates = batch buckets ⋈ state buckets on (band, bucket) — the
   batch side is broadcast, so this is one map pass over the bucket state,
   no shuffle of history;
3. EXACT word-n-gram Jaccard verification of the candidate pairs
   (``verify_pairs_jaccard``) against the candidate-touched text only —
   history text comes from the target via an id semi-join (a point lookup,
   file-pruned on a clustered/transactional target), never a full-corpus
   pass.  Exact verification means signature noise can't flip a decision:
   results equal re-running the batch operator against the full history;
4. batch docs with a verified match are dropped; survivors append to the
   target and their buckets to state (id anti-join first).  Replay
   semantics match ``streaming/dedup.py``: once a delivery completed the
   state append, a replayed micro-batch matches its own history rows
   (exact Jaccard 1.0 with itself) and contributes zero target and zero
   state rows; the crash window between the TARGET append and the state
   append is the usual at-least-once hole, closed by a transactional
   target.

Scale posture: per-batch cost is (batch map work) + (one scan of the
bucket state) + (verify bounded by candidate count).  The bucket scan is
the knob: compact + sort state by (band, bucket) periodically and parquet
row-group stats skip the misses; batch several micro-batches per trigger
when ingest rate makes per-batch scans the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.dedup import (
    band_struct_expr,
    minhash_signatures,
    verify_pairs_jaccard,
)
from carto_etl_spark.operators.jobs import TargetTable
from carto_etl_spark.streaming.state import AppendOnlyState


def _state(state_dir: str) -> AppendOnlyState:
    """The bucket tree as a shared append-only store (staged atomic
    appends, recoverable compaction — the machinery whose hand-rolled
    predecessor here grew the two r4 crash-window bugs)."""
    return AppendOnlyState(state_dir, root_name="buckets")


def have_index(state_dir: str) -> bool:
    """True when committed bucket state exists (at least one committed
    batch subdir or compacted data file)."""
    return _state(state_dir).exists()


def _read_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """The committed (band, bucket, id) state."""
    return _state(state_dir).read(spark)


def batch_buckets(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 16,
) -> DataFrame:
    """(band, bucket, doc_id) rows for a signed batch — the exact rows the
    state stores."""
    return df.select(
        F.explode(band_struct_expr(F.col(sig_col), bands)).alias("bb"),
        F.col(id_col),
    ).select(
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        F.col(id_col),
    )


def match_against_index(
    spark: SparkSession,
    batch: DataFrame,
    history_text: DataFrame,
    state_dir: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Verified near-dup pairs (id_a = batch id, id_b = history id, inter,
    union_sz, jaccard) between ``batch`` and everything in the index.
    ``history_text`` supplies text for verification and is only read for
    candidate-touched ids (semi-join inside verify_pairs_jaccard).  The
    caller checks the index exists (``have_index``; the streaming handler
    does)."""
    _state(state_dir).recover()
    signed = minhash_signatures(
        batch, id_col, text_col,
        num_hashes=num_hashes, shingle_words=shingle_words,
    )
    bb = batch_buckets(signed, id_col, bands=bands)
    state = _read_index(spark, state_dir)
    cand = (
        F.broadcast(
            bb.select("band", "bucket", F.col(id_col).alias("id_a"))
        )
        .join(
            state.select("band", "bucket", F.col(id_col).alias("id_b")),
            ["band", "bucket"],
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        # materialize BEFORE verify (the dedup.py _materialize rule):
        # verify_pairs_jaccard references the pair list from five plan
        # branches (touched-id union x2 inside each shingle side + the
        # broadcast join), and per-branch column pruning makes the
        # subtrees non-identical so ReuseExchange cannot dedup them — an
        # unmaterialized candidate plan replays the signature build AND
        # the full bucket-state scan per branch (r10 measure:
        # lsh_match_steady's plan held 94 Exchanges; the state scan is
        # the dominant per-batch term at corpus scale)
        .localCheckpoint(eager=True)
    )
    corpus = batch.select(id_col, text_col).unionByName(
        history_text.select(id_col, text_col)
    )
    return verify_pairs_jaccard(
        cand, corpus, id_col, text_col,
        n=shingle_words, min_jaccard=threshold,
    )


def append_to_index(
    df: DataFrame,
    state_dir: str,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 16,
) -> None:
    """Atomically append a signed batch's bucket rows, id-anti-joined
    against existing state so a replayed batch is a no-op (idempotent per
    id).  ``AppendOnlyState.append`` stages the write outside the read path
    and commits with one ``os.rename`` — a crash anywhere leaves either the
    complete batch or nothing (see the module docstring for why partial
    visibility would be a permanent recall loss)."""
    state = _state(state_dir)
    rows = batch_buckets(df, id_col, bands=bands)
    spark = df.sparkSession
    if state.exists():
        seen = _read_index(spark, state_dir).select(id_col).distinct()
        rows = rows.join(seen, on=id_col, how="left_anti")
    state.append(rows)


def compact_index(
    spark: SparkSession, state_dir: str, target_files: int = 8
) -> int:
    """Rewrite the append-only bucket state sorted by (band, bucket) so
    parquet row-group stats skip misses during the per-batch scan.  Promote
    is ``AppendOnlyState.compact``'s two-rename pair, recovered on any
    crash point.  Returns the row count."""
    state = _state(state_dir)
    rows = (
        state.read(spark)
        .repartitionByRange(target_files, "band", "bucket")
        .sortWithinPartitions("band", "bucket")
    )
    state.compact(rows)
    return state.read(spark).count()


def insert_stream_near_dedup(
    stream_df: DataFrame,
    target: TargetTable,
    id_col: str,
    text_col: str,
    state_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the near-dedup ingest: each micro-batch drops documents with a
    verified near-dup already in the corpus, appends survivors to the
    target and their buckets to state.  Intra-batch near-dups are NOT
    collapsed here — run the batch ``minhash_dedup`` upstream when the
    source itself contains duplicates."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([id_col]).where(
            F.col(id_col).isNotNull()
        )
        if have_index(state_dir):
            history_text = target.read().select(id_col, text_col)
            pairs = match_against_index(
                spark, batch, history_text, state_dir, id_col, text_col,
                threshold=threshold, num_hashes=num_hashes, bands=bands,
                shingle_words=shingle_words,
            )
            dup_ids = pairs.select(F.col("id_a").alias(id_col)).distinct()
            fresh = batch.join(dup_ids, on=id_col, how="left_anti")
        else:
            fresh = batch
        # two consumers (target append, state append): pin survivors once
        fresh = fresh.localCheckpoint(eager=True)
        target.append(fresh)
        signed = minhash_signatures(
            fresh, id_col, text_col,
            num_hashes=num_hashes, shingle_words=shingle_words,
        )
        append_to_index(signed, state_dir, id_col, bands=bands)

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
