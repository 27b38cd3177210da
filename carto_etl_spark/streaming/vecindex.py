"""Incremental embedding near-dup index: match each micro-batch of VECTORS
against all previously ingested vectors by cosine similarity — the
embedding-space sibling of the MinHash index (``streaming/lshindex.py``),
and the incremental form of the batch ``embedding_near_dup_banded``
(operators/similarity.py): a growing corpus is deduplicated semantically
without ever re-hashing its own history.

State is an append-only parquet tree of ``(band, bucket, vec_id)`` rows —
one row per vector per band, a few dozen bytes each, sketch-sized relative
to the corpus.  Buckets are random-hyperplane signatures
(``signature_bits_expr``) whose planes derive deterministically from
``(dim, n_planes, seed + band)``: state written yesterday and a batch
hashed today can never disagree, and an independent SQL engine can replay
every bucket value (unlike the xxhash64 MinHash buckets) — the catalog
oracle checks the whole lifecycle by value.

Crash-safety is entirely the shared ``AppendOnlyState`` recipe (staged
atomic appends, recoverable two-rename compaction) — see
streaming/state.py; this module adds no hand-rolled state machinery.

Per batch:

1. band buckets for the batch — a map-only projection (one fold signature
   per band; see the ``signature`` note on vec_band_buckets);
2. candidates = batch buckets ⋈ state buckets on (band, bucket), batch
   side broadcast: one map pass over the bucket state, history is never
   shuffled;
3. EXACT cosine verification of candidate pairs — per-row norms hoisted
   before the join and only the expanded dot in the join condition (the
   embedding_near_dup_banded lessons; at toy dims the fold form is used
   for the same build-cost reason as that operator's verify);
4. batch vectors with a verified match are dropped; survivors append to
   the target and their buckets to state (id anti-join first, so a
   replayed batch is a per-id no-op).

Replay/crash semantics match lshindex.py: a batch replayed after its state
append matches its own history rows (cosine 1.0 with itself) and
contributes zero new target/state rows; the window between target append
and state append is the usual at-least-once hole, closed by a
transactional target.

Recall contract (same as the banded batch operator): a pair is checked
only if it collides in some band — identical vectors ALWAYS collide, and
near-identical pairs at cosine s collide with probability
``1 - (1 - p^r)^L``, ``p = 1 - arccos(s)/pi``.  Size bands for the
corpus's near-dup band; the exact verify then guarantees zero false
positives.

Reference: the reference system (a SQL-text ETL client,
/root/reference/etl/etl.py) has no vector surface; this is extension
scope for the LLM-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.jobs import TargetTable
from carto_etl_spark.operators.similarity import (
    _band_buckets_bulk,
    _banded_candidates,
    _hoisted_vecs,
    _hyperplanes,
    _verified_cosine,
    signature_bits_expr,
)
from carto_etl_spark.streaming.state import AppendOnlyState


def _state(state_dir: str) -> AppendOnlyState:
    return AppendOnlyState(state_dir, root_name="buckets")


def have_vec_index(state_dir: str) -> bool:
    """True when committed bucket state exists."""
    return _state(state_dir).exists()


def _read_index(spark: SparkSession, state_dir: str) -> DataFrame:
    return _state(state_dir).read(spark)


def vec_band_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    signature: str = "fold",
) -> DataFrame:
    """(band, bucket, id) rows for a batch — the exact rows the state
    stores.  ``signature`` picks the evaluation path:

    * ``"fold"`` (default): HOF-fold band signatures — right for streaming
      micro-batches, where the expansion's per-build analysis cost (~3 s
      per 8x64 signature tree) dominates any runtime gain, and the only
      SQL-replayable form an oracle can check.
    * ``"arrow"``: ONE numpy matmul per Arrow batch
      (``_band_buckets_bulk``) — the BACKFILL path for indexing a large
      static corpus (a 505k x 64-dim fold pass is interpreted at ~0.5 us
      per element, i.e. minutes; n_bands fused codegen signatures overflow
      Janino).  CONSISTENCY CONTRACT: fold and arrow agree except on plane
      dots within an ulp of 0.0 (sign flips from summation order), so an
      index must be BUILT and QUERIED with one path — record the choice
      with the index.  Identical-vector collisions are path-safe only
      within a path.
    """
    if signature == "arrow":
        sigged = _band_buckets_bulk(
            df, vec_col, dim, n_planes, n_bands, seed, out_col="__bands"
        )
        return sigged.select(
            F.col(id_col),
            F.posexplode("__bands").alias("band", "bucket"),
        ).select("band", "bucket", id_col)
    if signature != "fold":
        raise ValueError(
            f"signature must be 'fold' or 'arrow', got {signature!r}"
        )
    emb_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            signature_bits_expr(
                emb_sql, _hyperplanes(dim, n_planes, seed + b),
                expansion=False,
            ).alias("bucket"),
        )
        for b in range(n_bands)
    ]
    return df.select(
        F.explode(F.array(*bands)).alias("bb"), F.col(id_col)
    ).select("bb.band", "bb.bucket", id_col)


def match_against_vec_index(
    spark: SparkSession,
    batch: DataFrame,
    history_vecs: DataFrame,
    state_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.99,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    signature: str = "fold",
) -> DataFrame:
    """Verified near-dup pairs (id_a = batch id, id_b = history id,
    cosine) between ``batch`` and everything in the index.
    ``history_vecs`` supplies vectors for verification and is read only
    for candidate-touched ids (the semi-join below) — never a full
    history pass.  Caller checks ``have_vec_index`` first."""
    _state(state_dir).recover()
    bb = vec_band_buckets(
        batch, id_col, vec_col, dim, n_planes, n_bands, seed,
        signature=signature,
    )
    state = _read_index(spark, state_dir)
    cand = _banded_candidates(
        bb.select("band", "bucket", F.col(id_col).alias("__id")),
        other=state.select("band", "bucket", F.col(id_col).alias("__id")),
        broadcast_left=True,
        # materialize: the candidate list feeds both the touched-history
        # semi-join and the verify joins below — unmaterialized, each
        # branch would replay the banded join INCLUDING the bucket-state
        # scan (the dedup.py _materialize rule; see lshindex.py)
    ).localCheckpoint(eager=True)
    # exact verify on the candidate-touched sliver only (fold forms — dim
    # None: a micro-batch's candidate sliver is small, and the expansion's
    # per-build cost dominates at streaming cadence); history vectors are
    # read only for candidate-touched ids, never a full pass
    bvec = _hoisted_vecs(batch, id_col, vec_col)
    hids = cand.select(F.col("id_b").alias(id_col)).distinct()
    hvec = _hoisted_vecs(
        history_vecs.join(hids, id_col, "left_semi"), id_col, vec_col
    )
    return _verified_cosine(cand, bvec, hvec).filter(
        F.col("cosine") >= threshold
    )


def append_to_vec_index(
    df: DataFrame,
    state_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    signature: str = "fold",
) -> None:
    """Atomically append a batch's bucket rows, id-anti-joined against
    existing state (idempotent per id under replay).  ``signature`` must
    match the index's recorded path (see vec_band_buckets)."""
    state = _state(state_dir)
    rows = vec_band_buckets(
        df, id_col, vec_col, dim, n_planes, n_bands, seed,
        signature=signature,
    )
    if state.exists():
        seen = _read_index(df.sparkSession, state_dir).select(
            id_col
        ).distinct()
        rows = rows.join(seen, on=id_col, how="left_anti")
    state.append(rows)


def compact_vec_index(
    spark: SparkSession, state_dir: str, target_files: int = 8
) -> int:
    """Rewrite bucket state sorted by (band, bucket) so row-group stats
    skip misses during the per-batch scan; returns the row count."""
    state = _state(state_dir)
    rows = (
        state.read(spark)
        .repartitionByRange(target_files, "band", "bucket")
        .sortWithinPartitions("band", "bucket")
    )
    state.compact(rows)
    return state.read(spark).count()


def insert_stream_vec_near_dedup(
    stream_df: DataFrame,
    target: TargetTable,
    state_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.99,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    signature: str = "fold",
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the near-dedup vector ingest: each micro-batch drops vectors
    with a verified cosine near-dup already in the corpus, appends
    survivors to the target and their buckets to state.  Intra-batch
    near-dups are NOT collapsed here — run the batch
    ``embedding_near_dup_banded`` upstream when the source itself carries
    duplicates (the lshindex.py contract).  ``signature`` must match the
    path any pre-existing state was built with (vec_band_buckets)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([id_col]).where(
            F.col(id_col).isNotNull()
        )
        if have_vec_index(state_dir):
            history = target.read().select(id_col, vec_col)
            pairs = match_against_vec_index(
                spark, batch, history, state_dir, id_col, vec_col, dim,
                threshold=threshold, n_planes=n_planes, n_bands=n_bands,
                seed=seed, signature=signature,
            )
            dup_ids = pairs.select(F.col("id_a").alias(id_col)).distinct()
            fresh = batch.join(dup_ids, on=id_col, how="left_anti")
        else:
            fresh = batch
        fresh = fresh.localCheckpoint(eager=True)  # two consumers
        target.append(fresh)
        append_to_vec_index(
            fresh, state_dir, id_col, vec_col, dim, n_planes, n_bands,
            seed, signature=signature,
        )

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
