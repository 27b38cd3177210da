"""User-facing preprocessing pipeline compositions.

The engine's flagship chains — the CCNet-style clean/classify pipeline, the
FineWeb-style rules-before-dedup pipeline (Penedo et al. arXiv:2406.17557),
and the generic clean->dedup->split->shard manifest — existed only as query-
harness entries inside queries.py; a user wanting "FineWeb my corpus" had to
copy harness code.  This module is the published-order composition as a
LIBRARY call: a config object of rule knobs -> (survivors, manifest).  The
catalog entries (q_pipeline_e2e / q_pipeline_ccnet / q_pipeline_fineweb)
delegate here, so the DuckDB oracles prove THIS code path end to end.

Input contract: a DataFrame with an integral id column and a text column
(defaults ``doc_id`` / ``text``).  Every stage is scan-stage column math or
an Arrow-batched pass; the only shuffles are the inherent ones (line-count
agg, doc reassembly, MinHash bands, components, split/shard are map-only).
Materialization boundaries sit exactly where a stage output fans out into
multiple consumers (the pipeline_e2e lesson, r7: unmaterialized, minhash's
five plan branches re-derived the whole prefix — 8 corpus scans instead
of 1).

100 TB posture: the chains inherit each operator's scale story (banded LSH
with hot-bucket star-pairing, partial-agg line counts, broadcast rule
tables); the classifier gate bounds its training set with ``train_cap`` —
a deterministic Lehmer hash-sample computed in INTEGER arithmetic so a SQL
oracle replays the exact same training set.  Real CCNet trains its LM on a
bounded held-out set; in-query full-corpus training was the one composed
stage without a scale story (r9: 37.5x cost at 109x rows vs fineweb's
3.5x — training dominated).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from carto_etl_spark.operators import dedup as dd
from carto_etl_spark.operators import sampling as smp
from carto_etl_spark.operators import text as tx
from carto_etl_spark.operators.export import assign_shards
from carto_etl_spark.operators.sampling import LEHMER_M, hash_expr


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for the composition chains.  Defaults are the production
    values; the catalog entries relax the word/sentence minimums the way
    any toy-scale corpus must."""

    # near-dedup tail (operators/dedup.py minhash_dedup)
    dedup_threshold: float = 0.8
    dedup_num_hashes: int = 64
    dedup_bands: int = 16
    dedup_shingle_words: int = 3
    dedup_verify_exact: bool = True
    dedup_max_bucket_size: int | None = 10_000

    # split / shard manifest
    split_weights: dict = field(
        default_factory=lambda: {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    split_salt: int = 0
    n_shards: int = 16

    # CCNet cleaning prefix
    line_max_occurrences: int = 1
    line_min_chars: int = 10
    min_tokens: int = 3
    blocklist_terms: tuple = ()
    blocklist_max_hits: int = 2
    scrub_pii: bool = True

    # CCNet classifier gate (operators/classifier.py fixed-point GD)
    classifier_dim: int = 64
    classifier_iterations: int = 12
    classifier_lr_num: int = 1
    classifier_lr_den: int = 16
    classifier_scale: int = 10**6
    quality_tau: int = 250_000
    #: bound the training set: keep labeled docs whose Lehmer hash falls
    #: under min(M, train_cap * M // n) — ~train_cap docs regardless of
    #: corpus size, exact-integer so oracles replay it.  None = train on
    #: everything (the toy-scale default; at corpus scale ALWAYS set it).
    train_cap: int | None = None
    train_salt: int = 0

    # FineWeb rule tables
    c4_min_words: int = 3
    c4_min_sentences: int = 5
    gopher_word_count_min: int | None = None  # None = operator default
    gopher_word_count_max: int | None = None
    gopher_min_stopwords: int | None = None


class PipelineResult(NamedTuple):
    """Both frames a pipeline run produces: the surviving documents
    (id + cleaned text — feed training directly) and the export manifest
    (id, split, shard, n_tokens, text_md5)."""

    survivors: DataFrame
    manifest: DataFrame


def _boundary(df: DataFrame) -> DataFrame:
    """Stage-output materialization boundary: at 100 TB this is the
    'stage output to durable storage' write every real pipeline places
    between fan-out stages; locally an eager localCheckpoint."""
    return df.localCheckpoint(eager=True)


def finish_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> PipelineResult:
    """The shared pipeline TAIL: MinHash near-dedup (transitive
    survivorship) -> deterministic split assignment -> shard assignment ->
    export-manifest projection.  ``docs`` should already be materialized
    (every chain here checkpoints its last gate) — minhash references its
    input from five plan branches."""
    survivors = dd.minhash_dedup(
        docs,
        id_col,
        text_col,
        threshold=cfg.dedup_threshold,
        num_hashes=cfg.dedup_num_hashes,
        bands=cfg.dedup_bands,
        shingle_words=cfg.dedup_shingle_words,
        verify_exact=cfg.dedup_verify_exact,
        max_bucket_size=cfg.dedup_max_bucket_size,
    )
    out = smp.dataset_split(
        survivors, id_col, cfg.split_weights, cfg.split_salt
    )
    out = assign_shards(out, cfg.n_shards, id_col)
    manifest = out.select(
        id_col,
        "split",
        "shard",
        tx.token_count_expr(F.col(text_col)).cast("long").alias("n_tokens"),
        F.md5(text_col).alias("text_md5"),
    )
    return PipelineResult(survivors=survivors, manifest=manifest)


def ccnet_clean(
    docs: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet cleaning prefix: cross-document line dedup (boilerplate
    removal) -> min-token gate -> term-blocklist gate -> PII scrub.
    Returns (id, text), unmaterialized — callers place the boundary after
    their last gate."""
    from carto_etl_spark.operators.blocklist import flag
    from carto_etl_spark.operators.scrub import scrub

    cleaned = dd.drop_repeated_lines(
        docs.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        max_occurrences=cfg.line_max_occurrences,
        min_line_chars=cfg.line_min_chars,
    )
    gated = cleaned.where(
        tx.token_count_expr(F.col(text_col)) >= cfg.min_tokens
    )
    if cfg.blocklist_terms:
        gated = (
            flag(gated, text_col, tuple(cfg.blocklist_terms))
            .where(F.col("n_blocked") <= cfg.blocklist_max_hits)
            .select(id_col, text_col)
        )
    if cfg.scrub_pii:
        gated = scrub(gated, text_col).select(id_col, text_col)
    return gated


def e2e_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> PipelineResult:
    """clean -> near-dedup -> split -> shard: the generic end-to-end
    chain (q_pipeline_e2e's published order)."""
    return finish_pipeline(
        _boundary(ccnet_clean(docs, cfg, id_col, text_col)),
        cfg, id_col, text_col,
    )


def train_sample_threshold(n: int, cap: int | None) -> int:
    """The Lehmer keep-threshold bounding a training set to ~``cap`` of
    ``n`` labeled docs: min(M, cap * M // n), all integer — a SQL engine
    reproduces it bit-for-bit from count(*).  ``cap=None`` or ``n<=cap``
    keeps everything (threshold M: every hash is < M)."""
    if cap is None:
        return LEHMER_M
    if cap <= 0:
        raise ValueError(f"train_cap must be positive, got {cap}")
    if n <= 0:
        raise ValueError("no labeled rows")
    return min(LEHMER_M, cap * LEHMER_M // n)


def train_quality_gate(
    labeled: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> tuple[list, int]:
    """Train the CCNet-style quality classifier on ``labeled``
    (id, text, label in {0,1}) and return (weights, bias) for
    ``quality_score_expr``.  With ``cfg.train_cap`` set, training reads a
    deterministic hash-sample of ~train_cap docs — the count job + Lehmer
    filter are exact integers, so the same sample (and therefore the same
    weights, bit-for-bit) falls out on any engine and any partitioning."""
    from carto_etl_spark.operators import classifier as clf

    src = labeled
    if cfg.train_cap is not None:
        thr = train_sample_threshold(labeled.count(), cfg.train_cap)
        if thr < LEHMER_M:
            src = labeled.where(hash_expr(id_col, cfg.train_salt) < thr)
    feats = tx.hashed_features(
        src, text_col, [id_col], dim=cfg.classifier_dim
    )
    labels = src.select(id_col, label_col)
    return clf.train_quality_classifier(
        feats,
        labels,
        dim=cfg.classifier_dim,
        iterations=cfg.classifier_iterations,
        lr_num=cfg.classifier_lr_num,
        lr_den=cfg.classifier_lr_den,
        scale=cfg.classifier_scale,
        id_col=id_col,
        label_col=label_col,
    )


def ccnet_pipeline(
    docs: DataFrame,
    labeled: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> PipelineResult:
    """The full CCNet shape: clean ``docs``, train the quality classifier
    on ``labeled`` (bounded by ``cfg.train_cap``), gate the cleaned corpus
    at scan stage (score >= cfg.quality_tau — one more scan predicate, no
    shuffle, no UDF), then the shared dedup/split/shard tail."""
    from carto_etl_spark.operators import classifier as clf

    w, b = train_quality_gate(labeled, cfg, id_col, text_col, label_col)
    cleaned = ccnet_clean(docs, cfg, id_col, text_col)
    gated = _boundary(
        cleaned.where(
            clf.quality_score_expr(
                text_col, w, b, scale=cfg.classifier_scale
            )
            >= cfg.quality_tau
        )
    )
    return finish_pipeline(gated, cfg, id_col, text_col)


def fineweb_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> PipelineResult:
    """The FineWeb order — heuristic rules BEFORE dedup: C4 line+page
    rules -> Gopher quality table (zero-shuffle projection; the cheap gate
    prunes before the expensive counting pass) -> Gopher repetition table
    (map-only Arrow counting) -> near-dedup -> split -> shard.

    The three rule gates carry the text through ``keep_cols`` and filter
    on ``passes`` in place, so the whole pre-dedup chain FUSES into one
    scan-stage pipeline: no semi-join back onto the corpus, no
    intermediate materialization — each stage has exactly one consumer
    until the final gate output, which fans out into the dedup tail and
    so keeps the single boundary."""
    from carto_etl_spark.operators import c4rules as c4
    from carto_etl_spark.operators.gopher import (
        gopher_quality,
        gopher_repetition,
    )

    c4out = c4.c4_filter(
        docs.select(id_col, text_col),
        text_col,
        [id_col],
        min_words=cfg.c4_min_words,
        min_sentences=cfg.c4_min_sentences,
    )
    c4kept = c4out.where("doc_kept").select(
        id_col, F.col("clean_text").alias(text_col)
    )
    gq_kwargs = {}
    if cfg.gopher_word_count_min is not None:
        gq_kwargs["word_count_min"] = cfg.gopher_word_count_min
    if cfg.gopher_word_count_max is not None:
        gq_kwargs["word_count_max"] = cfg.gopher_word_count_max
    if cfg.gopher_min_stopwords is not None:
        gq_kwargs["min_stopwords"] = cfg.gopher_min_stopwords
    # method="arrow": the quality gate must NOT be the expr projection
    # here — without a boundary below it, Catalyst collapses the
    # where("passes") filter through the staged projections and
    # re-evaluates the C4 clean/tokenize chain once per referenced signal
    # (measured sf0.1: fused expr 7.3 s vs fused arrow 4.4 s vs the old
    # checkpoint+semi-join shape 4.8 s).  The map-only Arrow pass is an
    # optimizer barrier AND the cheaper evaluator, and the text is about
    # to cross into Python for the repetition counter anyway.
    qual = gopher_quality(
        c4kept, text_col, id_col, method="arrow",
        keep_cols=[text_col], **gq_kwargs
    )
    qkept = qual.where("passes").select(id_col, text_col)
    gop = gopher_repetition(qkept, text_col, id_col, keep_cols=[text_col])
    gated = _boundary(gop.where("passes").select(id_col, text_col))
    return finish_pipeline(gated, cfg, id_col, text_col)
