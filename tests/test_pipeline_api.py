"""The user-facing composition API (operators/pipeline.py): config ->
(survivors, manifest) as a LIBRARY call.

The catalog entries (q_pipeline_e2e / ccnet / fineweb) delegate here, so the
DuckDB oracles already prove the numeric semantics end to end; these tests
pin the API contract itself — config plumbing, the bounded-training-set
sample (deterministic, partition-invariant, count-exact), the
survivors/manifest consistency, and the plan boundaries surviving the
library indirection."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from carto_etl_spark.operators import sampling as smp
from carto_etl_spark.operators.pipeline import (
    PipelineConfig,
    ccnet_clean,
    ccnet_pipeline,
    e2e_pipeline,
    fineweb_pipeline,
    train_quality_gate,
    train_sample_threshold,
)
from carto_etl_spark.plans.inspect import explain_str

SF = "/root/testdata/sf0.001"


def _docs(spark, n=60):
    rows = [
        Row(
            doc_id=i,
            text=" ".join(
                ["alpha bravo charlie delta echo"]
                + (["dup dup dup"] if i % 7 == 0 else [])
                + [f"unique token {i}"]
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# train_sample_threshold: the exact-integer keep bound
# ---------------------------------------------------------------------------

def test_train_sample_threshold_math():
    M = smp.LEHMER_M
    # no cap, or corpus under the cap: keep everything (threshold M —
    # every hash is < M)
    assert train_sample_threshold(1000, None) == M
    assert train_sample_threshold(100, 100) == M
    assert train_sample_threshold(50, 100) == M
    # corpus over the cap: exact integer fraction
    assert train_sample_threshold(500, 200) == 200 * M // 500
    with pytest.raises(ValueError):
        train_sample_threshold(500, 0)
    with pytest.raises(ValueError):
        train_sample_threshold(0, 10)


def test_train_quality_gate_sample_is_partition_invariant(spark):
    """The sampled training set is a pure function of (id, salt, n, cap):
    the same weights fall out on any partitioning — the property that lets
    a SQL oracle replay training bit-for-bit."""
    labeled = _docs(spark, 80).withColumn(
        "label", (F.col("doc_id") % 7 != 0).cast("int")
    )
    cfg = PipelineConfig(
        classifier_dim=16, classifier_iterations=3, train_cap=30,
        train_salt=5,
    )
    w1, b1 = train_quality_gate(labeled, cfg)
    w2, b2 = train_quality_gate(labeled.repartition(13), cfg)
    assert (w1, b1) == (w2, b2)
    # and the cap actually bites: a different salt picks a different
    # sample, hence (almost surely on this planted corpus) different weights
    w3, b3 = train_quality_gate(
        labeled,
        PipelineConfig(
            classifier_dim=16, classifier_iterations=3, train_cap=30,
            train_salt=6,
        ),
    )
    assert (w1, b1) != (w3, b3)


def test_train_quality_gate_no_cap_equals_full_corpus(spark):
    """cap=None and cap >= n both train on everything — the toy-scale
    arm is literally the uncapped computation."""
    labeled = _docs(spark, 40).withColumn(
        "label", (F.col("doc_id") % 7 != 0).cast("int")
    )
    base = PipelineConfig(classifier_dim=16, classifier_iterations=3)
    w_none, b_none = train_quality_gate(labeled, base)
    w_big, b_big = train_quality_gate(
        labeled,
        PipelineConfig(
            classifier_dim=16, classifier_iterations=3, train_cap=10_000,
        ),
    )
    assert (w_none, b_none) == (w_big, b_big)


# ---------------------------------------------------------------------------
# The three published chains as library calls
# ---------------------------------------------------------------------------

_TOY = dict(
    dedup_threshold=0.5,
    dedup_bands=32,
    dedup_verify_exact=True,
    min_tokens=2,
    c4_min_words=2,
    c4_min_sentences=1,
    gopher_word_count_min=2,
    gopher_min_stopwords=0,
)


def test_e2e_pipeline_survivors_and_manifest_agree(spark):
    docs = _docs(spark)
    res = e2e_pipeline(docs, PipelineConfig(**_TOY))
    surv = {r.doc_id for r in res.survivors.select("doc_id").collect()}
    man = res.manifest.collect()
    assert surv  # something survives
    assert {r.doc_id for r in man} == surv
    assert set(res.manifest.columns) == {
        "doc_id", "split", "shard", "n_tokens", "text_md5"
    }
    for r in man:
        assert r.split in ("train", "valid", "test")
        assert 0 <= r.shard < 16
        assert r.n_tokens >= 2


def test_ccnet_pipeline_gate_composes(spark):
    docs = _docs(spark)
    labeled = docs.withColumn(
        "label", (F.col("doc_id") % 7 != 0).cast("int")
    )
    cfg = PipelineConfig(
        **_TOY,
        classifier_dim=16,
        classifier_iterations=6,
        quality_tau=500_000,
        train_cap=40,
    )
    res = ccnet_pipeline(docs, labeled, cfg)
    ids = {r.doc_id for r in res.manifest.collect()}
    base = {r.doc_id for r in e2e_pipeline(docs, cfg).manifest.collect()}
    # the gate only removes documents relative to the ungated chain
    # (modulo min-id promotion inside a dedup component, which this
    # corpus has none of: every doc is unique post-clean)
    assert ids <= base


def test_fineweb_pipeline_runs_and_keeps_clean_docs(spark):
    # doc 1 must be long and diverse enough to clear the Gopher repetition
    # thresholds (a handful of words makes ANY top bigram a large char
    # fraction — the paper's bound legitimately kills tiny docs)
    good = (
        "The quick brown fox jumps over a lazy dog near the river bank. "
        "Seventeen sailors counted ninety strange lights above the harbor. "
        "Every morning the baker sells fresh bread to hungry travelers. "
        "Old maps describe forgotten roads winding through quiet valleys."
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text="short"),
        ]
    )
    res = fineweb_pipeline(docs, PipelineConfig(**_TOY))
    ids = {r.doc_id for r in res.manifest.collect()}
    assert 1 in ids
    assert 2 not in ids  # dies at the C4 min-words line rule


def test_ccnet_clean_respects_config_gates(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two three four five"),
            Row(doc_id=2, text="tiny"),
            Row(doc_id=3, text="blockme blockme blockme and then some text"),
        ]
    )
    cfg = PipelineConfig(
        min_tokens=3, blocklist_terms=("blockme",), blocklist_max_hits=2
    )
    ids = {r.doc_id for r in ccnet_clean(docs, cfg).collect()}
    assert ids == {1}  # 2 dies at min_tokens, 3 at the blocklist


def test_library_chain_keeps_materialization_boundary(spark):
    """The plan boundary the catalog entries pinned must survive the
    library indirection: past the checkpoint the final plan never
    re-derives the cleaning prefix, so the source parquet appears ZERO
    times in the manifest's plan (minhash fans out into five branches;
    unmaterialized, each re-scanned the corpus — the r7 lesson)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    res = e2e_pipeline(docs, PipelineConfig(**_TOY))
    plan = explain_str(res.manifest)
    scans = plan.count("documents.parquet")
    assert scans == 0, f"library chain re-scans the corpus: {scans}"
