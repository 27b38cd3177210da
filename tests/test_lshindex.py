"""Incremental LSH near-dup index (streaming/lshindex.py): cross-batch
similarity dedup, replay idempotency, compaction equivalence."""

from __future__ import annotations

import os

from carto_etl_spark.operators.dedup import with_minhash
from carto_etl_spark.operators.jobs import TargetTable
from carto_etl_spark.streaming.lshindex import (
    _read_index,
    append_to_index,
    compact_index,
    insert_stream_near_dedup,
    match_against_index,
)

SCHEMA = "doc_id long, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill every single morning"
)
OTHER = (
    "completely different words about databases shuffles partitions "
    "executors catalyst tungsten codegen arrow pandas parquet manifests"
)


def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def _run(spark, src_dir, target, state, checkpoint):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    q = insert_stream_near_dedup(
        stream, target, "doc_id", "text", state,
        threshold=0.5, bands=32, checkpoint=checkpoint,
    )
    q.awaitTermination(120)


def test_cross_batch_near_dedup_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    tgt_dir = str(tmp_path / "target")
    target = TargetTable(spark, tgt_dir)

    _write_batch(spark, src, "b1", [(1, BASE), (2, OTHER)])
    _run(spark, src, target, state, str(tmp_path / "ck1"))
    assert {r.doc_id for r in spark.read.parquet(tgt_dir).collect()} == {1, 2}

    # batch 2: a near-copy of doc 1 (dropped), a novel doc (kept)
    _write_batch(spark, src, "b2", [
        (3, BASE + " extra token"),
        (4, "unrelated fresh vocabulary zebra quartz lantern velvet "
            "meadow copper anchor thistle bramble harvest"),
    ])
    _run(spark, src, target, state, str(tmp_path / "ck2"))
    assert {r.doc_id for r in spark.read.parquet(tgt_dir).collect()} == {1, 2, 4}

    # redelivery of everything through a fresh checkpoint: every doc now
    # exact-matches its own history row -> zero new rows, zero new state
    n_state = _read_index(spark, state).count()
    _run(spark, src, target, state, str(tmp_path / "ck3"))
    assert {r.doc_id for r in spark.read.parquet(tgt_dir).collect()} == {1, 2, 4}
    assert _read_index(spark, state).count() == n_state


def test_match_reports_exact_jaccard_and_compaction_is_transparent(
    spark, tmp_path
):
    state = str(tmp_path / "state")
    hist = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    append_to_index(
        with_minhash(hist, "text", num_hashes=64), state, "doc_id", bands=32
    )
    batch = spark.createDataFrame([(10, BASE + " extra token")], SCHEMA)

    def match():
        return {
            (r.id_a, r.id_b): r.jaccard
            for r in match_against_index(
                spark, batch, hist, state, "doc_id", "text",
                threshold=0.5, bands=32,
            ).collect()
        }

    before = match()
    assert set(before) == {(10, 1)}
    # exact verification: integer set arithmetic, well above threshold
    assert 0.5 < before[(10, 1)] <= 1.0

    n = compact_index(spark, state, target_files=2)
    assert n == _read_index(spark, state).count()
    assert match() == before


def test_append_is_idempotent_per_id(spark, tmp_path):
    state = str(tmp_path / "state")
    signed = with_minhash(
        spark.createDataFrame([(1, BASE)], SCHEMA), "text", num_hashes=64
    )
    append_to_index(signed, state, "doc_id", bands=32)
    n1 = _read_index(spark, state).count()
    assert n1 == 32  # one row per band
    append_to_index(signed, state, "doc_id", bands=32)
    assert _read_index(spark, state).count() == n1


def test_recover_restores_state_after_compaction_crash(spark, tmp_path):
    from carto_etl_spark.streaming.lshindex import have_index

    state = str(tmp_path / "state")
    hist = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    append_to_index(
        with_minhash(hist, "text", num_hashes=64), state, "doc_id", bands=32
    )
    n = _read_index(spark, state).count()
    # simulate the compaction crash window: buckets moved aside, the
    # replacement not yet moved in
    buckets = os.path.join(state, "buckets")
    os.rename(buckets, buckets + ".old")
    assert not os.path.exists(buckets)
    # every entry point self-heals: the index is back, nothing lost
    assert have_index(state)
    assert os.path.exists(buckets)
    assert _read_index(spark, state).count() == n
    batch = spark.createDataFrame([(10, BASE + " extra token")], SCHEMA)
    got = {
        (r.id_a, r.id_b)
        for r in match_against_index(
            spark, batch, hist, state, "doc_id", "text",
            threshold=0.5, bands=32,
        ).collect()
    }
    assert got == {(10, 1)}


def test_append_commits_atomically_and_sweeps_stale_staging(spark, tmp_path):
    from carto_etl_spark.streaming.lshindex import have_index

    state = str(tmp_path / "state")
    os.makedirs(state)
    # leftover staging dir from a crashed append: outside the read path,
    # swept on the next entry
    stale = os.path.join(state, "staging-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "part-00000.parquet"), "wb").write(b"junk")
    signed = with_minhash(
        spark.createDataFrame([(1, BASE)], SCHEMA), "text", num_hashes=64
    )
    append_to_index(signed, state, "doc_id", bands=32)
    assert not os.path.exists(stale)
    # committed state is exactly one batch subdir; no staging anywhere
    entries = os.listdir(os.path.join(state, "buckets"))
    assert all(e.startswith("batch-") for e in entries) and len(entries) == 1
    assert _read_index(spark, state).count() == 32
    # a fully-deduplicated batch commits nothing (no empty batch dirs)
    append_to_index(signed, state, "doc_id", bands=32)
    assert len(os.listdir(os.path.join(state, "buckets"))) == 1
    assert have_index(state)
