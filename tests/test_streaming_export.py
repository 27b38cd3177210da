"""Streaming JSONL export (streaming/export.py): cross-batch completeness
(multi-batch union equals one batch export), replay idempotency under a
fresh checkpoint, crash-partial invisibility + overwrite recovery, and
empty-batch handling."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.export import assign_shards
from carto_etl_spark.streaming.export import (
    complete_batch_dirs,
    read_stream_export,
    stream_export_jsonl,
)

SCHEMA = "doc_id long, text string, n long"


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"text {i}", i * 2) for i in range(lo, hi)], SCHEMA
    )


def _run_stream(spark, src, out, ckpt, max_files=1):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src)
    )
    q = stream_export_jsonl(
        stream, out, n_shards=4, key_col="doc_id", checkpoint=ckpt
    )
    q.awaitTermination(120)


def test_multi_batch_union_equals_batch_export(spark):
    work = tempfile.mkdtemp(prefix="sexp-")
    try:
        for i, (lo, hi) in enumerate([(0, 40), (40, 80), (80, 120)]):
            _docs(spark, lo, hi).coalesce(1).write.parquet(
                f"{work}/src/b{i}"
            )
        spark.conf.set("spark.sql.streaming.schemaInference", "false")
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(f"{work}/src")
        )
        q = stream_export_jsonl(
            stream, f"{work}/out", 4, "doc_id", checkpoint=f"{work}/ckpt"
        )
        q.awaitTermination(120)
        assert len(complete_batch_dirs(f"{work}/out")) == 3
        back = read_stream_export(spark, f"{work}/out", SCHEMA)
        all_docs = _docs(spark, 0, 120)
        assert sorted(map(tuple, back.drop("shard").collect())) == sorted(
            map(tuple, all_docs.collect())
        )
        # streamed shard ids equal the batch operator's assignment
        want = {
            r["doc_id"]: r["shard"]
            for r in assign_shards(all_docs, 4, "doc_id").collect()
        }
        for r in back.select("doc_id", "shard").collect():
            assert r["shard"] == want[r["doc_id"]]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_replay_with_fresh_checkpoint_is_idempotent(spark):
    work = tempfile.mkdtemp(prefix="sexp-")
    try:
        _docs(spark, 0, 50).coalesce(1).write.parquet(f"{work}/src")
        _run_stream(spark, f"{work}/src", f"{work}/out", f"{work}/ckpt1")
        first = sorted(
            map(
                tuple,
                read_stream_export(spark, f"{work}/out", SCHEMA).collect(),
            )
        )
        # fresh checkpoint => the source replays everything; content
        # addressing must dedupe it
        _run_stream(spark, f"{work}/src", f"{work}/out", f"{work}/ckpt2")
        second = sorted(
            map(
                tuple,
                read_stream_export(spark, f"{work}/out", SCHEMA).collect(),
            )
        )
        assert first == second
        assert len(complete_batch_dirs(f"{work}/out")) == 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_crash_partial_is_invisible_and_recovered(spark):
    work = tempfile.mkdtemp(prefix="sexp-")
    try:
        _docs(spark, 0, 30).coalesce(1).write.parquet(f"{work}/src")
        _run_stream(spark, f"{work}/src", f"{work}/out", f"{work}/ckpt1")
        (real,) = complete_batch_dirs(f"{work}/out")
        # simulate a crash mid-write: same batch dir, no _SUCCESS, torn file
        os.remove(os.path.join(real, "_SUCCESS"))
        with open(os.path.join(real, "torn.txt"), "w") as f:
            f.write("{not json")
        assert complete_batch_dirs(f"{work}/out") == []
        with pytest.raises(ValueError, match="no complete"):
            read_stream_export(spark, f"{work}/out", SCHEMA)
        # replay rewrites the batch dir from scratch (overwrite clears it)
        _run_stream(spark, f"{work}/src", f"{work}/out", f"{work}/ckpt2")
        assert len(complete_batch_dirs(f"{work}/out")) == 1
        assert not glob.glob(os.path.join(real, "torn.txt"))
        back = read_stream_export(spark, f"{work}/out", SCHEMA)
        assert back.count() == 30
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_round_trip_preserves_values(spark):
    work = tempfile.mkdtemp(prefix="sexp-")
    try:
        df = spark.createDataFrame(
            [(1, 'quotes " and\nnewline', 5), (2, None, 6)], SCHEMA
        )
        df.coalesce(1).write.parquet(f"{work}/src")
        _run_stream(spark, f"{work}/src", f"{work}/out", f"{work}/ckpt")
        back = read_stream_export(spark, f"{work}/out", SCHEMA)
        got = sorted(map(tuple, back.drop("shard").collect()))
        assert got == sorted(map(tuple, df.collect()))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_reserved_shard_column_fails_fast(spark):
    work = tempfile.mkdtemp(prefix="sexp-")
    try:
        spark.createDataFrame(
            [(1, 0)], "doc_id long, shard int"
        ).write.parquet(f"{work}/src")
        stream = spark.readStream.schema("doc_id long, shard int").parquet(
            f"{work}/src"
        )
        with pytest.raises(ValueError, match="shard"):
            stream_export_jsonl(
                stream, f"{work}/out", 4, "doc_id", checkpoint=f"{work}/ckpt"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_same_keys_different_values_both_land(spark):
    """The batch fingerprint covers payload columns, not just the key
    multiset: two batches with identical keys but different values must BOTH
    export (the r5 key-only fingerprint silently dropped the second)."""
    src = tempfile.mkdtemp(prefix="sx_src_")
    out = tempfile.mkdtemp(prefix="sx_out_")
    ckpt = tempfile.mkdtemp(prefix="sx_ck_")
    try:
        # batch 1 and batch 2: same doc_ids, different text/n payloads
        spark.createDataFrame(
            [(i, "first", 1) for i in range(5)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        _run_stream(spark, src, out, ckpt)
        spark.createDataFrame(
            [(i, "second", 2) for i in range(5)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        _run_stream(spark, src, out, ckpt)
        got = read_stream_export(spark, out, SCHEMA).collect()
        texts = sorted(r["text"] for r in got)
        assert len(got) == 10
        assert texts == ["first"] * 5 + ["second"] * 5
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_legacy_key_only_fingerprint_dir_is_honored(spark, caplog):
    """A batch exported under the pre-r6 key-only fingerprint must NOT be
    re-exported when a post-upgrade replay recomputes the payload-folding
    fingerprint: the sink probes the legacy directory name too — and logs
    the suppression loudly (it is indistinguishable, by construction, from
    a new batch with a colliding key multiset)."""
    import logging

    from carto_etl_spark.streaming.export import (
        _FP_MARKER,
        _batch_fingerprints,
    )

    src = tempfile.mkdtemp(prefix="sl_src_")
    out = tempfile.mkdtemp(prefix="sl_out_")
    ck1 = tempfile.mkdtemp(prefix="sl_ck1_")
    ck2 = tempfile.mkdtemp(prefix="sl_ck2_")
    try:
        batch = _docs(spark, 0, 5)
        batch.coalesce(1).write.mode("append").parquet(src)
        _run_stream(spark, src, out, ck1)
        current, legacy = _batch_fingerprints(batch, "doc_id")
        # simulate a pre-upgrade export: the SAME shard payload sits under
        # the legacy key-only fingerprint name, with NO version marker
        # (pre-upgrade sinks didn't write one)
        os.rename(
            os.path.join(out, "batches", current),
            os.path.join(out, "batches", legacy),
        )
        os.remove(os.path.join(out, "batches", legacy, _FP_MARKER))
        # post-upgrade replay from a fresh checkpoint re-sees the batch and
        # computes the CURRENT fingerprint — the legacy probe must skip it
        with caplog.at_level(
            logging.WARNING, logger="carto_etl_spark.streaming.export"
        ):
            _run_stream(spark, src, out, ck2)
        got = read_stream_export(spark, out, SCHEMA).collect()
        assert len(got) == 5  # no duplication
        assert complete_batch_dirs(out) == [os.path.join(out, "batches", legacy)]
        assert any(
            "LEGACY" in r.message for r in caplog.records
        ), "legacy suppression must be observable in the log"
    finally:
        for d in (src, out, ck1, ck2):
            shutil.rmtree(d, ignore_errors=True)


def test_legacy_probe_gated_off_without_pre_upgrade_dirs(spark):
    """The legacy key-only probe must be INERT on a target containing only
    marker-stamped (post-upgrade) batch directories: a directory that
    happens to occupy a batch's legacy fingerprint name but carries the
    version marker must not suppress that batch — otherwise a genuinely
    new batch whose key multiset collides with an old one (different
    payload) would silently vanish, the r5 data-loss mode."""
    from carto_etl_spark.streaming.export import _batch_fingerprints

    src1 = tempfile.mkdtemp(prefix="sg_src1_")
    src2 = tempfile.mkdtemp(prefix="sg_src2_")
    out = tempfile.mkdtemp(prefix="sg_out_")
    ck1 = tempfile.mkdtemp(prefix="sg_ck1_")
    ck2 = tempfile.mkdtemp(prefix="sg_ck2_")
    try:
        # batch 1: keys 0..4 payload "text i"; exported post-upgrade
        _docs(spark, 0, 5).coalesce(1).write.mode("append").parquet(src1)
        _run_stream(spark, src1, out, ck1)
        # batch 2: SAME key multiset, different payload
        batch2 = spark.createDataFrame(
            [(i, "other", 9) for i in range(5)], SCHEMA
        )
        current1, _ = _batch_fingerprints(_docs(spark, 0, 5), "doc_id")
        _, legacy2 = _batch_fingerprints(batch2, "doc_id")
        # place batch 1's (marker-stamped) export at batch 2's legacy name
        os.rename(
            os.path.join(out, "batches", current1),
            os.path.join(out, "batches", legacy2),
        )
        batch2.coalesce(1).write.mode("append").parquet(src2)
        _run_stream(spark, src2, out, ck2)
        got = read_stream_export(spark, out, SCHEMA).collect()
        texts = sorted(r["text"] for r in got)
        assert len(got) == 10, "colliding-key batch must land, not vanish"
        assert texts == ["other"] * 5 + [f"text {i}" for i in range(5)]
    finally:
        for d in (src1, src2, out, ck1, ck2):
            shutil.rmtree(d, ignore_errors=True)
