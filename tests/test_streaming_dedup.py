"""Streaming ingest dedup (streaming/dedup.py): cross-batch key dedup with
persisted bloom + key-table state, per-key idempotency under replay, and
incremental bitmap maintenance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from carto_etl_spark.operators.jobs import TargetTable
from carto_etl_spark.streaming.dedup import insert_stream_deduped

SCHEMA = "doc_id long, key string, text string"


def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def _run(spark, src_dir, target, state, checkpoint):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    q = insert_stream_deduped(
        stream, target, key="key", state_dir=state,
        num_bits=1 << 14, checkpoint=checkpoint,
    )
    q.awaitTermination(120)


def test_cross_batch_dedup_and_replay_idempotency(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    tgt_dir = str(tmp_path / "target")
    target = TargetTable(spark, tgt_dir)

    _write_batch(spark, src, "b1", [
        (1, "ka", "alpha"), (2, "kb", "beta"), (3, "ka", "alpha-dup-in-batch"),
    ])
    _run(spark, src, target, state, ckpt)
    out1 = spark.read.parquet(tgt_dir)
    assert out1.count() == 2  # within-batch dup collapsed
    assert {r.key for r in out1.collect()} == {"ka", "kb"}

    # batch 2 overlaps batch 1 ('kb') and itself; only 'kc' is new
    _write_batch(spark, src, "b2", [
        (4, "kb", "beta again"), (5, "kc", "gamma"), (6, "kc", "gamma dup"),
    ])
    _run(spark, src, target, state, ckpt)
    out2 = spark.read.parquet(tgt_dir)
    assert sorted(r.key for r in out2.collect()) == ["ka", "kb", "kc"]

    # replay the SAME data through a fresh checkpoint (simulated redelivery):
    # per-key idempotency means zero new rows
    _run(spark, src, target, state, str(tmp_path / "ckpt2"))
    out3 = spark.read.parquet(tgt_dir)
    assert sorted(r.key for r in out3.collect()) == ["ka", "kb", "kc"]

    # state reflects exactly the ingested keys
    keys = spark.read.parquet(os.path.join(state, "keys"))
    assert sorted(r.key for r in keys.collect()) == ["ka", "kb", "kc"]


def test_bloom_state_actually_prefilters(spark, tmp_path):
    from carto_etl_spark.operators.bloom import (
        _BLOOM_COL,
        load_bloom,
        might_contain,
        numeric_key_expr,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    target = TargetTable(spark, str(tmp_path / "target"))
    _write_batch(spark, src, "b1",
                 [(i, f"key-{i}", f"text {i}") for i in range(200)])
    _run(spark, src, target, state, str(tmp_path / "ckpt"))

    bloom = load_bloom(spark, os.path.join(state, "bloom"))
    probe = spark.createDataFrame(
        [(i, f"key-{i}", "x") for i in range(150, 350)], SCHEMA
    )
    tagged = probe.join(F.broadcast(bloom), how="cross")
    hits = tagged.where(
        might_contain(numeric_key_expr(probe, "key"), F.col(_BLOOM_COL), 1 << 14)
    ).count()
    # all 50 known keys hit; the 150 novel keys mostly miss
    assert hits >= 50
    assert hits < 50 + 0.1 * 150


def test_compact_keys_state_preserves_keys(spark, tmp_path):
    from carto_etl_spark.streaming.dedup import compact_keys_state

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    target = TargetTable(spark, str(tmp_path / "target"))
    _write_batch(spark, src, "b1", [(1, "ka", "a"), (2, "kb", "b")])
    _run(spark, src, target, state, str(tmp_path / "c1"))
    _write_batch(spark, src, "b2", [(3, "kc", "c")])
    _run(spark, src, target, state, str(tmp_path / "c2"))

    n = compact_keys_state(spark, state, target_files=1)
    assert n == 3
    keys = spark.read.parquet(os.path.join(state, "keys"))
    assert sorted(r.key for r in keys.collect()) == ["ka", "kb", "kc"]
    # dedup still works against the compacted state
    _write_batch(spark, src, "b3", [(4, "ka", "dup"), (5, "kd", "new")])
    _run(spark, src, target, state, str(tmp_path / "c3"))
    out = spark.read.parquet(str(tmp_path / "target"))
    assert sorted(r.key for r in out.collect()) == ["ka", "kb", "kc", "kd"]
