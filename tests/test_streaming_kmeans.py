"""Incremental mini-batch k-means state (streaming/kmeansstate.py):
deterministic lifecycle (the catalog oracle replays it bit-for-bit —
streaming_kmeans in the differential harness), exactly-once replay via the
content-addressed ledger, crash-recovery of the snapshot rename dance,
centroid convergence on a separable stream, and the real writeStream
drive."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.streaming.kmeansstate import (
    apply_kmeans_batch,
    assign_from_state,
    load_kmeans_state,
    track_clusters,
)

SCHEMA = "vec_id long, embedding array<double>"
DIM = 8


def _jit(vid, i):
    h = hashlib.md5(f"{vid}:{i}".encode()).hexdigest()
    return (int(h[:8], 16) / 2**32 - 0.5) * 0.8


def _rows(lo, hi, k=4):
    out = []
    for vid in range(lo, hi):
        c = vid % k
        center = [5.0 if i == c else 0.0 for i in range(DIM)]
        out.append(
            (vid, [center[i] + _jit(vid, i) for i in range(DIM)])
        )
    return out


def test_batches_fold_and_counts_track(spark, tmp_path):
    state = str(tmp_path / "st")
    # batch 1 is a curated seed batch (one row per planted cluster — the
    # warm-start pattern; md5 one-shot seeding from a BIG first batch can
    # put two seeds in one planted cluster, which online running means
    # cannot escape: that is inherent to mini-batch k-means, not a bug)
    df1 = spark.createDataFrame(_rows(0, 4), SCHEMA)
    df2 = spark.createDataFrame(_rows(4, 60), SCHEMA)
    df3 = spark.createDataFrame(_rows(60, 140), SCHEMA)
    assert apply_kmeans_batch(df1, state, k=4)
    cents1, counts1 = load_kmeans_state(spark, state)
    assert sum(counts1) == 4 and len(cents1) == 4
    assert apply_kmeans_batch(df2, state, k=4)
    assert apply_kmeans_batch(df3, state, k=4)
    cents2, counts2 = load_kmeans_state(spark, state)
    assert sum(counts2) == 140
    # separable stream: the final assignment recovers the planted labels
    both = spark.createDataFrame(_rows(0, 140), SCHEMA)
    got = assign_from_state(spark, both, state).collect()
    mapping: dict = {}
    for r in got:
        by = mapping.setdefault(r["vec_id"] % 4, {})
        by[r["cluster"]] = by.get(r["cluster"], 0) + 1
    agree = sum(max(by.values()) for by in mapping.values())
    assert agree / len(got) > 0.97, mapping


def test_replayed_batch_is_a_noop(spark, tmp_path):
    state = str(tmp_path / "st")
    df = spark.createDataFrame(_rows(0, 40), SCHEMA)
    assert apply_kmeans_batch(df, state, k=4)
    cents, counts = load_kmeans_state(spark, state)
    assert apply_kmeans_batch(df, state, k=4) is False  # ledger hit
    assert (cents, counts) == load_kmeans_state(spark, state)
    # an empty batch is also a no-op
    assert apply_kmeans_batch(df.limit(0), state, k=4) is False


def test_crash_between_renames_recovers(spark, tmp_path):
    state = str(tmp_path / "st")
    df1 = spark.createDataFrame(_rows(0, 40), SCHEMA)
    df2 = spark.createDataFrame(_rows(40, 90), SCHEMA)
    apply_kmeans_batch(df1, state, k=4)
    before = load_kmeans_state(spark, state)
    # simulate the crash window: current -> current.old happened, the tmp
    # promotion did not
    os.rename(
        os.path.join(state, "current"), os.path.join(state, "current.old")
    )
    assert load_kmeans_state(spark, state) == before  # recover() heals
    apply_kmeans_batch(df2, state, k=4)
    _, counts = load_kmeans_state(spark, state)
    assert sum(counts) == 90


def test_k_exceeding_first_batch_raises(spark, tmp_path):
    state = str(tmp_path / "st")
    df = spark.createDataFrame(_rows(0, 3), SCHEMA)
    with pytest.raises(ValueError, match="exceeds the first batch"):
        apply_kmeans_batch(df, state, k=9)


def test_writestream_drive_matches_direct_batches(spark, tmp_path):
    """The real foreachBatch drive over two file-batches must land the
    same state as calling apply_kmeans_batch directly in order."""
    src = str(tmp_path / "src")
    b1, b2 = _rows(0, 50), _rows(50, 120)
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b2"))
    streamed = str(tmp_path / "streamed")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = track_clusters(
        stream, streamed, k=4, checkpoint=str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    direct = str(tmp_path / "direct")
    # file-batch order == lexicographic path order here (b1 then b2)
    apply_kmeans_batch(spark.createDataFrame(b1, SCHEMA), direct, k=4)
    apply_kmeans_batch(spark.createDataFrame(b2, SCHEMA), direct, k=4)
    assert load_kmeans_state(spark, streamed) == load_kmeans_state(
        spark, direct
    )
