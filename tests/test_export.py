"""Sharded JSONL export (operators/export.py): deterministic assignment,
real files on disk (one per non-empty shard, valid JSONL), exact round-trip
through write + read_jsonl, manifest agreement, and the sized-shard
helper's arithmetic."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.export import (
    assign_shards,
    export_jsonl,
    manifest_df,
    read_jsonl,
    shards_for_bytes,
    write_manifest,
)

SCHEMA = "doc_id long, text string, n long"


def _docs(spark, n=200):
    rows = [
        (i, f'line-{i}\nwith "quotes" and tab\there' if i % 7 == 0 else f"doc {i}", i * 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_assignment_deterministic_and_balanced(spark):
    df = _docs(spark)
    a = assign_shards(df, 8, "doc_id").select("doc_id", "shard").collect()
    b = assign_shards(df, 8, "doc_id").select("doc_id", "shard").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = [0] * 8
    for r in a:
        assert 0 <= r["shard"] < 8
        per[r["shard"]] += 1
    # md5 uniformity: no shard empty, none holds more than half the rows
    assert min(per) > 0 and max(per) < 100


def test_round_trip_and_files(spark):
    df = _docs(spark)
    work = tempfile.mkdtemp(prefix="exp-test-")
    try:
        path = os.path.join(work, "out")
        export_jsonl(df, path, n_shards=4, key_col="doc_id")
        dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
        assert len(dirs) == 4
        for d in dirs:
            parts = [
                p
                for p in glob.glob(os.path.join(d, "part-*"))
                if not p.endswith(".crc")
            ]
            assert len(parts) == 1  # one file per shard
            with open(parts[0]) as f:
                for line in f:
                    json.loads(line)  # every line is standalone JSON
        back = read_jsonl(spark, path, SCHEMA)
        orig = sorted(map(tuple, df.collect()))
        got = sorted(map(tuple, back.drop("shard").collect()))
        assert got == orig
        # read-back shard column equals the assignment function
        want = {
            r["doc_id"]: r["shard"]
            for r in assign_shards(df, 4, "doc_id").collect()
        }
        for r in back.select("doc_id", "shard").collect():
            assert r["shard"] == want[r["doc_id"]]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_manifest_matches_files(spark):
    df = _docs(spark, 60)
    work = tempfile.mkdtemp(prefix="exp-test-")
    try:
        path = os.path.join(work, "out")
        export_jsonl(df, path, n_shards=4, key_col="doc_id")
        write_manifest(df, path, n_shards=4, key_col="doc_id")
        with open(os.path.join(path, "manifest.json")) as f:
            man = json.load(f)
        assert man["n_shards"] == 4 and man["key_col"] == "doc_id"
        back = assign_shards(
            read_jsonl(spark, path, SCHEMA).drop("shard"), 4, "doc_id"
        )
        got = {
            r["shard"]: (r["n_rows"], r["key_checksum"])
            for r in manifest_df(back, "doc_id").collect()
        }
        assert got == {
            s["shard"]: (s["n_rows"], s["key_checksum"])
            for s in man["shards"]
        }
        assert sum(n for n, _ in got.values()) == 60
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_shards_for_bytes(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 50)], "id int, nbytes int"
    )
    assert shards_for_bytes(df, 100, "nbytes") == 3
    assert shards_for_bytes(df, 250, "nbytes") == 1
    assert shards_for_bytes(df, 1, "nbytes") == 250
    empty = spark.createDataFrame([], "id int, nbytes int")
    assert shards_for_bytes(empty, 100, "nbytes") == 1


def test_rejects_bad_shard_count(spark):
    with pytest.raises(ValueError):
        assign_shards(_docs(spark, 5), 0, "doc_id")


def test_shard_column_collision_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, shard int")
    with pytest.raises(ValueError, match="shard"):
        assign_shards(df, 4, "doc_id")


def test_bad_target_bytes_rejected(spark):
    df = spark.createDataFrame([(1, 10)], "id int, nbytes int")
    with pytest.raises(ValueError, match="target_bytes"):
        shards_for_bytes(df, 0, "nbytes")
