"""Streaming count-min state (streaming/frequency.py): cross-batch merge
equals a one-shot batch build, replay is exactly-once via the
content-addressed ledger, and the crash-recovery rename dance restores a
consistent (sketch, ledger) pair."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from carto_etl_spark.operators.sketch import cms_build, cms_estimate
from carto_etl_spark.streaming.frequency import (
    load_frequency_sketch,
    track_frequencies,
)

SCHEMA = "id long, item string"


def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def _run(spark, src_dir, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    q = track_frequencies(
        stream, "item", state_dir=state, depth=4, width=1024,
        checkpoint=ckpt,
    )
    q.awaitTermination(120)


def _cells(df):
    return {(r["seed"], r["bucket"]): r["n"] for r in df.collect()}


def test_cross_batch_merge_equals_oneshot_build(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    b1 = [(1, "apple"), (2, "banana"), (3, "apple")]
    b2 = [(4, "apple"), (5, "cherry"), (6, "banana"), (7, "banana")]
    ckpt = str(tmp_path / "c1")  # same checkpoint: run 2 sees only b2
    _write_batch(spark, src, "b1", b1)
    _run(spark, src, state, ckpt)
    _write_batch(spark, src, "b2", b2)
    _run(spark, src, state, ckpt)

    streamed = load_frequency_sketch(spark, state)
    oneshot = cms_build(
        spark.createDataFrame(b1 + b2, SCHEMA), "item", 4, 1024
    )
    assert _cells(streamed) == _cells(oneshot)

    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_estimate(
            streamed,
            spark.createDataFrame(
                [("apple",), ("banana",), ("cherry",)], ["item"]
            ),
            "item", 4, 1024,
        ).collect()
    }
    assert est == {"apple": 3, "banana": 3, "cherry": 1}


def test_replay_is_exactly_once(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    _write_batch(spark, src, "b1", [(1, "x"), (2, "x"), (3, "y")])
    _run(spark, src, state, str(tmp_path / "c1"))
    before = _cells(load_frequency_sketch(spark, state))
    # redeliver the same data through a FRESH checkpoint (batch ids restart
    # at 0 — an id-keyed ledger would double-count; the content ledger must
    # not)
    _run(spark, src, state, str(tmp_path / "c2"))
    after = _cells(load_frequency_sketch(spark, state))
    assert before == after


def test_crash_between_promote_renames_recovers(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    _write_batch(spark, src, "b1", [(1, "x"), (2, "y")])
    _run(spark, src, state, str(tmp_path / "c1"))
    good = _cells(load_frequency_sketch(spark, state))
    # simulate the crash window: current moved aside, replacement not yet in
    cur = os.path.join(state, "current")
    os.rename(cur, cur + ".old")
    assert _cells(load_frequency_sketch(spark, state)) == good  # recovered
    assert os.path.exists(cur)
