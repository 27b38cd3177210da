"""Streaming HLL cardinality state (streaming/cardinality.py): cross-batch
register merge equals a one-shot batch build, replay is a no-op WITHOUT a
ledger (register-max is idempotent), and the crash-recovery rename dance
restores the state."""

from __future__ import annotations

import os

from carto_etl_spark.operators.sketch import hll_build
from carto_etl_spark.streaming.cardinality import (
    estimate_cardinality,
    load_cardinality_registers,
    track_cardinality,
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
    q = track_cardinality(stream, "item", state_dir=state, p=10,
                          checkpoint=ckpt)
    q.awaitTermination(120)


def _regs(df):
    return {(r["bucket"], r["max_rho"]) for r in df.collect()}


def test_cross_batch_merge_equals_one_shot_build(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    b1 = [(i, f"item-{i}") for i in range(0, 800)]
    b2 = [(i, f"item-{i}") for i in range(500, 1500)]  # overlap 500-799

    _write_batch(spark, src, "b1", b1)
    _run(spark, src, state, str(tmp_path / "ck1"))
    _write_batch(spark, src, "b2", b2)
    _run(spark, src, state, str(tmp_path / "ck1"))

    streamed = _regs(load_cardinality_registers(spark, state))
    oneshot = _regs(
        hll_build(
            spark.createDataFrame(b1 + b2, SCHEMA), "item", p=10
        )
    )
    assert streamed == oneshot

    [row] = estimate_cardinality(spark, state, p=10).collect()
    # 1500 true distinct; ~3.3% standard error at p=10, allow 4 sigma
    assert abs(row["estimate"] - 1500) / 1500 < 0.13


def test_replay_is_idempotent_without_ledger(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _write_batch(spark, src, "b1", [(i, f"x{i}") for i in range(300)])
    _run(spark, src, state, str(tmp_path / "ck1"))
    before = _regs(load_cardinality_registers(spark, state))
    # redeliver the same source through a FRESH checkpoint: max-merge of
    # identical rhos changes nothing
    _run(spark, src, state, str(tmp_path / "ck2"))
    assert _regs(load_cardinality_registers(spark, state)) == before


def test_crash_window_recovery(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _write_batch(spark, src, "b1", [(i, f"x{i}") for i in range(100)])
    _run(spark, src, state, str(tmp_path / "ck1"))
    before = _regs(load_cardinality_registers(spark, state))
    cur = os.path.join(state, "current")
    os.rename(cur, cur + ".old")  # simulate crash between the two renames
    assert _regs(load_cardinality_registers(spark, state)) == before
    assert os.path.exists(cur)
