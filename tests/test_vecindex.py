"""Incremental embedding near-dup index (streaming/vecindex.py):
cross-batch cosine dedup, replay idempotency, exact verification values,
compaction transparency, and crash recovery — the lshindex.py contract on
the vector side."""

from __future__ import annotations

import math
import os

from carto_etl_spark.operators.jobs import TargetTable
from carto_etl_spark.streaming.vecindex import (
    _read_index,
    append_to_vec_index,
    compact_vec_index,
    have_vec_index,
    insert_stream_vec_near_dedup,
    match_against_vec_index,
    vec_band_buckets,
)

SCHEMA = "vec_id long, embedding array<double>"
DIM = 8


def _vec(seed: int) -> list[float]:
    # deterministic, well-spread unit-ish vectors
    return [math.sin(seed * 37 + i * 13) for i in range(DIM)]


def _near(v: list[float]) -> list[float]:
    return [v[0] + 1e-4] + v[1:]


def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def _run(spark, src_dir, target, state, checkpoint):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    q = insert_stream_vec_near_dedup(
        stream, target, state, dim=DIM, threshold=0.99,
        n_planes=6, n_bands=4, checkpoint=checkpoint,
    )
    q.awaitTermination(120)


def test_cross_batch_vec_dedup_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    tgt_dir = str(tmp_path / "target")
    target = TargetTable(spark, tgt_dir)

    _write_batch(spark, src, "b1", [(1, _vec(1)), (2, _vec(2))])
    _run(spark, src, target, state, str(tmp_path / "ck1"))
    assert {r.vec_id for r in spark.read.parquet(tgt_dir).collect()} == {1, 2}

    # batch 2: a near-identical copy of vec 1 (dropped), a novel vector
    _write_batch(spark, src, "b2", [(3, _near(_vec(1))), (4, _vec(9))])
    _run(spark, src, target, state, str(tmp_path / "ck2"))
    assert {r.vec_id for r in spark.read.parquet(tgt_dir).collect()} == {1, 2, 4}

    # redelivery through a fresh checkpoint: every vector now matches its
    # own history row at cosine 1.0 -> zero new target rows, zero new state
    n_state = _read_index(spark, state).count()
    _run(spark, src, target, state, str(tmp_path / "ck3"))
    assert {r.vec_id for r in spark.read.parquet(tgt_dir).collect()} == {1, 2, 4}
    assert _read_index(spark, state).count() == n_state


def test_match_reports_exact_cosine_and_compaction_is_transparent(
    spark, tmp_path
):
    state = str(tmp_path / "state")
    hist = spark.createDataFrame([(1, _vec(1)), (2, _vec(2))], SCHEMA)
    append_to_vec_index(hist, state, dim=DIM, n_planes=6, n_bands=4)

    batch = spark.createDataFrame([(10, _near(_vec(1)))], SCHEMA)

    def match():
        return {
            (r.id_a, r.id_b): r.cosine
            for r in match_against_vec_index(
                spark, batch, hist, state, dim=DIM, threshold=0.99,
                n_planes=6, n_bands=4,
            ).collect()
        }

    before = match()
    assert set(before) == {(10, 1)}
    assert 0.99 < before[(10, 1)] <= 1.0 + 1e-12

    n = compact_vec_index(spark, state, target_files=2)
    assert n == _read_index(spark, state).count()
    assert match() == before


def test_vec_append_is_idempotent_per_id(spark, tmp_path):
    state = str(tmp_path / "state")
    df = spark.createDataFrame([(1, _vec(1))], SCHEMA)
    append_to_vec_index(df, state, dim=DIM, n_planes=6, n_bands=4)
    n1 = _read_index(spark, state).count()
    assert n1 == 4  # one row per band
    append_to_vec_index(df, state, dim=DIM, n_planes=6, n_bands=4)
    assert _read_index(spark, state).count() == n1


def test_vec_buckets_fold_and_arrow_paths_agree(spark):
    # fold vs Arrow matmul: equal except plane dots within an ulp of 0.0 —
    # none exist among these fixed deterministic vectors, so exact equality
    # is a stable assertion (and the cross-path consistency the docstring
    # contract promises in practice)
    df = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20)], SCHEMA
    )
    kw = dict(dim=DIM, n_planes=6, n_bands=4)
    a = {(r.band, r.vec_id): r.bucket for r in vec_band_buckets(
        df, signature="fold", **kw).collect()}
    b = {(r.band, r.vec_id): r.bucket for r in vec_band_buckets(
        df, signature="arrow", **kw).collect()}
    assert a == b


def test_vec_recover_restores_state_after_compaction_crash(spark, tmp_path):
    state = str(tmp_path / "state")
    hist = spark.createDataFrame([(1, _vec(1)), (2, _vec(2))], SCHEMA)
    append_to_vec_index(hist, state, dim=DIM, n_planes=6, n_bands=4)
    buckets = os.path.join(state, "buckets")
    os.rename(buckets, buckets + ".old")
    assert not os.path.exists(buckets)
    assert have_vec_index(state)  # entry points self-heal
    assert _read_index(spark, state).count() == 8
