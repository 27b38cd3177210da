"""Streaming quantile state (streaming/quantile.py): the final
(level, sample) state is order-independent — any batch split equals the
one-shot batch computation — replay is exactly-once for n_total via the
content-addressed ledger, adaptive leveling keeps the sample under cap,
and the crash-recovery rename dance restores a consistent state."""

from __future__ import annotations

import math
import os

from carto_etl_spark.operators.sampling import LEHMER_A, LEHMER_M
from carto_etl_spark.streaming.state import SnapshotState
from carto_etl_spark.streaming.quantile import (
    level_cutoff,
    load_quantile_state,
    state_quantiles,
    track_quantiles,
)

SCHEMA = "v double, k long"


def _py_hash(k: int, salt: int = 0) -> int:
    x = (k + salt) % LEHMER_M
    x = (x * LEHMER_A) % LEHMER_M
    x ^= x >> 16
    x = (x * LEHMER_A) % LEHMER_M
    x ^= x >> 13
    return (x * LEHMER_A) % LEHMER_M


def _rows(lo, hi):
    return [(((k * 37) % 1000) + 0.25, k) for k in range(lo, hi)]


def _reference_state(rows, cap):
    """Pure-python re-derivation: min level whose filtered set fits cap."""
    for level in range(41):
        kept = [(v, k) for v, k in rows if _py_hash(k) < level_cutoff(level)]
        if len(kept) <= cap:
            return level, sorted(kept)
    raise AssertionError("no level fits")


def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def _run(spark, src_dir, state, ckpt, cap):
    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    q = track_quantiles(
        stream, "v", "k", state_dir=state, cap=cap, checkpoint=ckpt
    )
    q.awaitTermination(120)


def test_batched_state_equals_python_reference(spark, tmp_path):
    """Stream two batches; the final (level, sample, n_total) must equal
    the order-independent reference computed on the full data set."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    ckpt = str(tmp_path / "ck")
    b1, b2 = _rows(0, 700), _rows(700, 1600)
    _write_batch(spark, src, "b1", b1)
    _run(spark, src, state, ckpt, cap=100)
    _write_batch(spark, src, "b2", b2)
    _run(spark, src, state, ckpt, cap=100)

    sample, level, n_total = load_quantile_state(spark, state)
    ref_level, ref_sample = _reference_state(b1 + b2, cap=100)
    assert level == ref_level and level > 0  # leveling actually engaged
    assert n_total == 1600
    got = sorted((r["v"], r["k"]) for r in sample.collect())
    assert got == ref_sample
    assert len(got) <= 100


def test_split_invariance(spark, tmp_path):
    """One batch vs three batches of the same rows -> identical state."""
    rows = _rows(0, 1200)
    states = []
    for i, splits in enumerate([[rows], [rows[:200], rows[200:900], rows[900:]]]):
        src = str(tmp_path / f"src{i}")
        state = str(tmp_path / f"state{i}")
        ckpt = str(tmp_path / f"ck{i}")
        for j, chunk in enumerate(splits):
            _write_batch(spark, src, f"b{j}", chunk)
            _run(spark, src, state, ckpt, cap=80)
        sample, level, n_total = load_quantile_state(spark, state)
        states.append(
            (level, n_total, sorted((r["v"], r["k"]) for r in sample.collect()))
        )
    assert states[0] == states[1]


def test_replay_is_exactly_once(spark, tmp_path):
    """A fresh checkpoint re-delivers ALL batches; the ledger must keep
    n_total exact and the sample unchanged."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    rows = _rows(0, 900)
    _write_batch(spark, src, "b1", rows)
    _run(spark, src, state, str(tmp_path / "ck1"), cap=60)
    before = load_quantile_state(spark, state)
    n_before = before[2]
    _run(spark, src, state, str(tmp_path / "ck2"), cap=60)  # full replay
    sample, level, n_total = load_quantile_state(spark, state)
    assert n_total == n_before == 900
    assert level == before[1]


def test_quantile_estimates_and_dkw(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    rows = _rows(0, 2000)
    _write_batch(spark, src, "b1", rows)
    _run(spark, src, state, str(tmp_path / "ck"), cap=400)
    out = state_quantiles(spark, state, [0.25, 0.5, 0.75]).collect()
    values = sorted(v for v, _ in rows)
    for r in out:
        true_rank = sum(1 for v in values if v < r["est"]) / len(values)
        bound = math.sqrt(math.log(2 / 0.001) / (2 * r["sample_m"]))
        assert abs(true_rank - r["q"]) <= bound, (r, true_rank, bound)
        assert r["n_total"] == 2000


def test_crash_between_promote_renames_recovers(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    _write_batch(spark, src, "b1", _rows(0, 500))
    _run(spark, src, state, str(tmp_path / "ck"), cap=50)
    before = load_quantile_state(spark, state)
    cur = os.path.join(state, "current")
    # simulate the crash window: current moved aside, replacement missing
    os.rename(cur, cur + ".old")
    SnapshotState(state).recover()
    after = load_quantile_state(spark, state)
    assert after[1] == before[1] and after[2] == before[2]
    assert sorted((r["v"], r["k"]) for r in after[0].collect()) == sorted(
        (r["v"], r["k"]) for r in before[0].collect()
    )


def test_state_stores_reject_object_store_uris():
    """POSIX-only contract (r9): os.rename-based state must fail LOUD at
    construction on an object-store URI — os.path.exists would otherwise
    silently report the state missing and restart it from scratch."""
    import pytest as _pytest

    from carto_etl_spark.streaming.state import (
        AppendOnlyState,
        SnapshotState,
        complete_dirs,
    )

    for uri in ("s3a://bucket/state", "gs://bucket/state",
                "hdfs://nn/state", "file:///tmp/state"):
        with _pytest.raises(ValueError, match="POSIX"):
            SnapshotState(uri)
        with _pytest.raises(ValueError, match="POSIX"):
            AppendOnlyState(uri)
        with _pytest.raises(ValueError, match="POSIX"):
            complete_dirs(uri)
    # plain and relative paths still construct
    SnapshotState("/tmp/x")
    AppendOnlyState("relative/dir")
