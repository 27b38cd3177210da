"""Distributed progress reporter (statusTracker polling -> observer dicts)."""

from __future__ import annotations

from carto_etl_spark.operators.progress import ProgressReporter


def test_progress_reporter_emits_stage_progress(spark):
    events = []
    with ProgressReporter(spark, events.append, interval_s=0.05):
        spark.range(20_000_000).selectExpr(
            "sum(cast(id as double) * id)"
        ).collect()
    assert events, "no progress events captured"
    assert all(set(e) == {"type", "msg"} for e in events)
    assert any(e["type"] == "progress" and "tasks" in e["msg"] for e in events)


def test_progress_reporter_swallows_observer_errors(spark):
    def bad_observer(_):
        raise RuntimeError("observer exploded")

    with ProgressReporter(spark, bad_observer, interval_s=0.05):
        assert spark.range(1000).count() == 1000  # job unaffected
