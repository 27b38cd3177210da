"""Distributed progress reporter (statusTracker polling -> observer dicts)."""

from __future__ import annotations

from carto_etl_spark.operators.progress import ProgressReporter


def test_progress_reporter_emits_stage_progress(spark):
    # The reporter samples the status tracker on an interval; whether a poll
    # lands inside the job window depends on scheduling, so retry the job a
    # few times rather than assuming one pass is slow enough (under heavy CPU
    # contention a single window can be missed).
    events = []
    for attempt in range(5):
        events.clear()
        with ProgressReporter(spark, events.append, interval_s=0.05):
            spark.range(20_000_000 * (attempt + 1)).selectExpr(
                "sum(cast(id as double) * id)"
            ).collect()
        if any(e["type"] == "progress" and "tasks" in e["msg"] for e in events):
            break
    assert events, "no progress events captured"
    assert all(set(e) == {"type", "msg"} for e in events)
    assert any(e["type"] == "progress" and "tasks" in e["msg"] for e in events)


def test_progress_reporter_swallows_observer_errors(spark):
    def bad_observer(_):
        raise RuntimeError("observer exploded")

    with ProgressReporter(spark, bad_observer, interval_s=0.05):
        assert spark.range(1000).count() == 1000  # job unaffected
