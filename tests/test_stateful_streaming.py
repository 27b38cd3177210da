"""Stateful streaming operators: state must carry across micro-batches
(maxFilesPerTrigger=1 forces one batch per input file)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.streaming.stateful import running_totals, streaming_dedup

SCHEMA = "event_id long, user_id long, value double"


def _write_batches(spark, path):
    b1 = spark.createDataFrame(
        [(1, 7, 10.0), (2, 7, 5.0), (3, 9, 1.0)], SCHEMA
    )
    b2 = spark.createDataFrame(
        [(4, 7, 2.0), (2, 7, 99.0), (5, 9, 4.0)], SCHEMA  # event 2 replayed
    )
    b1.coalesce(1).write.parquet(f"{path}/f=1")
    b2.coalesce(1).write.parquet(f"{path}/f=2")


@pytest.fixture()
def stream(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(spark, str(src))
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )


def _run_to_memory(df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_running_totals_accumulate_across_batches(spark, stream, tmp_path):
    _run_to_memory(running_totals(stream), "totals", tmp_path)
    rows = spark.sql("SELECT * FROM totals").collect()
    # last emitted update per user reflects the full history
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n_events"], r["sum_value"])
    assert latest[7] == (4, 116.0)
    assert latest[9] == (2, 5.0)
    # state visible mid-stream too: user 7 appeared in more than one update
    assert len([r for r in rows if r["user_id"] == 7]) >= 2


def test_watermark_drops_late_events(spark, tmp_path):
    from carto_etl_spark.streaming.jobs import windowed_counts
    from pyspark.sql import functions as F

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = tmp_path / "wsrc"
    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def mk(rows):
        return spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts")
        )

    import time as _time

    # b1 fills window 00:00 and advances event time to 02:00 (wm -> 01:50)
    mk([
        (1, "2024-01-01 00:01:00", 1, "click", 1.0),
        (2, "2024-01-01 00:04:00", 1, "click", 2.0),
        (3, "2024-01-01 02:00:00", 1, "click", 4.0),
    ]).coalesce(1).write.parquet(str(src / "f=1"))
    _time.sleep(1.1)  # distinct mtimes keep file->batch order deterministic
    # b2: window 00:00 gets finalized + emitted during this batch
    mk([(4, "2024-01-01 02:05:00", 1, "click", 16.0)]).coalesce(1).write.parquet(
        str(src / "f=2")
    )
    _time.sleep(1.1)
    # b3: a LATE event for the already-finalized window — must be dropped,
    # not resurrect the window (append mode emits each window exactly once)
    mk([
        (5, "2024-01-01 00:02:00", 1, "click", 8.0),
        (6, "2024-01-01 02:06:00", 1, "click", 32.0),
    ]).coalesce(1).write.parquet(str(src / "f=3"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    agg = windowed_counts(stream, "5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = [
        r
        for r in spark.sql("SELECT * FROM wm").collect()
        if str(r["window_start"]) == "2024-01-01 00:00:00"
    ]
    # exactly one emission of the finalized window, without the late event
    assert len(emitted) == 1
    assert emitted[0]["n_events"] == 2
    assert emitted[0]["sum_value"] == 3.0


def test_streaming_dedup_drops_replays(spark, stream, tmp_path):
    _run_to_memory(streaming_dedup(stream), "dedup", tmp_path)
    rows = spark.sql("SELECT * FROM dedup").collect()
    got = sorted((r["user_id"], r["event_id"]) for r in rows)
    # event 2 replayed in batch 2 must appear exactly once
    assert got == [(7, 1), (7, 2), (7, 4), (9, 3), (9, 5)]
