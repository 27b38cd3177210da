"""Stream-stream interval join: two watermarked file-source streams joined
on key + time range, verified against the identical batch-mode join; plus
attribution semantics (last-touch, tiebreak, window exclusivity) on batch."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.streaming.joins import (
    attribute_conversions,
    interval_join,
)

SCHEMA = "id long, user_id long, ts timestamp"


def _ts(minute):
    return dt.datetime(2024, 1, 1, 12, 0) + dt.timedelta(minutes=minute)


CLICKS = [(1, 7, _ts(0)), (2, 7, _ts(30)), (3, 9, _ts(10)), (4, 5, _ts(50))]
BUYS = [
    (101, 7, _ts(40)),   # within 1h of clicks 1 and 2 -> both pair
    (102, 9, _ts(15)),   # within of click 3
    (103, 9, _ts(9)),    # BEFORE click 3 -> no pair
    (104, 5, _ts(55)),   # within of click 4
    (105, 7, _ts(95)),   # 95' after click 1 (out), 65' after click 2 (out)
]


def _expected_pairs():
    out = set()
    for cid, cu, cts in CLICKS:
        for bid, bu, bts in BUYS:
            if cu == bu and cts <= bts <= cts + dt.timedelta(hours=1):
                out.add((cid, bid))
    return out


def test_interval_join_batch(spark):
    l = spark.createDataFrame(CLICKS, SCHEMA)
    r = spark.createDataFrame(
        BUYS, "rid long, user_id long, ts timestamp"
    )
    got = interval_join(l, r, on="user_id", max_delay="1 hour")
    pairs = {(x["id"], x["rid"]) for x in got.collect()}
    assert pairs == _expected_pairs()
    assert {"ts_left", "ts_right"} <= set(got.columns)


def test_interval_join_stream_stream(spark, tmp_path):
    lsrc, rsrc = tmp_path / "clicks", tmp_path / "buys"
    spark.createDataFrame(CLICKS, SCHEMA).coalesce(1).write.parquet(
        str(lsrc / "f=1")
    )
    spark.createDataFrame(
        BUYS, "rid long, user_id long, ts timestamp"
    ).coalesce(1).write.parquet(str(rsrc / "f=1"))
    ls = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(lsrc) + "/*")
    )
    rs = (
        spark.readStream.schema("rid long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rsrc) + "/*")
    )
    joined = interval_join(ls, rs, on="user_id", max_delay="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = {
        (r["id"], r["rid"]) for r in spark.sql("SELECT * FROM sjoin").collect()
    }
    assert pairs == _expected_pairs()


def test_attribution_last_touch_and_tiebreak(spark):
    events = spark.createDataFrame(
        [
            (1, 7, _ts(0), "click"),
            (2, 7, _ts(30), "click"),     # later click wins for buy 101
            (3, 7, _ts(30), "click"),     # same ts: higher id wins tiebreak
            (101, 7, _ts(40), "purchase"),
            (102, 7, _ts(85), "purchase"),  # click 1 (85') aged out;
                                            # clicks 2/3 (55') still in
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {
        r["conversion_id"]: r["trigger_id"]
        for r in attribute_conversions(
            events, "click", "purchase", max_delay="1 hour"
        ).collect()
    }
    assert got == {101: 3, 102: 3}


def test_attribute_stream_late_trigger_across_batches(spark, tmp_path):
    """A trigger arriving in a LATER micro-batch (still inside the
    watermark) must steal the attribution from the earlier winner: the
    stream-stream join emits its pair in batch 2, and the foreachBatch
    MERGE must converge to one row per conversion with the later trigger
    — the case naive per-batch dedup gets wrong."""
    from carto_etl_spark.operators.transactional import TransactionalTable
    from carto_etl_spark.streaming.joins import attribute_stream

    schema = "event_id long, user_id long, ts timestamp, event_type string"
    src = tmp_path / "events"
    spark.createDataFrame(
        [(1, 7, _ts(0), "click"), (101, 7, _ts(40), "purchase")], schema
    ).coalesce(1).write.parquet(str(src / "f=1"))
    spark.createDataFrame(
        [(2, 7, _ts(30), "click")], schema  # late, within watermark
    ).coalesce(1).write.parquet(str(src / "f=2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = str(tmp_path / "attributed")
    q = attribute_stream(
        stream, out, str(tmp_path / "ckpt_attr"),
        trigger_type="click", conversion_type="purchase",
        max_delay="1 hour", available_now=True,
    )
    q.awaitTermination(180)

    rows = TransactionalTable(spark, out).read().collect()
    assert len(rows) == 1
    assert rows[0]["conversion_id"] == 101
    assert rows[0]["trigger_id"] == 2  # the late trigger won


def test_attribution_refuses_streaming_input(spark, tmp_path):
    src = tmp_path / "ev"
    spark.createDataFrame(
        [(1, 7, _ts(0), "click")],
        "event_id long, user_id long, ts timestamp, event_type string",
    ).coalesce(1).write.parquet(str(src / "f=1"))
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string"
    ).parquet(str(src) + "/*")
    with pytest.raises(ValueError, match="batch-only"):
        attribute_conversions(stream, "click", "purchase")
