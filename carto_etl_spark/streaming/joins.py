"""Stream-stream joins (SURVEY §2.8 gap): watermarked interval equi-joins.

Spark's stream-stream join needs two things to bound state: a watermark on
both inputs (so old rows age out of the join state store) and a time-range
condition tying the two event times together (so a row knows when it can
never match again).  `interval_join` packages that shape -- an equi-join on
a key plus ``right.ts in [left.ts, left.ts + max_delay]`` -- and runs
identically on batch DataFrames (where the watermark is skipped and the
predicate is just a theta condition on top of the equi-join; Catalyst plans
the equi-part as a hash/sort-merge join, never a cartesian).

Attribution (`attribute_conversions`) is the canonical use: each conversion
event is credited to the LAST qualifying trigger event inside the window --
a row_number over (conversion, trigger-ts desc) after the interval join, the
same dedup the as-of join does but with a bounded look-back instead of
unbounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_delay: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """right rows joined to left rows of the same ``on`` key with
    ``left_ts <= right_ts <= left_ts + max_delay``.

    On streaming inputs both sides are watermarked (state stays bounded:
    a left row is droppable once the watermark passes its ts + max_delay).
    Column names must be disambiguated by the caller beforehand except the
    two ts columns, which may both be called "ts" -- they are renamed to
    ``left_ts``/``right_ts`` suffixed outputs internally.
    """
    l = left.withColumnRenamed(left_ts, "_lts")
    r = right.withColumnRenamed(right_ts, "_rts")
    if l.isStreaming and watermark:
        l = l.withWatermark("_lts", watermark)
    if r.isStreaming and watermark:
        r = r.withWatermark("_rts", watermark)
    cond = (
        (l[on] == r[on])
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {max_delay}"))
    )
    out = l.join(r, cond, how).drop(r[on])
    return out.withColumnRenamed("_lts", f"{left_ts}_left").withColumnRenamed(
        "_rts", f"{right_ts}_right"
    )


def attribute_conversions(
    events: DataFrame,
    trigger_type: str,
    conversion_type: str,
    key: str = "user_id",
    max_delay: str = "1 hour",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Last-touch attribution: each ``conversion_type`` event credited to
    the latest ``trigger_type`` event of the same key within ``max_delay``
    before it (trigger id as tiebreak on equal timestamps).  Emits one row
    per attributed conversion.  Works batch or streaming; in streaming the
    last-touch dedup requires the conversion id in the grouping state, so
    it must run inside ``foreachBatch`` (stream-stream join emits candidate
    pairs; a row_number over them is not a time-based window, which
    streaming forbids), so this helper raises on streaming input and the
    caller composes `interval_join` + per-batch dedup instead."""
    if events.isStreaming:
        raise ValueError(
            "attribute_conversions is batch-only (last-touch dedup needs a "
            "row_number, which streaming forbids outside foreachBatch); "
            "compose interval_join + per-batch dedup in foreachBatch"
        )
    triggers = events.where(F.col(type_col) == trigger_type).select(
        F.col(key),
        F.col(id_col).alias("trigger_id"),
        F.col(ts_col),
    )
    convs = events.where(F.col(type_col) == conversion_type).select(
        F.col(key),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col),
    )
    joined = interval_join(
        triggers,
        convs,
        on=key,
        max_delay=max_delay,
        left_ts=ts_col,
        right_ts=ts_col,
        watermark=watermark,
    )
    w = Window.partitionBy("conversion_id").orderBy(
        F.desc(f"{ts_col}_left"), F.desc("trigger_id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            key,
            "conversion_id",
            "trigger_id",
            F.col(f"{ts_col}_left").alias("trigger_ts"),
            F.col(f"{ts_col}_right").alias("conversion_ts"),
        )
    )


def attribute_stream(
    events,
    out_path: str,
    checkpoint: str,
    trigger_type: str,
    conversion_type: str,
    key: str = "user_id",
    max_delay: str = "1 hour",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    watermark: str = "2 hours",
    available_now: bool = False,
):
    """The streaming composition `attribute_conversions` refuses to guess:
    a watermarked stream-stream interval join emits candidate (trigger,
    conversion) pairs, and last-touch selection runs INSIDE foreachBatch
    as a keyed MERGE into a TransactionalTable.

    A stream-stream inner join emits a pair as soon as BOTH rows have
    arrived — candidates for one conversion can therefore SPAN batches (a
    late-but-in-watermark trigger pairs up in a later batch).  Per-batch
    row_number alone would emit two winners for such a conversion, so each
    batch instead (1) picks its in-batch best per conversion, (2) unions
    in the CURRENT attributed rows of the affected conversions, (3) takes
    the overall max by (trigger_ts, trigger_id), and (4) upserts keyed on
    conversion_id.  The result after any prefix of batches equals the
    batch-mode answer over the events seen so far, and upsert's
    idempotent last-write semantics make replays safe."""
    triggers = events.where(F.col(type_col) == trigger_type).select(
        F.col(key), F.col(id_col).alias("trigger_id"), F.col(ts_col)
    )
    convs = events.where(F.col(type_col) == conversion_type).select(
        F.col(key), F.col(id_col).alias("conversion_id"), F.col(ts_col)
    )
    joined = interval_join(
        triggers, convs, on=key, max_delay=max_delay,
        left_ts=ts_col, right_ts=ts_col, watermark=watermark,
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from carto_etl_spark.operators.transactional import (
            TransactionalTable,
        )

        spark = batch_df.sparkSession
        cand = batch_df.select(
            key,
            "conversion_id",
            "trigger_id",
            F.col(f"{ts_col}_left").alias("trigger_ts"),
            F.col(f"{ts_col}_right").alias("conversion_ts"),
        )
        table = TransactionalTable(spark, out_path)
        if table.version():
            existing = table.read().join(
                cand.select("conversion_id").distinct(),
                "conversion_id",
                "semi",
            )
            cand = cand.unionByName(existing)
        w = Window.partitionBy("conversion_id").orderBy(
            F.desc("trigger_ts"), F.desc("trigger_id")
        )
        winners = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        table.upsert(winners, "conversion_id")

    writer = (
        joined.writeStream.foreachBatch(merge_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
