"""Structured-Streaming surface (SURVEY §2.8): the reference is batch-only but
micro-batch shaped (chunk = trigger batch, observer = listener, retry =
per-batch recovery, start/end chunk = offsets).  This module exposes the
streaming equivalents:

- directory CSV/parquet stream sources feeding the same coercion + sinks via
  ``foreachBatch`` (chunk == micro-batch, reference etl/etl.py:37-56);
- tumbling/sliding window aggregation with watermarked late-data handling;
- session windows (gap-based) — the stateful operator the events table needs.

Scale notes: watermark bounds state; ``foreachBatch`` reuses the batch sink
(and its retry/dead-letter), giving exactly-once into transactional targets
and at-least-once into plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.config import JobConfig
from carto_etl_spark.operators.jobs import InsertJob, TargetTable
from carto_etl_spark.sources.csv import normalize_headers

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_csv_dir(
    spark: SparkSession, path: str, schema: str, cfg: JobConfig | None = None
) -> DataFrame:
    """Streaming CSV directory source with the reference's scan semantics
    (delimiter/encoding/header normalization)."""
    cfg = cfg or JobConfig()
    df = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("sep", cfg.delimiter)
        .option("encoding", cfg.file_encoding)
        .csv(path)
    )
    return normalize_headers(df)


def insert_stream(
    stream_df: DataFrame,
    target: TargetTable,
    cfg: JobConfig | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous InsertJob: every micro-batch runs the same coercion +
    retry-wrapped append as the batch path (foreachBatch -> InsertJob with a
    DataFrame source)."""
    cfg = cfg or JobConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        job = InsertJob(batch_df, spark=batch_df.sparkSession, target=target,
                        config=cfg)
        job.run()

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def insert_stream_transactional(
    stream_df: DataFrame,
    table,
    cfg: JobConfig | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Exactly-once streaming ingest: foreachBatch coerces each micro-batch
    through the InsertJob expression path, then lands it as ONE atomic
    TransactionalTable commit keyed by the batch id — a replayed batch (after
    a crash between sink write and checkpoint advance, the classic
    at-least-once hole) finds its idempotency key already committed and
    becomes a no-op.  This is the manifest-log equivalent of Delta's
    txn-version sink dedup."""
    cfg = cfg or JobConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        job = InsertJob(batch_df, spark=batch_df.sparkSession, config=cfg)
        out = job.coerced_df(job.source_df())
        table.append(out, idempotency_key=f"stream-batch-{batch_id}")

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding) window counts + averages with late-data
    watermark; works on both batch and streaming DataFrames."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    return df.groupBy(win.alias("w"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_events",
        "sum_value",
        "avg_value",
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key (built-in session_window — no custom
    state store needed)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        key_col,
        "n_events",
        "sum_value",
    )
