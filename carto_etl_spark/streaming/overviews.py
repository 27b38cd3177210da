"""Incremental overview (LOD) refresh — the streaming answer to the
reference's batch ``CDB_CreateOverviews`` job (/root/reference/etl/etl.py:
166-173; SURVEY §4 flags "incremental refresh via streaming" as the scale
path).

Design: per micro-batch, aggregate the batch's points into PARTIAL tile rows
(sum/count carry, same shape as operators/overviews.base_overview) and
append them to a partial store.  Readers merge partials with one small
groupBy; a periodic ``compact_overview`` rewrites the store to one row per
tile.  All operations are associative, so batches never need to read
existing state — appends stay O(batch), and the store stays small because
it grows with touched tiles, not points."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from carto_etl_spark.operators.overviews import base_overview, finish_overview


def _merge_partials(partials: DataFrame, value_columns) -> DataFrame:
    aggs = [
        F.sum("n_features").alias("n_features"),
        F.sum("sum_x").alias("sum_x"),
        F.sum("sum_y").alias("sum_y"),
    ]
    for c in value_columns:
        aggs += [
            F.sum(f"sum_{c}").alias(f"sum_{c}"),
            F.sum(f"cnt_{c}").alias(f"cnt_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    return partials.groupBy("zoom", "tile_x", "tile_y").agg(*aggs)


def incremental_overviews(
    stream_points: DataFrame,
    store_path: str,
    zoom: int,
    geom_col: str = "the_geom",
    value_columns: tuple[str, ...] = (),
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the incremental refresh: each micro-batch appends its partial
    tile aggregates to ``store_path``."""
    value_columns = list(value_columns)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        partial = base_overview(batch_df, zoom, geom_col, value_columns)
        partial.write.mode("append").parquet(store_path)

    writer = stream_points.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_overview(
    spark: SparkSession, store_path: str, value_columns: tuple[str, ...] = ()
) -> DataFrame:
    """Reader-facing overview: merge partials, finish to centroid/avg form.
    Cost is one groupBy over the partial store (tiles x appended batches)."""
    value_columns = list(value_columns)
    merged = _merge_partials(spark.read.parquet(store_path), value_columns)
    return finish_overview(merged, value_columns)


def compact_overview(
    spark: SparkSession, store_path: str, value_columns: tuple[str, ...] = ()
) -> None:
    """Rewrite the partial store to one row per tile (bounds reader cost
    after many batches).  Safe to run between refresh triggers."""
    import shutil
    import uuid
    from pathlib import Path

    value_columns = list(value_columns)
    merged = _merge_partials(spark.read.parquet(store_path), value_columns)
    path = Path(store_path)
    tmp = path.with_name(f"{path.name}.compact-{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").parquet(str(tmp))
    shutil.rmtree(path)
    tmp.rename(path)
    # pre-compaction DataFrames hold the old file listing — invalidate it
    spark.catalog.refreshByPath(store_path)
