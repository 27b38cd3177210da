"""Incremental overview refresh: streamed partials must merge to exactly the
batch-computed overview, before and after compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from carto_etl_spark.functions.geom import point_struct
from carto_etl_spark.operators.overviews import base_overview, finish_overview
from carto_etl_spark.streaming.overviews import (
    compact_overview,
    incremental_overviews,
    read_overview,
)

SCHEMA = "id long, lon double, lat double, val double"


def _points(spark, ids):
    rows = [(i, float((i % 360) - 180) + 0.5, float((i % 160) - 80) + 0.5, float(i)) for i in ids]
    return spark.createDataFrame(rows, SCHEMA)


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_matches_batch(spark, tmp_path):
    src = tmp_path / "pts"
    _points(spark, range(0, 150)).coalesce(1).write.parquet(str(src / "f=1"))
    _points(spark, range(150, 400)).coalesce(1).write.parquet(str(src / "f=2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
        .select(
            point_struct(F.col("lon"), F.col("lat")).alias("the_geom"),
            F.col("val"),
        )
    )
    q = incremental_overviews(
        stream,
        str(tmp_path / "store"),
        zoom=4,
        value_columns=("val",),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    all_points = _points(spark, range(0, 400)).select(
        point_struct(F.col("lon"), F.col("lat")).alias("the_geom"), F.col("val")
    )
    expected = finish_overview(
        base_overview(all_points, 4, value_columns=["val"]), ["val"]
    )
    got_rows = _norm(read_overview(spark, str(tmp_path / "store"), ("val",)))
    expected_rows = _norm(expected)
    assert got_rows == expected_rows

    raw_rows = spark.read.parquet(str(tmp_path / "store")).count()
    compact_overview(spark, str(tmp_path / "store"), ("val",))
    compacted_rows = spark.read.parquet(str(tmp_path / "store")).count()
    # compaction shrinks partials to one row per tile
    assert compacted_rows <= raw_rows
    assert compacted_rows == len(expected_rows)
    # reads identical after compaction
    got2 = _norm(read_overview(spark, str(tmp_path / "store"), ("val",)))
    assert got2 == expected_rows
