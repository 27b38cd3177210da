"""Overview (level-of-detail) aggregation — the Spark-native rebuild of CARTO's
``CDB_CreateOverviews`` (/root/reference/etl/etl.py:166-173, README.md:169-194).

The reference fires one async server-side SQL job that materializes per-zoom
point-cluster summary tables.  Here each zoom level is a grid aggregate over
web-mercator tiles, with two scale-critical design choices:

1. **Hierarchical rollup**: only the finest zoom scans the base table; every
   coarser zoom is re-aggregated from the next finer level (tile_z-1 =
   floor(tile_z / 2)).  At 100 TB that turns Z full scans into one scan plus
   Z-1 shuffles over geometrically shrinking aggregates.
2. **Async job handles**: ``submit_overview_job`` returns a job_id immediately
   and computes in a background thread; ``check_job`` polls — the same
   `regenerate_overviews`/`check_job` lifecycle as the reference's Batch SQL
   API (etl/etl.py:166-173).

Aggregates per tile: feature count, centroid (avg x/y), and avg/sum/min/max of
requested numeric columns — count/avg compose correctly across levels by
carrying (sum, count) and finishing at read time.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.functions.geom import st_x, st_y, tile_x, tile_y


def base_overview(
    df: DataFrame,
    zoom: int,
    geom_col: str = "the_geom",
    value_columns: Iterable[str] = (),
) -> DataFrame:
    """Finest-level grid aggregate: one scan of the base table."""
    lon = st_x(geom_col)
    lat = st_y(geom_col)
    pts = df.filter(F.col(geom_col).isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n_features"),
        F.sum(lon).alias("sum_x"),
        F.sum(lat).alias("sum_y"),
    ]
    for c in value_columns:
        aggs += [
            F.sum(c).alias(f"sum_{c}"),
            F.count(c).alias(f"cnt_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return (
        pts.groupBy(
            tile_x(lon, zoom).alias("tile_x"),
            tile_y(lat, zoom).alias("tile_y"),
        )
        .agg(*aggs)
        .withColumn("zoom", F.lit(zoom))
    )


def rollup_overview(finer: DataFrame, value_columns: Iterable[str] = ()) -> DataFrame:
    """Derive zoom z-1 from zoom z: parent tile = floor(child / 2).  All
    carried aggregates (counts, sums, min/max) compose associatively."""
    zoom = finer.select(F.first("zoom")).first()[0] - 1
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
    return (
        finer.groupBy(
            (F.col("tile_x") / 2).cast("long").alias("tile_x"),
            (F.col("tile_y") / 2).cast("long").alias("tile_y"),
        )
        .agg(*aggs)
        .withColumn("zoom", F.lit(zoom))
    )


def finish_overview(ov: DataFrame, value_columns: Iterable[str] = ()) -> DataFrame:
    """Reader-facing view: centroid + per-column averages from the carried
    (sum, count) pairs."""
    out = ov.select(
        "zoom",
        "tile_x",
        "tile_y",
        "n_features",
        (F.col("sum_x") / F.col("n_features")).alias("centroid_x"),
        (F.col("sum_y") / F.col("n_features")).alias("centroid_y"),
        *[
            (F.col(f"sum_{c}") / F.nullif(F.col(f"cnt_{c}"), F.lit(0))).alias(
                f"avg_{c}"
            )
            for c in value_columns
        ],
        *[F.col(f"min_{c}") for c in value_columns],
        *[F.col(f"max_{c}") for c in value_columns],
    )
    return out


def create_overviews(
    df: DataFrame,
    max_zoom: int = 8,
    min_zoom: int = 0,
    geom_col: str = "the_geom",
    value_columns: Iterable[str] = (),
) -> dict[int, DataFrame]:
    """All zoom levels [min_zoom, max_zoom], hierarchically.  Returns
    finished (reader-facing) DataFrames keyed by zoom."""
    value_columns = list(value_columns)
    levels: dict[int, DataFrame] = {}
    carried = base_overview(df, max_zoom, geom_col, value_columns)
    levels[max_zoom] = carried
    for _ in range(max_zoom - min_zoom):
        carried = rollup_overview(carried, value_columns)
        levels[carried.select(F.first("zoom")).first()[0]] = carried
    return {z: finish_overview(ov, value_columns) for z, ov in levels.items()}


# ---------------------------------------------------------------------------
# Async job registry (reference D5/D6 lifecycle)
# ---------------------------------------------------------------------------

@dataclass
class _OverviewJob:
    job_id: str
    status: str = "pending"
    error: str | None = None
    zooms: list[int] = field(default_factory=list)


_JOBS: dict[str, _OverviewJob] = {}
_JOBS_LOCK = threading.Lock()


def submit_overview_job(
    target,
    max_zoom: int = 8,
    min_zoom: int = 0,
    geom_col: str = "the_geom",
    value_columns: Iterable[str] = (),
) -> str:
    """Kick off overview materialization for a TargetTable in a background
    thread; parquet outputs land beside the target as ``<name>_ovw_z<z>``.
    Returns a job_id for ``check_job`` polling, like the reference's
    ``regenerate_overviews`` (etl/etl.py:166-170)."""
    job_id = uuid.uuid4().hex
    job = _OverviewJob(job_id=job_id)
    with _JOBS_LOCK:
        _JOBS[job_id] = job

    def work() -> None:
        job.status = "running"
        try:
            df = target.read()
            levels = create_overviews(
                df, max_zoom, min_zoom, geom_col, value_columns
            )
            for z, ov in levels.items():
                out = target.path.with_name(f"{target.path.name}_ovw_z{z}")
                ov.write.mode("overwrite").parquet(str(out))
                job.zooms.append(z)
            job.status = "done"
        except Exception as exc:  # noqa: BLE001 — job surface reports failure
            job.status = "failed"
            job.error = str(exc)

    threading.Thread(target=work, daemon=True).start()
    return job_id


def check_job(job_id: str) -> dict:
    """Poll a job; dict shape mirrors the reference's batch-job read
    (etl/etl.py:172-173)."""
    with _JOBS_LOCK:
        job = _JOBS.get(job_id)
    if job is None:
        return {"job_id": job_id, "status": "unknown"}
    return {
        "job_id": job.job_id,
        "status": job.status,
        "error": job.error,
        "zooms": sorted(job.zooms),
    }
