"""Partitioned targets: keyed update/delete must rewrite only affected
partitions (file mtimes prove untouched dirs), and edge cases (emptied
partition, partition-column update) must stay correct."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.jobs import DeleteJob, InsertJob, TargetTable, UpdateJob


@pytest.fixture()
def ptarget(spark, tmp_path):
    target = TargetTable(spark, tmp_path / "pt", partition_by=["region"])
    df = spark.createDataFrame(
        [
            ("r1", "eu", "a"),
            ("r2", "eu", "b"),
            ("r3", "us", "c"),
            ("r4", "asia", "d"),
        ],
        ["id", "region", "val"],
    )
    target.append(df)
    return target


def _partition_files(target, part):
    d = target.path / f"region={part}"
    return {
        f: os.path.getmtime(d / f)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_partitioned_update_touches_only_affected(spark, ptarget, tmp_path):
    us_before = _partition_files(ptarget, "us")
    asia_before = _partition_files(ptarget, "asia")
    upd = tmp_path / "upd.csv"
    upd.write_text("id,val\nr1,A1\n")
    UpdateJob(
        "id", str(upd), spark=spark, target=ptarget, columns="id,val",
        force_no_geometry="true",
    ).run()
    rows = {r["id"]: r for r in ptarget.read().collect()}
    assert rows["r1"]["val"] == "A1"
    assert rows["r3"]["val"] == "c"
    # us/asia partitions untouched on disk
    assert _partition_files(ptarget, "us") == us_before
    assert _partition_files(ptarget, "asia") == asia_before


def test_partitioned_delete_and_emptied_partition(spark, ptarget, tmp_path):
    eu_before = _partition_files(ptarget, "eu")
    dele = tmp_path / "del.csv"
    dele.write_text("id\nr3\n")
    DeleteJob("id", str(dele), spark=spark, target=ptarget, columns="id").run()
    assert {r["id"] for r in ptarget.read().collect()} == {"r1", "r2", "r4"}
    # us partition fully emptied -> its dir must be gone
    assert not (ptarget.path / "region=us").exists()
    assert _partition_files(ptarget, "eu") == eu_before


def test_update_partition_column_rejected(spark, ptarget, tmp_path):
    upd = tmp_path / "upd2.csv"
    upd.write_text("id,region\nr1,us\n")
    job = UpdateJob(
        "id", str(upd), spark=spark, target=ptarget, columns="id,region",
        force_no_geometry="true",
    )
    with pytest.raises(ValueError, match="partition column"):
        job.run()


def test_partitioned_insert_appends_new_partition(spark, ptarget):
    df = ptarget.spark.createDataFrame(
        [("r5", "af", "e")], ["id", "region", "val"]
    )
    InsertJob(
        df, spark=ptarget.spark, target=ptarget, columns="id,region,val",
        force_no_geometry="true", column_types="id:string,region:string,val:string",
    ).run()
    assert (ptarget.path / "region=af").exists()
    assert ptarget.read().count() == 5
