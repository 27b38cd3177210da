"""Distributed zip-member source (S10 scale path)."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from carto_etl_spark.sources.zipfiles import read_zip_lines, zip_member_csv


def make_zip(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("job1_out.txt", "recId,lat,lon\n1,40.4,-3.7\n2,41.0,2.1\n")
        zf.writestr("job1_err.txt", "recId,searchText\n9,nowhere\n")


def test_read_zip_lines(spark, tmp_path):
    make_zip(tmp_path / "r.zip")
    lines = read_zip_lines(spark, str(tmp_path / "r.zip"))
    assert lines.count() == 5
    out_only = read_zip_lines(spark, str(tmp_path / "r.zip"), "_out.txt")
    assert out_only.count() == 3


def test_zip_member_csv(spark, tmp_path):
    make_zip(tmp_path / "r.zip")
    recs = zip_member_csv(spark, str(tmp_path / "r.zip"), "_out.txt")
    rows = sorted(
        (r["record"]["recId"], r["record"]["lat"]) for r in recs.collect()
    )
    assert rows == [("1", "40.4"), ("2", "41.0")]


def test_zip_member_csv_ragged_rows(spark, tmp_path):
    # short rows pad with NULL; long rows truncate to the header width
    with zipfile.ZipFile(tmp_path / "g.zip", "w") as zf:
        zf.writestr("j_out.txt", "a,b,c\n1,2\n3,4,5,6\n")
    recs = zip_member_csv(spark, str(tmp_path / "g.zip"), "_out.txt")
    by_a = {r["record"]["a"]: r["record"] for r in recs.collect()}
    assert by_a["1"]["c"] is None
    assert by_a["3"]["c"] == "5" and "d" not in by_a["3"]
