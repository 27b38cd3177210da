"""session.local_df: the Arrow fast path must be value-identical to the
classic list path on every dtype it accepts, and must FALL BACK for the
cases where pandas semantics diverge (NaN-as-null, naive-datetime
localization)."""

from __future__ import annotations

import datetime

from carto_etl_spark.session import local_df


def test_arrow_path_matches_list_path(spark):
    rows = [(1, "a", 2.5, [1, 2]), (2, None, -0.0, [])]
    schema = "i long, s string, d double, arr array<long>"
    got = sorted(map(tuple, local_df(spark, rows, schema).collect()))
    want = sorted(map(tuple, spark.createDataFrame(rows, schema).collect()))
    assert got == want


def test_nan_falls_back_to_null_free_path(spark):
    rows = [(1, float("nan")), (2, 3.0)]
    out = {r["i"]: r["d"] for r in local_df(spark, rows, "i long, d double").collect()}
    # NaN must survive as NaN (the pandas path would turn it into NULL)
    assert out[1] != out[1] and out[2] == 3.0


def test_timestamps_match_list_path(spark):
    # naive datetimes: pandas/Arrow localizes in the SESSION zone while the
    # list path uses the driver zone — local_df must give list-path values
    rows = [(1, datetime.datetime(2024, 3, 1, 12, 30, 0))]
    schema = "i long, ts timestamp"
    got = local_df(spark, rows, schema).collect()[0]["ts"]
    want = spark.createDataFrame(rows, schema).collect()[0]["ts"]
    assert got == want == datetime.datetime(2024, 3, 1, 12, 30, 0)


def test_plans_as_jvm_local_relation(spark):
    # the point of the Arrow path: no Python-RDD scan in the plan
    df = local_df(spark, [(1,), (2,)], "i long")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "PythonRDD" not in plan
