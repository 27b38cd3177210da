"""Incremental materialized-view maintenance
(operators/transactional.py:apply_aggregate_delta): the delta-maintained
view must equal a full recompute from the final snapshot under appends,
deletes, and upserts — including groups that vanish (count -> 0) and
groups born after the view was built."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators.transactional import (
    TransactionalTable,
    apply_aggregate_delta,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="inc-mv-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mv(df):
    return df.groupBy("grp").agg(
        F.sum("cents").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def _as_map(df):
    return {r["grp"]: (r["cents"], r["n_rows"]) for r in df.collect()}


def test_delta_maintained_view_equals_recompute(spark, workdir):
    base = spark.createDataFrame(
        [(i, i % 5, 100 + i) for i in range(200)],
        ["k", "grp", "cents"],
    )
    t = TransactionalTable(spark, f"{workdir}/t", stats_columns=["k"])
    t.append(base)
    v1 = t.version()
    mv1 = _mv(t.read(v1)).localCheckpoint()

    # churn: delete a key range, append new rows (incl. a brand-new group),
    # upsert (update-in-place surfaces as delete+insert in the feed)
    t.delete_where("k", lo=50, hi=99)
    t.append(
        spark.createDataFrame(
            [(1000 + i, 7, 9000 + i) for i in range(10)],
            ["k", "grp", "cents"],
        )
    )
    t.upsert(
        spark.createDataFrame(
            [(i, i % 5, 1) for i in range(0, 20)], ["k", "grp", "cents"]
        ),
        key="k",
    )

    feed = t.diff(v1)
    maintained = apply_aggregate_delta(mv1, feed, ["grp"], ["cents"])
    recomputed = _mv(t.read())
    assert _as_map(maintained) == _as_map(recomputed)


def test_vanishing_group_dropped_and_new_group_born(spark, workdir):
    base = spark.createDataFrame(
        [(1, 0, 10), (2, 0, 20), (3, 1, 30)], ["k", "grp", "cents"]
    )
    t = TransactionalTable(spark, f"{workdir}/t")
    t.append(base)
    v1 = t.version()
    mv1 = _mv(t.read(v1)).localCheckpoint()

    t.delete_where("k", lo=3, hi=3)  # group 1 vanishes
    t.append(spark.createDataFrame([(9, 2, 99)], ["k", "grp", "cents"]))

    maintained = apply_aggregate_delta(mv1, t.diff(v1), ["grp"], ["cents"])
    m = _as_map(maintained)
    assert 1 not in m          # count hit zero -> dropped from the view
    assert m[2] == (99, 1)     # group born after the view was built
    assert m[0] == (30, 2)     # untouched group carried through
    assert _as_map(maintained) == _as_map(_mv(t.read()))


def test_empty_feed_is_identity(spark, workdir):
    base = spark.createDataFrame([(1, 0, 10)], ["k", "grp", "cents"])
    t = TransactionalTable(spark, f"{workdir}/t")
    t.append(base)
    v1 = t.version()
    mv1 = _mv(t.read(v1))
    maintained = apply_aggregate_delta(mv1, t.diff(v1, v1), ["grp"], ["cents"])
    assert _as_map(maintained) == _as_map(mv1)
