"""Byte-budgeted Arrow probe (operators/probe.py): JVM size parsing,
boundary behavior of every tier signal (whole-frame / cap+1 / byte-bound
None), the bytes-beat-the-estimate recheck, and the end-to-end contract
that a byte-bound probe sends min_label_components / pagerank to their
distributed tiers with identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators import probe as probe_mod
from carto_etl_spark.operators.probe import arrow_probe, parse_jvm_size


def test_parse_jvm_size():
    assert parse_jvm_size("4g") == 4 << 30
    assert parse_jvm_size("512m") == 512 << 20
    assert parse_jvm_size("1048576") == 1 << 20
    assert parse_jvm_size("10K") == 10 << 10
    assert parse_jvm_size("0") == 0
    assert parse_jvm_size(" 2gb ") == 2 << 30
    with pytest.raises(ValueError):
        parse_jvm_size("lots")


def test_whole_frame_within_budget(spark):
    df = spark.range(100).select(F.col("id").alias("id_a"))
    t = arrow_probe(df, row_cap=1000, byte_budget=1 << 20)
    assert t is not None and t.num_rows == 100


def test_row_cap_exceeded_signal(spark):
    df = spark.range(500).select(F.col("id").alias("id_a"))
    t = arrow_probe(df, row_cap=99, byte_budget=1 << 20)
    assert t is not None and t.num_rows == 100  # cap + 1


def test_sample_alone_busts_budget(spark):
    wide = spark.range(50).select(
        F.repeat(F.lit("x"), 10_000).alias("payload")
    )
    assert arrow_probe(wide, row_cap=1000, byte_budget=20_000) is None


def test_byte_budget_binds_below_row_cap(spark, monkeypatch):
    """Rows fit the cap, bytes don't: the extrapolation path must return
    None instead of hauling the frame.  _SAMPLE_ROWS is shrunk so the
    estimate path runs without a 65k-row fixture."""
    monkeypatch.setattr(probe_mod, "_SAMPLE_ROWS", 10)
    wide = spark.range(1000).select(
        F.repeat(F.lit("y"), 1000).alias("payload")
    )
    # ~1 KB/row; budget of 50 KB allows ~50 rows << 1000 present
    assert arrow_probe(wide, row_cap=5000, byte_budget=50_000) is None
    # same shape, budget comfortably above the full frame: returns it
    t = arrow_probe(wide, row_cap=5000, byte_budget=10 << 20)
    assert t is not None and t.num_rows == 1000


def test_estimate_recheck_on_variable_width(spark, monkeypatch):
    """Narrow rows first, wide rows later: the sample underestimates
    bytes/row; the post-transfer nbytes recheck must still bail."""
    monkeypatch.setattr(probe_mod, "_SAMPLE_ROWS", 10)
    df = spark.range(200).select(
        F.repeat(F.lit("z"), F.when(F.col("id") < 10, 1).otherwise(5000))
        .alias("payload")
    ).coalesce(1)
    assert arrow_probe(df, row_cap=5000, byte_budget=60_000) is None


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("id_a"))
    t = arrow_probe(df, row_cap=10, byte_budget=1 << 20)
    assert t is not None and t.num_rows == 0


def test_byte_bound_components_fall_back_to_distributed(spark, monkeypatch):
    """min_label_components with a starved byte budget must produce the
    same components through the distributed fixpoint."""
    from carto_etl_spark.operators.dedup import min_label_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    want = sorted(
        tuple(r) for r in min_label_components(pairs).collect()
    )
    monkeypatch.setattr(probe_mod, "default_probe_budget", lambda df: 1)
    got = sorted(tuple(r) for r in min_label_components(pairs).collect())
    assert got == want
    assert got == [
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    ]


def test_byte_bound_pagerank_falls_back_to_distributed(spark, monkeypatch):
    from carto_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1), (1, 3, 2)],
        "src long, dst long, w long",
    )
    want = sorted(tuple(r) for r in pagerank(edges, iterations=5).collect())
    monkeypatch.setattr(probe_mod, "default_probe_budget", lambda df: 1)
    got = sorted(tuple(r) for r in pagerank(edges, iterations=5).collect())
    assert got == want
