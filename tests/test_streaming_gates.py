"""The stateless quality gates (C4 rules, Gopher Arrow counting, the
reputation verdict broadcast) must run unchanged inside Structured
Streaming — the property that lets one gate definition serve batch
backfill and the live ingest path.  gopher's relational twin aggregates
(not streamable without a watermark); the Arrow path is mapInPandas +
projection, which streams as-is."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from carto_etl_spark.operators.c4rules import c4_filter
from carto_etl_spark.operators.gopher import gopher_repetition_arrow

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

DOCS = [
    (1, "a fine first sentence.\nno punct line\nanother good one here."),
    (2, "dup dup dup dup dup dup dup dup dup dup."),
    (3, None),
    (4, "short."),
]


@pytest.fixture()
def doc_stream(spark, tmp_path):
    src = tmp_path / "docs"
    df = spark.createDataFrame(DOCS[:2], SCHEMA)
    df.coalesce(1).write.parquet(str(src / "f=1"))
    df2 = spark.createDataFrame(DOCS[2:], SCHEMA)
    df2.coalesce(1).write.parquet(str(src / "f=2"))
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )


def _drain(df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_c4_filter_streams(spark, doc_stream, tmp_path):
    _drain(c4_filter(doc_stream, "text", ["doc_id"]), "c4s", tmp_path)
    rows = {r["doc_id"]: r for r in spark.table("c4s").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["n_kept"] == 2  # the punct-less middle line died
    assert rows[3]["clean_text"] == ""


def test_gopher_arrow_streams_and_matches_batch(spark, doc_stream, tmp_path):
    _drain(
        gopher_repetition_arrow(doc_stream, "text", "doc_id"), "gps", tmp_path
    )
    got = sorted(tuple(r) for r in spark.table("gps").collect())
    batch = sorted(
        tuple(r)
        for r in gopher_repetition_arrow(
            spark.createDataFrame(DOCS, SCHEMA), "text", "doc_id"
        ).collect()
    )
    assert got == batch
    # doc 2 is one repeated unigram: the dup-n-gram fractions saturate
    rows = {r["doc_id"]: r.asDict() for r in spark.table("gps").collect()}
    assert not rows[2]["passes"]
