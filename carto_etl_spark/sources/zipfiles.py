"""Distributed zip-member source (reference S10: the HERE geocode result zip,
/root/reference/etl/geocoding.py:88-116).

The reference downloads one zip on the driver and rewrites its members.  The
scale path: ``binaryFile`` streams whole zips to executors, an Arrow-batched
``mapInPandas`` extracts members, and the text lands as (zip_path, member,
line) rows ready for CSV parsing — no driver bottleneck, one task per zip."""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = "zip_path string, member string, line_no long, line string"


def read_zip_lines(
    spark: SparkSession,
    path: str,
    member_suffix: str | None = None,
    encoding: str = "utf-8",
) -> DataFrame:
    """All text lines of every member (optionally filtered by suffix, e.g.
    ``_out.txt``) of every zip under ``path``."""
    raw = spark.read.format("binaryFile").load(path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for zpath, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for name in zf.namelist():
                        if member_suffix and not name.endswith(member_suffix):
                            continue
                        text = zf.read(name).decode(encoding)
                        for i, line in enumerate(text.splitlines()):
                            rows.append((zpath, name, i, line))
            yield pd.DataFrame(
                rows, columns=["zip_path", "member", "line_no", "line"]
            )

    return raw.select("path", "content").mapInPandas(
        extract, schema=MEMBER_SCHEMA
    )


def zip_member_csv(
    spark: SparkSession,
    path: str,
    member_suffix: str,
    delimiter: str = ",",
    encoding: str = "utf-8",
) -> DataFrame:
    """Parse the matching members as headered CSV: header taken from each
    member's line 0, values split on the delimiter.  Suits the fixed-width
    result schemas of the geocode zips; for arbitrary quoting use the lines
    output with spark.read.csv over a re-staged directory."""
    lines = read_zip_lines(spark, path, member_suffix, encoding)
    header = (
        lines.filter(F.col("line_no") == 0)
        .select("member", F.split("line", delimiter).alias("__cols"))
    )
    body = lines.filter(F.col("line_no") > 0).select(
        "zip_path", "member", "line_no", F.split("line", delimiter).alias("__vals")
    )
    joined = body.join(F.broadcast(header), "member")
    return joined.select(
        "zip_path",
        "member",
        F.map_from_arrays(
            F.col("__cols"),
            F.slice(
                F.concat(
                    F.col("__vals"),
                    F.array_repeat(
                        F.lit(None).cast("string"),
                        F.greatest(
                            F.size("__cols") - F.size("__vals"), F.lit(0)
                        ),
                    ),
                ),
                1,
                F.size("__cols"),
            ),
        ).alias("record"),
    )
