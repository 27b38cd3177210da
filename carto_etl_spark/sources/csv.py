"""CSV (and parquet) sources with the reference's scan semantics (S1-S8).

- header normalization: strip + lowercase (InsensitiveDictReader,
  /root/reference/etl/etl.py:70-73) — done once at scan so the whole plan is
  case-normalized; Spark's default case-insensitive resolution covers lookups.
- encoding / delimiter / unbounded field width (etl/etl.py:127-139) via reader
  options, all pushed into Spark's vectorized CSV scan.
- row/chunk indexing: the reference's chunk membership is file-row order
  (etl/etl.py:300-305).  ``with_row_index`` pins a contiguous 0-based index
  without a global sort: per-partition row_number + cumulative partition
  offsets (a driver-side collect of #partitions rows — O(partitions), not
  O(rows), so it scales).  When the required order is a KEY order rather
  than file order, use ``operators.ranking.with_keyed_row_index`` — the
  same offset design over deterministic range buckets, never a
  single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from carto_etl_spark.config import JobConfig
from carto_etl_spark.session import local_df


def normalize_headers(df: DataFrame) -> DataFrame:
    """Strip + lowercase all column names (reference S2)."""
    return df.toDF(*[c.strip().lower() for c in df.columns])


def read_csv(
    spark: SparkSession,
    path: str,
    cfg: JobConfig | None = None,
    schema=None,
) -> DataFrame:
    """Headered CSV scan with configured delimiter/encoding, unbounded field
    width, and normalized headers.  All columns arrive as strings unless a
    schema is given — typing happens in the coercion layer, mirroring the
    reference's parse-at-emit model."""
    cfg = cfg or JobConfig()
    reader = (
        spark.read.option("header", True)
        .option("sep", cfg.delimiter)
        .option("encoding", cfg.file_encoding)
        .option("maxCharsPerColumn", -1)
        .option("multiLine", False)
        # RFC-4180 doubled-quote unescaping ("qu""ote" -> qu"ote), matching the
        # reference's csv.DictReader (doublequote=True, no backslash escapes).
        # Spark's default escape char is backslash, which leaves "" unparsed.
        .option("escape", '"')
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)
    return normalize_headers(reader.csv(path))


def with_row_index(df: DataFrame, name: str = "row_idx") -> DataFrame:
    """Attach a contiguous 0-based row index in partition order without a
    global shuffle.

    ``monotonically_increasing_id`` already encodes (partition, local offset)
    but is non-contiguous across partitions; chunk semantics
    (floor(row_idx / chunk_size), reference S7) need contiguity.  We compute
    per-partition counts (tiny aggregate), turn them into cumulative offsets on
    the driver, and broadcast-join them back — the classic zipWithIndex design
    without leaving the DataFrame API.
    """
    pid = F.spark_partition_id().alias("__pid")
    mid = F.monotonically_increasing_id().alias("__mid")
    indexed = df.select("*", pid, mid)

    counts = (
        indexed.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets: dict[int, int] = {}
    running = 0
    for row in counts:
        offsets[row["__pid"]] = running
        running += row["count"]

    spark = df.sparkSession
    offsets_df = local_df(
        spark, [(p, o) for p, o in offsets.items()], "__pid int, __offset long"
    )
    local_rn = F.row_number().over(
        Window.partitionBy("__pid").orderBy("__mid")
    )
    return (
        indexed.withColumn("__local", local_rn - 1)
        .join(F.broadcast(offsets_df), "__pid")
        .withColumn(name, F.col("__offset") + F.col("__local"))
        .drop("__pid", "__mid", "__local", "__offset")
    )


def with_chunk_id(
    df: DataFrame,
    chunk_size: int,
    row_index_col: str = "row_idx",
    name: str = "chunk_id",
) -> DataFrame:
    """1-based chunk id from a row index (documented chunk semantics,
    reference README.md:125-126 — NOT the buggy ``chunks()`` indexing, see
    SURVEY §2.1 S7)."""
    return df.withColumn(
        name, (F.col(row_index_col) / F.lit(chunk_size)).cast("long") + 1
    )


def chunk_range_filter(
    df: DataFrame,
    start_chunk: int = 1,
    end_chunk: int | None = None,
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Resume/stop offsets in chunk units: skip chunks < start, stop after end
    (README.md:125-126)."""
    out = df.filter(F.col(chunk_col) >= start_chunk)
    if end_chunk is not None:
        out = out.filter(F.col(chunk_col) <= end_chunk)
    return out


def row_range_filter(
    df: DataFrame,
    start_row: int = 1,
    end_row: int | None = None,
    row_index_col: str = "row_idx",
) -> DataFrame:
    """UpdateJob's row-range scan (etl/etl.py:325-330): 0-based row_num, skip
    rows < start_row-1, stop at row_num >= end_row."""
    out = df.filter(F.col(row_index_col) >= start_row - 1)
    if end_row is not None:
        out = out.filter(F.col(row_index_col) < end_row)
    return out
