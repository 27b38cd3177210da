"""Write-layout clustering: make files carry tight value ranges so manifest
stats (TransactionalTable.read_where) and parquet row-group stats actually
prune.

Two flavors, both ending in ``repartitionByRange`` + ``sortWithinPartitions``
on the clustering key (one shuffle; Spark's range partitioner samples
boundaries, so partitions are balanced even on skewed keys):

- ``cluster_by_morton``: spatial Z-order over web-mercator tile indices
  (functions/geom.py:morton_expr) — the layout CARTO-style point tables and
  overviews want: a bbox/tile query maps to a few Morton ranges, which map to
  a few files.
- ``cluster_by_zorder``: generic multi-column Z-order via per-column
  quantile buckets (approxQuantile boundaries -> bucket index -> bit
  interleave), the same design as Delta's OPTIMIZE ZORDER BY.  Quantile
  bucketing (not min/max scaling) keeps every bit informative under skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from carto_etl_spark.functions.geom import morton_expr, tile_x, tile_y


def cluster_by_morton(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 12,
    out_col: str = "zorder",
    partitions: int | None = None,
) -> DataFrame:
    """Attach a Morton code over zoom-level tiles and range-cluster by it.
    Keep ``out_col`` in the written table (and in ``stats_columns``) so a
    tile-range query can prune files against manifest stats."""
    z = morton_expr(
        tile_x(F.col(lon_col), zoom), tile_y(F.col(lat_col), zoom), zoom
    )
    out = df.withColumn(out_col, z)
    n = partitions or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return out.repartitionByRange(int(n), out_col).sortWithinPartitions(out_col)


def _bucket_expr(col: Column, boundaries: list[float]) -> Column:
    """Bucket index by binary-search-free chained comparisons: boundaries are
    few (2^bits - 1), and the whole thing stays one codegen'd expression."""
    idx = F.lit(0)
    for i, b in enumerate(boundaries):
        idx = F.when(col > F.lit(b), F.lit(i + 1)).otherwise(idx)
    return idx.cast("long")


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 6,
    out_col: str = "zorder",
    partitions: int | None = None,
    relative_error: float = 0.01,
) -> DataFrame:
    """Generic Z-order clustering over numeric columns.  Each column is
    quantile-bucketed into 2^bits ranks (one approxQuantile pass over the
    input, driver gets only the boundaries), then rank bits are interleaved
    round-robin into the clustering key."""
    if not cols:
        raise ValueError("cluster_by_zorder needs at least one column")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucketed: list[Column] = []
    for c in cols:
        qs = df.approxQuantile(c, probs, relative_error)
        boundaries = sorted(set(qs))
        bucketed.append(_bucket_expr(F.col(c).cast("double"), boundaries))
    code = F.lit(0).cast("long")
    k = len(bucketed)
    for bit in range(bits):
        for ci, b in enumerate(bucketed):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1)),
                    bit * k + ci,
                )
            )
    out = df.withColumn(out_col, code)
    n = partitions or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return out.repartitionByRange(int(n), out_col).sortWithinPartitions(out_col)
