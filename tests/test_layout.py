"""Morton/Z-order clustering and its composition with file-level skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from carto_etl_spark.functions.geom import morton_expr
from carto_etl_spark.operators.layout import cluster_by_morton, cluster_by_zorder
from carto_etl_spark.operators.transactional import TransactionalTable


def test_morton_known_values(spark):
    cases = [
        # (x, y, zoom, expected): hand-interleaved bits
        (0, 0, 1, 0), (1, 0, 1, 1), (0, 1, 1, 2), (1, 1, 1, 3),
        (2, 1, 2, 6), (3, 3, 2, 15), (5, 0, 3, 17),
    ]
    df = spark.createDataFrame(
        [(x, y, z, exp) for x, y, z, exp in cases], ["x", "y", "z", "exp"]
    )
    for zoom in {c[2] for c in cases}:
        rows = (
            df.filter(F.col("z") == zoom)
            .select("exp", morton_expr(F.col("x"), F.col("y"), zoom).alias("m"))
            .collect()
        )
        for r in rows:
            assert r["m"] == r["exp"]


def test_morton_clustering_tightens_file_ranges(spark, tmp_path):
    # 4k points spread over the globe, written unclustered vs Morton-clustered
    # into transactional tables with stats on the zorder column: a small
    # zorder range must touch far fewer files in the clustered layout.
    pts = spark.range(4000).select(
        (F.col("id") % 360 - 180 + 0.5).cast("double").alias("lon"),
        ((F.col("id") * 7 % 160) - 80 + 0.5).cast("double").alias("lat"),
    )
    clustered = cluster_by_morton(pts, zoom=8, partitions=8)

    t = TransactionalTable(spark, tmp_path / "clustered",
                           stats_columns=["zorder"])
    t.append(clustered)
    files_total = len(t.read().inputFiles())
    assert files_total >= 8

    zmax = clustered.agg(F.max("zorder")).first()[0]
    pruned = t.read_where("zorder", lo=0, hi=zmax // 8)
    assert len(pruned.inputFiles()) <= max(2, files_total // 4)
    # results identical to a plain filter over the full table
    expected = t.read().filter(F.col("zorder") <= zmax // 8).count()
    assert pruned.count() == expected


def test_generic_zorder_buckets_both_columns(spark, tmp_path):
    df = spark.range(2000).select(
        F.col("id").cast("double").alias("a"),
        ((F.col("id") * 37) % 2000).cast("double").alias("b"),
    )
    out = cluster_by_zorder(df, ["a", "b"], bits=4, partitions=4)
    # the key must depend on BOTH columns: restricting either column's range
    # restricts the zorder range
    lo_a = out.filter("a < 100").agg(F.max("zorder")).first()[0]
    hi_a = out.filter("a > 1900").agg(F.min("zorder")).first()[0]
    assert lo_a is not None and hi_a is not None
    full = out.agg(F.max("zorder")).first()[0]
    assert lo_a < full  # low-a rows cannot reach the top of the key space
    assert out.count() == 2000
