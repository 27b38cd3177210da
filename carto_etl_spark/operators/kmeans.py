"""Fixed-point Lloyd k-means over embedding columns — the canonical
iterative unsupervised-learning leg of the pipeline suite (diversity
bucketing, SemDeDup's coarse stage done properly, corpus cartography),
built on the repo's exact-integer iteration recipe (graph.py pagerank,
classifier.py GD): every Lloyd round is plain integer arithmetic, so an
independent SQL engine UNROLLS the whole fit and replays each centroid
bit-for-bit.  The reference (a SQL-text ETL client, /root/reference/etl/)
has no ML surface; extension scope.

Why fixed point: float centroid means depend on summation order (Spark
partial aggregation is order-unstable), which would make assignments
non-deterministic across runs and engines.  Instead coordinates are
quantized ONCE to integers (``floor(x * scale + 0.5)`` — the quantize.py
convention, identical IEEE double ops in Spark and DuckDB), distances are
integer sums of squares, and centroid updates are integer means with
truncating division (Spark ``div`` == DuckDB ``//``, verified incl.
negatives).  Quantization is the only approximation: at the default
``scale=10**6`` the per-coordinate error is <= 0.5e-6 — far below any
real cluster geometry.

Distributed shape per iteration (centroids are driver-resident, k x dim
longs — the data never leaves executors):

1. assignment: ONE scan-stage argmin expression over the k centroid
   literals (``array_min`` of (distance, cid) structs; fold distances —
   see assign_ivf_lists for when an expansion/Arrow path earns its keep);
2. update: ONE ``groupBy(cluster)`` hash-aggregate with dim+1 partial-agg
   columns (count + per-dimension sums), k rows collected.

One shuffle per iteration, map-side combined.  Empty clusters keep their
previous centroid (deterministic; mirrored by the oracle).

Overflow envelope: |q| <= scale * max|x|; the per-cluster dimension sums
are bounded by n * scale * max|x| — exact in BIGINT up to ~9e12 rows at
the default scale and unit-ish coordinates.  DuckDB sums widen to HUGEINT
and are cast back inside the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from carto_etl_spark.operators.classifier import _tdiv

__all__ = ["kmeans_fit", "assign_clusters", "kmeans_oracle_sql"]


def _q_sql(vec_col: str, scale: int) -> str:
    """Quantized-coordinate expression (array<bigint>); the floor(+0.5)
    form is cross-engine exact (see quantize.py)."""
    return (
        f"transform(CAST(`{vec_col}` AS ARRAY<DOUBLE>), "
        f"x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT))"
    )


def _dist_sql(q_sql: str, center: list[int]) -> str:
    arr = "array(" + ", ".join(f"{int(v)}L" for v in center) + ")"
    return (
        f"aggregate(zip_with({q_sql}, {arr}, "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    )


def _argmin_expr(q_sql: str, centroids: list[list[int]]):
    choices = ", ".join(
        f"named_struct('d', {_dist_sql(q_sql, c)}, 'c', {cid})"
        for cid, c in enumerate(centroids)
    )
    return F.expr(f"array_min(array({choices})).c")


def _init_centroids(
    df: DataFrame, k: int, id_col: str, vec_col: str, scale: int
) -> list[list[int]]:
    """k quantized seed rows by md5(id) order — the engine-portable sample
    every sketch in this repo uses (sampled_centroids, pq_codebooks)."""
    rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.expr(_q_sql(vec_col, scale)).alias("__q"),
        )
        .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(k)
        .collect()
    )
    ordered = sorted((r["__id"], r["__q"]) for r in rows)
    return [[int(v) for v in q] for _, q in ordered]


def assign_clusters(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    scale: int = 10**6,
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment (squared integer L2; ties to the lower
    cluster id) — one scan-stage expression, no join, no shuffle."""
    return df.withColumn(
        out_col, _argmin_expr(_q_sql(vec_col, scale), centroids)
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> list[list[int]]:
    """Run ``iterations`` Lloyd rounds; returns the final centroid table
    (k lists of dim quantized longs) for ``assign_clusters``.
    Deterministic: md5-sampled init, integer arithmetic, no RNG."""
    if k < 1 or iterations < 0:
        raise ValueError("k must be >= 1, iterations >= 0")
    dim = len(df.select(vec_col).first()[0])
    qdf = df.select(
        F.expr(_q_sql(vec_col, scale)).alias("__q")
    ).localCheckpoint(eager=True)
    centroids = _init_centroids(df, k, id_col, vec_col, scale)
    if len(centroids) < k:
        # fail loudly: padding k down would silently diverge from the
        # unrolled oracle (which would emit fewer cids for the same k)
        raise ValueError(
            f"k={k} exceeds the number of rows ({len(centroids)})"
        )
    for _ in range(iterations):
        assigned = qdf.withColumn(
            "__cl", _argmin_expr("__q", centroids)
        )
        agg = assigned.groupBy("__cl").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.element_at("__q", i + 1)).alias(f"__s{i}")
                for i in range(dim)
            ],
        ).collect()
        new = {
            r["__cl"]: [
                _tdiv(int(r[f"__s{i}"]), int(r["__n"])) for i in range(dim)
            ]
            for r in agg
        }
        # empty clusters keep their previous centroid
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids


def kmeans_oracle_sql(
    rows_sql: str,
    k: int,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_sql: str = "CAST(embedding AS DOUBLE[])",
    scale: int = 10**6,
    dim: int = 64,
) -> str:
    """The whole fit + final assignment unrolled into a WITH-chain DuckDB
    replays bit-for-bit (one assignment + one centroid CTE per iteration,
    every CTE MATERIALIZED — plain CTEs inline per reference and the
    chain references each round twice).  ``rows_sql`` must yield
    (``id_col``, the embedding column).  Emits (id_col, cluster)."""
    dist = (
        "list_sum(list_transform(list_zip(q, c.v), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    parts = [
        f"""q0 AS MATERIALIZED (
  SELECT {id_col},
         list_transform({vec_sql},
                        x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS q
  FROM ({rows_sql}) r)""",
        f"""c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY {id_col}) - 1 AS INT) AS cid, q AS v
  FROM (SELECT {id_col}, q FROM q0
        ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} LIMIT {k}))""",
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""a{t} AS MATERIALIZED (
  SELECT {id_col}, q,
         (SELECT c.cid FROM c{p} c ORDER BY {dist}, c.cid LIMIT 1) AS cl
  FROM q0)"""
        )
        parts.append(
            f"""c{t} AS MATERIALIZED (
  SELECT cid, v FROM (
    SELECT cl AS cid, list(s ORDER BY pos) AS v FROM (
      SELECT cl, CAST(u.l[2] AS INT) AS pos,
             CAST(CAST(SUM(u.l[1]) AS BIGINT) // COUNT(*) AS BIGINT) AS s
      FROM a{t}, unnest(list_zip(q, range(1, {dim + 1}))) AS u(l)
      GROUP BY cl, pos) g
    GROUP BY cl) upd
  UNION ALL
  SELECT cid, v FROM c{p}
  WHERE cid NOT IN (SELECT DISTINCT cl FROM a{t}))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT {id_col},
       CAST((SELECT c.cid FROM c{iterations} c
             ORDER BY {dist}, c.cid LIMIT 1) AS INT) AS cluster
FROM q0"""
    )
