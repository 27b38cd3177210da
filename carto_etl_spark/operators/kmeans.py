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

1. assignment: below ``_FOLD_ARGMIN_CAP`` centroid-dims, ONE scan-stage
   argmin expression over the k centroid literals (``array_min`` of
   (distance, cid) structs); above it, ONE numpy int64 matmul per Arrow
   batch (``_assign_bulk_q``) — and because the distances are exact
   integers, the two paths are BIT-IDENTICAL (same values, same lower-cid
   tie rule), so even the unrolled oracle replays either;
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

__all__ = [
    "kmeans_fit",
    "assign_clusters",
    "assign_with_distance",
    "diversity_sample",
    "kmeans_oracle_sql",
    "diversity_oracle_sql",
]


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


#: centroid-dims (k * dim) above which assignment dispatches to the Arrow
#: matmul path.  The fold argmin is an interpreted higher-order function
#: (~0.5 us per ELEMENT — the SCALING.md r6 cliff), i.e. ~k*dim*0.5 us per
#: ROW; the Arrow path is one numpy int64 matmul per batch.  Unlike the
#: float cosine paths, the two are BIT-IDENTICAL (exact integer
#: arithmetic, same tie-break), so the dispatch threshold is purely a
#: performance knob — small instances keep the fold's zero build cost, and
#: the oracle replays either path.
_FOLD_ARGMIN_CAP = 256


def _overflow_guard(cmat, dim: int) -> int:
    """Max |q| the c.c - 2 q.c distance stays exact-in-int64 for; the
    Spark fold raises on overflow (ANSI), so the Arrow path must too
    rather than silently wrapping (numpy int64 wraps)."""
    import numpy as np

    maxc = int(np.abs(cmat).max()) if cmat.size else 0
    if maxc == 0:
        return 2**62
    # |c.c| <= dim*maxc^2; |2 q.c| <= 2*dim*maxq*maxc — require the sum
    # under 2^62 (headroom for the subtraction)
    return max(0, (2**62 - dim * maxc * maxc) // (2 * dim * maxc))


def _assign_bulk_q(
    df: DataFrame,
    q_sql: str,
    centroids: list[list[int]],
    out_col: str,
    scale: int | None = None,
    raw_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment as ONE numpy int64 matmul per Arrow
    batch — the scale path (see ``_FOLD_ARGMIN_CAP``).

    argmin_c sum((q-c)^2) = argmin_c (c.c - 2 q.c): the q.q term is
    constant per row, and in INTEGER arithmetic dropping it preserves
    ties exactly, so the argmin — first minimum over centroids in cid
    order, numpy's tie rule == ``array_min``'s lower-cid rule — is
    bit-identical to the fold.  With ``raw_col`` set the batch quantizes
    inside the UDF (``np.floor(x*scale+0.5)`` — the identical IEEE double
    ops as ``_q_sql``); otherwise the input column already carries
    quantized longs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.array(centroids, dtype=np.int64)  # (k, d) in cid order
    cnorm = (cmat * cmat).sum(axis=1)  # (k,)
    dim = cmat.shape[1]
    maxq_ok = _overflow_guard(cmat, dim)
    s = float(scale) if scale is not None else None

    def _nearest(col):
        if col.isna().any():
            raise ValueError("kmeans assignment: NULL embedding in batch")
        x = np.array(col.tolist(), dtype=np.float64 if s else np.int64)
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(
                f"kmeans assignment: expected fixed dim {dim}, "
                f"got shape {x.shape}"
            )
        q = np.floor(x * s + 0.5).astype(np.int64) if s else x
        if q.size and int(np.abs(q).max()) > maxq_ok:
            raise ArithmeticError(
                "kmeans assignment: quantized coordinate magnitude "
                f"{int(np.abs(q).max())} exceeds the int64-exact envelope "
                f"({maxq_ok}); lower scale"
            )
        d2 = cnorm - 2 * (q @ cmat.T)  # (b, k) exact int64
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    _nearest.__annotations__ = {"col": pd.Series, "return": pd.Series}
    nearest = pandas_udf(_nearest, "int")
    src = (
        F.col(raw_col).cast("array<double>")
        if raw_col is not None
        else F.expr(q_sql)
    )
    return df.withColumn(out_col, nearest(src))


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


def _pick_method(method: str, centroids: list[list[int]]) -> str:
    if method not in ("auto", "fold", "arrow"):
        raise ValueError(f"method must be auto|fold|arrow, got {method!r}")
    if method != "auto":
        return method
    work = len(centroids) * (len(centroids[0]) if centroids else 0)
    return "arrow" if work > _FOLD_ARGMIN_CAP else "fold"


def assign_clusters(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    scale: int = 10**6,
    out_col: str = "cluster",
    method: str = "auto",
) -> DataFrame:
    """Nearest-centroid assignment (squared integer L2; ties to the lower
    cluster id).  ``method="fold"`` is one scan-stage expression — no
    join, no shuffle; ``"arrow"`` is one numpy int64 matmul per Arrow
    batch; ``"auto"`` picks arrow above ``_FOLD_ARGMIN_CAP`` centroid-dims
    (the interpreted-HOF cliff).  The two are bit-identical — exact
    integer distances, same lower-cid tie rule (equality-tested in
    tests/test_kmeans.py)."""
    if _pick_method(method, centroids) == "arrow":
        return _assign_bulk_q(
            df, "", centroids, out_col, scale=scale, raw_col=vec_col
        )
    return df.withColumn(
        out_col, _argmin_expr(_q_sql(vec_col, scale), centroids)
    )


def assign_with_distance(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    scale: int = 10**6,
    method: str = "auto",
) -> DataFrame:
    """`assign_clusters` that also emits the EXACT squared integer L2 to
    the winning centroid (``cluster`` int, ``dist`` long) — the quantity
    diversity sampling, medoid picking, and outlier triage rank on.

    ``method="fold"`` reuses the scan-stage argmin struct and reads both
    fields; ``"arrow"`` extends the matmul path with the q.q term (the
    argmin drops it as a per-row constant, the true distance needs it
    back) and returns a struct column from one pandas_udf.  Bit-identical
    by the same argument as `assign_clusters` — exact integers, lower-cid
    ties (equality-tested)."""
    if _pick_method(method, centroids) == "arrow":
        return _assign_bulk_q_dist(df, centroids, vec_col, scale)
    q = _q_sql(vec_col, scale)
    choices = ", ".join(
        f"named_struct('d', {_dist_sql(q, c)}, 'c', {cid})"
        for cid, c in enumerate(centroids)
    )
    best = F.expr(f"array_min(array({choices}))")
    out = df.withColumn("__best", best)
    return (
        out.withColumn("cluster", F.col("__best.c").cast("int"))
        .withColumn("dist", F.col("__best.d").cast("long"))
        .drop("__best")
    )


def _assign_bulk_q_dist(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str,
    scale: int,
) -> DataFrame:
    """Arrow twin of the with-distance fold: d(q,c) = c.c - 2 q.c + q.q,
    all exact int64.  The overflow guard tightens to the FULL distance
    (dim * (maxq + maxc)^2 must stay under 2^62 — the argmin-only path
    could drop the q.q term, this one cannot)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.array(centroids, dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)
    dim = cmat.shape[1]
    maxc = int(np.abs(cmat).max()) if cmat.size else 0
    maxq_ok = max(0, int((2**62 // max(dim, 1)) ** 0.5) - maxc - 1)
    s = float(scale)

    def _nearest(col):
        if col.isna().any():
            raise ValueError("kmeans assignment: NULL embedding in batch")
        x = np.array(col.tolist(), dtype=np.float64)
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(
                f"kmeans assignment: expected fixed dim {dim}, "
                f"got shape {x.shape}"
            )
        q = np.floor(x * s + 0.5).astype(np.int64)
        if q.size and int(np.abs(q).max()) > maxq_ok:
            raise ArithmeticError(
                "kmeans assignment: quantized coordinate magnitude "
                f"{int(np.abs(q).max())} exceeds the int64-exact distance "
                f"envelope ({maxq_ok}); lower scale"
            )
        qnorm = (q * q).sum(axis=1)
        d2 = cnorm - 2 * (q @ cmat.T) + qnorm[:, None]
        cid = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {
                "c": cid.astype(np.int32),
                "d": d2[np.arange(len(cid)), cid].astype(np.int64),
            }
        )

    _nearest.__annotations__ = {"col": pd.Series, "return": pd.DataFrame}
    nearest = pandas_udf(_nearest, "struct<c:int,d:bigint>")
    out = df.withColumn("__best", nearest(F.col(vec_col).cast("array<double>")))
    return (
        out.withColumn("cluster", F.col("__best.c"))
        .withColumn("dist", F.col("__best.d"))
        .drop("__best")
    )


def diversity_sample(
    df: DataFrame,
    k: int,
    m: int = 2,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Cluster-stratified diversity sampling (the SemDeDup-adjacent
    curation move: cover the embedding space, don't sample it i.i.d.):
    fixed-point Lloyd fit, exact-distance assignment, and the ``m``
    nearest-to-centroid representatives per cluster — every step exact
    integers, so the whole chain unrolls into `diversity_oracle_sql`.
    Returns (id, cluster, dist, rank), rank 1-based within cluster; one
    window PARTITIONED by cluster, never global."""
    from pyspark.sql import Window

    cents = kmeans_fit(
        df, k, iterations=iterations, id_col=id_col, vec_col=vec_col,
        scale=scale,
    )
    ad = assign_with_distance(df, cents, vec_col=vec_col, scale=scale)
    w = Window.partitionBy("cluster").orderBy("dist", F.col(id_col))
    return (
        ad.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select(id_col, "cluster", "dist", F.col("rank").cast("int").alias("rank"))
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    method: str = "auto",
) -> list[list[int]]:
    """Run ``iterations`` Lloyd rounds; returns the final centroid table
    (k lists of dim quantized longs) for ``assign_clusters``.
    Deterministic: md5-sampled init, integer arithmetic, no RNG.
    ``method`` picks the per-iteration assignment path (see
    ``assign_clusters``) — the fold and Arrow paths are bit-identical, so
    the fitted centroids do not depend on the choice."""
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
        if _pick_method(method, centroids) == "arrow":
            assigned = _assign_bulk_q(qdf, "__q", centroids, "__cl")
        else:
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


def _oracle_chain(
    rows_sql: str,
    k: int,
    iterations: int,
    id_col: str,
    vec_sql: str,
    scale: int,
    dim: int,
) -> tuple[list, str]:
    """The unrolled fit WITH-chain (quantize, init, one assignment + one
    centroid CTE per Lloyd round) shared by `kmeans_oracle_sql` and
    `diversity_oracle_sql`; returns (parts, dist_expr)."""
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
    return parts, dist


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
    parts, dist = _oracle_chain(
        rows_sql, k, iterations, id_col, vec_sql, scale, dim
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


def diversity_oracle_sql(
    rows_sql: str,
    k: int,
    m: int = 2,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_sql: str = "CAST(embedding AS DOUBLE[])",
    scale: int = 10**6,
    dim: int = 64,
) -> str:
    """DuckDB twin of `diversity_sample`: the shared fit chain, then per
    row the winning centroid AND its exact distance (two scalar
    subqueries over the same ordering), then the per-cluster
    nearest-first ranking."""
    parts, dist = _oracle_chain(
        rows_sql, k, iterations, id_col, vec_sql, scale, dim
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
fin AS MATERIALIZED (
  SELECT {id_col},
         CAST((SELECT c.cid FROM c{iterations} c
               ORDER BY {dist}, c.cid LIMIT 1) AS INT) AS cluster,
         CAST((SELECT {dist} FROM c{iterations} c
               ORDER BY {dist}, c.cid LIMIT 1) AS BIGINT) AS dist
  FROM q0)
SELECT {id_col}, cluster, dist,
       CAST(rn AS INT) AS rank
FROM (
  SELECT {id_col}, cluster, dist,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY dist, {id_col}) AS rn
  FROM fin)
WHERE rn <= {m}"""
    )
