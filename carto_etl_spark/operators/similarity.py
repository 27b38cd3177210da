"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one narrow scan, JVM-side arithmetic via
``aggregate``/``zip_with``, no UDFs.  Scale path: LSH bucketing with random
hyperplanes (deterministic, seeded) so the scan only scores candidate buckets;
and a near-dup variant that joins embeddings bucket-to-bucket instead of
all-pairs.

At 100 TB the brute-force path is still sometimes right (it is a single
pass, perfectly parallel, no shuffle for per-query top-k — Spark's takeOrdered
tree-aggregates per partition); the LSH path trades recall for touching only
~1/2^planes of the data per query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot_expr(a, b):
    """Dot product of two array columns via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    """Cosine similarity; NULL when either norm is 0."""
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def _query_lit(query_vec: list[float]):
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against one query vector.  The embedding is
    cast to double before arithmetic so results are engine-portable."""
    q = _query_lit(query_vec)
    emb = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        cosine_expr(emb, q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane / sign) bucketing
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes without numpy RNG
    state: a simple LCG -> uniform(-1,1) per coordinate.  Stable across runs
    and engines."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def signature_bits_expr(vec, planes: list[list[float]]):
    """LSH signature: one bit per hyperplane (sign of the dot product),
    packed into a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot_expr(vec, F.array(*[F.lit(float(v)) for v in plane]))
        sig = sig + F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    emb = F.col(vec_col).cast("array<double>")
    return df.withColumn(out_col, signature_bits_expr(emb, planes))


def query_signature(
    query_vec: list[float], n_planes: int = 8, seed: int = 42
) -> int:
    """LSH signature of a query vector, computed driver-side with the same
    left-to-right dot-product fold the executors use."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qsig = 0
    for i, plane in enumerate(planes):
        d = 0.0
        for a, b in zip(query_vec, plane):
            d += float(a) * float(b)
        if d >= 0:
            qsig |= 1 << i
    return qsig


def ann_candidates(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    n_planes: int = 8,
    hamming_radius: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Rows whose LSH bucket is within ``hamming_radius`` of the query's
    bucket — the pruned candidate set ann_topk scores."""
    dim = len(query_vec)
    bucketed = with_lsh_buckets(df, vec_col, n_planes, dim, seed)
    qsig = query_signature(query_vec, n_planes, seed)
    return bucketed.filter(
        F.bit_count(F.col("lsh_bucket").bitwiseXOR(F.lit(qsig))) <= hamming_radius
    )


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    hamming_radius: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket is within
    ``hamming_radius`` of the query's bucket.  With 8 planes and radius 1 the
    scan touches ~(1+8)/256 of the data; the bucket predicate pushes into the
    scan when buckets are precomputed + partitioned."""
    candidates = ann_candidates(
        df, query_vec, vec_col, n_planes, hamming_radius, seed
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantization via KMeans
# ---------------------------------------------------------------------------

def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    out_col: str = "ivf_list",
    train_rows: int = 100_000,
):
    """Build an IVF index: KMeans coarse quantizer assigns every vector to a
    list (cluster).  Returns (indexed_df, centers).  At scale you persist the
    indexed table partitioned by ``ivf_list`` so a probe-limited query prunes
    entire files.

    The quantizer trains on a bounded SAMPLE (~``train_rows`` rows, seeded
    deterministic), never the full corpus — coarse centroids need only a
    representative sample, and full-corpus KMeans iterations over 100 TB would
    dwarf the indexing job itself.  Assignment (transform) still covers every
    row in one pass."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = df.withColumn(
        "__vec", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    total = with_vec.count()
    if total > train_rows:
        # over-sample slightly so the bound is met with high probability
        fraction = min(1.0, 1.25 * train_rows / total)
        train = with_vec.sample(fraction=fraction, seed=seed).limit(train_rows)
    else:
        train = with_vec
    model = KMeans(k=n_lists, seed=seed, featuresCol="__vec").fit(train)
    indexed = (
        model.transform(with_vec)
        .withColumnRenamed("prediction", out_col)
        .drop("__vec")
    )
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    return indexed, centers


def sampled_centroids(
    df: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random centroid sample: the ``n_lists`` vectors
    whose md5(id-as-string) sorts first.  A hash order is engine-portable
    (any engine with md5 picks the same rows), which makes IVF assignment
    fully reproducible in SQL — the property the KMeans quantizer can't
    offer.  Coarse-quantizer quality barely moves between a random sample
    and a few Lloyd iterations; recall is governed by nprobe either way.

    Returns [(centroid_id, vector)] sorted by centroid_id; driver-side
    collect of n_lists rows (tiny by construction)."""
    rows = (
        df.select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
        .orderBy(F.md5(F.col("__cid").cast("string")), F.col("__cid"))
        .limit(n_lists)
        .collect()
    )
    return sorted((r["__cid"], [float(v) for v in r["__cv"]]) for r in rows)


def assign_ivf_lists(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
) -> DataFrame:
    """Assign every vector to its nearest centroid (euclidean; ties broken by
    centroid id).  The centroid table is a literal expression — the argmin is
    one ``array_min`` over (distance, id) structs, whole-stage codegen, no
    join, no shuffle."""
    emb = F.col(vec_col).cast("array<double>")

    def dist(center: list[float]):
        c = F.array(*[F.lit(float(v)) for v in center])
        return F.sqrt(
            F.aggregate(
                F.zip_with(emb, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    choices = F.array(
        *[
            F.struct(dist(vec).alias("d"), F.lit(cid).alias("cid"))
            for cid, vec in centroids
        ]
    )
    return df.withColumn(out_col, F.array_min(choices)["cid"])


def probe_lists(
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    nprobe: int,
) -> list[int]:
    """The ``nprobe`` centroid ids nearest the query (euclidean, id
    tie-break) — driver-side over the tiny centroid list."""

    def l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (float(x) - float(y)) ** 2
        return acc ** 0.5

    return [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (l2(c[1], query_vec), c[0])
        )[:nprobe]
    ]


def ivf_sampled_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with the hash-sampled quantizer: assign, pick the ``nprobe``
    centroids nearest the query (driver-side over the tiny centroid list),
    score only those lists.  Every step is reproducible in portable SQL."""
    centroids = sampled_centroids(df, n_lists, id_col, vec_col)
    indexed = assign_ivf_lists(df, centroids, vec_col)
    probes = probe_lists(centroids, query_vec, nprobe)
    candidates = indexed.filter(F.col("ivf_list").isin(probes))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def ivf_topk(
    indexed: DataFrame,
    centers: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
) -> DataFrame:
    """Probe-limited cosine top-k: score only the ``nprobe`` lists whose
    centroids are closest to the query (driver-side picks probes over the
    tiny centroid table; executors scan only matching lists)."""
    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probes = sorted(range(len(centers)), key=lambda i: l2(centers[i], query_vec))[
        :nprobe
    ]
    candidates = indexed.filter(F.col(list_col).isin(probes))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket join (same LSH bucket)
    then exact cosine filter.  Shuffle key = bucket, never all-pairs."""
    bucketed = with_lsh_buckets(df, vec_col, n_planes, seed=seed).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        "lsh_bucket",
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine_expr(F.col("a.__v"), F.col("b.__v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then inside each
    cluster drop every item whose cosine to some LOWER-id cluster-mate
    reaches ``threshold`` — the keep-min-id rule, deterministic and
    engine-reproducible (no dependence on scan order).  Near-duplicate
    SEMANTICS (same meaning, different tokens) that survives paraphrase,
    which MinHash/SimHash text dedup cannot see.

    Plan shape: centroid sample (n_clusters-row driver collect), codegen
    argmin assignment (no join), one equi-join keyed by cluster for the
    within-cluster pairs, one groupBy(id) min-aggregate, one left join back.
    Pair volume is sum_i c_i^2 over cluster sizes — the SemDeDup cost model;
    size n_clusters ~ n/target_cluster_size so clusters stay bounded (the
    paper uses ~0.1% of n).  Never all-pairs across clusters.

    Two cost hoists keep the pair stage lean without moving a single float:
    the per-row norm is computed ONCE before the join (sqrt(aggregate(v*v))
    is the identical IEEE op tree whether evaluated per row or per pair, so
    every cosine — dot / (norm_a * norm_b) in that order — is bit-equal to
    the unhoisted form), cutting the interpreted higher-order-function work
    per pair from three array aggregates to one; and the assignment frame is
    materialized ONCE via ``localCheckpoint(eager=True)`` because THREE plan
    branches read it (both join sides and the final left join) — without it
    each branch re-scans the corpus and re-evaluates the n_clusters x dim
    literal argmin.  localCheckpoint rather than ``persist`` deliberately:
    Spark's CacheManager holds SQL caches strongly for the session lifetime
    (see the note in skyline.py), so a per-call ``persist`` leaks one
    corpus-scale cached frame per invocation, while a checkpointed RDD is
    released by the ContextCleaner as soon as the returned DataFrame is
    garbage-collected.  The lineage cut also means no recomputation on
    executor loss — at 100 TB "materialize the assignments, then pair
    within clusters" is the standard SemDeDup staging anyway, typically to
    durable storage; swap in ``.checkpoint()`` with a checkpoint dir for
    fault-tolerant runs.

    Returns the input ids with ``cluster``, ``is_dup`` and ``dup_of`` (the
    smallest cluster-mate id that semantically covers this one; NULL for
    kept items).
    """
    centroids = sampled_centroids(df, n_clusters, id_col, vec_col)
    indexed = assign_ivf_lists(df, centroids, vec_col, out_col="cluster")
    indexed = indexed.localCheckpoint(eager=True)
    sides = indexed.select(
        F.col(id_col).alias("__id"),
        "cluster",
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", norm_expr(F.col("__v")))
    a, b = sides.alias("a"), sides.alias("b")
    dup_of = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .where(
            dot_expr(F.col("a.__v"), F.col("b.__v"))
            / F.nullif(F.col("a.__n") * F.col("b.__n"), F.lit(0.0))
            >= threshold
        )
        .groupBy(F.col("b.__id").alias(id_col))
        .agg(F.min(F.col("a.__id")).alias("dup_of"))
    )
    return (
        indexed.join(dup_of, id_col, "left")
        .withColumn("is_dup", F.col("dup_of").isNotNull())
    )


def pq_codebooks(
    df: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into
    ``n_sub`` contiguous subspaces; each subspace's codebook is the
    corresponding subvectors of the ``n_codes`` corpus rows whose
    md5(id-as-string) sorts first — the same engine-portable sampling as
    ``sampled_centroids``, so an independent SQL engine reproduces every
    codebook entry (k-means codebooks quantize ~15-20% tighter but carry
    unreproducible iteration state; recall at fixed code budget is
    governed by n_sub/n_codes either way).

    Returns ``codebooks[s][c] = subvector`` (driver-side n_codes rows —
    sketch-sized).  Dimension must divide evenly by ``n_sub``."""
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("__v"),
                  F.col(id_col).alias("__id"))
        .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(n_codes)
        .collect()
    )
    rows = sorted((r["__id"], [float(x) for x in r["__v"]]) for r in rows)
    dim = len(rows[0][1])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    w = dim // n_sub
    return [
        [vec[s * w : (s + 1) * w] for _, vec in rows]
        for s in range(n_sub)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Attach the PQ code array: per subspace, the index of the nearest
    codebook entry (squared L2; ties to the smaller code).  Codebooks are
    literal expressions — the whole encoding is one codegen projection, no
    join, no shuffle; at 100 TB this is the map-only pass that shrinks an
    f32 corpus ~(4*dim/n_sub)x for the ADC scan."""
    emb = F.col(vec_col).cast("array<double>")
    n_sub = len(codebooks)
    w = len(codebooks[0][0])

    def code_for(s: int):
        sub = F.slice(emb, s * w + 1, w)
        choices = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in entry]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(c).alias("c"),
            )
            for c, entry in enumerate(codebooks[s])
        ])
        return F.array_min(choices)["c"]

    return df.withColumn(out_col, F.array(*[code_for(s) for s in range(n_sub)]))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the per-subspace lookup
    table dist[s][c] = ||query_sub - codebook[s][c]||^2 is computed
    driver-side (n_sub x n_codes floats) and baked in as literal arrays;
    the scan is then one ``element_at`` chain per row — a fixed-order sum,
    bit-reproducible by any engine fed the same table.  No original
    vectors are read: the scan touches only the code column."""
    n_sub = len(codebooks)
    w = len(codebooks[0][0])
    luts = [
        [
            sum(
                (query_vec[s * w + i] - entry[i]) ** 2
                for i in range(w)
            )
            for entry in codebooks[s]
        ]
        for s in range(n_sub)
    ]
    dist = None
    for s in range(n_sub):
        term = F.element_at(
            F.array(*[F.lit(float(d)) for d in luts[s]]),
            F.col(codes_col)[s] + 1,
        )
        dist = term if dist is None else dist + term
    return (
        encoded.select(
            id_col, F.round(dist, 6).alias("adc_dist")
        )
        .orderBy(F.asc("adc_dist"), F.col(id_col))
        .limit(k)
    )
