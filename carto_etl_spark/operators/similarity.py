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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a, b):
    """Dot product of two array columns via zip_with + aggregate (JVM-side,
    dimension-agnostic).  NOTE: higher-order functions are CodegenFallback —
    Catalyst evaluates them INTERPRETED at ~0.5 us per element, which is the
    whole cost of a vector scan at corpus scale (measured: a 505k x 64-dim
    signature pass pinned 32 cores for minutes).  Whenever the dimension is
    statically known, use ``dot_fixed_expr`` — identical IEEE result, whole-
    stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def arr_lit_sql(vals) -> str:
    """A literal double array as ONE SQL fragment.  ``repr`` of a float is
    the shortest round-trip decimal and string->double casts are correctly
    rounded, so each element is bit-identical to ``F.lit(v)``."""
    return (
        "array("
        + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals)
        + ")"
    )


def _dot_fixed_sql(a_sql: str, b_sql: str, dim: int) -> str:
    # FLAT sum, no accumulator parens: SQL + is left-associative, so the
    # parse tree (and therefore the IEEE evaluation order) is identical to
    # the explicitly nested form — but ANTLR parses the flat chain
    # iteratively, while ~400-deep nested parens cost SECONDS per
    # expression in recursive descent
    terms = " + ".join(
        f"(get({a_sql}, {i}) * get({b_sql}, {i}))" for i in range(dim)
    )
    return f"(CAST(0.0 AS DOUBLE) + {terms})" if dim else "CAST(0.0 AS DOUBLE)"


def dot_fixed_expr(a, b, dim: int):
    """Dot product with a STATICALLY KNOWN dimension, expanded to a chain of
    ``get(a,i) * get(b,i)`` terms — plain arithmetic that stays inside
    whole-stage codegen (~100x the interpreted HOF throughput at 64 dims).

    Bit-identical to ``dot_expr``: the expansion starts from the same 0.0
    seed and adds products in the same left-to-right order (explicit
    parentheses in the SQL form), so every IEEE rounding step matches the
    fold.  ``get`` (0-based) returns NULL past the array end instead of the
    ANSI element_at error, so a short/NULL vector yields NULL exactly like
    the zip_with path.

    Operands may be Columns OR SQL fragments (strings).  Prefer strings:
    the Column form costs ~4 py4j round-trips per term (~0.3 s per 64-dim
    expression, seconds per operator build), while the SQL form is ONE
    round-trip parsed JVM-side."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_fixed_sql(a, b, dim))
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i) * F.get(b, i)
    return acc


def _norm_fixed_sql(a_sql: str, dim: int) -> str:
    terms = " + ".join(
        f"(get({a_sql}, {i}) * get({a_sql}, {i}))" for i in range(dim)
    )
    body = f"(CAST(0.0 AS DOUBLE) + {terms})" if dim else "CAST(0.0 AS DOUBLE)"
    return f"sqrt({body})"


def norm_fixed_expr(a, dim: int):
    """``norm_expr`` with the expansion of ``dot_fixed_expr`` (same 0.0 seed
    and term order — bit-identical), codegen-friendly.  Column or SQL-string
    operand, same trade-off as ``dot_fixed_expr``."""
    if isinstance(a, str):
        return F.expr(_norm_fixed_sql(a, dim))
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i) * F.get(a, i)
    return F.sqrt(acc)


def cosine_expr(a, b):
    """Cosine similarity; NULL when either norm is 0."""
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def cosine_fixed_expr(a, b, dim: int):
    """``cosine_expr`` on the codegen expansion (``dot_fixed_expr`` /
    ``norm_fixed_expr``) — bit-identical values, ~100x the scan throughput.
    Use whenever the embedding dimension is known (it always is after one
    ``len(first()[vec_col])`` probe).  Column or SQL-string operands (see
    ``dot_fixed_expr``)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"({_dot_fixed_sql(a, b, dim)}) / "
            f"nullif({_norm_fixed_sql(a, dim)} * {_norm_fixed_sql(b, dim)},"
            " CAST(0.0 AS DOUBLE))"
        )
    return dot_fixed_expr(a, b, dim) / F.nullif(
        norm_fixed_expr(a, dim) * norm_fixed_expr(b, dim), F.lit(0.0)
    )


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
    emb_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    scored = df.select(
        F.col(id_col),
        cosine_fixed_expr(
            emb_sql, arr_lit_sql(query_vec), len(query_vec)
        ).alias("cosine"),
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


def _fold_dot_sql(vec_sql: str, plane: list[float]) -> str:
    """The HOF fold dot product as ONE SQL fragment — the exact
    ``dot_expr`` tree (zip_with product, 0.0-seeded left aggregate), so
    values are bit-identical to both ``dot_expr`` and the expansion.  Used
    by toy-scale signatures where the expansion's ~2000-node tree costs
    ~3 s of Catalyst ANALYSIS per query build (measured at 8 planes x 64
    dims) for zero runtime benefit on 500-row frames."""
    return (
        f"aggregate(zip_with({vec_sql}, {arr_lit_sql(plane)}, "
        "(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def signature_bits_expr(vec, planes: list[list[float]], expansion: bool = True):
    """LSH signature: one bit per hyperplane (sign of the dot product),
    packed into a long.  The plane dot products use the codegen expansion
    (``dot_fixed_expr`` — plane length is statically known): the interpreted
    HOF form pinned every core for minutes on a 505k x 64-dim signature
    scan; the values are bit-identical.  ``vec`` may be a SQL fragment
    (string) — then the WHOLE signature is one parsed expression, one py4j
    round-trip instead of thousands.  Signatures are capped at 63 planes:
    the SQL-string path emits each bit as a ``{1 << i}L`` literal, and the
    i=63 term (2^63) exceeds Long.MAX — fail loudly here rather than with a
    parse error (string path) or a sign-flipped bucket (Column path)."""
    if len(planes) > 63:
        raise ValueError(
            f"signature_bits_expr packs bits into a signed 64-bit long; "
            f"n_planes must be <= 63, got {len(planes)} (use multiple bands "
            "of <=63 planes each instead)"
        )
    if isinstance(vec, str):
        def dot_sql(plane: list[float]) -> str:
            if expansion:
                return _dot_fixed_sql(vec, arr_lit_sql(plane), len(plane))
            # fold form (bit-identical): toy frames, where build-time
            # analysis of the expansion dominates the whole query
            return _fold_dot_sql(vec, plane)

        cases = " + ".join(
            f"(CASE WHEN ({dot_sql(plane)})"
            f" >= CAST(0.0 AS DOUBLE) THEN {1 << i}L ELSE 0L END)"
            for i, plane in enumerate(planes)
        )
        return F.expr(f"CAST(0 AS BIGINT) + {cases}")
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot_fixed_expr(
            vec, F.array(*[F.lit(float(v)) for v in plane]), len(plane)
        )
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
    expansion: bool = True,
) -> DataFrame:
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    emb_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    return df.withColumn(
        out_col, signature_bits_expr(emb_sql, planes, expansion=expansion)
    )


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
    expansion: bool = True,
) -> DataFrame:
    """Rows whose LSH bucket is within ``hamming_radius`` of the query's
    bucket — the pruned candidate set ann_topk scores.  ``expansion``
    passes through to the signature build (see with_lsh_buckets): False
    keeps toy/oracle-pinned frames off the doomed >hugeMethodLimit codegen
    compile of an 8x64 expanded signature tree."""
    dim = len(query_vec)
    bucketed = with_lsh_buckets(
        df, vec_col, n_planes, dim, seed, expansion=expansion
    )
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


#: literal-argmin width cap: above ~2048 centroid-dims (32 lists x 64 dims)
#: the generated expression falls out of whole-stage codegen and Catalyst
#: evaluates the higher-order functions INTERPRETED per element — measured
#: 0.44 ms/row at 256x64 on local[32], i.e. ~hours for a 500k-row corpus.
#: Past the cap, assignment dispatches to the Arrow/numpy bulk path.
_LITERAL_ARGMIN_CAP = 2048

#: list count at which semantic_dedup_bulk's coarse stage switches from the
#: flat bulk matmul (exact argmin, O(n*k*dim)) to the two-level
#: assign_ivf_lists_hier (approximate, O(n*2*sqrt(k)*dim)) — with the
#: SemDeDup k ~ n/target sizing the flat form is quadratic in the corpus
_HIER_ASSIGN_MIN_LISTS = 512


def assign_ivf_lists(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
    force_literal: bool = False,
    expansion: bool = True,
) -> DataFrame:
    """Assign every vector to its nearest centroid (euclidean; ties broken by
    centroid id).

    Small centroid tables (<= ``_LITERAL_ARGMIN_CAP`` centroid-dims — every
    oracle-checked catalog entry): the centroid table is a literal
    expression — the argmin is one ``array_min`` over (distance, id)
    structs, whole-stage codegen, no join, no shuffle, and bit-reproducible
    by an independent SQL engine.

    Large centroid tables (real deployments: n_lists ~ sqrt(n)): the
    literal expression exceeds codegen limits and Catalyst falls back to
    per-element interpreted evaluation of the distance fold — O(n_lists *
    dim) interpreted ops PER ROW.  ``assign_ivf_lists_bulk`` instead ships
    the centroid matrix to executors once and computes the argmin as one
    numpy matmul per Arrow batch (the FAISS coarse-assign shape) —
    measured >100x faster at 256+ lists.  Same nearest-centroid semantics;
    ties between EXACTLY equal distances resolve to the smallest centroid
    id on both paths, but the two paths' float rounding differs in the
    last ulp (expansion vs direct sum), so force the literal path when an
    oracle must replay the assignment.

    ``out_col`` carries the centroid id: BIGINT for integral ids on both
    paths (the literal path emits ``{cid}L`` literals, the bulk path an
    int64 pandas_udf — widened from the pre-r6 INT so the two paths agree
    and downstream unions/joins never see a path-dependent schema), STRING
    for string ids.

    ``expansion=False`` swaps each literal distance for its HOF-fold form
    (bit-identical: same per-element op, same 0.0 seed, same left-to-right
    order) — for oracle-pinned TOY entries, where Catalyst's analysis of
    the ~4-nodes-per-term expanded tree costs seconds per query BUILD and
    the frame is a few hundred rows; scale paths keep the expansion (or
    cross the cap into the Arrow path regardless)."""
    dim = len(centroids[0][1]) if centroids else 0
    if not force_literal and len(centroids) * dim > _LITERAL_ARGMIN_CAP:
        return assign_ivf_lists_bulk(df, centroids, vec_col, out_col)
    emb_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"

    def dist_sql(center: list[float]) -> str:
        # codegen expansion (same 0.0 seed + term order as the zip_with
        # fold -> bit-identical; HOFs are interpreted and ~100x slower);
        # built as ONE SQL fragment — the Column form cost ~4 py4j round
        # trips per term (~5 s to BUILD the 8x64 argmin)
        if not expansion:
            return (
                f"sqrt(aggregate(zip_with({emb_sql}, "
                f"{arr_lit_sql(center)}, (x, y) -> (x - y) * (x - y)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
            )
        terms = []
        for i, v in enumerate(center):
            t = f"(get({emb_sql}, {i}) - CAST('{float(v)!r}' AS DOUBLE))"
            terms.append(f"({t} * {t})")
        return f"sqrt(CAST(0.0 AS DOUBLE) + {' + '.join(terms)})"

    def cid_lit(cid) -> str:
        if isinstance(cid, str):
            return "'" + cid.replace("'", "''") + "'"
        return f"{int(cid)}L"

    choices = ", ".join(
        f"named_struct('d', {dist_sql(vec)}, 'cid', {cid_lit(cid)})"
        for cid, vec in centroids
    )
    return df.withColumn(
        out_col, F.expr(f"array_min(array({choices})).cid")
    )


def assign_ivf_lists_bulk(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
) -> DataFrame:
    """Nearest-centroid assignment as ONE numpy matmul per Arrow batch —
    the scale path for large coarse quantizers (see ``assign_ivf_lists``).

    argmin_c ||x - c||^2 = argmin_c (c.c - 2 x.c): the x.x term is constant
    per row, so the whole batch assigns with ``-2 * X @ C.T + cnorms`` —
    BLAS work, not per-element interpretation.  The centroid matrix rides
    the UDF closure (n_lists x dim doubles — a few MB at worst, broadcast
    once per executor).  Ties: centroids are sorted by id and
    ``np.argmin`` returns the first minimum, so exact ties resolve to the
    smallest centroid id, matching the literal path.  Embeddings must be
    non-null, fixed-dim (raises otherwise rather than guessing)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    srt = sorted(centroids)
    if srt and isinstance(srt[0][0], str):
        cids = np.array([cid for cid, _ in srt], dtype=object)
        cid_type = "string"
    else:
        cids = np.array([cid for cid, _ in srt], dtype=np.int64)
        cid_type = "long"
    cmat = np.array([v for _, v in srt], dtype=np.float64)  # (k, d)
    cnorms = (cmat * cmat).sum(axis=1)  # (k,)

    def _nearest(col):
        if col.isna().any():
            raise ValueError(
                "assign_ivf_lists_bulk: NULL embedding in batch"
            )
        x = np.array(col.tolist(), dtype=np.float64)  # (b, d)
        if x.ndim != 2 or x.shape[1] != cmat.shape[1]:
            raise ValueError(
                f"assign_ivf_lists_bulk: expected fixed dim "
                f"{cmat.shape[1]}, got shape {x.shape}"
            )
        d2 = cnorms - 2.0 * (x @ cmat.T)  # (b, k)
        return pd.Series(cids[np.argmin(d2, axis=1)])

    # annotations set as live objects: the module uses `from __future__
    # import annotations`, under which inline hints are strings that
    # pandas_udf's eval-type inference cannot resolve for a locally
    # imported pandas
    _nearest.__annotations__ = {"col": pd.Series, "return": pd.Series}
    nearest = pandas_udf(_nearest, cid_type)

    return df.withColumn(
        out_col, nearest(F.col(vec_col).cast("array<double>"))
    )


def assign_ivf_lists_hier(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
    n_super: int | None = None,
) -> DataFrame:
    """TWO-LEVEL (hierarchical) nearest-centroid assignment — the FAISS
    IVF-on-IVF shape for LARGE coarse quantizers, where even the bulk
    matmul's O(n * k * dim) bites: with SemDeDup-style ``k ~ n/200`` the
    flat assignment is quadratic in the corpus (505k x 2525 x 64 ~ 8e10
    multiply-adds — the one SUPRALINEAR row left in the r8 vector bench).

    Stage 1 clusters the CENTROIDS driver-side (numpy Lloyd, deterministic:
    cid-order seeds, 3 rounds, empty supers keep their seed) into
    ``n_super ~ sqrt(k)`` super-centroids; stage 2 assigns each row to its
    nearest super (one n x sqrt(k) matmul), then argmins only within that
    super's member centroids — O(n * 2*sqrt(k) * dim), ~25x less compute
    at k=2525.

    APPROXIMATE by design: a row whose true nearest centroid lives in a
    different super-cluster gets its best same-super centroid instead —
    the standard IVF trade, acceptable exactly where this operator is
    meant to be used (SemDeDup coarse stages, where the paper's own
    clustering is approximate and dedup correctness rests on the exact
    in-cluster verify).  Duplicate centroid VECTORS are collapsed to
    their smallest cid before assignment: BLAS matmul kernels are
    row/column-position dependent, so two identical centroid columns can
    break their exact-zero tie differently for identical input rows in
    different batches (observed) — collapsing removes the only exact-tie
    pathology, after which identical rows map identically whenever their
    nearest centroid wins by more than float noise (any real geometry;
    adversarially equidistant rows may flip between DISTINCT centroids,
    which SemDeDup's exact in-cluster verify tolerates).  For strict
    smallest-cid tie semantics keep ``assign_ivf_lists`` /
    ``assign_ivf_lists_bulk``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    srt = sorted(centroids)
    seen: dict = {}
    kept = []
    for cid, v in srt:
        key = tuple(v)
        if key not in seen:
            seen[key] = cid
            kept.append((cid, v))
    cids = np.array([cid for cid, _ in kept], dtype=np.int64)
    cmat = np.array([v for _, v in kept], dtype=np.float64)  # (k, d)
    k, dim = cmat.shape
    ns = n_super or max(1, int(math.isqrt(k)))
    # driver-side Lloyd over the k centroids (k x dim floats — tiny)
    smat = cmat[:ns].copy()  # cid-order seeds, deterministic
    for _ in range(3):
        d2 = (smat * smat).sum(axis=1) - 2.0 * (cmat @ smat.T)
        owner = np.argmin(d2, axis=1)
        for s in range(ns):
            m = owner == s
            if m.any():
                smat[s] = cmat[m].mean(axis=0)
    d2 = (smat * smat).sum(axis=1) - 2.0 * (cmat @ smat.T)
    owner = np.argmin(d2, axis=1)
    # drop empty supers: stage 2 needs >= 1 member centroid per super
    live = np.unique(owner)
    smat = smat[live]
    members = [np.nonzero(owner == s)[0] for s in live]
    snorm = (smat * smat).sum(axis=1)
    subnorms = [(cmat[idx] * cmat[idx]).sum(axis=1) for idx in members]

    def _nearest(col):
        if col.isna().any():
            raise ValueError("assign_ivf_lists_hier: NULL embedding")
        x = np.array(col.tolist(), dtype=np.float64)
        if x.ndim != 2 or x.shape[1] != dim:
            raise ValueError(
                f"assign_ivf_lists_hier: expected dim {dim}, got {x.shape}"
            )
        sup = np.argmin(snorm - 2.0 * (x @ smat.T), axis=1)
        out = np.empty(len(x), dtype=np.int64)
        for s in np.unique(sup):
            m = sup == s
            idx = members[s]
            d = subnorms[s] - 2.0 * (x[m] @ cmat[idx].T)
            out[m] = cids[idx[np.argmin(d, axis=1)]]
        return pd.Series(out)

    _nearest.__annotations__ = {"col": pd.Series, "return": pd.Series}
    nearest = pandas_udf(_nearest, "long")
    return df.withColumn(
        out_col, nearest(F.col(vec_col).cast("array<double>"))
    )


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
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket join (same LSH bucket)
    then exact cosine filter.  Shuffle key = bucket, never all-pairs.

    This single-band operator is toy-scale BY CONTRACT (its bucket join is
    ~n^2/2^planes; the scale twin is ``embedding_near_dup_banded``), so
    both the signature and the pair cosine use the HOF FOLD forms: bit
    identical to the expansions, but ~3 s cheaper PER QUERY BUILD — on an
    oracle-pinned 500-row entry the expansion's Catalyst analysis + codegen
    was 85% of wall-clock (r7 measurement).  Pass ``dim`` when known to
    skip the one-job length probe."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucketed = with_lsh_buckets(
        df, vec_col, n_planes, dim=dim, seed=seed, expansion=False
    ).select(
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
            # fold, not the codegen expansion: this single-band operator is
            # ~n^2/2^planes by construction and only ever runs on small
            # oracle-pinned frames (the scale twin is the banded variant);
            # the expansion's one-time Janino compile (~6 s) would dominate
            # every toy-scale run for zero scale benefit here
            cosine_expr(F.col("a.__v"), F.col("b.__v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _band_plane_counts(n_planes: float, n_bands: int) -> list[int]:
    """Per-band plane counts for OCCUPANCY-TARGETED banding: a fractional
    ``n_planes`` f splits the bands between floor(f) and ceil(f) planes in
    proportion, so EXPECTED bucket occupancy tracks ``n / 2^f``
    fractionally instead of jumping 2x at every integer step.  The
    integer-step jump is the superlinear-candidate cliff SCALING.md r7
    named: between 50.5k and 505k rows the integer ``log2`` step moved
    12 -> 15 while the corpus grew 10x, driving candidate volume 12.5x.
    With mixed counts the candidate volume interpolates:
    ``n_bands * n^2 * ((1-frac)/2^lo + frac/2^(lo+1))``."""
    lo = int(math.floor(n_planes))
    if float(n_planes) == lo:
        return [lo] * n_bands
    n_hi = int(round((float(n_planes) - lo) * n_bands))
    # ceil-plane (smaller-bucket) bands FIRST: with few bands the rounding
    # must still move occupancy toward the target
    return [lo + 1] * n_hi + [lo] * (n_bands - n_hi)


def _band_buckets_bulk(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: float,
    n_bands: int,
    seed: int,
    out_col: str,
) -> DataFrame:
    """All bands' LSH buckets in one numpy matmul per Arrow batch:
    ``sign(X @ P.T)`` over the stacked plane matrix, bits packed per band —
    the scale path for large band/plane counts where the expanded codegen
    signature overflows Janino.  ``n_planes`` may be FRACTIONAL — bands
    then mix floor/ceil plane counts (see ``_band_plane_counts``) so
    expected occupancy tracks the target between integer steps.  Bit
    values can differ from the codegen path by sign flips on dots within
    an ulp of zero; bucketing correctness is unaffected (both join sides
    use the SAME expression), so this path is for scale runs, not oracle
    replays."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    counts = _band_plane_counts(n_planes, n_bands)
    pmat = np.concatenate(
        [
            np.array(_hyperplanes(dim, c, seed + b), dtype=np.float64)
            for b, c in enumerate(counts)
        ],
        axis=0,
    )  # (sum(counts), dim)
    offs = np.cumsum([0] + counts)
    weights = [
        (1 << np.arange(c, dtype=np.int64)) for c in counts
    ]

    def _sigs(col):
        x = np.array(col.tolist(), dtype=np.float64)
        bits = (x @ pmat.T) >= 0.0  # (n, sum(counts))
        out = []
        for r in bits:
            out.append(
                [
                    int(r[offs[b]: offs[b + 1]] @ weights[b])
                    for b in range(len(counts))
                ]
            )
        return pd.Series(out)

    _sigs.__annotations__ = {"col": pd.Series, "return": pd.Series}
    sigs = pandas_udf(_sigs, "array<long>")
    return df.withColumn(
        out_col, sigs(F.col(vec_col).cast("array<double>"))
    )


def _banded_candidates(
    bucketed: DataFrame,
    other: DataFrame | None = None,
    broadcast_left: bool = False,
) -> DataFrame:
    """Distinct candidate pairs from (``__id``, band, bucket) rows — the
    shared stage under the banded near-dup, k-NN graph and incremental
    vector index paths (each used to hand-roll it).

    Self mode (``other`` is None): ONE self-join keyed (band, bucket) with
    ``id_a < id_b`` — half the pair volume of a directed join — deduped
    across bands.  Bipartite mode: left x other on (band, bucket), with
    ``broadcast_left`` for the micro-batch-vs-state shape where the left
    side is small and the state must never shuffle."""
    a = bucketed.alias("a")
    if other is None:
        b_ = bucketed.alias("b")
        cond = (
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id"))
        )
    else:
        b_ = other.alias("b")
        cond = (F.col("a.band") == F.col("b.band")) & (
            F.col("a.bucket") == F.col("b.bucket")
        )
    left = F.broadcast(a) if broadcast_left else a
    return (
        left.join(b_, cond)
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _hoisted_vecs(
    df: DataFrame, id_col: str, vec_col: str, dim: int | None = None
) -> DataFrame:
    """(``__vid``, ``__v``, ``__n``) with the per-row norm hoisted BEFORE
    any pair join (bit-identical to computing it per pair — sqrt of the
    same expanded sum): per-PAIR work drops from three array aggregates to
    one, and the threshold filter Catalyst pushes into the join CONDITION
    then carries only the dot (with the full cosine inlined, the condition
    — one unsplittable generated method — overflowed Janino's 64 KB limit,
    killing whole-stage codegen for the entire verify stage).  ``dim``
    picks the codegen expansion; None keeps the fold (right for toy/
    micro-batch slivers where the expansion's per-build analysis cost
    dominates)."""
    emb = F.col(vec_col).cast("array<double>")
    out = df.select(F.col(id_col).alias("__vid"), emb.alias("__v"))
    n = (
        norm_fixed_expr("__v", dim)
        if dim is not None
        else norm_expr(F.col("__v"))
    )
    return out.withColumn("__n", n)


def _verified_cosine(
    cand: DataFrame,
    vecs_a: DataFrame,
    vecs_b: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """EXACT cosine for each (id_a, id_b) candidate, joining back to
    ``_hoisted_vecs`` frames (``vecs_b`` defaults to ``vecs_a`` — the
    self-corpus shape).  ``dim`` as in ``_hoisted_vecs``.  Callers apply
    their own threshold/ranking; zero-norm vectors yield cosine NULL (the
    nullif guard) — threshold filters drop those, rankers must."""
    if vecs_b is None:
        vecs_b = vecs_a
    va = (
        vecs_a.withColumnRenamed("__vid", "id_a")
        .withColumnRenamed("__v", "__va")
        .withColumnRenamed("__n", "__na")
    )
    vb = (
        vecs_b.withColumnRenamed("__vid", "id_b")
        .withColumnRenamed("__v", "__vb")
        .withColumnRenamed("__n", "__nb")
    )
    dot = (
        dot_fixed_expr("__va", "__vb", dim)
        if dim is not None
        else dot_expr(F.col("__va"), F.col("__vb"))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            (
                dot / F.nullif(F.col("__na") * F.col("__nb"), F.lit(0.0))
            ).alias("cosine"),
        )
    )


def embedding_near_dup_banded(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: float = 16,
    n_bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs with OR-amplified LSH banding — the scale
    path of ``embedding_near_dup_pairs``.

    The single-band operator hashes into ``2^n_planes`` buckets, so its
    bucket self-join carries ~``n^2 / 2^n_planes`` pairs: with the 8 planes
    the 500-row oracle entry pins, that is quadratic-with-a-constant and
    dies around 10^5 rows.  Raising ``n_planes`` alone shrinks buckets but
    collapses recall (a cosine-0.99 pair agrees on one 20-bit signature
    with probability only ~0.4).  The standard fix is the same
    AND/OR amplification MinHash banding uses: ``n_bands`` independent
    signatures of ``n_planes`` bits each; a pair is a candidate if it
    collides in ANY band — recall ``1 - (1 - p^r)^L`` (p = 1 - theta/pi per
    hyperplane), pair volume ~``n_bands * n^2 / 2^n_planes``, tuned
    per-corpus so buckets stay O(1)-sized.  ``n_planes`` may be FRACTIONAL
    — bands then mix floor/ceil plane counts so expected occupancy tracks
    the target between integer steps (see ``_band_plane_counts``; pass
    ``log2(n / target)`` unrounded).  Candidates dedupe across bands,
    then ONE exact-cosine verification joins the (id_a, id_b) sliver back
    to the vectors — signature noise can never flip a decision, exactly the
    minhash_dedup contract.

    Scale shape: bucket computation is scan-stage (n_bands x n_planes dot
    products per row), the self-join shuffles (band, bucket) keys, verify
    touches candidate pairs only.  Never all-pairs."""
    dim = len(df.select(vec_col).first()[0])
    # every band's bucket from ONE Arrow matmul, exploded to (band, bucket)
    # rows.  Always the Arrow path: n_bands codegen signatures fused into
    # one generated method overflow Janino's 64 KB limit already at
    # 3 bands x 6 planes x 64 dims (each failed compile costs seconds
    # before the interpreted fallback), and the banded operator's oracle
    # verifies by exact cosine, never by signature replay — the single-band
    # operator keeps the codegen signature for the oracle-pinned entries.
    sigged = _band_buckets_bulk(
        df, vec_col, dim, n_planes, n_bands, seed, out_col="__bands"
    )
    bucketed = sigged.select(
        F.col(id_col).alias("__id"),
        F.posexplode("__bands").alias("band", "bucket"),
    )
    cand = _banded_candidates(bucketed)
    # verify joins are hinted shuffle_hash: the vector side's size estimate
    # comes from compressed parquet stats, which understate a fat
    # array<double> column enough that AQE picks a broadcast that then
    # fails to build (observed at 505k x 64 dims under a 64 MB threshold);
    # at corpus scale these joins are big-big by nature, so shuffling on id
    # is the right plan anyway.  Norm hoisting + the condition-splitting
    # rationale live on _hoisted_vecs.
    vecs = _hoisted_vecs(df, id_col, vec_col, dim).hint("shuffle_hash")
    return _verified_cosine(cand, vecs, dim=dim).filter(
        F.col("cosine") >= threshold
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    n_planes: float = 16,
    n_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN graph over an embedding corpus: per vector, its
    top-``k`` banded-LSH candidates ranked by EXACT cosine — the
    neighbor-graph primitive under diversity sampling, dedup clustering
    and graph-based curation (the q_knn_graph catalog entry pins a toy
    2-band/6-plane instance for the oracle; this is its parameterized
    scale twin, the near_dup_banded : embedding_near_dup relationship).

    Plan shape, stage by stage:

    * ``_band_buckets_bulk``: every band signature from ONE numpy matmul
      per Arrow batch (n_bands codegen signatures fused into one generated
      method overflow Janino's 64 KB limit — see embedding_near_dup_banded).
    * Candidate generation: posexplode to (band, bucket) rows, ONE
      self-join keyed (band, bucket) with ``id_a < id_b`` — half the pair
      volume of a directed ``!=`` join — deduped across bands, then
      mirrored into both directions with a ``union`` (map-side, no extra
      shuffle) so every vector ranks its full candidate set.
    * Exact verify: candidates join back to the vectors (shuffle_hash
      hinted — compressed parquet stats understate fat array columns and a
      mis-chosen broadcast dies at corpus scale); cosine is the codegen
      expansion (``cosine_fixed_expr``), never an interpreted fold.
    * Top-k: ``row_number`` over a window PARTITIONED by source id
      (descending cosine, neighbor id tie-break) — never a global window.

    Cost model: candidate pairs ~ ``n_bands * n^2 / 2^n_planes``; pick
    ``n_planes ~ log2(n / target_bucket_size)`` so buckets stay O(1)-sized
    and the join stays ~linear.  ``n_planes`` may be FRACTIONAL
    (occupancy-targeted banding, r7 verdict #4): the integer-only step
    made candidate volume jump up to 2x per step — at 10x rows the step
    12 -> 15 drove candidate volume 12.5x; mixed floor/ceil plane counts
    across bands (``_band_plane_counts``) interpolate expected occupancy
    between the steps, so pass ``log2(n / target)`` UNROUNDED.  Recall of
    a true neighbor at cosine s is ``1 - (1 - p^r)^L`` with
    ``p = 1 - arccos(s)/pi`` — raise n_bands for recall, n_planes for
    precision/cost.  Vectors whose buckets are singletons in every band
    emit NO rows (no candidates) — at sane parameterizations that is the
    far-outlier tail; lower n_planes or add bands to pull them in.

    Returns (``id_col``, neighbor_id, cosine, rank), rank 1-based."""
    from pyspark.sql import Window

    dim = len(df.select(vec_col).first()[0])
    sigged = _band_buckets_bulk(
        df, vec_col, dim, n_planes, n_bands, seed, out_col="__bands"
    )
    bucketed = sigged.select(
        F.col(id_col).alias("__id"),
        F.posexplode("__bands").alias("band", "bucket"),
    )
    pairs = _banded_candidates(bucketed)
    # Cosine is symmetric, so each UNDIRECTED pair is scored ONCE
    # (id_a < id_b) and the scored rows are mirrored into both directions
    # afterwards — half the verify join volume and half the expansion work
    # of mirroring first.  Norm hoisting + shuffle_hash rationale live on
    # _hoisted_vecs / embedding_near_dup_banded.
    vecs = _hoisted_vecs(df, id_col, vec_col, dim).hint("shuffle_hash")
    scored_pairs = _verified_cosine(pairs, vecs, dim=dim)
    # map-side mirror via explode — a union of two projections would
    # duplicate the whole verify-join plan (no exchange reuse across
    # differing projections); this is one pass, zero recompute
    scored = scored_pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("nbr")
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("nbr")
                ),
            )
        ).alias("__e"),
        "cosine",
    ).select("__e.src", "__e.nbr", "cosine")
    # zero-norm vectors score cosine NULL against every collision (the
    # nullif guard); those are non-edges, not neighbors — drop them before
    # ranking or they consume top-k slots (NULLS LAST under desc, but they
    # would still be emitted once real candidates run out)
    scored = scored.filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.col("nbr"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("src").alias(id_col),
            F.col("nbr").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def rank_triplets(
    edges: DataFrame,
    labels: DataFrame,
    k_pos: int = 2,
    k_neg: int = 2,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-triplet mining over a scored neighbor edge list — the
    contrastive-training data recipe: per anchor, the ``k_pos`` nearest
    SAME-label neighbors ("pos" — positives) and the ``k_neg`` nearest
    WRONG-label neighbors ("neg" — hard negatives, the informative ones a
    random negative sample essentially never draws).  ``edges`` is any
    (id, neighbor_id, cosine) frame — `knn_graph`'s output at scale, or
    an exact pinned candidate set (q_hard_negatives); ``labels`` maps id
    -> label.

    Plan: two keyed joins to attach anchor/neighbor labels (corpus-sized
    label table — shuffle hash joins AQE can skew-split; broadcast it
    yourself upstream if it is dimension-sized), then ONE window
    partitioned by (anchor, kind) — never global.  Anchors with no
    same-label (or no wrong-label) candidates simply emit fewer rows;
    widen the candidate set (knn_graph k / bands) if slates come back
    short.  Returns (id, kind, rank, neighbor_id, cosine), rank 1-based
    within kind."""
    from pyspark.sql import Window

    if k_pos < 0 or k_neg < 0 or (k_pos == 0 and k_neg == 0):
        raise ValueError("need k_pos >= 0, k_neg >= 0, and one positive")
    alab = labels.select(
        F.col(id_col).alias("__aid"), F.col(label_col).alias("__alab")
    )
    nlab = labels.select(
        F.col(id_col).alias("__nid"), F.col(label_col).alias("__nlab")
    )
    j = (
        edges.join(alab, edges[id_col] == alab["__aid"])
        .join(nlab, edges["neighbor_id"] == nlab["__nid"])
        .withColumn(
            "kind",
            F.when(F.col("__alab") == F.col("__nlab"), "pos").otherwise("neg"),
        )
    )
    w = Window.partitionBy(id_col, "kind").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    cap = F.when(F.col("kind") == "pos", F.lit(k_pos)).otherwise(F.lit(k_neg))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cap)
        .select(id_col, "kind", "rank", "neighbor_id", "cosine")
    )


def embedding_decontam(
    train: DataFrame,
    evals: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: float = 8,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """SEMANTIC eval-set decontamination: flag every eval vector whose
    cosine to ANY training vector reaches ``threshold`` — the
    embedding-space complement of the n-gram overlap check
    (operators/decontam.py), catching paraphrased/reworded benchmark
    leakage that token n-grams cannot see (the reference, a SQL-text ETL
    client at /root/reference/etl/, has no ML surface; extension scope).

    Plan shape — the incremental vector index's bipartite stages, batch
    form (shared scaffold): ``_band_buckets_bulk`` signatures on BOTH
    sides (one Arrow matmul each; the same expression on both sides, so
    an identical train/eval pair collides in EVERY band),
    ``_banded_candidates`` bipartite with the eval side broadcast (the
    eval set is benchmark-sized; the 100 TB training corpus is never
    shuffled), then ``_verified_cosine`` — exact, so signature noise can
    never flip a verdict.  Returns one row per EVAL id:
    (``id_col``, n_matches, is_contaminated, contaminated_by) with
    contaminated_by = the smallest matching train id (NULL when clean).

    Recall contract is the banded operator's: a true near-pair at cosine s
    below exact-duplicate level is caught with probability
    ``1 - (1 - p^r)^L``; size bands for the leakage regime you care about
    (verbatim + light paraphrase sit near s = 1 where recall ~ 1)."""
    dim = len(train.select(vec_col).first()[0])
    tb = _band_buckets_bulk(
        train, vec_col, dim, n_planes, n_bands, seed, out_col="__bands"
    ).select(
        F.col(id_col).alias("__id"),
        F.posexplode("__bands").alias("band", "bucket"),
    )
    eb = _band_buckets_bulk(
        evals, vec_col, dim, n_planes, n_bands, seed, out_col="__bands"
    ).select(
        F.col(id_col).alias("__id"),
        F.posexplode("__bands").alias("band", "bucket"),
    )
    cand = _banded_candidates(eb, other=tb, broadcast_left=True)
    ev = _hoisted_vecs(evals, id_col, vec_col)
    tv = _hoisted_vecs(train, id_col, vec_col)
    hits = (
        _verified_cosine(cand, ev, tv)
        .filter(F.col("cosine") >= threshold)
        .groupBy(F.col("id_a").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("id_b").alias("contaminated_by"),
        )
    )
    return evals.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_matches"), F.lit(0))
        .cast("long")
        .alias("n_matches"),
        (F.coalesce(F.col("n_matches"), F.lit(0)) > 0).alias(
            "is_contaminated"
        ),
        "contaminated_by",
    )


def rp_sign_matrix(
    dim: int, out_dim: int, seed: int = 97
) -> list[list[int]]:
    """Deterministic +-1 sign matrix for the sparse JL projection
    (Achlioptas 2003, "Database-friendly random projections": +-1 entries
    satisfy the Johnson-Lindenstrauss bound with the same constants as
    Gaussians).  md5-derived like ``_hyperplanes`` — reproducible by any
    engine, no RNG state; computed driver-side and embedded as literals,
    so neither engine hashes anything at run time."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"rp:{seed}:{r}:{d}".encode()).hexdigest()[:8],
                16,
            )
            % 2
            == 0
            else -1
            for d in range(dim)
        ]
        for r in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    scale: int = 10**6,
    seed: int = 97,
    method: str = "auto",
    arrow_threshold_rows: int = 100_000,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dim`` +-1 sign vectors — the standard cheapening
    step in front of LSH banding / k-NN / clustering when the native
    dimension is wide (pairwise cosines are preserved within the JL
    distortion bound at out_dim ~ O(log n / eps^2)).

    EXACT FIXED-POINT: coordinates quantize once via the cross-engine
    floor(x*scale + 0.5) (quantize.py), and a +-1 dot product is an
    integer SUM — order-independent, so the interpreted-fold path, the
    Arrow int64-matmul path, and the DuckDB oracle are all bit-identical
    (the same no-float-caveat argument as the k-means assignment).
    Output is ``array<bigint>`` in units of 1/scale.

    Overflow envelope: |q_i| <= scale * max|x| and the sum spans ``dim``
    terms — BIGINT-exact up to dim * max|x| ~ 9 * 10^12 at the default
    scale; unit-normalized embeddings are ~10^8.

    ``method``: 'fold' = scan-stage HOF expression (engine-portable, the
    pinned-oracle form); 'arrow' = one numpy int64 matmul per batch (the
    scale path: out_dim*dim multiplies per row run as BLAS-shaped batch
    work instead of ~0.5 us/element interpretation); 'auto' = fold below
    ``arrow_threshold_rows`` (probed with a LIMIT-bounded count, so the
    probe never scans past the threshold), arrow at or above."""
    dim = len(df.select(vec_col).first()[0])
    signs = rp_sign_matrix(dim, out_dim, seed)
    if method == "auto":
        probe = df.limit(arrow_threshold_rows).count()
        method = "arrow" if probe >= arrow_threshold_rows else "fold"
    if method == "fold":
        q = (
            f"transform(CAST(`{vec_col}` AS ARRAY<DOUBLE>), "
            f"x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT))"
        )
        rows = ", ".join(
            "aggregate(zip_with({q}, {s}, (x, y) -> x * y), 0L, "
            "(acc, v) -> acc + v)".format(
                q=q, s="array(" + ", ".join(f"{v}L" for v in srow) + ")"
            )
            for srow in signs
        )
        return df.withColumn(out_col, F.expr(f"array({rows})"))
    if method != "arrow":
        raise ValueError(f"unknown method {method!r}")

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    smat = np.array(signs, dtype=np.int64)  # (out_dim, dim)

    def _project(col):
        if col.isna().any():
            raise ValueError("random_projection: NULL embedding in batch")
        x = np.array(col.tolist(), dtype=np.float64)
        if x.ndim != 2 or x.shape[1] != smat.shape[1]:
            raise ValueError(
                f"random_projection: expected fixed dim {smat.shape[1]}, "
                f"got shape {x.shape}"
            )
        q = np.floor(x * float(scale) + 0.5).astype(np.int64)
        return pd.Series(list(q @ smat.T))

    _project.__annotations__ = {"col": pd.Series, "return": pd.Series}
    project = pandas_udf(_project, "array<bigint>")
    return df.withColumn(
        out_col, project(F.col(vec_col).cast("array<double>"))
    )


def rp_quantize_sql(vec_sql: str, scale: int = 10**6) -> str:
    """DuckDB quantization half of the ``random_projection`` twin —
    compute ONCE (in a CTE) and feed the name to ``rp_project_sql``."""
    return (
        f"list_transform({vec_sql}, "
        f"x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT))"
    )


def rp_project_sql(
    q_sql: str, dim: int, out_dim: int, seed: int = 97
) -> str:
    """DuckDB projection half: list literal of per-output signed integer
    sums over an ALREADY-QUANTIZED bigint list named by ``q_sql`` (same
    signs, value-exact; quantize separately so the oracle does not
    re-expand the transform dim*out_dim times)."""
    signs = rp_sign_matrix(dim, out_dim, seed)
    rows = ", ".join(
        "("
        + " + ".join(
            f"{'' if s > 0 else '-'}{q_sql}[{d + 1}]"
            for d, s in enumerate(srow)
        )
        + ")"
        for srow in signs
    )
    return f"[{rows}]"


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
    indexed = assign_ivf_lists(
        # fold distances: below the Arrow cap this operator is toy-scale
        # by contract (see the pair-stage note), and the expansion costs
        # seconds of per-build analysis; values are bit-identical
        df, centroids, vec_col, out_col="cluster", expansion=False
    )
    indexed = indexed.localCheckpoint(eager=True)
    sides = indexed.select(
        F.col(id_col).alias("__id"),
        "cluster",
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", norm_expr(F.col("__v")))
    a, b = sides.alias("a"), sides.alias("b")
    # The pair-stage dot runs once per CANDIDATE PAIR (sum_i c_i^2 — the
    # dominant term of the whole operator), unlike the per-ROW assignment
    # and norm above, so it alone justifies the codegen expansion: the
    # dimension is known from the centroid sample at no extra job, the
    # SQL-string form is one driver round-trip to build, and
    # dot_fixed_expr is documented bit-identical to the fold (same 0.0
    # seed, same left-to-right IEEE order; get() past the array end yields
    # NULL exactly like zip_with).  r10 A/B at sf0.1: the interpreted fold
    # evaluated ~64 HOF steps per pair at ~0.5 us each across ~1.6M pairs.
    dim = len(centroids[0][1]) if centroids else 0
    pair_cos = (
        dot_fixed_expr("a.__v", "b.__v", dim)
        if dim
        else dot_expr(F.col("a.__v"), F.col("b.__v"))
    ) / F.nullif(F.col("a.__n") * F.col("b.__n"), F.lit(0.0))
    dup_of = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .where(pair_cos >= threshold)
        .groupBy(F.col("b.__id").alias(id_col))
        .agg(F.min(F.col("a.__id")).alias("dup_of"))
    )
    return (
        indexed.join(dup_of, id_col, "left")
        .withColumn("is_dup", F.col("dup_of").isNotNull())
    )


def semantic_dedup_bulk(
    df: DataFrame,
    n_clusters: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 1024,
    iterations: int = 0,
    scale: int = 10**6,
) -> DataFrame:
    """SemDeDup at corpus scale: identical keep-min-id semantics to
    ``semantic_dedup``, with BOTH hot stages vectorized —
    ``assign_ivf_lists_bulk`` for the coarse assignment and one
    ``applyInPandas`` per cluster for the within-cluster pair scoring
    (normalized Gram matrix blocks, ``Xn @ Xn[block].T`` — BLAS, not a
    pair JOIN through interpreted higher-order functions, which costs
    ~micro-seconds PER PAIR and dominates past ~10^6 pairs).

    This is the path a real 100 TB SemDeDup run takes (the paper computes
    within-cluster similarity as dense matrix blocks on accelerators); the
    DataFrame version stays the oracle-checkable reference: exactly equal
    inputs produce equal outputs up to float rounding in the cosine (matmul
    accumulation order differs from the zip_with fold), so thresholds
    within an ulp of an actual pair cosine can flip only that pair.

    Shuffle shape: ONE exchange keyed by cluster (the applyInPandas
    grouping); memory per task is O(cluster_size x dim + cluster_size x
    block) — pick ``n_clusters ~ n / target_cluster_size`` to bound it.

    ``iterations > 0`` Lloyd-refines the coarse stage (r7 verdict #7):
    instead of raw one-shot sampled centroids, run that many rounds of
    fixed-point k-means (operators/kmeans.py — seeded from the SAME md5
    sample, exact integer arithmetic at ``scale``, Arrow-matmul
    assignments) before assigning.  Refined centroids cut within-cluster
    variance, i.e. fewer near-dup pairs split across cluster boundaries
    (the only miss mode SemDeDup has — identical vectors can never split,
    any shared assignment map sends them to one cluster).  The refinement
    stays oracle-replayable: the kmeans unroll composes into the dedup
    oracle the same way the classifier unroll composes into
    pipeline_ccnet.  Costs one extra shuffle per iteration (the Lloyd
    update agg); the default 0 keeps the original one-shot behavior.

    Returns (id_col, cluster, dup_of, is_dup) — same contract as
    ``semantic_dedup``."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegralType, StringType

    id_field = df.schema[id_col].dataType
    if not isinstance(id_field, (IntegralType, StringType)):
        # the output schema mirrors the id type and "smallest id" must be a
        # total order both numpy's sort and Spark agree on — integrals and
        # strings are the cases with that guarantee (and the only id shapes
        # the DataFrame twin is oracle-checked on)
        raise ValueError(
            f"semantic_dedup_bulk: id column {id_col!r} must be an integral "
            f"or string type, got {id_field.simpleString()} (use "
            "semantic_dedup, or add a surrogate integral id)"
        )
    id_type = id_field.simpleString()

    if iterations > 0:
        from carto_etl_spark.operators.kmeans import (
            assign_clusters,
            kmeans_fit,
        )

        qcents = kmeans_fit(
            df, k=n_clusters, iterations=iterations,
            id_col=id_col, vec_col=vec_col, scale=scale,
        )
        indexed = assign_clusters(
            df, qcents, vec_col=vec_col, scale=scale, out_col="cluster"
        ).withColumn(
            # match assign_ivf_lists' path-stable BIGINT cluster ids
            "cluster", F.col("cluster").cast("long")
        )
    elif (
        n_clusters >= _HIER_ASSIGN_MIN_LISTS
        and not isinstance(id_field, StringType)
    ):
        # SemDeDup sizes k ~ n/target, so the FLAT bulk assignment is
        # O(n * k * dim) = quadratic in the corpus — the one supralinear
        # row left in the r8 vector bench.  The two-level assignment cuts
        # it to O(n * 2*sqrt(k) * dim); its approximation (best same-super
        # centroid) only moves boundary rows BETWEEN clusters, which the
        # SemDeDup contract tolerates — identical vectors still map
        # identically, and in-cluster dup decisions stay exact-verified.
        centroids = sampled_centroids(df, n_clusters, id_col, vec_col)
        indexed = assign_ivf_lists_hier(
            df, centroids, vec_col, out_col="cluster"
        )
    else:
        centroids = sampled_centroids(df, n_clusters, id_col, vec_col)
        indexed = assign_ivf_lists(
            # fold distances: below the Arrow cap this operator is
            # toy-scale by contract (see the pair-stage note), and the
            # expansion costs seconds of per-build analysis; values are
            # bit-identical
            df, centroids, vec_col, out_col="cluster", expansion=False
        )
    thr = float(threshold)
    blk = int(block)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        norms[norms == 0.0] = np.inf  # zero vectors match nothing
        xn = x / norms[:, None]
        m = len(pdf)
        ids = pdf[id_col].to_numpy()
        # dup_of carries the covering id under a NULL MASK — not a -1
        # sentinel — so negative ids and string ids round-trip untouched.
        # Integral ids stay a vectorized int64 buffer + boolean mask
        # (pandas nullable Int64 -> Arrow int64-with-nulls, no per-row
        # Python objects); the object path exists only for string ids.
        integral = ids.dtype.kind in "iu"
        dup_vals = (
            np.zeros(m, dtype=np.int64) if integral else [None] * m
        )
        found = np.zeros(m, dtype=bool)
        for j0 in range(0, m, blk):
            j1 = min(j0 + blk, m)
            s = xn @ xn[j0:j1].T  # (m, j1-j0)
            for jj in range(j1 - j0):
                j = j0 + jj
                hits = np.nonzero(s[:j, jj] >= thr)[0]
                if hits.size:
                    dup_vals[j] = ids[hits[0]]  # smallest id: rows sorted
                    found[j] = True
        if integral:
            dup_series = pd.arrays.IntegerArray(dup_vals, mask=~found)
        else:
            dup_series = pd.Series(dup_vals, dtype=object)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": pdf["cluster"],
                "dup_of": dup_series,
                "is_dup": found,
            }
        )

    # cluster ids are centroid ids: assign_ivf_lists widens integral ids to
    # BIGINT (path-stable schema), string ids stay STRING
    cluster_type = "string" if isinstance(id_field, StringType) else "long"
    sig = (
        f"{id_col} {id_type}, cluster {cluster_type}, dup_of {id_type}, "
        "is_dup boolean"
    )
    return indexed.select(
        F.col(id_col), F.col("cluster"),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).groupBy("cluster").applyInPandas(score, sig)


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
    expansion: bool = True,
) -> DataFrame:
    """Attach the PQ code array: per subspace, the index of the nearest
    codebook entry (squared L2; ties to the smaller code).  Codebooks are
    literal expressions — the whole encoding is one codegen projection, no
    join, no shuffle; at 100 TB this is the map-only pass that shrinks an
    f32 corpus ~(4*dim/n_sub)x for the ADC scan.

    By default distances are expanded ``(get(i) - lit)^2`` chains, not
    zip_with folds: the fold form is CodegenFallback and interpreted per
    ELEMENT — at 505k rows the encode pass was the dominant cost of the
    whole PQ pipeline (SCALING.md r6).  ``expansion=False`` swaps each
    distance for its fold form (same 0.0 seed + per-index term order, so
    codes are bit-identical — equality-tested): for toy/oracle-pinned
    frames the 8x16x8-term expansion generates a codegen method past
    janino's 64 KB ceiling once fused with the ADC projection, so every
    run paid a DOOMED compile before the interpreted fallback anyway (the
    assign_ivf_lists lesson)."""
    emb_sql = f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)"
    n_sub = len(codebooks)
    w = len(codebooks[0][0])

    def code_for(s: int) -> str:
        def d2(entry: list[float]) -> str:
            if not expansion:
                return (
                    f"aggregate(zip_with(slice({emb_sql}, {s * w + 1}, {w}), "
                    f"{arr_lit_sql(entry)}, (x, y) -> (x - y) * (x - y)), "
                    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
                )
            terms = []
            for i, x in enumerate(entry):
                t = (
                    f"(get({emb_sql}, {s * w + i}) - "
                    f"CAST('{float(x)!r}' AS DOUBLE))"
                )
                terms.append(f"({t} * {t})")
            return f"(CAST(0.0 AS DOUBLE) + {' + '.join(terms)})"

        choices = ", ".join(
            f"named_struct('d', {d2(entry)}, 'c', {c})"
            for c, entry in enumerate(codebooks[s])
        )
        return f"array_min(array({choices})).c"

    codes = ", ".join(code_for(s) for s in range(n_sub))
    return df.withColumn(out_col, F.expr(f"array({codes})"))


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
