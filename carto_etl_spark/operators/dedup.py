"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Design rules for 100 TB:
- signatures are computed with built-in array/hash expressions (xxhash64 +
  affine rehash family) — one narrow scan, no Python, no shuffle;
- candidate generation shuffles on *band buckets* (MinHash-LSH), never all
  pairs; the only cross-row joins are per-bucket;
- exact dedup is a hash aggregate on a fingerprint, not a sort.

A portable md5-based exact path (``fingerprint_expr``) backs the duckdb-oracle
checks; xxhash64 signatures back the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from carto_etl_spark.operators.text import (
    normalize_text_expr,
    fingerprint_expr,
    tokens_expr,
)


def _materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize a *small* intermediate (signatures, pair lists)
    before a self-join or iteration.  Without this, both sides of a self-join
    recompute the full upstream lineage (hashing every shingle twice), and
    iterative label propagation re-derives the whole plan per round.  Never
    applied to base tables — only to sketch-sized intermediates."""
    return df.localCheckpoint(eager=True)



# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Row-level exact dedup: ``dropDuplicates`` (hash aggregate)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_text_dedup(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Content dedup on normalized text, deterministic winner = min id.
    One hash-shuffle on the md5 fingerprint; survivors keep original rows."""
    fp = fingerprint_expr(text_col).alias("__fp")
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.select("*", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash signatures (all built-in expressions)
# ---------------------------------------------------------------------------

def word_shingles_expr(text, n: int = 3, *, pretokenized: bool = False):
    """Distinct word n-gram strings over normalized text.

    PERFORMANCE: the slice lambda references the token array once per shingle;
    there is no CSE inside lambda bodies, so tokenization must not be inlined
    here for large inputs — project the tokens first and pass
    ``pretokenized=True`` (with_minhash does)."""
    toks = F.col(text) if pretokenized else tokens_expr(normalize_text_expr(text))
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(count - 1, F.lit(0)))
    shingles = F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
    return F.array_distinct(shingles)


def char_shingles_expr(text, k: int = 5, *, prenormalized: bool = False):
    """Distinct character k-gram strings over normalized text (same CSE
    caveat as word_shingles_expr)."""
    norm = F.col(text) if prenormalized else normalize_text_expr(text)
    count = F.greatest(F.length(norm) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    shingles = F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: norm.substr(i, F.lit(k)))
    )
    return F.array_distinct(shingles)


def minhash_signature_expr(shingles, num_hashes: int = 64):
    """MinHash signature as an array<long>: hash function i is
    xxhash64(i, shingle) — a keyed 64-bit hash per seed, no modular
    arithmetic (ANSI-safe: xxhash64 never overflows).  Computed in ONE
    aggregate pass over the shingles with an element-wise running min
    (num_hashes separate array_min passes would blow up codegen).  Empty
    shingle set -> NULL signature (can't estimate Jaccard on nothing)."""
    long_max = (1 << 63) - 1
    init = F.array_repeat(F.lit(long_max).cast("long"), num_hashes)
    sig = F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(F.lit(i), s) for i in range(num_hashes)]),
            lambda a, b: F.least(a, b),
        ),
    )
    return F.when(F.size(shingles) > 0, sig)


def with_minhash(
    df: DataFrame,
    text_col: str,
    num_hashes: int = 64,
    shingle_words: int = 3,
    out_col: str = "minhash",
) -> DataFrame:
    """Staged projections (tokens -> shingles -> signature) so each stage's
    result is computed once per row instead of once per lambda element."""
    staged = df.withColumn(
        "__toks", tokens_expr(normalize_text_expr(text_col))
    ).withColumn(
        "__shingles", word_shingles_expr("__toks", shingle_words, pretokenized=True)
    )
    return staged.withColumn(
        out_col, minhash_signature_expr(F.col("__shingles"), num_hashes)
    ).drop("__toks", "__shingles")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_words: int = 3,
    out_col: str = "minhash",
) -> DataFrame:
    """(id_col, out_col) signature TABLE via exploded shingles + codegen'd
    min aggregates — bit-identical values to ``with_minhash``'s per-row
    fold (equality-tested in tests/test_operators.py), for the
    signature-table consumers (minhash_dedup, the LSH index) that never
    need the text carried along.

    Why a second form: ``minhash_signature_expr``'s aggregate/zip_with
    lambdas run on Spark's interpreted HOF path (HigherOrderFunction is
    CodegenFallback), allocating a ``num_hashes``-long array per SHINGLE.
    Here each exploded shingle row evaluates ``num_hashes`` plain xxhash64
    expressions under whole-stage codegen, and the partial hash aggregate
    collapses to one row per document MAP-SIDE, so the exchange carries
    ~8*num_hashes bytes per DOCUMENT, not per shingle — strictly fewer
    bytes than shuffling the corpus text and ~2-3x less CPU than the
    interpreted fold at sf0.1.

    Shingle-less documents (empty/NULL text) have NO row here, where the
    fold emits a NULL signature; every consumer treats the two identically
    (banding explodes nothing out of a NULL signature, and the est/verify
    joins are inner joins on candidate ids)."""
    staged = df.withColumn(
        "__toks", tokens_expr(normalize_text_expr(text_col))
    )
    ex = staged.select(
        F.col(id_col),
        F.explode(
            word_shingles_expr("__toks", shingle_words, pretokenized=True)
        ).alias("__sh"),
    )
    # aggregates as ONE parsed SQL string each, not F.min(F.xxhash64(...))
    # Columns: the Column chain costs ~4 py4j round-trips per hash — ~0.5 s
    # of DRIVER time per call at 64 hashes, paid on every run (measured
    # r11; the ranking.py _bucket_expr lesson).  xxhash64(<int literal>,
    # __sh) parses to the same typed expression, values bit-identical
    # (the fold-equality test pins it).
    aggs = [
        F.expr(f"min(xxhash64({i}, __sh))").alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    arr = "array(" + ",".join(f"__h{i}" for i in range(num_hashes)) + ")"
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(F.col(id_col), F.expr(arr).alias(out_col))
    )


# ---------------------------------------------------------------------------
# LSH banding -> candidate pairs -> near-dedup
# ---------------------------------------------------------------------------

def band_struct_expr(sig, bands: int):
    """array<struct<band,bucket>> for a signature: bucket i is xxhash64 over
    the comma-joined i-th signature slice.  Shared by the batch LSH and the
    incremental index (streaming/lshindex.py) so bucket values can never
    diverge between state written yesterday and a batch hashed today."""
    rows_per_band = F.floor(F.size(sig) / bands)
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket"),
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 16,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs from banded signatures: documents sharing any band
    bucket.  The shuffle key is (band_idx, band_hash) — cardinality ~rows x
    bands, never rows^2.  Returns distinct (id_a < id_b) pairs with their
    signature-estimated Jaccard.

    MEMORY SHAPE (r9, found by the 109x synthetic corpus): the banded
    table must carry (id, band, bucket) ONLY.  Riding the full signature
    through the explode amplifies it `bands`-fold — at 600k docs x 32
    bands x 64-long signatures that is ~10 GB through the checkpoint and
    the self-join, and the executor heap died; at web scale it is
    signature-bytes x bands of shuffle.  Signatures are checkpointed ONCE
    at corpus size and joined back onto the DEDUPED pair list (two id
    joins over a ~corpus-linear pair table) to compute est_jaccard."""
    sig = F.col(sig_col)
    # Lazy checkpoint when the occupancy count below runs anyway: the
    # count() is a full action over the same frame, so materialization
    # happens inside that job instead of paying a separate eager
    # materialization action first (the prefiltered-count pattern, r10).
    # Without a count (max_bucket_size=None) the eager form keeps the
    # multi-consumer guarantee.
    sigs = df.select(
        F.col(id_col).alias("__id"), sig.alias("__sig")
    ).localCheckpoint(eager=max_bucket_size is None)
    banded = sigs.select(
        "__id",
        F.explode(band_struct_expr(F.col("__sig"), bands)).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")
    # NOT re-materialized (r11): every consumer (hot-bucket count, both
    # self-join sides, the rare star branch) reads the CHECKPOINTED sigs
    # table, and the band explode above it is a pure codegen projection —
    # recomputing it per consumer is cheaper than writing corpus x bands
    # x ~20 B through another eager checkpoint and reading it back (one
    # fewer materialization job per run, and no bands-fold block residency).

    # HOT-BUCKET CAP (r9, found at 5.45M docs): a band bucket holding k
    # docs contributes k(k-1)/2 pairs — one 23k-doc bucket produced 265M
    # of a 390M-pair candidate list and the downstream sort spilled past
    # the disk.  A bucket that big is usually NON-DISCRIMINATIVE (its
    # 2-hash slice collided on near-universal shingle minima, i.e.
    # boilerplate vocabulary) — but it can also be a GENUINE mega-cluster
    # of near-identical docs (web-scale 404/boilerplate pages), for which
    # EVERY band bucket is hot and dropping would let the whole cluster
    # escape dedup (r9 ADVICE).  So over-cap buckets are STAR-PAIRED
    # instead of dropped: each member pairs with the bucket's minimum id
    # only — k-1 pairs instead of k(k-1)/2, linear in occupancy.  A true
    # mega-cluster stays connected through its representative (the
    # downstream Jaccard filter keeps those edges and connected
    # components collapse the star); a noise bucket's star edges fail
    # the Jaccard filter and die exactly as the drop would have killed
    # them — at k-1 verification cost, not k^2/2.  The hot-bucket list
    # and its representatives come from ONE map-side agg pass and both
    # joins against them are broadcasts — no skewed shuffle ever forms.
    # ``max_bucket_size=None`` disables.
    star = None
    # r11: the star/anti-join plan around the over-cap list cost EVERY run
    # two broadcast joins, a union branch, and an extra eager checkpoint
    # even though the list is empty on every non-degenerate corpus
    # (in-session A/B: ~0.4 s of pipeline_e2e's 4.1 s and ~0.3 s of
    # minhash_dedup's 2.8 s at sf0.1).  Two driver-side short circuits keep
    # the emitted pairs identical by construction:
    #   1. occupancy dominance — each doc contributes exactly one row per
    #      band, so no bucket can ever hold more rows than the signature
    #      table has docs; sigs.count() is a cheap scan of the checkpoint
    #      blocks and skips the bucket aggregate outright when
    #      n_docs <= cap (sound at any scale, decisive at toy scale);
    #   2. emptiness — one count() over the map-side-collapsed bucket
    #      aggregate (count(), not take(1)/isEmpty(): the incremental-limit
    #      path schedules 1-then-4x partition mini-jobs, measured SLOWER
    #      than the single full pass).  Anti-join against an empty set and
    #      union with an empty star are identities.
    # The rare non-empty path keeps the exact star-pair plan.
    if max_bucket_size is not None and sigs.count() > max_bucket_size:
        hot = (
            banded.groupBy("band", "bucket")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min("__id").alias("__rep"),
            )
            .filter(F.col("__n") > max_bucket_size)
            .select("band", "bucket", "__rep")
        )
        if hot.count() > 0:
            hot = _materialize(hot)
            star = (
                banded.join(F.broadcast(hot), ["band", "bucket"])
                .filter(F.col("__id") > F.col("__rep"))
                .select(
                    F.col("__rep").alias("id_a"),
                    F.col("__id").alias("id_b"),
                )
            )
            banded = banded.join(
                F.broadcast(hot.select("band", "bucket")),
                ["band", "bucket"],
                "left_anti",
            )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    with_sigs = pairs.join(
        sigs.select(F.col("__id").alias("id_a"), F.col("__sig").alias("sig_a")),
        "id_a",
    ).join(
        sigs.select(F.col("__id").alias("id_b"), F.col("__sig").alias("sig_b")),
        "id_b",
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.size(F.col("sig_a"))
    )
    return with_sigs.select("id_a", "id_b", est.alias("est_jaccard"))


def verify_pairs_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.5,
    broadcast_pairs: bool = True,
) -> DataFrame:
    """EXACT word-n-gram Jaccard verification of candidate pairs: join each
    (id_a, id_b) back to its shingle set, one ``array_intersect`` per pair.
    Cost is bounded by the candidate count (LSH/SimHash keeps that ~linear),
    never the corpus squared — the standard candidates-then-verify shape of a
    production near-dedup pipeline.  Output: (id_a, id_b, inter, union_sz,
    jaccard) for pairs meeting the threshold; the integer inter/union columns
    are engine-exact (same set arithmetic anywhere).

    Shingles are recomputed only for documents that appear in at least one
    candidate pair (semi-join pushdown): at scale the candidate-touched set
    is a sliver of the corpus, so the expensive array build never does a
    second full-corpus pass."""
    touched = (
        pairs.select(F.col("id_a").alias("__want"))
        .union(pairs.select(F.col("id_b").alias("__want")))
        .distinct()
    )
    # Broadcast the touched-id set whenever the caller deems the pair list
    # broadcast-sized (touched <= 2x pairs, ids only).  The pair list is a
    # localCheckpoint in every caller, and checkpointed frames carry NO
    # size statistics — the planner assumed worst-case and gave the
    # semi-join a SortMergeJoin PER UNION BRANCH of the corpus, each with
    # its own shuffle, sort, and an optimizer-injected 1M-item runtime
    # Bloom filter (r11 lsh_match_steady plan: 3 SMJ LeftSemi + 8
    # bloom_filter_agg passes, 29 Exchanges).  With the hint the corpus
    # branches are never shuffled for the semi-join at all (guide §3.1).
    if broadcast_pairs:
        touched = F.broadcast(touched)
    narrowed = df.join(
        touched, F.col(id_col) == F.col("__want"), "left_semi"
    )
    # AQE coalesces the post-join partitioning by BYTES, which lands the
    # CPU-heavy shingle lambdas on a handful of scan tasks (candidate-touched
    # text is small on disk but expensive per row) — spread it across cores
    # explicitly.  ROUND-ROBIN, not hash-by-id: Catalyst collapses a
    # deterministic projection below a hash exchange (the shingle build would
    # run on the scan side again), but leaves it above a round-robin one.
    narrowed = narrowed.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    # NOT materialized, deliberately (r10 A/B): both join sides read this,
    # so a checkpoint would halve the md5-shingle compute — but the
    # shingle payload is fat array<string>, and serializing it to
    # checkpoint blocks plus reading it back twice measured SLOWER than
    # recomputing the projection in-pipeline (minhash 2.78 -> 3.33 s,
    # pipeline_e2e 5.0 -> 7.6 s at sf0.1).  Compute beats materialize for
    # wide derived columns; contrast the candidate-pair list (ints) above.
    sh = _staged_shingles(narrowed, id_col, text_col, n, False, 5)
    # broadcast the (small, id-only) pair list — NEVER the shingle table:
    # Spark's byte estimate undercounts the materialized array columns, and
    # broadcasting them serializes every shingle set through the driver
    # single-threaded; with the pair list broadcast, the array build and the
    # intersect both stay partition-parallel on the executors.
    # ``broadcast_pairs=False`` drops the hint for blown-up candidate lists
    # (degenerate shingle universes, pathological boilerplate): the joins
    # become shuffle joins on id — slower, but nothing OOMs (r9: a 109x
    # synthetic corpus with a 50-word vocabulary produced a pair list that
    # killed the driver through this hint; the hint is honored REGARDLESS
    # of size, so the caller must make the call — minhash_dedup counts its
    # materialized candidate list and decides).
    id_pairs = pairs.select("id_a", "id_b")
    if broadcast_pairs:
        id_pairs = F.broadcast(id_pairs)
    return (
        id_pairs
        .join(
            sh.select(
                F.col("__id").alias("id_a"),
                F.col("__sh").alias("__sh_a"),
                F.col("__size").alias("size_a"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("__id").alias("id_b"),
                F.col("__sh").alias("__sh_b"),
                F.col("__size").alias("size_b"),
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn(
            "union_sz", F.col("size_a") + F.col("size_b") - F.col("inter")
        )
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )


def _union_find_min_roots(pair_rows) -> list:
    """Driver-side connected components with min-id roots: classic
    union-find with path compression, then a second pass remaps every
    node to the MINIMUM id of its component (the same labeling the
    distributed fixpoint converges to)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pair_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return sorted((n, comp_min[find(n)]) for n in parent)


def _numpy_min_label_roots(arr_a, arr_b):
    """Vectorized min-label propagation over integer edge arrays: labels
    start as each node's own (dense) index, every round take the min across
    edges in both directions plus one pointer-jump (label[label]) to
    collapse chains in O(log diameter) rounds, iterate to fixpoint.  Dense
    indices come from np.unique, which SORTS — so the minimum dense index
    in a component IS its minimum node id, and the converged labels map
    back through the node array to exactly the labeling the union-find and
    distributed fixpoint produce.  Pointer jumping is safe here (unlike on
    min-PARENT pointers, see the valley note below): label values are
    node indices within the same component, so jumping only ever reaches
    another member's current label, and edge propagation still crosses
    valleys."""
    import numpy as np

    both = np.concatenate([arr_a, arr_b])
    # NOT np.unique(..., return_inverse=True): its inverse pass is an
    # argsort an order of magnitude slower than binary-searching the sorted
    # uniques (measured 57 s vs 6.5 s on 54M int64)
    nodes = np.unique(both)
    inv = np.searchsorted(nodes, both)
    src, dst = inv[: len(arr_a)], inv[len(arr_a):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, src, label[dst])
        np.minimum.at(new, dst, label[src])
        new = np.minimum(new, new[new])
        if np.array_equal(new, label):
            break
        label = new
    return nodes, nodes[label]


#: Above the union-find tier but below this many distinct edges, labeling
#: runs vectorized on the driver: ~27M edges is ~430 MB over Arrow and
#: ~1.1 s per minimum.at pass, converging in O(log diameter) rounds —
#: measured 46.9 s -> driver-side seconds for the 10x golden_records graph,
#: where the distributed loop pays ~4 scheduled jobs per round.
NUMPY_LOOP_MAX_EDGES = 50_000_000


def min_label_components(
    pairs: DataFrame,
    max_rounds: int = 20,
    driver_threshold_edges: int = 1_000_000,
    numpy_threshold_edges: int = NUMPY_LOOP_MAX_EDGES,
    assume_distinct: bool = False,
) -> DataFrame:
    """Connected components over an undirected pair list (``id_a``/``id_b``)
    as (node, root) where root = the component's minimum id.

    Plain BFS-min propagation iterated to FIXPOINT: each round every node
    takes the min label over itself and its neighbors; convergence is a
    changed-label count of zero (labels only ever decrease, so the check is a
    cheap ``new < old`` join).  Rounds needed = the max component diameter —
    near-dup clusters are shallow, so this converges in a handful of rounds;
    ``max_rounds`` bounds adversarial chains and a warning fires if the bound
    is hit.  Each round touches only the (small) pair table, never the corpus.

    Pointer-jumping alone is NOT correct here: min-parent pointers cannot
    cross a "valley" (chain 2—5—1 leaves 2 rooted at itself), which is why
    propagation goes along edges every round.

    Near-dup pair graphs are usually TINY relative to the corpus (the
    whole point of blocking), so labeling is tiered by distinct-edge count
    — the same broadcast-sized-iteration reasoning as operators/graph.py
    DRIVER_LOOP_MAX_EDGES, every tier property-tested identical:

    1. <= ``driver_threshold_edges``: driver-side union-find (python,
       any node type);
    2. <= ``numpy_threshold_edges`` with integer ids: driver-side
       VECTORIZED min-label propagation (numpy scatter-min + pointer
       jumping, ~1 s per 27M-edge pass) — mid-size graphs where the
       distributed loop's ~4 scheduled jobs per round dominate but python
       union-find would crawl;
    3. else: the distributed fixpoint below (also the fallback for
       non-integer node ids).  ``driver_threshold_edges=0`` forces it.
    """
    from pyspark.storagelevel import StorageLevel
    from pyspark.sql import types as T

    from carto_etl_spark.operators.probe import (
        default_probe_budget,
        static_row_width,
    )

    # Persist policy for the distinct edge list (r9/r10): a cache pays off
    # only when MORE THAN ONE job reads the pair plan, which is typically
    # the expensive part of the whole operator (fuzzy/LSH blocking joins).
    # Skip the upfront persist ONLY when the probe provably runs a single
    # job — fixed-width schema AND the worst-case capped materialization
    # fits the live byte budget (the same predicate arrow_probe's shortcut
    # uses; under a smaller maxResultSize the probe falls back to its
    # two-job sample path, which MUST see a cache or it replays the
    # blocking join end to end — the r9 golden_records regression).  If
    # the probe then declines at runtime and the distributed tier runs,
    # that tier persists the edge list lazily before doubling it (the
    # union reads ``und`` twice).  A/B at sf0.1: neutral under host
    # noise; the win is not paying to cache a 26M-row edge list nobody
    # re-reads at corpus scale.
    # ``assume_distinct``: callers whose pair list is unique BY
    # CONSTRUCTION (minhash_dedup: the candidate list is deduped before
    # the one-row-per-pair verify join) skip the distinct's exchange +
    # two aggregate passes; every labeling tier tolerates duplicate
    # edges anyway (union-find/scatter-min are idempotent per edge, the
    # distributed tier re-distincts after doubling), so the flag is a
    # pure plan-shape saving, never a correctness risk.
    und = pairs.select("id_a", "id_b")
    if not assume_distinct:
        und = und.distinct()
    width = static_row_width(und)
    node_int = isinstance(pairs.schema["id_a"].dataType, T.IntegralType)
    probe_cap = (
        max(driver_threshold_edges, numpy_threshold_edges)
        if node_int
        else driver_threshold_edges
    )
    single_job = (
        driver_threshold_edges > 0
        and width is not None
        and (probe_cap + 1) * width * 2 <= default_probe_budget(und)
    )
    caches: list = []
    if not single_job:
        caches.append(und.persist(StorageLevel.MEMORY_AND_DISK))
    try:
        return _min_label_components_tiered(
            pairs, und, max_rounds, driver_threshold_edges,
            numpy_threshold_edges, caches,
        )
    finally:
        for cached in caches:
            cached.unpersist(blocking=False)


def _min_label_components_tiered(
    pairs, und, max_rounds, driver_threshold_edges, numpy_threshold_edges,
    caches=None,
) -> DataFrame:
    if driver_threshold_edges > 0:
        # Arrow both ways: a 1M-edge probe is ~16 MB columnar (broadcast-
        # sized — the same budget a broadcast join spends), vs seconds of
        # Row-object materialization through collect().  driver_threshold=0
        # forces the fully-distributed path (it gates BOTH driver tiers).
        import numpy as np
        import pandas as pd

        from pyspark.sql import types as T

        node_type = pairs.schema["id_a"].dataType
        schema = T.StructType(
            [
                T.StructField("node", node_type),
                T.StructField("root", node_type),
            ]
        )
        # the numpy tier only applies to integral node ids — for any other
        # key type, probing past driver_threshold would haul up to 50M+1
        # edge rows onto the driver (risking maxResultSize) just to be
        # discarded by the dtype check below, so cap the probe accordingly.
        # The probe itself is BYTE-budgeted against the live maxResultSize
        # (operators/probe.py, r8 verdict #7): 50M int64 pairs are ~800 MB
        # over Arrow, but the same edge count of wide keys would die in
        # the transfer — probe returns None and the distributed tier runs.
        from carto_etl_spark.operators.probe import arrow_probe

        probe_cap = (
            max(driver_threshold_edges, numpy_threshold_edges)
            if isinstance(node_type, T.IntegralType)
            else driver_threshold_edges
        )
        probe = arrow_probe(und, probe_cap)
        if probe is None:
            pass  # byte budget binds: fall through to the distributed tier
        elif probe.num_rows <= driver_threshold_edges:
            result = _union_find_min_roots(
                list(
                    zip(
                        probe.column("id_a").to_pylist(),
                        probe.column("id_b").to_pylist(),
                    )
                )
            )
            pdf = pd.DataFrame(result, columns=["node", "root"])
            return pairs.sparkSession.createDataFrame(pdf, schema)
        elif probe.num_rows <= numpy_threshold_edges:
            arr_a = probe.column("id_a").to_numpy(zero_copy_only=False)
            arr_b = probe.column("id_b").to_numpy(zero_copy_only=False)
            if np.issubdtype(arr_a.dtype, np.integer) and np.issubdtype(
                arr_b.dtype, np.integer
            ):
                nodes, roots = _numpy_min_label_roots(arr_a, arr_b)
                pdf = pd.DataFrame({"node": nodes, "root": roots})
                return pairs.sparkSession.createDataFrame(pdf, schema)
            # non-integer node ids (e.g. string keys): fall through to the
            # distributed fixpoint, which is type-agnostic
    from pyspark.storagelevel import StorageLevel

    # the doubling union below reads ``und`` TWICE: if the caller's persist
    # policy skipped the upfront cache (single-job probe predicted), add it
    # now so the expensive pair plan materializes once, not per branch;
    # the caller's finally unpersists everything registered in ``caches``
    if caches is not None and all(c is not und for c in caches):
        caches.append(und.persist(StorageLevel.MEMORY_AND_DISK))

    # persist (NOT localCheckpoint) for the big edge table: it is referenced
    # every round from the SAME plan so lineage never grows, persist blocks
    # are evictable/spillable under executor memory pressure, and — unlike
    # checkpoint blocks — an explicit unpersist() frees them the moment the
    # fixpoint returns.  At 10x the tiled pair graph is 26.9M edges; keeping
    # it pinned as checkpoint blocks starved 32 concurrent hash-agg tasks
    # into AGGREGATE_OUT_OF_MEMORY.  Doubling reads the already-cached
    # distinct edge list (``und``), not the raw pair plan.
    edges = (
        und.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(und.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # seed: min over self + direct neighbors
        labels = _materialize(
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.least(F.min("dst"), F.min("src")).alias("root"))
        )
        for _ in range(max_rounds):
            neighbor_best = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.min("root").alias("nroot"))
            )
            improved = (
                labels.join(neighbor_best, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("root"), F.coalesce(F.col("nroot"), F.col("root"))
                    ).alias("root"),
                    (F.col("nroot") < F.col("root")).alias("__changed"),
                )
            )
            improved = _materialize(improved)
            changed = improved.filter(F.col("__changed")).count()
            labels = improved.drop("__changed")
            if changed == 0:
                return labels
        import logging

        logging.getLogger("carto-etl-spark").warning(
            "min_label_components: not converged after %d rounds; residual "
            "labels may be non-minimal (component diameter exceeds the bound)",
            max_rounds,
        )
        return labels
    finally:
        edges.unpersist(blocking=False)


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    verify_exact: bool = False,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-dedup: build LSH candidate pairs (est Jaccard >= threshold), take
    connected components over the pair graph, and keep only each component's
    minimum-id document.  Survivorship is TRANSITIVE: in a duplicate chain
    a~b~c only a survives, even when c never directly pairs with a — the
    component labels come from fixpoint min propagation
    (``min_label_components``), so chains of any depth resolve to the true
    minimum, deterministically.  The corpus is touched once by the final
    anti-join; all iteration happens on the sketch-sized pair list.

    ``verify_exact=True`` replaces the signature-estimated Jaccard filter
    with EXACT n-gram Jaccard verification of the LSH candidates
    (``verify_pairs_jaccard``): no borderline pair is mis-kept or mis-dropped
    by sketch noise, at the cost of one array_intersect per candidate.  With
    exact verification the edge set is SQL-reproducible, which is how the
    duckdb oracle checks this operator end to end.

    ``max_bucket_size`` passes through to ``lsh_candidate_pairs``'s
    hot-bucket star-pairing (``None`` disables the cap entirely)."""
    # exploded-agg signature table (codegen'd; see minhash_signatures) —
    # (id, sig) is all the banding and est/verify joins ever read
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_words)
    cands = lsh_candidate_pairs(
        sigs, id_col, bands=bands, max_bucket_size=max_bucket_size
    )
    if verify_exact:
        # cheap sketch prefilter before the exact join: drop candidates whose
        # ESTIMATED Jaccard sits more than ~4 sigma below the threshold
        # (sigma = sqrt(t(1-t)/num_hashes) ~ 0.0625 at 64 hashes) — a true
        # >=t pair fails this with P ~ 3e-5, while band-collision false
        # positives (the bulk of the candidate list at narrow bands) never
        # reach the array-intersect join at all.
        margin = 4.0 * (threshold * (1.0 - threshold) / num_hashes) ** 0.5
        # materialize BEFORE verify: verify_pairs_jaccard references the pair
        # list three times (two join sides + the touched-id semi-join), and an
        # unmaterialized candidate plan would replay the banded self-join per
        # reference (the module's _materialize rule).  Lazy checkpoint: the
        # count() below is a FULL action over the same frame, so checkpoint
        # materialization and the count share one job (the rfm pattern;
        # eager=True paid a separate materialization job first).
        prefiltered = cands.filter(
            F.col("est_jaccard") >= threshold - margin
        ).select("id_a", "id_b").localCheckpoint(eager=False)
        # decide the verify join strategy from the ACTUAL candidate count
        # (cheap: prefiltered is checkpointed): a sane LSH candidate list is
        # corpus-linear and broadcast-friendly; past ~5M pairs (~80 MB of
        # id longs, and a sign the banding has degenerated) the shuffle
        # join is the survivable plan.
        bc = prefiltered.count() <= 5_000_000
        pairs = _materialize(
            verify_pairs_jaccard(
                prefiltered, df, id_col, text_col, shingle_words, threshold,
                broadcast_pairs=bc,
            )
        )
    else:
        pairs = _materialize(cands.filter(F.col("est_jaccard") >= threshold))
    # the pair list is distinct by construction on BOTH arms: the
    # candidate list is deduped before est/verify and each verify join
    # emits one row per pair — skip the components' distinct exchange
    labels = min_label_components(pairs, assume_distinct=True)
    doomed = labels.filter(F.col("node") != F.col("root")).select(
        F.col("node").alias(id_col)
    )
    return df.join(doomed, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_expr(text, bits: int = 64):
    """64-bit SimHash over whitespace tokens: per-token xxhash64; each bit of
    the result is the sign of the sum of (+1/-1) contributions.  Pure array
    arithmetic: one aggregate pass builds the 64 counters, a second packs the
    sign bits via bitwise OR against literal bit masks (OR never overflows —
    bit 63's mask is the sign bit itself)."""
    toks = tokens_expr(normalize_text_expr(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)

    def bit_vec(h):
        # shift amounts are Python ints (column shift amounts are unsupported)
        return F.array(
            *[
                F.when(
                    F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for b in range(bits)
            ]
        )

    counters = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(acc, bit_vec(h), lambda a, c: a + c),
    )
    masks = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(bits)
        ]
    )
    packed = F.aggregate(
        F.zip_with(
            counters,
            masks,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )
    return F.when(F.size(toks) > 0, packed)


def with_simhash(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash"
) -> DataFrame:
    """Set-oriented SimHash: explode tokens, hash once per token, then ONE
    vectorized hash aggregate computes all 64 bit counters as scalar sums
    (whole-stage codegen; no per-row array allocation).  ~2-4x faster than
    the per-row array expression for corpus-sized inputs; one shuffle on the
    doc id.  Token-less documents are absent from the output (matching the
    NULL signature of ``simhash_expr``)."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_expr(normalize_text_expr(text_col))).alias("__t"),
    ).select(id_col, F.xxhash64("__t").alias("__h"))
    # parsed SQL strings instead of per-bit Column chains: the Column form
    # cost ~10 py4j round-trips per bit for the counter aggs plus ~6 per
    # bit for the packing OR — ~1.5 s of DRIVER time per call (measured
    # r11), re-paid on every run.  Same typed expressions after parsing:
    # `&`/`|` are bitwiseAND/OR, the masks are long literals, values
    # bit-identical (simhash golden-table oracle pins them).
    aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftrightunsigned(__h, {b}) & 1) = 1 "
            "THEN 1 ELSE -1 END)"
        ).alias(f"__c{b}")
        for b in range(64)
    ]
    counters = toks.groupBy(id_col).agg(*aggs)
    packed = " | ".join(
        f"(CASE WHEN __c{b} > 0 THEN "
        f"{(1 << b) if b < 63 else -(1 << 63)}L ELSE 0L END)"
        for b in range(64)
    )
    return counters.select(F.col(id_col), F.expr(packed).alias(out_col))


def hamming_distance_expr(a, b, bits: int = 64):
    """Popcount of XOR via bit_count (built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Near-pairs by SimHash: block on 16-bit prefixes (4 rotations) so only
    same-block rows join — standard SimHash blocking: any pair within hamming
    distance r <= 3 shares at least one of 4 disjoint 16-bit blocks."""
    sh = _materialize(
        with_simhash(df, id_col, text_col, "__sh").withColumnRenamed(
            id_col, "__id"
        )
    )
    blocks = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("__sh"), i * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(64 // block_bits)
                ]
            )
        ).alias("b"),
    ).select("__id", "__sh", "b.blk", "b.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            hamming_distance_expr(F.col("a.__sh"), F.col("b.__sh")).alias(
                "hamming"
            ),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification-grade similarity)
# ---------------------------------------------------------------------------

def _staged_shingles(df: DataFrame, id_col: str, text_col: str, n: int,
                     use_chars: bool, shingle_chars: int) -> DataFrame:
    """(__id, __sh, __size) with distinct shingles.  Shingle-less documents
    are NOT filtered here, deliberately: a ``__size > 0`` filter gets
    alias-substituted by predicate pushdown and lands the ENTIRE
    tokenize+shingle expression in the parquet scan's DataFilters — the scan
    cannot split below a row group, so the plan's most expensive computation
    would serialize onto the scan tasks (measured 6x slowdown at sf0.1).
    Every consumer already tolerates empty sets: explode() drops them for
    free in the join paths, and verification scores them 0/NULL, below any
    positive threshold."""
    if use_chars:
        staged = df.withColumn("__pre", normalize_text_expr(text_col))
        shingles = char_shingles_expr("__pre", shingle_chars, prenormalized=True)
    else:
        staged = df.withColumn(
            "__pre", tokens_expr(normalize_text_expr(text_col))
        )
        shingles = word_shingles_expr("__pre", n, pretokenized=True)
    return (
        staged.select(F.col(id_col).alias("__id"), shingles.alias("__sh"))
        .withColumn("__size", F.size("__sh"))
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.5,
    use_chars: bool = False,
    shingle_chars: int = 5,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs with AllPairs/PPJoin-style prefix filtering
    (public algorithms: Bayardo et al. WWW'07, Xiao et al. WWW'08) — same
    results as ``ngram_jaccard_pairs``, built to scale:

    - shingles are canonically ordered RAREST-FIRST (ascending document
      frequency): for Jaccard >= t two sets must share a shingle within their
      first ``|S| - ceil(t*|S|) + 1`` elements, so only those prefixes are
      exploded for candidate generation.  Hot shingles (the skew killers in
      the naive self-join's shuffle) sort LAST and rarely enter a prefix;
    - a symmetric length filter prunes candidates whose sizes cannot reach t;
    - verification is one ``array_intersect`` per surviving candidate pair —
      exact set arithmetic, no FP.

    Output schema matches ngram_jaccard_pairs: (id_a, id_b, inter, union_sz,
    jaccard)."""
    base = _materialize(
        _staged_shingles(df, id_col, text_col, n, use_chars, shingle_chars)
    )
    exploded = base.select("__id", F.explode("__sh").alias("__g"))
    dfreq = exploded.groupBy("__g").agg(F.count(F.lit(1)).alias("__cnt"))
    ordered = _materialize(
        exploded.join(dfreq, "__g")
        .groupBy("__id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__cnt", "__g"))),
                lambda s: s["__g"],
            ).alias("__sh")
        )
        .withColumn("__size", F.size("__sh"))
    )
    # prefix length: |S| - ceil(t|S|) + 1; the 1e-9 guards FP ceil overshoot
    prefix_len = (
        F.col("__size")
        - F.ceil(F.lit(min_jaccard) * F.col("__size") - F.lit(1e-9))
        + 1
    ).cast("int")
    # posexplode keeps each prefix gram's 1-based position in the canonical
    # array — the input to the PPJoin positional filter below
    prefixes = _materialize(
        ordered.select(
            "__id",
            "__size",
            F.posexplode(F.slice("__sh", F.lit(1), prefix_len)).alias(
                "__pos0", "__g"
            ),
        ).withColumn("__pos", F.col("__pos0") + 1).drop("__pos0")
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    size_ok = F.least(F.col("a.__size"), F.col("b.__size")) >= F.ceil(
        F.lit(min_jaccard)
        * F.greatest(F.col("a.__size"), F.col("b.__size"))
        - F.lit(1e-9)
    )
    # Positional filter (Xiao et al. WWW'08): take the GLOBALLY-smallest
    # shared prefix gram of the pair — because the canonical order is global,
    # min(pos_a) and min(pos_b) over prefix matches are achieved by the same
    # gram, and no shared gram can precede it on either side (an earlier
    # shared gram would occupy an earlier position in BOTH prefixes,
    # contradicting minimality).  Hence inter <= 1 + min(|a|-pa, |b|-pb),
    # while Jaccard >= t requires inter >= t*(|a|+|b|)/(1+t); pairs whose
    # bound cannot reach that never enter verification (99%+ of candidates
    # on a near-dup-dense corpus).
    required = F.ceil(
        F.lit(min_jaccard)
        * (F.col("size_a") + F.col("size_b"))
        / F.lit(1.0 + min_jaccard)
        - F.lit(1e-9)
    )
    ubound = F.lit(1) + F.least(
        F.col("size_a") - F.col("pa"), F.col("size_b") - F.col("pb")
    )
    cand = (
        a.join(
            b,
            (F.col("a.__g") == F.col("b.__g"))
            & (F.col("a.__id") < F.col("b.__id"))
            & size_ok,
        )
        .groupBy(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .agg(
            F.first("a.__size").alias("size_a"),
            F.first("b.__size").alias("size_b"),
            F.min("a.__pos").alias("pa"),
            F.min("b.__pos").alias("pb"),
        )
        .where(ubound >= required)
        .select("id_a", "id_b")
    )
    verified = (
        cand.join(
            ordered.select(
                F.col("__id").alias("id_a"),
                F.col("__sh").alias("__sh_a"),
                F.col("__size").alias("size_a"),
            ),
            "id_a",
        )
        .join(
            ordered.select(
                F.col("__id").alias("id_b"),
                F.col("__sh").alias("__sh_b"),
                F.col("__size").alias("size_b"),
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn(
            "union_sz", F.col("size_a") + F.col("size_b") - F.col("inter")
        )
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return verified.select("id_a", "id_b", "inter", "union_sz", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.5,
    use_chars: bool = False,
    shingle_chars: int = 5,
) -> DataFrame:
    """Exact Jaccard over n-gram sets for candidate generation at *small*
    scale (or verification of LSH candidates at large scale): explode shingles,
    self-join on shared shingle, count intersections, derive union from set
    sizes.  Shuffle key = shingle value."""
    if use_chars:
        staged = df.withColumn("__pre", normalize_text_expr(text_col))
        shingles = char_shingles_expr("__pre", shingle_chars, prenormalized=True)
    else:
        staged = df.withColumn(
            "__pre", tokens_expr(normalize_text_expr(text_col))
        )
        shingles = word_shingles_expr("__pre", n, pretokenized=True)
    base = staged.select(
        F.col(id_col).alias("__id"), shingles.alias("__sh")
    ).withColumn("__size", F.size("__sh"))
    exploded = _materialize(
        base.select("__id", "__size", F.explode("__sh").alias("__g"))
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__g") == F.col("b.__g"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__size").alias("size_a"),
            F.col("b.__size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    )
    return inter.select(
        "id_a",
        "id_b",
        F.col("inter"),
        (F.col("size_a") + F.col("size_b") - F.col("inter")).alias("union_sz"),
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


# ---------------------------------------------------------------------------
# Cross-document line/paragraph dedup (CCNet-style)
# ---------------------------------------------------------------------------

def doc_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """One row per (doc, position, unit) — position preserves reassembly
    order.  NULL texts produce no rows (handled by the caller's left join).
    ``sep`` is the unit boundary STRING: "\\n" for lines (default),
    "\\n\\n" for paragraphs (the RefinedWeb granularity).  It is treated
    literally on both sides of the round-trip: the split regex-escapes it
    (F.split takes a regex) so a separator carrying regex metacharacters
    ("|", ".") splits exactly where reassembly's literal array_join will
    re-join (r8 ADVICE: the literal/regex duality used to live only in a
    docstring)."""
    import re as _re

    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("pos", "line"),
    )


def repeated_lines(
    lines: DataFrame,
    max_occurrences: int = 1,
    min_line_chars: int = 10,
) -> DataFrame:
    """Lines whose corpus-wide occurrence count exceeds ``max_occurrences``,
    restricted to lines of at least ``min_line_chars`` non-space characters
    (short/blank lines are structural, not boilerplate, and are never
    dropped — matching the CCNet practice of deduping substantive lines
    only).

    groupBy, not a count-window, on purpose: partial aggregation collapses a
    hot boilerplate line ("All rights reserved.") map-side, so a line with a
    billion occurrences shuffles one row per input partition, where a
    count-over-window would funnel all billion rows into one reducer."""
    return (
        lines.where(F.length(F.trim(F.col("line"))) >= min_line_chars)
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_occurrences)
        .select("line")
    )


def drop_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 1,
    min_line_chars: int = 10,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style cross-document line dedup: remove every occurrence of any
    substantive line that appears more than ``max_occurrences`` times in the
    corpus (navigation chrome, cookie banners, license boilerplate), then
    reassemble documents in original line order.  ``sep="\\n\\n"`` turns
    this into RefinedWeb-style PARAGRAPH dedup — same plan, coarser unit
    (raise ``min_line_chars`` accordingly; a paragraph under ~20 chars is
    structural).

    Output = input schema with ``text_col`` rewritten, plus ``n_lines_kept``
    / ``n_lines_dropped``.  Documents whose every line is dropped survive
    with empty text (a downstream length filter decides their fate);
    NULL-text documents pass through unchanged.

    Scale — the DROP-LIST plan (r10; the old shape shuffled the corpus
    text twice): the only full-text shuffle left is the line-count groupBy
    (map-side collapse, irreducible — it IS the cross-document signal).
    Boilerplate membership then flows as a semi-join of exploded lines
    against the repeated set (AQE broadcasts the small side), producing a
    per-doc drop-list of INTEGER positions; that list — bytes of ints, not
    line text — is the only thing the regroup shuffles, and the final join
    attaches it back to the UNEXPLODED documents (broadcast when it fits),
    where the rewrite is pure scan-stage array math
    (``F.filter``/``F.transform`` over the split).  The reassembly
    ``array_sort(collect_list(struct(pos, line)))`` — all corpus text
    through a second exchange plus a per-doc sort — is gone.  Nothing
    driver-side, no UDFs."""
    import re as _re

    lines = doc_lines(df, text_col, id_col, sep)
    boiler = repeated_lines(lines, max_occurrences, min_line_chars)
    # Rejoin-side widen (r11): the drop-list attach join keeps the LEFT
    # side's partitioning, so the whole downstream rewrite (array filter +
    # rejoin) AND every caller stage stacked above it (token gates, PII
    # scrub, classifier scoring, the pipeline boundary checkpoint, the
    # minhash signature map side) runs at the SCAN's parallelism — on the
    # single-row-group toy parquet that is 2 tasks of 32 (measured r11:
    # the e2e boundary + signature map jobs were 1.9 s on 2 tasks).  A
    # round-robin repartition of ONLY this branch spreads it; the line
    # branch (explode -> line-count agg) keeps reading the narrow scan, so
    # the synthesized text is shuffled at most ONCE (the r10 negative
    # result widened the shared pages frame and paid the shuffle twice).
    # Catalyst keeps deterministic projections ABOVE a round-robin
    # exchange, so the rewrite runs wide.  Guarded like queries.widen():
    # a corpus-scale scan already yields >= defaultParallelism splits and
    # the repartition never fires.
    rejoin = df
    try:
        parts = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < parts:
            rejoin = df.repartition(parts)
    except Exception:
        rejoin = df
    # positions of boilerplate occurrences only: short/blank lines are
    # structural and never dropped, so they never enter the semi-join
    drops = (
        lines.where(F.length(F.trim(F.col("line"))) >= min_line_chars)
        .join(boiler, on="line", how="left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__drops"))
    )
    parts = F.split(F.col(text_col), _re.escape(sep))
    droplist = F.coalesce(F.col("__drops"), F.array().cast("array<int>"))
    kept_parts = F.filter(
        parts,
        lambda line, i: ~F.array_contains(droplist, i),
    )
    n_lines = F.size(parts)
    is_null = F.col(text_col).isNull()
    out = (
        rejoin.join(drops, on=id_col, how="left")
        .withColumn(
            "n_lines_kept",
            F.when(is_null, F.lit(None).cast("long")).otherwise(
                (n_lines - F.size(droplist)).cast("long")
            ),
        )
        .withColumn(
            "n_lines_dropped",
            F.when(is_null, F.lit(None).cast("long")).otherwise(
                F.size(droplist).cast("long")
            ),
        )
        .withColumn(
            "__final",
            F.when(is_null, F.lit(None).cast("string")).otherwise(
                F.array_join(kept_parts, sep)
            ),
        )
        .drop("__drops")
        .drop(text_col)
        .withColumnRenamed("__final", text_col)
    )
    return out


# ---------------------------------------------------------------------------
# Duplicated token-span removal (ExactSubstr-style)
# ---------------------------------------------------------------------------

def drop_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_occurrences: int = 1,
) -> DataFrame:
    """Remove every corpus-duplicated token span of length >= ``k`` tokens
    (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" exact-substring dedup, at token granularity): any ``k``-token
    window that occurs more than ``max_occurrences`` times corpus-wide marks
    its ``k`` positions as duplicated; overlapping marked windows merge into
    maximal spans, which are cut from the document.  Unlike line dedup
    (``drop_repeated_lines``) this catches boilerplate that crosses line
    boundaries or is embedded mid-sentence.

    The reference's tier-A surface has no corpus operator like this; it is a
    north-star LLM-pipeline extension (BASELINE.json).

    Output: ``id_col``, ``n_tokens``, ``dup_tokens``, ``n_dup_spans``, and
    ``text_col`` rewritten with duplicated spans removed (surviving tokens
    rejoined with single spaces).  Tokenization is whitespace-collapsed so
    the operator is insensitive to run-length of separators.

    Scale:
    - k-gram fingerprints are 60-bit md5-prefix ints (portable to the
      DuckDB oracle); the duplicate-gram groupBy collapses map-side, so a
      billion-occurrence gram shuffles one row per partition;
    - marking is an inner join of doc grams against the (small) duplicated
      set — shuffle bounded by true duplicate volume, AQE skew-splits hot
      grams;
    - span merge is one window per doc (classic interval-merge prefix-max),
      one exchange on ``id_col``;
    - reassembly uses index-aware higher-order functions on the token array
      (exists over the per-doc merged-span array) — no explode back to one
      row per token, no UDFs.
    """
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("__toks")
    )
    # posexplode of the k-gram hash array: one row per window start.
    # sequence(0, size-k) is only valid when size >= k — short docs carry no
    # windows and pass through via the left join below.
    grams = (
        base.where(F.size("__toks") >= k)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - k),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(F.concat_ws(" ", F.slice("__toks", i + 1, k))),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long"),
                )
            ).alias("pos", "gram_h"),
        )
    )
    dup = (
        grams.groupBy("gram_h")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_occurrences)
        .select("gram_h")
    )
    marked = grams.join(dup, on="gram_h").select(
        id_col, "pos", (F.col("pos") + k - 1).alias("endpos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("endpos").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = marked.withColumn(
        "__new_span",
        F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "__span_id",
        F.sum("__new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = (
        flagged.groupBy(id_col, "__span_id")
        .agg(F.min("pos").alias("s"), F.max("endpos").alias("e"))
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "e"))).alias("__spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
            F.count(F.lit(1)).alias("n_dup_spans"),
        )
    )
    joined = base.join(spans, on=id_col, how="left")
    kept = F.filter(
        "__toks",
        lambda x, i: ~F.exists(
            "__spans", lambda sp: (i >= sp["s"]) & (i <= sp["e"])
        ),
    )
    return joined.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.when(F.col("__spans").isNull(), F.concat_ws(" ", F.col("__toks")))
        .otherwise(F.concat_ws(" ", kept))
        .alias(text_col),
    )
