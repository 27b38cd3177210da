"""Fixed-point Lloyd k-means (operators/kmeans.py): recovers planted
separable clusters, is bit-deterministic across runs and partitionings,
obeys the empty-cluster and tie-break rules, and its catalog entry's
oracle replay is covered by the differential harness (kmeans_embeddings).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from carto_etl_spark.operators import kmeans as km

DIM = 8
SCHEMA = "vec_id long, embedding array<double>, label int"


def _clustered(spark, per_cluster: int = 40, k: int = 4):
    """Deterministic well-separated clusters: center c at 4*unit(c) with
    small sin-based jitter — inter-center distance ~5.6, jitter <= 0.5."""
    rows = []
    vid = 0
    for c in range(k):
        center = [4.0 if i == c else 0.0 for i in range(DIM)]
        for j in range(per_cluster):
            jit = [0.5 * math.sin(vid * 31 + i * 7) for i in range(DIM)]
            rows.append((vid, [center[i] + jit[i] for i in range(DIM)], c))
            vid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_kmeans_recovers_planted_clusters(spark):
    df = _clustered(spark)
    cents = km.kmeans_fit(df, k=4, iterations=5, scale=10**6)
    out = km.assign_clusters(df, cents).select("label", "cluster").collect()
    # purity: every planted label maps to exactly one fitted cluster
    mapping: dict = {}
    agree = 0
    for r in out:
        by = mapping.setdefault(r["label"], {})
        by[r["cluster"]] = by.get(r["cluster"], 0) + 1
    for label, by in mapping.items():
        agree += max(by.values())
    assert agree / len(out) > 0.97, mapping
    # and the 4 fitted clusters are all used
    assert len({max(by, key=by.get) for by in mapping.values()}) == 4


def test_kmeans_is_partition_invariant_and_deterministic(spark):
    df = _clustered(spark)
    a = km.kmeans_fit(df, k=4, iterations=3)
    b = km.kmeans_fit(df.repartition(13), k=4, iterations=3)
    assert a == b  # integer sums are order-independent
    ca = {r["vec_id"]: r["cluster"]
          for r in km.assign_clusters(df, a).collect()}
    cb = {r["vec_id"]: r["cluster"]
          for r in km.assign_clusters(df.repartition(7), b).collect()}
    assert ca == cb


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two coincident points, k=2: one centroid captures both (tie-break to
    # the lower cid), the other is empty every round and must stay at its
    # seed instead of NaN-ing or vanishing
    df = spark.createDataFrame(
        [(1, [1.0] * DIM, 0), (2, [1.0] * DIM, 0)], SCHEMA
    )
    cents = km.kmeans_fit(df, k=2, iterations=2)
    assert len(cents) == 2
    out = {r["vec_id"]: r["cluster"]
           for r in km.assign_clusters(df, cents).collect()}
    assert set(out.values()) == {0}  # all points on the lower cid


def test_kmeans_validation(spark):
    df = _clustered(spark, per_cluster=2, k=2)
    with pytest.raises(ValueError, match=">= 1"):
        km.kmeans_fit(df, k=0)


def test_assign_fold_and_arrow_paths_are_bit_identical(spark):
    """The Arrow int64-matmul assignment must equal the fold argmin
    EXACTLY — distances are exact integers (c.c - 2q.c preserves ties),
    numpy's first-min tie rule == array_min's lower-cid rule.  Includes
    negative coordinates and exact-tie rows (coincident with two
    centroids' midpoint)."""
    rows = [
        (i, [((-1.0) ** i) * 0.25 * ((i * 7 + j * 3) % 11) for j in range(DIM)], 0)
        for i in range(60)
    ]
    # exact ties: rows equidistant from centroid 0 and centroid 1
    rows += [(100 + i, [0.5] * DIM, 0) for i in range(4)]
    df = spark.createDataFrame(rows, SCHEMA)
    cents = km.kmeans_fit(df, k=5, iterations=2, method="fold")
    assert cents == km.kmeans_fit(df, k=5, iterations=2, method="arrow")
    fold = {r["vec_id"]: r["cluster"] for r in
            km.assign_clusters(df, cents, method="fold").collect()}
    arrow = {r["vec_id"]: r["cluster"] for r in
             km.assign_clusters(df, cents, method="arrow").collect()}
    assert fold == arrow


def test_assign_auto_dispatches_to_arrow_above_cap(spark):
    df = _clustered(spark)
    # k*DIM = 4*8 = 32 <= cap -> fold (no ArrowEvalPython in plan)
    cents = km.kmeans_fit(df, k=4, iterations=1)
    plan_small = (
        km.assign_clusters(df, cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan_small
    # k*dim above the cap -> arrow
    big = [[i * 1000] * DIM for i in range(km._FOLD_ARGMIN_CAP // DIM + 1)]
    plan_big = (
        km.assign_clusters(df, big)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan_big


def test_arrow_overflow_envelope_raises(spark):
    # coordinates far outside the int64-exact envelope at a huge scale
    # must raise (the fold path raises via ANSI; silent numpy wrap would
    # give WRONG clusters)
    df = spark.createDataFrame(
        [(1, [1.0e12] * DIM, 0), (2, [-1.0e12] * DIM, 0)], SCHEMA
    )
    cents = [[9 * 10**17] * DIM, [-(9 * 10**17)] * DIM]
    with pytest.raises(Exception, match="envelope|ARITHMETIC|overflow"):
        km.assign_clusters(
            df, cents, scale=10**6, method="arrow"
        ).collect()


def test_kmeans_k_exceeding_rows_raises(spark):
    # 4 rows, k=9: must fail loudly instead of the pre-r8 IndexError from
    # indexing the short seed list (and instead of silently diverging from
    # the unrolled oracle, which would emit fewer cids)
    df = _clustered(spark, per_cluster=2, k=2)  # 4 rows
    with pytest.raises(ValueError, match="exceeds the number of rows"):
        km.kmeans_fit(df, k=9, iterations=1)


def test_assign_with_distance_fold_and_arrow_identical(spark):
    """The with-distance fold and the Arrow struct twin must agree on BOTH
    fields — exact integer distances, lower-cid tie rule."""
    df = _clustered(spark, per_cluster=15, k=3)
    cents = km.kmeans_fit(df, k=3, iterations=2)
    a = sorted(
        (r["vec_id"], r["cluster"], r["dist"])
        for r in km.assign_with_distance(df, cents, method="fold").collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["dist"])
        for r in km.assign_with_distance(df, cents, method="arrow").collect()
    )
    assert a == b
    # distance really is the squared integer L2 to the WINNING centroid
    row = next(r for r in km.assign_with_distance(df, cents).collect())
    q = [int(math.floor(x * 10**6 + 0.5)) for x in
         df.filter(F.col("vec_id") == row["vec_id"]).first()["embedding"]]
    want = sum((qi - ci) ** 2 for qi, ci in zip(q, cents[row["cluster"]]))
    assert row["dist"] == want


def test_diversity_sample_covers_every_cluster(spark):
    """m nearest-to-centroid reps per cluster: every planted cluster is
    represented, ranks are 1..m nearest-first, and the selection is
    deterministic across runs."""
    df = _clustered(spark, per_cluster=20, k=4)
    out = km.diversity_sample(df, k=4, m=2, iterations=2)
    rows = out.collect()
    assert len(rows) == 8
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 4
    for reps in by_cluster.values():
        ranks = sorted(r["rank"] for r in reps)
        assert ranks == [1, 2]
        d = {r["rank"]: r["dist"] for r in reps}
        assert d[1] <= d[2]
    again = sorted(tuple(r) for r in km.diversity_sample(
        df, k=4, m=2, iterations=2).collect())
    assert again == sorted(tuple(r) for r in rows)
