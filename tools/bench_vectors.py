"""Measure the vector family at REAL corpus sizes (r5 verdict #1).

Runs each vector operator at two corpus sizes (default 50k and 500k rows —
generate with tools/make_vector_testdata.py) and reports min-of-2 warm
wall-clock plus the size ratio, the format SCALING.md records.

Two measurement tiers:

- **catalog entries** (cosine_topk, ann_topk, ann_ivf, ann_pq, ann_ivf_sq8,
  quant_recall, embedding_near_dup, semantic_dedup): run exactly as the
  driver does — but note several pin index parameters (n_lists=8,
  n_clusters=8) for oracle determinism, so their large-corpus behavior
  includes the pinned-parameter artifact (e.g. 8 IVF lists over 500k rows
  probe ~3/8 of the corpus by design).
- **scaled-parameter operator runs**: the same algorithms with the
  parameters a real deployment would use at that corpus size
  (n_lists ~ sqrt(n), SemDeDup n_clusters ~ n/500) — this is the honest
  100 TB posture measurement.

Usage: python tools/bench_vectors.py [small_dir] [big_dir]
       (defaults /tmp/carto-vec50k /tmp/carto-vec500k)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from carto_etl_spark.session import get_spark

# NOTE: two catalog entries are deliberately absent, both quadratic BY
# PINNED PARAMETER (oracle determinism), not by algorithm:
# - embedding_near_dup: single-band 8-plane config -> ~n^2/256 pairs; the
#   scale path is the banded variant measured below (neardup_banded_scaled).
# - semantic_dedup: n_clusters=8 -> cluster size n/8 -> sum c_i^2 ~ n^2/8
#   pairs; the scale path sizes n_clusters ~ n/200 (semdedup_scaled).
CATALOG = [
    "cosine_topk",
    "ann_topk",
    "ann_ivf",
    "ann_pq",
    "ann_ivf_sq8",
    "quant_recall",
]


def _run_scaled(name: str, spark, sf_dir: str, n: int):
    """Operator-level runs with size-appropriate parameters."""
    from carto_etl_spark.operators import similarity as sim
    from carto_etl_spark.operators.quantize import quantize_int8

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if name == "ivf_scaled":
        # n_lists ~ sqrt(n) (the FAISS heuristic), nprobe fixed at 8
        n_lists = max(8, int(math.sqrt(n)))
        query = [
            float(v)
            for v in e.filter(F.col("vec_id") == 1).first()["embedding"]
        ]
        centroids = sim.sampled_centroids(e, n_lists=n_lists)
        indexed = sim.assign_ivf_lists(e, centroids)
        probes = sim.probe_lists(centroids, query, nprobe=8)
        cands = indexed.filter(F.col("ivf_list").isin(probes))
        emb = F.col("embedding").cast("array<double>")
        q = F.array(*[F.lit(v) for v in query])
        return (
            cands.select(
                "vec_id",
                F.round(sim.cosine_fixed_expr(emb, q, len(query)), 6).alias("cos")
            )
            .orderBy(F.desc("cos"), "vec_id")
            .limit(10)
        )
    if name == "semdedup_scaled":
        # SemDeDup contract: clusters sized ~200 vectors -> pair volume
        # sum c_i^2 ~ n * 200, linear in n; bulk path (BLAS Gram blocks)
        return sim.semantic_dedup_bulk(
            e, n_clusters=max(8, n // 200), threshold=0.99
        ).groupBy("is_dup").count()
    if name == "neardup_banded_scaled":
        # bucket width scales with n (2^planes ~ n/4); 6 bands hold recall
        import math as _m

        planes = max(10, int(_m.log2(max(n, 2) / 4.0)))
        return sim.embedding_near_dup_banded(
            e, threshold=0.999, n_planes=planes, n_bands=6
        ).groupBy().count()
    if name == "sq8_scaled":
        q8 = quantize_int8(e, vec_col="embedding")
        return q8.select(
            F.sum(F.element_at("q_vec", 1)).alias("s")
        )
    raise KeyError(name)


def _time(fn, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/carto-vec50k"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/carto-vec500k"
    spark = get_spark("bench-vectors")
    spark.sparkContext.setLogLevel("ERROR")
    n_small = spark.read.parquet(f"{small}/embeddings.parquet").count()
    n_big = spark.read.parquet(f"{big}/embeddings.parquet").count()
    size_ratio = n_big / n_small
    print(f"corpus: {n_small} -> {n_big} rows ({size_ratio:.1f}x)\n")
    print("| entry | small s | big s | ratio | vs size |")
    print("|---|---|---|---|---|")

    from carto_etl_spark.queries import QUERIES

    def report(name, ts, tb):
        r = tb / ts if ts else float("inf")
        flag = "OK" if r <= size_ratio * 1.15 else "SUPRALINEAR"
        print(f"| {name} | {ts:.2f} | {tb:.2f} | {r:.2f}x | {flag} |",
              flush=True)

    for name in CATALOG:
        fn = QUERIES[name]
        ts = _time(lambda: fn(spark, small).collect())
        tb = _time(lambda: fn(spark, big).collect())
        report(name, ts, tb)
    for name in ["ivf_scaled", "semdedup_scaled", "sq8_scaled",
                 "neardup_banded_scaled"]:
        ts = _time(lambda: _run_scaled(name, spark, small, n_small).collect())
        tb = _time(lambda: _run_scaled(name, spark, big, n_big).collect())
        report(name, ts, tb)
    spark.stop()


if __name__ == "__main__":
    main()
