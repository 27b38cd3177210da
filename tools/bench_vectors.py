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

from carto_etl_spark.session import dense_scan_conf, get_spark

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
            for v in e.orderBy("vec_id").first()["embedding"]
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
        # bucket width scales with n (2^planes ~ n/4); 6 bands hold recall.
        # The aggregate folds planted-pair recall in (every 100th vector
        # has a near-identical partner at id + 10^9): `planted_found` must
        # equal the planted count or the banded stage lost a real pair.
        # UNROUNDED log2: occupancy-targeted banding (mixed floor/ceil
        # plane counts across bands) keeps expected bucket occupancy at
        # the n/4 target between integer steps — the integer-only step
        # made candidate volume jump up to 2x per step (SCALING.md r7)
        planes = max(10.0, math.log2(max(n, 2) / 4.0))
        pairs = sim.embedding_near_dup_banded(
            e, threshold=0.999, n_planes=planes, n_bands=6
        )
        return pairs.groupBy().agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(
                F.when(
                    (F.col("id_a") % 100 == 0)
                    & (F.col("id_b") == F.col("id_a") + 1_000_000_000),
                    1,
                ).otherwise(0)
            ).alias("planted_found"),
        )
    if name == "sq8_scaled":
        q8 = quantize_int8(e, vec_col="embedding")
        return q8.select(
            F.sum(F.element_at("q_vec", 1)).alias("s")
        )
    if name == "kmeans_scaled":
        # fixed k (not sqrt(n)) so per-row work is constant and the
        # quick gate's linear-scaling check stays meaningful: the
        # regression class this row exists to catch is the interpreted
        # fold (k*dim*0.5us/row) silently replacing the Arrow matmul
        from carto_etl_spark.operators import kmeans as km

        cents = km.kmeans_fit(e, k=64, iterations=2)
        return km.assign_clusters(e, cents).groupBy("cluster").count()
    if name == "knn_scaled":
        # k-NN graph with size-appropriate buckets (2^planes ~ n/8) and the
        # same 4-band OR amplification the near-dup scale path uses; the
        # aggregate also measures planted-dup recall (every 100th vector
        # has a near-identical partner at id + 10^9 — it must be rank 1)
        # UNROUNDED log2 -> occupancy-targeted banding (see the near-dup
        # row above); at 505k this was the r7 superlinear driver: the
        # integer step 12 -> 15 at 10x rows drove candidate volume 12.5x
        planes = max(10.0, math.log2(max(n, 2) / 8.0))
        g = sim.knn_graph(e, k=5, n_planes=planes, n_bands=4)
        return g.groupBy().agg(
            F.count(F.lit(1)).alias("edges"),
            F.sum(
                F.when(
                    (F.col("rank") == 1)
                    & (F.col("vec_id") % 100 == 0)
                    & (F.col("vec_id") < 1_000_000_000)
                    & (F.col("neighbor_id")
                       == F.col("vec_id") + 1_000_000_000),
                    1,
                ).otherwise(0)
            ).alias("planted_top1"),
        )
    raise KeyError(name)


def _time(fn, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


SCALED = ["ivf_scaled", "semdedup_scaled", "sq8_scaled",
          "neardup_banded_scaled", "knn_scaled", "kmeans_scaled"]


def _planted_sources(spark, sf_dir: str) -> int:
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(
            (F.col("vec_id") % 100 == 0)
            & (F.col("vec_id") < 1_000_000_000)
        )
        .count()
    )


def _quick(small: str) -> int:
    """CI-style regression gate (r6 verdict #7): ~2 minutes, small corpus
    vs its deterministic 1/10 slice, asserting the properties whose silent
    loss the round-6 measurements caught the hard way:

    * no scaled operator goes supralinear (ratio <= size_ratio * 1.3 —
      every real regression class here, interpreted HOF fallback /
      quadratic candidate volume / broadcast death, costs 10x+);
    * `assign_ivf_lists` still dispatches to the Arrow path at
      n_lists ~ sqrt(n) (the literal path is ~100x slower there);
    * banded near-dup and k-NN keep 100% planted-pair recall.

    Exit code 0 = gate green; 1 with a FAIL line per violation.
    Run after touching similarity.py/quantize.py:
        python tools/bench_vectors.py --quick
    (full 505k measurement: python tools/bench_vectors.py)
    """
    import math as _m

    from carto_etl_spark.operators import similarity as sim

    # Scope the 16MB dense-scan packing to THIS vector-only job (it was
    # session-global in r8 and taxed every relational scan — r8 verdict #1)
    spark = get_spark("bench-vectors-quick", extra_conf=dense_scan_conf())
    dense_scan_conf(spark)  # in case getOrCreate reused a live session
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []

    e = spark.read.parquet(f"{small}/embeddings.parquet")
    tiny = "/tmp/carto-vec-quick"
    # vec_id % 10 == 0 keeps every planted pair intact (sources are
    # multiples of 100, partners differ by 10^9 — both % 10 == 0)
    if not os.path.exists(f"{tiny}/embeddings.parquet"):
        e.filter(F.col("vec_id") % 10 == 0).write.mode("overwrite").parquet(
            f"{tiny}/embeddings.parquet"
        )
    n_small = e.count()
    n_tiny = spark.read.parquet(f"{tiny}/embeddings.parquet").count()
    size_ratio = n_small / n_tiny
    print(f"quick gate: {n_tiny} -> {n_small} rows ({size_ratio:.1f}x)")

    # 1) Arrow dispatch at real list counts
    cents = sim.sampled_centroids(e, n_lists=max(8, int(_m.sqrt(n_small))))
    plan = (
        sim.assign_ivf_lists(e, cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    if "ArrowEvalPython" not in plan:
        failures.append(
            "FAIL ivf dispatch: assign_ivf_lists at n_lists~sqrt(n) did "
            "not take the Arrow bulk path"
        )

    # 2) sub-supralinear scaling + 3) planted recall
    results: dict[str, tuple[float, float]] = {}
    rows: dict[str, list] = {}
    for name in SCALED:
        tt = _time(
            lambda: rows.__setitem__(
                name, _run_scaled(name, spark, tiny, n_tiny).collect()
            )
        )
        ts = _time(
            lambda: rows.__setitem__(
                name, _run_scaled(name, spark, small, n_small).collect()
            )
        )
        results[name] = (tt, ts)
        r = ts / tt if tt else float("inf")
        print(f"  {name}: {tt:.2f}s -> {ts:.2f}s ({r:.2f}x)", flush=True)
        if r > size_ratio * 1.3:
            failures.append(
                f"FAIL {name}: {r:.2f}x at {size_ratio:.1f}x rows "
                "(supralinear — interpreted fallback or candidate blowup?)"
            )
    planted = _planted_sources(spark, small)
    nd = rows["neardup_banded_scaled"][0]
    if nd["planted_found"] != planted:
        failures.append(
            f"FAIL banded recall: {nd['planted_found']}/{planted} planted "
            "pairs found"
        )
    kg = rows["knn_scaled"][0]
    if kg["planted_top1"] != planted:
        failures.append(
            f"FAIL knn recall: {kg['planted_top1']}/{planted} planted "
            "partners at rank 1"
        )
    spark.stop()
    for f in failures:
        print(f)
    print("QUICK GATE:", "FAIL" if failures else "PASS")
    return 1 if failures else 0


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--quick"]
    if "--quick" in sys.argv[1:]:
        small = argv[0] if argv else "/tmp/carto-vec50k"
        raise SystemExit(_quick(small))
    small = argv[0] if len(argv) > 0 else "/tmp/carto-vec50k"
    big = argv[1] if len(argv) > 1 else "/tmp/carto-vec500k"
    spark = get_spark("bench-vectors", extra_conf=dense_scan_conf())
    dense_scan_conf(spark)  # in case getOrCreate reused a live session
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
    recalls: dict[str, tuple[int, int]] = {}
    planted_small = _planted_sources(spark, small)
    planted_big = _planted_sources(spark, big)
    for name in SCALED:
        out: dict = {}
        ts = _time(
            lambda: out.__setitem__(
                "s", _run_scaled(name, spark, small, n_small).collect()
            )
        )
        tb = _time(
            lambda: out.__setitem__(
                "b", _run_scaled(name, spark, big, n_big).collect()
            )
        )
        report(name, ts, tb)
        if name == "neardup_banded_scaled":
            recalls[name] = (
                out["s"][0]["planted_found"], out["b"][0]["planted_found"]
            )
        if name == "knn_scaled":
            recalls[name] = (
                out["s"][0]["planted_top1"], out["b"][0]["planted_top1"]
            )
    print(
        f"\nplanted recall (small {planted_small} / big {planted_big} "
        f"sources): " + ", ".join(
            f"{k}={v[0]}/{planted_small} and {v[1]}/{planted_big}"
            for k, v in recalls.items()
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
