"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized on the driver (Arrow-batched toArrow — the
transfer path a real consumer of a large result would use; falls back to
row collect if Arrow conversion is unsupported for a result type), timed
wall-clock.  A small warmup query first so JVM/codegen startup is not billed
to the first benchmark entry.

Methodology (stable since r2, commit 0213617): toArrow materialization.  Per
query the reported number is the MEDIAN of $SPARK_GRAFT_BENCH_ITERS runs
(default 3) — single-shot timings moved ±20% on scheduling noise alone
(r2's simhash_pairs "regression" was exactly this).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The canonical cross-round comparison frame: round 1's 32 bench queries
# (BENCH_r01.json order).  Totals swing ±25% run-to-run as the catalog
# grows, while this frame holds at ~24-27 s — BASELINE.md records its
# median-of-3 denominator (24.587 s, r5 re-measure) and every bench emission
# prints the frame subtotal as "frame32" so BENCH_rN.json is
# self-comparable without manual recomputation.
FRAME32 = [
    "pricing_summary", "shipping_priority", "region_volume",
    "top_orders_per_customer", "locale_float_coercion", "dual_format_dates",
    "update_merge", "delete_antijoin", "geom_points", "overview_grid",
    "overview_rollup", "token_counts", "text_quality", "lang_id",
    "exact_dedup", "shingle_fingerprint", "cosine_topk", "events_window",
    "asof_join", "sessionize", "running_total", "rollup_revenue",
    "cube_revenue", "percentiles", "min_cost_supplier", "json_extract",
    "above_customer_avg", "geocode_lookup", "set_ops", "ingest_coercion",
    "simhash_pairs", "minhash_dedup",
]

BENCH_QUERIES = [
    "pricing_summary",
    "shipping_priority",
    "region_volume",
    "top_orders_per_customer",
    "locale_float_coercion",
    "dual_format_dates",
    "update_merge",
    "delete_antijoin",
    # r5: the S7/S8 demos now run the distributed keyed row index — track
    # their cost per round
    "chunk_assignment",
    "row_range",
    "geom_points",
    "overview_grid",
    "overview_rollup",
    "token_counts",
    "text_quality",
    "lang_id",
    "quality_classifier",
    "quality_mixture",
    "exact_dedup",
    "shingle_fingerprint",
    "cosine_topk",
    "events_window",
    "asof_join",
    "scd2_dimension",
    "sessionize",
    "running_total",
    "rollup_revenue",
    "cube_revenue",
    "percentiles",
    "sample_quantiles",
    "group_quantiles",
    "equi_depth_hist",
    "min_cost_supplier",
    "important_stock",
    "parts_supplier_relationship",
    "promotable_suppliers",
    "json_extract",
    "above_customer_avg",
    "geocode_lookup",
    "set_ops",
    "ingest_coercion",
    "simhash_pairs",
    "minhash_dedup",
    "pipeline_e2e",
    "pipeline_ccnet",
    # new r4 operators (per-query numbers are the comparable unit across
    # rounds; the total includes these from r4 on)
    "ngram_jaccard",
    "stateplane_transform",
    "datum_shift",
    "albers_transform",
    "bng_transform",
    "swiss_transform",
    "polar_transform",
    "audio_features",
    "stratified_sample",
    "temperature_mixture",
    "group_sample",
    "pack_sequences",
    "decontam",
    "pii_scrub",
    "repetition",
    "dataset_split",
    "bloom_dedup",
    "line_dedup",
    "span_dedup",
    "heavy_hitters",
    "hll_registers",
    "hll_grouped",
    "embedding_near_dup",
    "near_dup_banded",
    "knn_graph",
    "incremental_vec_near_dup",
    "kmeans_embeddings",
    "embedding_decontam",
    "streaming_kmeans",
    "semantic_dedup",
    "semantic_dedup_bulk",
    "streaming_cardinality",
    "streaming_quantiles",
    "lm_fluency",
    "incremental_mv",
    "tfidf_terms",
    "image_features",
    "image_near_dup",
    "audio_fingerprint",
    "nation_trade_volume",
    "returned_revenue",
    "promo_share",
    "idle_rich_customers",
    "funnel",
    "cohort_retention",
    "frequent_ngrams",
    "gif_features",
    "cow_dml",
    "range_join",
    "forecast_revenue",
    "order_count_distribution",
    "large_volume_customers",
    "jpeg_features",
    "video_frames",
    "sliding_windows",
    "market_share",
    "priority_with_big_lines",
    "top_supplier",
    "small_qty_revenue",
    "table_profile",
    "ship_delay_priority",
    "disjunctive_revenue",
    "waiting_suppliers",
    "chunk_documents",
    "data_quality",
    "resample_fill",
    "weighted_sample",
    "snapshot_diff",
    "fuzzy_pairs",
    "linkage_scores",
    "mad_outliers",
    "cusum_drift",
    "theil_sen",
    "psi_drift",
    "bpe_merges",
    "bpe_tokenize",
    "quant_recall",
    "export_shards",
    "textrank_keywords",
    "mixture_epoch",
    "pareto_parts",
    "streaming_export",
    "ann_ivf_sq8",
    "transitions",
    "value_histogram",
    "pivot_revenue",
    "spatial_contains",
    "spatial_nearest",
    "pagerank_nations",
    "nation_profit",
    "rolling_features",
    "bfs_hops",
    "spatial_polygons",
    "latest_per_key",
    "haversine_pairs",
    "attribution",
    "scd2_intervals",
    "deciles",
    "trajectory_length",
    "ohlc_bars",
    "state_runs",
    "bm25_scores",
    "triangle_count",
    "golden_records",
    "label_centroids",
    "quantize_int8",
    "random_projection",
    "split_leakage",
    "dsir_sample",
    "c4_rules",
    "gopher_repetition",
    # r9: the quality half of the Gopher rule set (scan-stage, no shuffle)
    "gopher_quality",
    # r9: hex-WKB passthrough decoding (pure column math, fixture-sized)
    "wkb_points",
    "pipeline_fineweb",
    "source_reputation",
    "paragraph_dedup",
    "hard_negatives",
    "diversity_sample",
    "seasonal_residuals",
    "drawdown",
    "shortest_paths",
    "contingency",
    "latency_bands",
    "revenue_share",
    "quality_auc",
    "value_ks",
    "revenue_gini",
    "benford_digits",
    "corr_matrix",
    "hashed_features",
    "peak_concurrency",
    "item_affinity",
    "rfm_segments",
    "url_canonical",
    "url_dedup",
    "unicode_fold",
    "dataset_shuffle",
    # incremental near-dup measured per PHASE (r5): build runs once per
    # bench iteration (fresh state dir), match runs against a per-process
    # prebuilt index — the steady-state number an incremental pipeline pays
    # per batch.  The combined lifecycle entry remains in the catalog for
    # correctness; its r4 bench line equals build + match.
    "lsh_index_build",
    "lsh_match_steady",
    "html_extract",
    "blocklist_filter",
    # r8: previously-unbenched catalog entries (r7 verdict #5 — no silent
    # gaps; the few deliberate exclusions live in EXCLUDED with reasons)
    "approx_stats",
    "compression_ratio",
    "image_dhash",
    "lcc_transform",
    "mktsegment_stats",
    "morton_tiles",
    "multimodal_features",
    "quality_scores",
    "salted_join",
    "threeway_fanout",
    "transactional_lifecycle",
    "utm_transform",
]

#: catalog entries deliberately NOT in BENCH_QUERIES — every exclusion
#: needs a reason here; tests/test_registry.py asserts
#: catalog == BENCH_QUERIES (disjoint-)union EXCLUDED, so an entry can
#: never silently go unbenched again.
EXCLUDED = {
    "ann_ivf": (
        "vector-family scaling is priced per-round by tools/"
        "bench_vectors.py at 50k/505k rows; the toy-sf reading adds host "
        "noise without information (ann_ivf_sq8 + quant_recall stay in "
        "BENCH_QUERIES as the family's bench canaries)"
    ),
    "ann_pq": "same policy as ann_ivf (bench_vectors.py covers it)",
    "ann_topk": "same policy as ann_ivf (bench_vectors.py covers it)",
    "incremental_near_dup": (
        "combined build+match lifecycle; priced per PHASE by the "
        "lsh_index_build + lsh_match_steady rows (see the r5 note above) "
        "— its bench line would equal their sum"
    ),
}


#: Three cheap scan/agg/window queries re-timed at the START and END of the
#: bench pass.  Their drift is a machine-readable host-noise indicator: on a
#: quiet host end/start stays ~1.0; a noisy-neighbor window shows up as
#: drift >> 1 (or canary medians far off their committed priors) WITHOUT
#: anyone having to narrate noise in SCALING.md prose (r8 verdict #4).
CANARIES = ["pricing_summary", "token_counts", "events_window"]

#: A query whose fresh median exceeds OUTLIER_FACTOR x its prior-round
#: BENCH_FULL.json median gets ONE same-session re-run (another median of
#: `iters`); the reported value is the min of the two medians.  This
#: removes one-off scheduling spikes without letting a real regression
#: hide: a true slowdown reproduces in the re-run and still lands >2x.
OUTLIER_FACTOR = 2.0


def _jvm_cpu_reader(spark):
    """JVM-process CPU seconds (utime+stime).  In local mode executors
    live in the driver JVM, so deltas across a query are its executor+
    driver CPU — the noise-robust sidecar metric (r11 verdict item 2:
    CPU time separates host windows from code).  Returns None when /proc
    is unavailable; callers skip the sidecar then."""
    try:
        jvm_pid = int(
            spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
        )
        clk = os.sysconf("SC_CLK_TCK")
        with open(f"/proc/{jvm_pid}/stat") as fh:
            fh.read()
    except Exception:
        return None

    def read() -> float:
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / clk

    return read


def _median_run(fn, spark, sf_dir: str, iters: int, cpu_read=None):
    samples = []
    cpu_samples = []
    for _ in range(iters):
        c0 = cpu_read() if cpu_read else 0.0
        t0 = time.time()
        try:
            rows = fn(spark, sf_dir).toArrow()
        except Exception:
            rows = fn(spark, sf_dir).collect()
        samples.append(time.time() - t0)
        if cpu_read:
            cpu_samples.append(cpu_read() - c0)
        del rows
    med = statistics.median(samples)
    if cpu_read:
        return med, statistics.median(cpu_samples)
    return med, None


def _sf_label(sf_dir: str):
    """The 'sf' value a bench record carries for a given data dir — shared
    by the writer and the prior-round comparability check."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from carto_etl_spark.queries import QUERIES
    from carto_etl_spark.session import get_spark

    spark = get_spark(app_name="carto-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    # local-iteration subset filter, e.g. SPARK_GRAFT_BENCH_ONLY=frame32 or a
    # comma list of query names; the driver never sets it (full run).
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    bench_queries = BENCH_QUERIES
    if only_env:
        names = FRAME32 if only_env == "frame32" else only_env.split(",")
        bench_queries = [n for n in BENCH_QUERIES if n in set(names)]

    # prior-round per-query medians (the committed BENCH_FULL.json) anchor
    # the outlier re-run pass; absent or unreadable -> no re-runs.
    here = os.path.dirname(os.path.abspath(__file__))
    prior: dict[str, float] = {}
    try:
        with open(os.path.join(here, "BENCH_FULL.json")) as fh:
            record = json.load(fh)
        # priors are only comparable at the SAME scale factor: a run at a
        # different SPARK_GRAFT_SF_DIR would flag every query a >2x
        # outlier and anchor 'min of the two medians' to incomparable
        # numbers (r9 ADVICE) — skip the outlier pass instead.
        if str(record.get("sf")) == str(_sf_label(sf_dir)):
            prior = record.get("queries", {}) or {}
    except Exception:
        prior = {}

    # one untimed pass of each canary first: canary_start must measure the
    # HOST, not JVM/codegen warmup (a single count() warms neither the
    # whole-stage-codegen cache nor the Python worker pool)
    for n in CANARIES:
        _median_run(QUERIES[n], spark, sf_dir, 1)
    canary_start = {
        n: round(_median_run(QUERIES[n], spark, sf_dir, iters)[0], 3)
        for n in CANARIES
    }

    cpu_read = _jvm_cpu_reader(spark)
    timings: dict[str, float] = {}
    cpu_sec: dict[str, float] = {}
    suspects: list[str] = []
    for name in bench_queries:
        fn = QUERIES[name]
        med, cpu = _median_run(fn, spark, sf_dir, iters, cpu_read)
        if cpu is not None:
            cpu_sec[name] = round(cpu, 3)
        ref = prior.get(name)
        if ref and ref > 0 and med > OUTLIER_FACTOR * ref:
            suspects.append(name)
        timings[name] = round(med, 3)

    # Outlier re-runs are DEFERRED to the end of the pass: noisy-neighbor
    # windows sweep CONTIGUOUS stretches of the run order (r9 observation:
    # two blocks of adjacent queries read 3-10x their priors and their
    # inline re-runs, executed inside the same window, confirmed the bogus
    # number).  Minutes later the window has usually passed; min of the
    # two medians keeps a REAL regression visible (it reproduces) while a
    # window artifact heals.
    reruns: dict[str, dict[str, float]] = {}
    for name in suspects:
        again, again_cpu = _median_run(
            QUERIES[name], spark, sf_dir, iters, cpu_read)
        reruns[name] = {
            "first": timings[name],
            "rerun": round(again, 3),
            "prior": prior[name],
        }
        if again_cpu is not None and again < timings[name]:
            cpu_sec[name] = round(again_cpu, 3)
        timings[name] = round(min(timings[name], again), 3)

    canary_end = {
        n: round(_median_run(QUERIES[n], spark, sf_dir, iters)[0], 3)
        for n in CANARIES
    }
    drift = round(
        sum(canary_end.values()) / max(sum(canary_start.values()), 1e-9), 3
    )
    noise = {
        "canary_start": canary_start,
        "canary_end": canary_end,
        "drift_end_over_start": drift,
        "rerun_outliers": reruns,
        "iters": iters,
    }

    sf_val = _sf_label(sf_dir)
    frame32 = round(sum(timings.get(n, 0.0) for n in FRAME32), 3)
    full = {
        "metric": (
            "total wall-clock of headline queries "
            f"(full materialization, median of {iters}; outliers >"
            f"{OUTLIER_FACTOR}x prior re-run once, min of medians)"
        ),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "frame32": frame32,
        "noise": noise,
        "sf": sf_val,
    }
    # r11 (additions only, sidecar file only): per-entry JVM-process CPU
    # seconds alongside the wall medians — wall separates from CPU when a
    # host window inflates the capture, so the next round can tell noise
    # from code without re-running (VERDICT r10 item 2).
    if cpu_sec:
        full["cpu_sec"] = cpu_sec
    # The full per-query map (~200 entries) exceeds the driver's 2 KB output
    # tail capture (round-4's BENCH_r04.json recorded parsed:null for exactly
    # this reason), so the complete record goes to a sidecar file and the
    # REQUIRED single JSON line printed LAST is a compact summary (<1 KB):
    # same metric/value/unit/sf, plus only the 10 slowest queries.  A
    # SPARK_GRAFT_BENCH_ONLY subset run never overwrites the committed full
    # record (it anchors the next run's outlier pass).
    out_name = "BENCH_SUBSET.json" if only_env else "BENCH_FULL.json"
    with open(os.path.join(here, out_name), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    line = {
        "metric": full["metric"] + f"; n={len(timings)} queries; "
        "full per-query map in BENCH_FULL.json",
        "value": full["value"],
        "unit": "sec",
        "queries": slowest,
        "frame32": frame32,
        "noise_drift": drift,
        "noise_reruns": len(reruns),
        "sf": sf_val,
    }
    # r11 (additions only): the 10-slowest contract conditions per-query
    # round-over-round deltas on BEING slow (improved queries exit the
    # comparison, regressed ones stay — the r10 survivorship bias).  The
    # frame32 members are a FIXED comparison set, so also emit their
    # timings — guarded against the driver's 2 KB output-tail capture
    # (the reason the full map lives in BENCH_FULL.json).
    f32q = {n: timings[n] for n in FRAME32 if n in timings}
    if f32q and len(json.dumps({**line, "frame32_queries": f32q})) <= 1900:
        line["frame32_queries"] = f32q
    print(json.dumps(line))


if __name__ == "__main__":
    main()
