"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized on the driver (Arrow-batched toArrow — the
transfer path a real consumer of a large result would use; falls back to
row collect if Arrow conversion is unsupported for a result type), timed
wall-clock.  A small warmup query first so JVM/codegen startup is not billed
to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "shipping_priority",
    "region_volume",
    "top_orders_per_customer",
    "locale_float_coercion",
    "dual_format_dates",
    "update_merge",
    "delete_antijoin",
    "geom_points",
    "overview_grid",
    "overview_rollup",
    "token_counts",
    "text_quality",
    "lang_id",
    "exact_dedup",
    "shingle_fingerprint",
    "cosine_topk",
    "events_window",
    "asof_join",
    "sessionize",
    "running_total",
    "rollup_revenue",
    "cube_revenue",
    "percentiles",
    "min_cost_supplier",
    "json_extract",
    "above_customer_avg",
    "geocode_lookup",
    "set_ops",
    "ingest_coercion",
    "simhash_pairs",
    "minhash_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from carto_etl_spark.queries import QUERIES
    from carto_etl_spark.session import get_spark

    spark = get_spark(app_name="carto-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            rows = fn(spark, sf_dir).toArrow()
        except Exception:
            rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
        del rows

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total wall-clock of headline queries (full materialization)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
