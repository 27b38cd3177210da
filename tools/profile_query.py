"""Per-query profiler for the optimization rounds.

For each named catalog entry (default: the 10 slowest in BENCH_FULL.json):
  - warms it once, then times median-of-N toArrow materializations
    (bench.py methodology), plus ONE noop-sink timing (guide §1.4: the
    computation without the driver transfer);
  - counts the Spark JOBS one materialization launches (statusTracker over
    a dedicated job group) — each job at local[32] carries fixed launch
    cost, so eager checkpoints / count() prepasses show up here;
  - writes .explain("formatted") to plans/r10/<name>_<tag>.txt and a plan
    shape summary (Exchange count, join nodes, Python-eval nodes).

Usage: python tools/profile_query.py [--tag before|after] [--iters 3] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_NODE_RE = re.compile(
    r"\b(Exchange|BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|BatchEvalPython|"
    r"ArrowEvalPython|MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas|"
    r"WholeStageCodegen|AQEShuffleRead)\b"
)


def plan_shape(plan_text: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for m in PLAN_NODE_RE.finditer(plan_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from carto_etl_spark.queries import QUERIES
    from carto_etl_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = args.names
    if not names:
        with open(os.path.join(here, "BENCH_FULL.json")) as fh:
            rec = json.load(fh)
        names = [k for k, _ in sorted(
            rec["queries"].items(), key=lambda kv: -kv[1])[:10]]

    plans_dir = os.path.join(here, "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warmup: JVM + codegen + parquet footers (bench.py does the same)
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    results = {}
    for name in names:
        fn = QUERIES[name]
        sc.setJobDescription(f"profile:{name}")
        # warm run (also the job-count run)
        group = f"profile-{name}-{time.time()}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        t_build = time.time() - t0
        try:
            df.toArrow()
        except Exception:
            df.collect()
        warm_s = time.time() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(f"profile-{name}-timed", name)

        samples = []
        for _ in range(args.iters):
            t0 = time.time()
            d2 = fn(spark, args.sf_dir)
            try:
                d2.toArrow()
            except Exception:
                d2.collect()
            samples.append(time.time() - t0)
        med = statistics.median(samples)

        # noop-sink timing: computation without the driver transfer
        t0 = time.time()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        noop_s = time.time() - t0

        shape = {}
        if not args.no_plans:
            d3 = fn(spark, args.sf_dir)
            plan = d3.sparkSession._jvm.PythonSQLUtils.explainString(
                d3._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(
                    plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            shape = plan_shape(plan)

        results[name] = {
            "median_s": round(med, 3),
            "warm_first_s": round(warm_s, 3),
            "build_s": round(t_build, 3),
            "noop_s": round(noop_s, 3),
            "jobs_per_run": jobs,
            "plan": shape,
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(here, "plans", "r10", f"profile_{args.tag}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
