"""Per-query profiler for the optimization rounds.

For each named catalog entry (default: the 10 slowest in BENCH_FULL.json):
  - warms it once, then times median-of-N toArrow materializations
    (bench.py methodology), plus ONE noop-sink timing (guide §1.4: the
    computation without the driver transfer);
  - counts the Spark JOBS one materialization launches (statusTracker over
    a dedicated job group) — each job at local[32] carries fixed launch
    cost, so eager checkpoints / count() prepasses show up here;
  - records the JVM process CPU seconds each timed iteration consumed
    (local mode: executors live in the driver JVM, so /proc utime+stime
    deltas ARE executor+driver CPU — the noise-robust metric on a host
    with CPU steal);
  - writes .explain("formatted") to plans/<round>/<name>_<tag>.txt and a
    plan shape summary (Exchange count, join nodes, Python-eval nodes).

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
    ap.add_argument("--plans-dir", default="r11")
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

    plans_dir = os.path.join(here, "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    jvm_pid = int(sc._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")

    def jvm_cpu_s() -> float:
        # utime+stime of the gateway JVM (fields 14/15 of /proc/pid/stat);
        # local mode runs executors inside this JVM, so the delta across a
        # query is its executor+driver CPU including codegen and GC.
        with open(f"/proc/{jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / clk
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
        cpu_samples = []
        for _ in range(args.iters):
            t0 = time.time()
            c0 = jvm_cpu_s()
            d2 = fn(spark, args.sf_dir)
            try:
                d2.toArrow()
            except Exception:
                d2.collect()
            samples.append(time.time() - t0)
            cpu_samples.append(jvm_cpu_s() - c0)
        med = statistics.median(samples)
        med_cpu = statistics.median(cpu_samples)

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
            "median_cpu_s": round(med_cpu, 3),
            "warm_first_s": round(warm_s, 3),
            "build_s": round(t_build, 3),
            "noop_s": round(noop_s, 3),
            "jobs_per_run": jobs,
            "plan": shape,
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(here, "plans", args.plans_dir, f"profile_{args.tag}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
