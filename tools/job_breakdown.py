"""Per-JOB breakdown of one catalog entry: run the query once warm, then
once inside a dedicated job group, and pull every job's duration, stage
summary, and description from the local Spark UI REST API — the tool that
answers "which of the 31 jobs is the slow one" (guide §1/§7.1) without
eyeballing the UI.

Usage: python tools/job_breakdown.py <name> [--sf-dir DIR] [--min-ms 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--min-ms", type=int, default=0)
    args = ap.parse_args()

    from carto_etl_spark.queries import QUERIES
    from carto_etl_spark.session import get_spark

    # the engine session disables the UI; this tool needs the REST API
    spark = get_spark(app_name="job-breakdown",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    for name in args.names:
        fn = QUERIES[name]
        # warm run (codegen, broadcast caches, steady-state index builds)
        try:
            fn(spark, args.sf_dir).toArrow()
        except Exception:
            fn(spark, args.sf_dir).collect()

        group = f"breakdown-{name}-{time.time()}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        t_build = time.time() - t0
        try:
            df.toArrow()
        except Exception:
            df.collect()
        wall = time.time() - t0
        sc.setJobGroup(f"idle-{time.time()}", "idle")

        job_ids = sorted(sc.statusTracker().getJobIdsForGroup(group))
        rows = []
        total_ms = 0
        for jid in job_ids:
            j = rest(f"/jobs/{jid}")
            t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second precision from the GMT strings' trailing .mmm
            ms = (time.mktime(t_end) - time.mktime(t_sub)) * 1000.0
            ms += float(j["completionTime"][19:23] or 0) * 1000 - \
                float(j["submissionTime"][19:23] or 0) * 1000
            total_ms += ms
            # the job's LAST stage name carries the action's callsite; the
            # first stage names the deepest exchange — show both ends
            names = []
            for sid in (min(j["stageIds"]), max(j["stageIds"])):
                try:
                    st = rest(f"/stages/{sid}")
                    names.append(st[0]["name"].split("\n")[0][:60])
                except Exception:
                    pass
            desc = " | ".join(dict.fromkeys(names)) or (
                j.get("description") or "")[:60]
            rows.append((jid, ms, j["numTasks"], desc))
        print(f"\n=== {name}: wall {wall:.2f}s (build {t_build:.2f}s), "
              f"{len(job_ids)} jobs, sum-of-jobs {total_ms/1000:.2f}s ===")
        for jid, ms, ntasks, desc in rows:
            if ms >= args.min_ms:
                print(f"  job {jid:>5}  {ms:>8.0f} ms  {ntasks:>4} tasks  {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
