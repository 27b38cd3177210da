"""Interleaved A/B for flag-switchable optimizations: run variants
alternately (A,B,A,B,...) inside ONE session so a host-noise window hits
both arms equally — this box swings 2-4x between minutes (r10/r11 logs),
which makes sequential A/Bs unreadable.

Usage:
  python tools/ab_interleaved.py --flag CARTO_AB_NO_WIDEN_REJOIN \
      --pairs 4 pipeline_e2e pipeline_ccnet

The flag names the variant to DISABLE for the baseline arm (so arm "new"
is flag unset, arm "old" is flag=1).  Reports per-arm medians, paired
per-iteration ratios, and job counts.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--flag", required=True, action="append",
                    help="env flag(s) set to 1 for the OLD arm")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from carto_etl_spark.queries import QUERIES
    from carto_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    def set_arm(old: bool) -> None:
        for f in args.flag:
            if old:
                os.environ[f] = "1"
            else:
                os.environ.pop(f, None)

    def one_run(name: str) -> tuple[float, int]:
        fn = QUERIES[name]
        group = f"ab-{name}-{time.time()}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        try:
            fn(spark, args.sf_dir).toArrow()
        except Exception:
            fn(spark, args.sf_dir).collect()
        dt = time.time() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        return dt, jobs

    for name in args.names:
        # warm both arms once (codegen for each plan shape)
        set_arm(True); one_run(name)
        set_arm(False); one_run(name)
        olds, news, jobs_old, jobs_new, ratios = [], [], [], [], []
        for _ in range(args.pairs):
            set_arm(True)
            t_old, j_old = one_run(name)
            set_arm(False)
            t_new, j_new = one_run(name)
            olds.append(t_old); news.append(t_new)
            jobs_old.append(j_old); jobs_new.append(j_new)
            ratios.append(t_new / t_old)
        print(json.dumps({
            "query": name,
            "old_median_s": round(statistics.median(olds), 3),
            "new_median_s": round(statistics.median(news), 3),
            "paired_ratio_median": round(statistics.median(ratios), 3),
            "paired_ratios": [round(r, 3) for r in ratios],
            "old_s": [round(v, 3) for v in olds],
            "new_s": [round(v, 3) for v in news],
            "jobs_old": jobs_old[-1], "jobs_new": jobs_new[-1],
        }), flush=True)
    set_arm(False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
