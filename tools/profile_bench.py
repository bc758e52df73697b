"""Per-query profile: split bench rows into build (plan construction, which
includes driver-side collects like k-means training), analysis, and execution
(noop sink) time, plus the number of Spark jobs each execution launches.

Usage:
    python tools/profile_bench.py [--only q1,...] [--reps 2]

This is a diagnosis tool (guide §1): at sf0.1 most rows are seconds, so the
split tells us whether to attack driver-side constant work (build/analysis,
collects, Catalyst on huge literal trees) or cluster-side work (shuffles,
scans). Job count proxies scheduling overhead per row.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capture_plans import DEFAULT_QUERIES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from postgresql_cdc_spark.session import get_spark
    from postgresql_cdc_spark.plans import QUERIES

    names = (args.only.split(",") if args.only else DEFAULT_QUERIES)
    spark = get_spark("profile-bench")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()  # session warm

    print(f"{'query':36s} {'build_s':>8s} {'exec_s':>8s} {'jobs':>5s}")
    for name in names:
        q = QUERIES.get(name)
        if q is None:
            print(f"{name:36s} NOT REGISTERED")
            continue
        for rep in range(args.reps):
            sc.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            try:
                df = q.spark(spark, args.sf)
                df.schema  # force analysis
            except Exception as e:  # noqa: BLE001
                print(f"{name:36s} BUILD ERROR {type(e).__name__}: "
                      f"{str(e)[:160]}")
                break
            t1 = time.perf_counter()
            tracker = sc.statusTracker()
            before_ids = set(tracker.getJobIdsForGroup(None) or [])
            # put execution in its own job group to count its jobs
            sc.setJobGroup(f"prof-{name}-{rep}", name)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"{name:36s} EXEC ERROR {type(e).__name__}: "
                      f"{str(e)[:160]}")
                break
            t2 = time.perf_counter()
            jobs = len(tracker.getJobIdsForGroup(f"prof-{name}-{rep}") or [])
            print(f"{name:36s} {t1 - t0:8.3f} {t2 - t1:8.3f} {jobs:5d}"
                  f"  (rep {rep})", flush=True)
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001
                pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
