"""Process-interleaved paired A/B for registered queries across two repo
checkouts (r18): arm A = the pre-round code (a worktree at the round-start
commit), arm B = the current tree. Box drift on a shared sandbox swamps
before/after runs taken hours apart (the r17 lesson: plan-identical rows
drifted 10-30%), so each rep alternates A,B subprocesses back-to-back and
only same-index reps compare; session startup and rep-0 JIT warm-up stay
untimed inside each subprocess.

Usage:
    python tools/ab_paired_queries.py --a /tmp/repo_r18_before --b /root/repo \
        --queries decon_fuzzy_minhash,dedup_minhash_lsh --reps 4
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
names = sys.argv[2].split(",")
from postgresql_cdc_spark.session import get_spark
from postgresql_cdc_spark.plans import QUERIES
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-paired")
spark.range(1000).selectExpr("sum(id)").collect()
try:
    import pandas as _pd  # noqa
    n = spark.sparkContext.defaultParallelism
    spark.range(n).repartition(n).mapInPandas(lambda it: it, "id long").count()
except Exception:
    pass
out = {}
for name in names:
    q = QUERIES[name]
    for rep in range(3):  # rep 0+1 warm-up (JIT), rep 2 timed
        spark.sparkContext.setJobDescription(f"ab {name} rep{rep}")
        t0 = time.perf_counter()
        q.spark(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        out[name] = round(dt, 3)
print("ABRESULT " + json.dumps(out))
"""


def _run(checkout: str, queries: str) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, checkout, queries],
        capture_output=True, text=True, env=env, cwd="/tmp",
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("ABRESULT "):
            return json.loads(ln[len("ABRESULT "):])
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"child failed for {checkout}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    res = {"A": [], "B": []}
    for rep in range(args.reps):
        for arm, checkout in (("A", args.a), ("B", args.b)):
            r = _run(checkout, args.queries)
            res[arm].append(r)
            print(f"rep{rep} {arm}: {r}", file=sys.stderr, flush=True)

    names = args.queries.split(",")
    table = {}
    for name in names:
        av = [r[name] for r in res["A"]]
        bv = [r[name] for r in res["B"]]
        table[name] = {
            "A_median": round(statistics.median(av), 3), "A_runs": av,
            "B_median": round(statistics.median(bv), 3), "B_runs": bv,
            "speedup_A_over_B": round(
                statistics.median(av) / statistics.median(bv), 2
            ),
        }
    print(json.dumps(table, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
