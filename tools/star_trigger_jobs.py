"""Per-trigger Spark-job counts on the two-dim star view, split by WHICH
relations a trigger touches — the r17/r18 IVM evidence table:

    trigger touches | jobs/trigger (median)
    facts only      | ...
    one dim only    | ...
    all relations   | ...

r17 recorded 26 / 28 / 37 on the empty-term-skip kernel (cap 8). r18's
shared fact-delta arrangement store should shave the duplicated per-dim
epoch copy from every fact-carrying trigger.

Usage: python tools/star_trigger_jobs.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.join_ivm_lifecycle_soak import _STAR_DDL, _star_spec  # noqa: E402

N_GRP = 3
N_FACT = 5_000
N_BATCH = 8  # per trigger kind
CAP = 8  # production compaction cadence


def main() -> int:
    from postgresql_cdc_spark.session import get_spark
    from postgresql_cdc_spark.streaming.join_ivm import apply_batch, latest_view

    spark = get_spark("star-trigger-jobs")
    spark.range(1000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    spec = _star_spec()
    n_cust, n_part = max(12, N_FACT // 10), max(10, N_FACT // 20)

    base = tempfile.mkdtemp(prefix=f"star_jobs_{uuid.uuid4().hex[:8]}_")
    state = os.path.join(base, "state")
    os.makedirs(state)
    custs: dict = {}
    parts: dict = {}
    facts: dict = {}

    def route(rows):
        df = spark.createDataFrame(rows, _STAR_DDL)
        c = df.where(F.col("tab") == "c").select(
            F.col("k").alias("cid"), F.col("a").cast("int").alias("seg"),
            "op", "lsn")
        p = df.where(F.col("tab") == "p").select(
            F.col("k").alias("pid"), F.col("a").cast("int").alias("brand"),
            "op", "lsn")
        f = df.where(F.col("tab") == "f").select(
            F.col("k").alias("iid"), F.col("a").alias("cid"),
            F.col("b").alias("pid"), F.col("p").cast("int").alias("price"),
            F.col("q").cast("int").alias("qty"), "op", "lsn")
        return [c, p], f

    def model_apply(rows):
        for tab, k, a, b, p, q, op, _ in rows:
            if tab == "c":
                custs.pop(k, None) if op == "D" else custs.update({k: a})
            elif tab == "p":
                parts.pop(k, None) if op == "D" else parts.update({k: a})
            elif op == "D":
                facts.pop(k, None)
            else:
                facts[k] = (a, b, p, q)

    def apply(ep, rows):
        model_apply(rows)
        dims_b, fact_b = route(rows)
        tag = f"star_jobs_ep{ep}_{uuid.uuid4().hex[:6]}"
        sc.setLocalProperty("spark.jobGroup.id", tag)
        t0 = time.monotonic()
        try:
            apply_batch(spark, state, ep, dims_b, fact_b,
                        max_live_partials=CAP, spec=spec)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return (time.monotonic() - t0,
                len(sc.statusTracker().getJobIdsForGroup(tag)))

    try:
        lsn = 10
        seed = []
        for i in range(n_cust):
            seed.append(("c", i, i % N_GRP, None, None, None, "I", lsn)); lsn += 1
        for i in range(n_part):
            seed.append(("p", i, i % 5, None, None, None, "I", lsn)); lsn += 1
        for i in range(N_FACT):
            seed.append(("f", i, i % n_cust, (i * 3) % n_part,
                         (i * 7) % 50 + 1, i % 5 + 1, "I", lsn)); lsn += 1
        apply(0, seed)

        out: dict = {}
        ep = 1

        def batch_facts(ep):
            rows = []
            nonlocal lsn
            for j in range(6):
                fid = (ep * 13 + j * 5) % N_FACT
                rows.append(("f", fid, (fid + ep) % n_cust,
                             (fid * 3 + ep) % n_part,
                             (fid * 7 + ep * 3) % 50 + 1,
                             fid % 5 + 1, "U", lsn)); lsn += 1
            return rows

        def batch_one_dim(ep):
            nonlocal lsn
            r = [("c", (ep * 7) % n_cust, (ep + 1) % N_GRP,
                  None, None, None, "U", lsn)]
            lsn += 1
            return r

        def batch_all(ep):
            nonlocal lsn
            rows = batch_facts(ep)
            rows.append(("c", (ep * 7) % n_cust, (ep + 1) % N_GRP,
                         None, None, None, "U", lsn)); lsn += 1
            rows.append(("p", (ep * 11) % n_part, (ep + 2) % 5,
                         None, None, None, "U", lsn)); lsn += 1
            return rows

        for kind, make in (("facts_only", batch_facts),
                           ("one_dim_only", batch_one_dim),
                           ("all_relations", batch_all)):
            jobs, secs = [], []
            for _ in range(N_BATCH):
                dt, nj = apply(ep, make(ep))
                ep += 1
                jobs.append(nj)
                secs.append(round(dt, 2))
            js, ts = sorted(jobs), sorted(secs)
            out[kind] = {
                "jobs_per_trigger_median": js[len(js) // 2],
                "jobs": jobs,
                "batch_s_median": ts[len(ts) // 2],
            }

        # answers must match a driver-side recompute at the end
        agg: dict = {}
        for cid, pid, price, qty in facts.values():
            if cid in custs and pid in parts:
                g = (custs[cid], parts[pid])
                a = agg.setdefault(g, [0, 0, 0])
                a[0] += 1
                a[1] += price * qty
                a[2] = max(a[2], price)
        want = sorted((s, b, n, rev, mx)
                      for (s, b), (n, rev, mx) in agg.items())
        got = sorted(
            (r.seg, r.brand, r.dn, r.revenue, r.max_price)
            for r in latest_view(spark, state, spec).collect()
        )
        out["answers_match_recompute"] = got == want
        assert got == want, (got[:5], want[:5])
        print(json.dumps({"star_trigger_jobs": out}, indent=2))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
