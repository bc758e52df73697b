"""Paired A/B for dedup_exact's corpus fan-out opt-out (r18 verdict item 8):
shape A = fan-out ON (the pre-r18 behavior: the shared reader repartitions
the single-row-group documents fixture to the full core count), shape B =
fan-out OFF (r18 ships B for this one consumer). Run once per core count:

    SPARK_GRAFT_CPUS=32 python tools/ab_dedup_exact_fanout.py
    SPARK_GRAFT_CPUS=8  python tools/ab_dedup_exact_fanout.py

so the c8/c32 scaling ratio of each shape is measurable — the r17 scaling
block read 0.63 for dedup_exact (8 cores beat 32), the fan-out overshoot
this opt-out removes. Passes interleave A,B,A,B,...; rep 0 untimed.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from postgresql_cdc_spark.operators.dedup import exact_dedup
    from postgresql_cdc_spark.plans.extensions import _near_dup_corpus
    from postgresql_cdc_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-dedup-exact")
    spark.range(1000).selectExpr("sum(id)").collect()
    cpus = spark.sparkContext.defaultParallelism

    times = {"A_fanout": [], "B_plain": []}
    for rep in range(7):
        for tag, fo in (("A_fanout", True), ("B_plain", False)):
            spark.sparkContext.setJobDescription(f"ab-exact {tag} rep{rep}")
            t0 = time.perf_counter()
            exact_dedup(
                _near_dup_corpus(spark, sf, fanout=fo), "text", "doc_id"
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if rep > 0:
                times[tag].append(round(dt, 3))
            print(f"  c{cpus} rep{rep} {tag}: {dt:.3f}s",
                  file=sys.stderr, flush=True)
    print({"cpus": cpus} | {
        t: {"median": round(statistics.median(v), 3), "runs": v}
        for t, v in times.items()
    })
    return 0


if __name__ == "__main__":
    sys.exit(main())
