"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation, no
collect-to-driver cost, no count()-projection pruning shortcut).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: spans scans/aggs/joins/windows/sessionization/as-of, CDC
# replay+materialization, PG type layer, text analysis, all dedup families,
# and similarity search. (dedup_simhash excluded: its pair-count explodes
# quadratically on the shared-vocabulary fixture — not a representative
# throughput measure.)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "join_outer_order_counts",
    "agg_rollup_region_nation",
    "window_topk_orders_per_customer",
    "events_sessionize",
    "asof_purchase_to_signup",
    "cdc_materialize_state",
    "cdc_pricing_after_replay",
    "pg_numeric_arrays",
    "pg_string_arrays",
    "text_token_stats",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_topk_brute",
    "sim_topk_lsh",
    "mm_binary_features",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")  # get_spark reads this

    from postgresql_cdc_spark.session import get_spark
    from postgresql_cdc_spark.plans import QUERIES

    spark = get_spark("bench")

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    # Warm the JVM/codegen paths once on a trivial query so the first measured
    # query doesn't pay session spin-up.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = QUERIES[name]
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": f"bench_total_{len(BENCH_QUERIES)}q",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
