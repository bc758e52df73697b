"""Capture ``.explain('formatted')`` for bench queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r17 --suffix before [--only q1,...]

Writes plans/<tag>/<query>_<suffix>.txt with the formatted physical plan,
plus a one-line summary (Exchange count, join strategies, Python-eval nodes)
to stdout so plan regressions are visible at a glance.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "q18_large_volume_orders",
    "q19_disjunctive_filter",
    "join_outer_order_counts",
    "agg_rollup_region_nation",
    "window_topk_orders_per_customer",
    "events_sessionize",
    "asof_purchase_to_signup",
    "cdc_materialize_state",
    "pg_numeric_arrays",
    "pg_string_arrays",
    "text_token_stats",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_topk_brute",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_ivfpq",
    "text_bm25_topk",
    "hybrid_rrf_fusion",
    "decon_fuzzy_minhash",
    "mm_binary_features",
]


def summarize(plan: str) -> str:
    n_exch = len(re.findall(r"\bExchange\b", plan))
    joins = sorted(set(re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b", plan)))
    py = sorted(set(re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas)\b", plan)))
    return (f"Exchange x{n_exch}; joins={joins or ['-']};"
            f" python={py or ['-']}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r17")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from postgresql_cdc_spark.session import get_spark
    from postgresql_cdc_spark.plans import QUERIES

    names = (args.only.split(",") if args.only else DEFAULT_QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    for name in names:
        q = QUERIES.get(name)
        if q is None:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        try:
            df = q.spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}", flush=True)
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
