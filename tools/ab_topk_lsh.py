"""Paired A/B for sim_topk_lsh's r17 shuffle-narrowing rewrite (r18 verdict
item 6): the driver's r17 run read sim_topk_lsh 23% SLOWER despite the
plan-verified change (dedupe exchange carries one double instead of two
float vectors), while the builder's paired run read flat. Settle it with an
interleaved A/B in ONE session on one box: shape A = the pre-r17 form
(dedupe pairs carrying both vectors, then score), shape B = the current
operator. Both end in the noop sink; passes alternate A,B,A,B,... so box
drift hits both arms equally.

Usage: python tools/ab_topk_lsh.py [--reps 7]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402


def _old_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5):
    """The pre-r17 shape, verbatim from commit 6e9508c (vectors ride
    through the pair-dedupe exchange; cosine computed after)."""
    from postgresql_cdc_spark.operators.similarity import (
        MAX_BUCKET,
        BANDS,
        PLANES_PER_BAND,
        _drop_hot_buckets,
        _with_band_codes,
        cosine_expr,
        infer_dim,
    )

    dim = infer_dim(corpus, "embedding")
    c = _with_band_codes(
        corpus.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id",
        "embedding", BANDS, PLANES_PER_BAND, "__v_neighbor", dim=dim,
    ).persist()
    c = _drop_hot_buckets(c, MAX_BUCKET)
    q = _with_band_codes(
        queries, "query_id", "embedding", BANDS, PLANES_PER_BAND,
        "__v_query", dim=dim,
    )
    cand = (
        c.join(F.broadcast(q), ["band", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.col("__v_query").alias("__qvec"),
            F.col("__v_neighbor").alias("__nvec"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id",
        cosine_expr("__nvec", "__qvec").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from postgresql_cdc_spark.operators.similarity import topk_lsh
    from postgresql_cdc_spark.plans.extensions import T
    from postgresql_cdc_spark.session import get_spark

    spark = get_spark("ab-topk-lsh")
    spark.range(1000).selectExpr("sum(id)").collect()

    def emb(sp):
        return T(sp, args.sf, "embeddings")

    def build_a(sp):
        e = emb(sp)
        qs = e.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding")
        return _old_topk_lsh(e, qs)

    def build_b(sp):
        e = emb(sp)
        qs = e.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding")
        return topk_lsh(e, qs)

    times = {"A_old": [], "B_new": []}
    for rep in range(args.reps):
        for tag, build in (("A_old", build_a), ("B_new", build_b)):
            spark.sparkContext.setJobDescription(f"ab {tag} rep{rep}")
            t0 = time.perf_counter()
            build(spark).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if rep > 0:  # rep 0 is JIT/cache warm-up, untimed
                times[tag].append(round(dt, 3))
            print(f"  rep{rep} {tag}: {dt:.3f}s", file=sys.stderr, flush=True)
    out = {
        t: {"median": round(statistics.median(v), 3), "runs": v}
        for t, v in times.items()
    }
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
