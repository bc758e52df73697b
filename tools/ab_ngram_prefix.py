"""Paired A/B for ngram_jaccard_pairs: posting self-join (shape A, the
shipping default) vs prefix-filtered candidates (shape B, r18, behind
``prefix_filter=True``) — the r17 verdict item 4 measurement. The r17
attempt lost at sf0.1 where the posting join is cheap; the prefix filter's
payoff is the quadratic-in-df pair fan-out it avoids, which only shows as
the corpus (and bucket widths) grow — so this tool measures BOTH at sf0.1
and at a 10x corpus (the scale_soak salted-replica construction: every
second token salted per replica, so cross-replica Jaccard is exactly 0 and
the true pair count stays ~linear in corpus size).

Passes interleave A,B,A,B,... in one session so box drift hits both arms
equally; rep 0 per scale is untimed warm-up. Identity of the two shapes'
outputs is pinned by tests/test_r18_shapes.py and asserted here once per
scale (pair count + checksum over rounded jaccards).

Usage: python tools/ab_ngram_prefix.py [--reps 5] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _docs_10x(spark, src_dir: str, replicas: int):
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    reps = [docs.select("doc_id", "text")]
    for k in range(1, replicas):
        salted = (
            "array_join(flatten(transform(split(text, ' '), "
            f"(t, i) -> IF(i % 2 = 0, array('rk{k}x', t), array(t)))), ' ')"
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                F.expr(salted).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from postgresql_cdc_spark.operators.dedup import ngram_jaccard_pairs
    from postgresql_cdc_spark.session import get_spark

    spark = get_spark("ab-ngram-prefix")
    spark.range(1000).selectExpr("sum(id)").collect()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big_path = os.path.join(repo, ".bench_cache",
                            f"ab_docs_{args.replicas}x.parquet")
    if not os.path.isdir(big_path):
        print(f"building {args.replicas}x corpus -> {big_path}",
              file=sys.stderr, flush=True)
        _docs_10x(spark, args.sf, args.replicas).write.mode(
            "overwrite").parquet(big_path)

    scales = {
        "sf0.1": lambda: spark.read.parquet(
            os.path.join(args.sf, "documents.parquet")
        ).select("doc_id", "text"),
        f"{args.replicas}x": lambda: spark.read.parquet(big_path),
    }

    results = {}
    for scale, reader in scales.items():
        # identity check once per scale (count + checksum of rounded sims)
        sigs = {}
        for tag, pf in (("A_posting", False), ("B_prefix", True)):
            agg = ngram_jaccard_pairs(
                reader(), "text", "doc_id", threshold=0.5, prefix_filter=pf
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("jaccard") * 1e6).cast("long")).alias("s"),
            ).collect()[0]
            sigs[tag] = (agg.n, agg.s)
            spark.catalog.clearCache()
        assert sigs["A_posting"] == sigs["B_prefix"], sigs
        print(f"{scale}: identical pair sets, n={sigs['A_posting'][0]}",
              file=sys.stderr, flush=True)

        times = {"A_posting": [], "B_prefix": []}
        for rep in range(args.reps):
            for tag, pf in (("A_posting", False), ("B_prefix", True)):
                spark.sparkContext.setJobDescription(
                    f"ab-ngram {scale} {tag} rep{rep}")
                t0 = time.perf_counter()
                ngram_jaccard_pairs(
                    reader(), "text", "doc_id", threshold=0.5,
                    prefix_filter=pf,
                ).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                if rep > 0:
                    times[tag].append(round(dt, 3))
                print(f"  {scale} rep{rep} {tag}: {dt:.3f}s",
                      file=sys.stderr, flush=True)
        results[scale] = {
            t: {"median": round(statistics.median(v), 3), "runs": v}
            for t, v in times.items()
        }
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
