"""The two-level seam-stitch helpers (operators/seams.py) pinned against
the single-task reference windows they replace.

The helpers exist so no window task ever holds a table that scales with
the key range (round-9 verdict #2); these tests prove the two-level form
is VALUE-equivalent to the plain unpartitioned window for every bucket
layout a fuzz can produce — sparse buckets, negative buckets, fanout
smaller than / equal to / larger than the bucket range — so the rewired
registry queries (dq_sequence_gaps, events_ab_rank_sum,
stats_ks_two_sample, stats_weighted_median) inherit correctness from
their unchanged DuckDB oracles plus this equivalence.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.operators.seams import (
    two_level_exclusive_prefix,
    two_level_next,
)


def _random_summary(spark, seed, parts=False):
    rng = random.Random(seed)
    n = rng.randint(1, 60)
    # sparse, possibly-negative bucket ids: the floor-division super-bucket
    # must keep ordering-grouping consistent across zero
    bkts = rng.sample(range(-300, 300), n)
    rows = []
    for b in bkts:
        for p in (["x", "y", None] if parts else [""]):
            if parts and rng.random() < 0.3:
                continue  # ragged: not every (part, bkt) present
            rows.append((p, b, rng.randint(0, 50), rng.randint(-9, 9)))
    if not rows:
        rows = [("x", 0, 1, 1)]
    # a NULL bucket id is a legitimate window group (sorts first in
    # ascending order); the helpers' internal joins must be null-safe or
    # these rows silently vanish
    if rng.random() < 0.7:
        for p in (["x", None] if parts else [""]):
            rows.append((p, None, rng.randint(0, 50), rng.randint(-9, 9)))
    return spark.createDataFrame(rows, "p string, bkt long, a long, b long")



def _key(r):
    # None-robust row sort key (None < everything, stable across columns)
    return tuple((v is None, 0 if v is None else v) for v in r)

class TestTwoLevelExclusivePrefix:
    def test_matches_unpartitioned_window(self, spark):
        for seed in (1, 2, 3):
            df = _random_summary(spark, seed).cache()
            w = (
                Window.orderBy("bkt")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            want = df.select(
                "bkt",
                (F.sum("a").over(w) - F.col("a")).alias("ca"),
                (F.sum("b").over(w) - F.col("b")).alias("cb"),
            )
            for fanout in (1, 3, 8, 10_000):
                got = two_level_exclusive_prefix(
                    df, "bkt", {"a": "ca", "b": "cb"}, fanout=fanout
                ).select("bkt", "ca", "cb")
                assert sorted(got.collect(), key=_key) == sorted(
                    want.collect(), key=_key
                ), (seed, fanout)

    def test_matches_partitioned_window(self, spark):
        for seed in (4, 5):
            df = _random_summary(spark, seed, parts=True).cache()
            w = (
                Window.partitionBy("p")
                .orderBy("bkt")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            want = df.select(
                "p", "bkt", (F.sum("a").over(w) - F.col("a")).alias("ca")
            )
            got = two_level_exclusive_prefix(
                df, "bkt", {"a": "ca"}, part=("p",), fanout=4
            ).select("p", "bkt", "ca")
            assert sorted(got.collect(), key=_key) == sorted(
                want.collect(), key=_key
            ), seed


class TestTwoLevelNext:
    def test_matches_unpartitioned_lead(self, spark):
        for seed in (6, 7, 8):
            df = _random_summary(spark, seed).cache()
            w = Window.orderBy("bkt")
            want = df.select(
                "bkt", F.lead("a").over(w).alias("na")
            )
            for fanout in (1, 3, 8, 10_000):
                got = two_level_next(
                    df, "bkt", {"a": "na"}, fanout=fanout
                ).select("bkt", "na")
                assert sorted(got.collect(), key=_key) == sorted(
                    want.collect(), key=_key
                ), (seed, fanout)

    def test_matches_partitioned_lead(self, spark):
        for seed in (9, 10):
            df = _random_summary(spark, seed, parts=True).cache()
            w = Window.partitionBy("p").orderBy("bkt")
            want = df.select("p", "bkt", F.lead("a").over(w).alias("na"))
            got = two_level_next(
                df, "bkt", {"a": "na"}, part=("p",), fanout=4
            ).select("p", "bkt", "na")
            assert sorted(got.collect(), key=_key) == sorted(
                want.collect(), key=_key
            ), seed


class TestAdviceRegressions:
    def test_next_alias_equals_source_column(self, spark):
        """nexts={'a': 'a'} (in-place LEAD) must not let the alias write
        clobber the source column before the firsts rollup reads it — the
        LEAD now lands in a temp column and the alias is assigned last."""
        rows = [(b, b * 10) for b in range(12)]
        df = spark.createDataFrame(rows, "bkt long, a long")
        w = Window.orderBy("bkt")
        want = sorted(
            df.select("bkt", F.lead("a").over(w).alias("a")).collect(),
            key=_key,
        )
        got = sorted(
            two_level_next(df, "bkt", {"a": "a"}, fanout=4)
            .select("bkt", "a").collect(),
            key=_key,
        )
        assert got == want

    def test_super_bucket_exact_past_double_precision(self, spark):
        """Bucket ids beyond 2^53: double-space floor(bkt/fanout) rounds,
        merging or splitting super-buckets at the seam. The exact-BIGINT
        floor-div must keep two adjacent huge buckets in DISTINCT
        super-buckets so the stitched LEAD crosses the seam correctly."""
        base = (1 << 60) + 1
        # adjacent buckets straddling a fanout boundary at huge magnitude,
        # plus negative twins (floor semantics, not truncate-toward-zero)
        bkts = [base - 1, base, base + 1, -base - 1, -base, -base + 1]
        df = spark.createDataFrame(
            [(b, i) for i, b in enumerate(sorted(bkts))], "bkt long, a long"
        )
        w = Window.orderBy("bkt")
        want = sorted(
            df.select("bkt", F.lead("a").over(w).alias("na")).collect(),
            key=_key,
        )
        for fanout in (2, 8192):
            got = sorted(
                two_level_next(df, "bkt", {"a": "na"}, fanout=fanout)
                .select("bkt", "na").collect(),
                key=_key,
            )
            assert got == want, fanout
        # and the prefix-sum twin on the same layout
        wsum = (
            Window.orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want2 = sorted(
            df.select(
                "bkt", (F.sum("a").over(wsum) - F.col("a")).alias("ca")
            ).collect(),
            key=_key,
        )
        got2 = sorted(
            two_level_exclusive_prefix(df, "bkt", {"a": "ca"}, fanout=2)
            .select("bkt", "ca").collect(),
            key=_key,
        )
        assert got2 == want2

    def test_super_bucket_no_underflow_at_long_min(self, spark):
        """r12 advice: the old `(b - pmod(b, f)) DIV f` form wrapped LONG
        when bkt is within fanout of LONG_MIN (b - pmod underflows before
        the DIV). The trunc-div + floor-correction form must place the
        absolute extremes of the BIGINT domain in the right super-buckets
        so the stitched LEAD still crosses the seam there."""
        lo = -(1 << 63)          # LONG_MIN, divisible by any 2^k fanout
        hi = (1 << 63) - 1       # LONG_MAX
        bkts = [lo, lo + 1, lo + 8191, lo + 8192, hi - 1, hi]
        df = spark.createDataFrame(
            [(b, i) for i, b in enumerate(sorted(bkts))], "bkt long, a long"
        )
        from postgresql_cdc_spark.operators.seams import _with_super_bucket
        sb = {
            r["bkt"]: r["__seam_sb"]
            for r in _with_super_bucket(df, "bkt", 8192).collect()
        }
        import math
        for b in bkts:
            assert sb[b] == math.floor(b / 8192) if abs(b) < (1 << 52) else True
        # exact expectations (math.floor in float space is wrong up here):
        assert sb[lo] == lo // 8192
        assert sb[lo + 1] == (lo + 1) // 8192 == lo // 8192
        assert sb[lo + 8191] == lo // 8192
        assert sb[lo + 8192] == lo // 8192 + 1
        assert sb[hi] == hi // 8192
        # and the end-to-end LEAD across the LONG_MIN-side seam
        w = Window.orderBy("bkt")
        want = sorted(
            df.select("bkt", F.lead("a").over(w).alias("na")).collect(),
            key=_key,
        )
        got = sorted(
            two_level_next(df, "bkt", {"a": "na"}, fanout=8192)
            .select("bkt", "na").collect(),
            key=_key,
        )
        assert got == want
