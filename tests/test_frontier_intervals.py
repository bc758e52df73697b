"""Pareto skyline and interval-union coverage: operator contracts pinned
against brute-force Python references on randomized frames (the
oracle-paired queries pin values against DuckDB at sf0.01; these pin the
operator semantics — dominance with ties, band-boundary soundness, island
merging with duplicates and containment — on adversarial small inputs)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from postgresql_cdc_spark.operators.frontier import pareto_skyline_2d
from postgresql_cdc_spark.operators.timeseries import interval_union_coverage


def _brute_skyline(rows):
    out = []
    for i, (pid, c, g) in enumerate(rows):
        dominated = any(
            (qc < c and qg >= g) or (qc <= c and qg > g)
            for j, (qid, qc, qg) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((pid, c, g))
    return sorted(out)


class TestParetoSkyline:
    def _run(self, spark, rows, band_width):
        df = spark.createDataFrame(rows, "id long, cost long, gain long")
        got = pareto_skyline_2d(df, "cost", "gain", band_width=band_width)
        return sorted((r.id, r.cost, r.gain) for r in got.collect())

    def test_ties_survive_together(self, spark):
        # identical (cost, gain) pairs never dominate each other
        rows = [(1, 10, 5), (2, 10, 5), (3, 20, 4)]
        assert self._run(spark, rows, 100) == [(1, 10, 5), (2, 10, 5)]

    def test_equal_cost_higher_gain_dominates(self, spark):
        rows = [(1, 10, 5), (2, 10, 7)]
        assert self._run(spark, rows, 100) == [(2, 10, 7)]

    def test_equal_gain_lower_cost_dominates(self, spark):
        rows = [(1, 10, 5), (2, 12, 5)]
        assert self._run(spark, rows, 100) == [(1, 10, 5)]

    def test_randomized_vs_brute_force_across_band_widths(self, spark):
        # band boundaries must never change the frontier (phase 1 is only
        # a sound prune); exercise widths that split, straddle, and
        # degenerate to one-row-per-band
        rng = random.Random(8)
        rows = [
            (i, rng.randrange(0, 40), rng.randrange(0, 15))
            for i in range(120)
        ]
        want = _brute_skyline(rows)
        for bw in (1, 7, 10, 1000):
            assert self._run(spark, rows, bw) == want, f"band_width={bw}"


def _brute_coverage(rows):
    by_key = {}
    for k, t0, t1 in rows:
        by_key.setdefault(k, []).append((t0, t1))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        out[k] = (len(merged), sum(e - s for s, e in merged))
    return out


class TestIntervalUnionCoverage:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "k long, t0 long, t1 long")
        got = interval_union_coverage(df, key="k", t0="t0", t1="t1")
        return {r.k: (r.n_intervals, r.covered) for r in got.collect()}

    def test_adjacent_intervals_merge(self, spark):
        # [0,10) and [10,20) touch: the >= start rule merges them
        assert self._run(spark, [(1, 0, 10), (1, 10, 20)]) == {1: (1, 20)}

    def test_contained_interval_extends_nothing(self, spark):
        assert self._run(spark, [(1, 0, 100), (1, 10, 20)]) == {1: (1, 100)}

    def test_gap_splits_islands(self, spark):
        assert self._run(spark, [(1, 0, 10), (1, 11, 20)]) == {1: (2, 19)}

    def test_duplicate_intervals(self, spark):
        assert self._run(spark, [(1, 5, 9), (1, 5, 9)]) == {1: (1, 4)}

    def test_randomized_vs_brute_force(self, spark):
        rng = random.Random(88)
        rows = []
        for k in range(4):
            for _ in range(60):
                s = rng.randrange(0, 500)
                rows.append((k, s, s + rng.randrange(1, 40)))
        assert self._run(spark, rows) == _brute_coverage(rows)

    def test_exact_tie_rows_with_tiebreak_column(self, spark):
        # Regression: the island-start flag window and the island-numbering
        # running sum must share ONE total order. Fixed-length intervals
        # tie exactly on (t0, t1); with a tiebreak column the running sum
        # used to order differently, so a new-island row could sort after
        # its tie peers and absorb them into the previous island. Many
        # exact duplicates + a gap exercises both island boundaries.
        rows = [
            (1, eid, 100, 110) for eid in range(30)
        ] + [
            (1, eid, 200, 210) for eid in range(30, 60)
        ]
        df = spark.createDataFrame(rows, "k long, eid long, t0 long, t1 long")
        df = df.repartition(8)
        got = interval_union_coverage(
            df, key="k", t0="t0", t1="t1", order_tiebreak="eid"
        )
        assert {r.k: (r.n_intervals, r.covered) for r in got.collect()} == {
            1: (2, 20)
        }


def _brute_skyline_nd(rows):
    out = []
    for i, r in enumerate(rows):
        pid, c, g1, g2 = r
        dominated = any(
            (qc <= c and qg1 >= g1 and qg2 >= g2)
            and (qc < c or qg1 > g1 or qg2 > g2)
            for j, (qid, qc, qg1, qg2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append(r)
    return sorted(out)


class TestParetoSkylineNd:
    def _run(self, spark, rows, partitions):
        from postgresql_cdc_spark.operators.frontier import pareto_skyline_nd

        df = spark.createDataFrame(
            rows, "id long, cost long, g1 long, g2 long"
        ).repartition(partitions)
        got = pareto_skyline_nd(df, "cost", ["g1", "g2"])
        return sorted((r.id, r.cost, r.g1, r.g2) for r in got.collect())

    def test_identical_points_survive_together(self, spark):
        rows = [(1, 5, 5, 5), (2, 5, 5, 5), (3, 6, 5, 5)]
        assert self._run(spark, rows, 2) == [(1, 5, 5, 5), (2, 5, 5, 5)]

    def test_third_dimension_rescues_2d_dominated(self, spark):
        # point 2 loses on (cost, g1) but wins on g2 -> both survive
        rows = [(1, 1, 9, 1), (2, 2, 1, 9)]
        assert self._run(spark, rows, 2) == sorted(rows)

    def test_randomized_vs_brute_force_across_partitionings(self, spark):
        rng = random.Random(38)
        rows = [
            (i, rng.randrange(0, 20), rng.randrange(0, 8),
             rng.randrange(0, 8))
            for i in range(150)
        ]
        want = _brute_skyline_nd(rows)
        for parts in (1, 3, 16):
            assert self._run(spark, rows, parts) == want, f"parts={parts}"

    def test_frontier_dense_input_raises_before_global_pass(self, spark):
        from postgresql_cdc_spark.operators.frontier import pareto_skyline_nd

        # an antichain: paying more cost always buys more g1, so no point
        # dominates any other and every row survives phase 1
        rows = [(i, i, i, 0) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, cost long, g1 long, g2 long")
        try:
            with pytest.raises(RuntimeError, match="frontier-dense"):
                pareto_skyline_nd(df, "cost", ["g1", "g2"],
                                  max_global_rows=100)
        finally:
            spark.catalog.clearCache()


class TestNdPruneKernel:
    """The blocked numpy dominance kernel, pinned against a per-row
    reference and micro-benched (VERDICT r8 #4: phase 1 must stay C-speed
    on large partitions)."""

    @staticmethod
    def _per_row_reference(c, gs):
        import numpy as np

        n = len(c)
        keep = np.ones(n, dtype=bool)
        for i in range(n):
            ge = c <= c[i]
            strict = c < c[i]
            for g in gs:
                ge &= g >= g[i]
                strict |= g > g[i]
            if bool((ge & strict).any()):
                keep[i] = False
        return keep

    def _random_arrays(self, n, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        c = rng.integers(0, n // 4 + 2, n)
        gs = [rng.integers(0, 50, n) for _ in range(3)]
        return c, gs

    def test_blocked_kernel_matches_per_row_reference(self):
        import numpy as np

        from postgresql_cdc_spark.operators.frontier import _nd_prune_arrays

        for seed in (1, 2, 3):
            c, gs = self._random_arrays(2000, seed)
            for block in (1, 7, 256, 10_000):
                got = _nd_prune_arrays(c, gs, block=block)
                assert np.array_equal(
                    got, self._per_row_reference(c, gs)
                ), f"seed={seed} block={block}"

    def test_extreme_dtypes_do_not_wrap_sort_keys(self):
        """Gain columns that value-negation cannot handle: bool (numpy's
        unary ``-`` raises) and int64 containing the dtype minimum (negation
        wraps, corrupting the dominator-appears-first sort invariant). The
        rank-based descending key must still produce the exact skyline."""
        import numpy as np

        from postgresql_cdc_spark.operators.frontier import _nd_prune_arrays

        # bool gain: (cost, flag) — flag=True dominates flag=False at = cost
        c = np.array([1, 1, 2, 2, 3], dtype=np.int64)
        flag = np.array([True, False, True, False, True])
        got = _nd_prune_arrays(c, [flag], block=2)
        assert np.array_equal(got, self._per_row_reference(c, [flag]))

        lo = np.iinfo(np.int64).min
        hi = np.iinfo(np.int64).max
        c2 = np.array([5, 5, 5, 1, 9], dtype=np.int64)
        g2 = np.array([lo, hi, 0, lo, hi], dtype=np.int64)
        got2 = _nd_prune_arrays(c2, [g2], block=2)
        assert np.array_equal(got2, self._per_row_reference(c2, [g2]))

    def test_blocked_kernel_5x_faster_on_50k_partition(self):
        import time

        from postgresql_cdc_spark.operators.frontier import _nd_prune_arrays

        c, gs = self._random_arrays(50_000, 9)
        t0 = time.perf_counter()
        _nd_prune_arrays(c, gs)
        blocked = time.perf_counter() - t0
        # time the per-row loop on a 1/10 slice and scale: both are O(n^2)
        # in comparisons, so the slice costs 1/100 of the full run
        sl = slice(0, 5_000)
        t0 = time.perf_counter()
        self._per_row_reference(c[sl], [g[sl] for g in gs])
        per_row = (time.perf_counter() - t0) * 100
        assert per_row / blocked >= 5, (
            f"blocked={blocked:.3f}s vs per-row(extrapolated)={per_row:.3f}s"
        )
