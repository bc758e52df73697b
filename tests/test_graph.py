"""Connected-components operator: label propagation semantics on known
graphs (the oracle-paired query covers the near-dup integration)."""

from __future__ import annotations

import pytest

from postgresql_cdc_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df)
    return {r.id: r.component for r in out.collect()}


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark):
        # 1-2-3-4 chain: diameter > 1 forces multiple propagation rounds
        got = _cc(spark, [(2, 1), (3, 2), (4, 3)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_two_components_stay_separate(self, spark):
        got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_cycle(self, spark):
        got = _cc(spark, [(5, 6), (6, 7), (7, 5)])
        assert got == {5: 5, 6: 5, 7: 5}


class TestNonConvergence:
    def test_raises_when_diameter_exceeds_max_iter(self, spark):
        """A long chain with max_iter=1 cannot converge; plausible-but-wrong
        labels must raise, not return (ADVICE r3)."""
        import pytest

        from postgresql_cdc_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iter=1)


class TestPagerankInt:
    def test_symmetric_two_cycle_is_stationary(self, spark):
        from postgresql_cdc_spark.operators.graph import pagerank_int
        from pyspark.sql import functions as F

        edges = spark.createDataFrame(
            [(1, 2, 1), (2, 1, 1)], "src long, dst long, w long"
        )
        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        r = {
            x.id: x.r
            for x in pagerank_int(edges, nodes, 2, iters=3,
                                  scale=10**6).collect()
        }
        spark.catalog.clearCache()
        # uniform start is the stationary point of a symmetric cycle, and
        # 17/20 damping splits exactly: 75000 teleport + 425000 propagated
        assert r == {1: 500000, 2: 500000}

    def test_dangling_sink_hand_values(self, spark):
        from postgresql_cdc_spark.operators.graph import pagerank_int

        edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        r = {
            x.id: x.r
            for x in pagerank_int(edges, nodes, 2, iters=2,
                                  scale=10**6).collect()
        }
        spark.catalog.clearCache()
        # iter1: r(1)=75000, r(2)=75000+floor(17*500000/20)=500000
        # iter2: r(1)=75000, r(2)=75000+floor(17*75000/20)=138750
        # (node 2 is dangling: its mass leaks, identically on any engine)
        assert r == {1: 75000, 2: 138750}

    def test_weighted_split_floors_per_edge(self, spark):
        from postgresql_cdc_spark.operators.graph import pagerank_int

        # node 1 splits 2:1 over (2, 3); per-edge floor, not rounded
        edges = spark.createDataFrame(
            [(1, 2, 2), (1, 3, 1)], "src long, dst long, w long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        r = {
            x.id: x.r
            for x in pagerank_int(edges, nodes, 3, iters=1,
                                  scale=10**6).collect()
        }
        spark.catalog.clearCache()
        # tele = floor(3e6/60) = 50000; r0 = 333333
        # to 2: floor(17*333333*2/60) = floor(188888.7) = 188888
        # to 3: floor(17*333333*1/60) = floor(94444.35) = 94444
        assert r == {1: 50000, 2: 238888, 3: 144444}

    def test_overflow_raises_instead_of_wrapping(self, spark):
        """17*r*w past int64 must fail loudly (non-ANSI Spark would silently
        wrap while the DuckDB oracle promotes to HUGEINT — divergence)."""
        from postgresql_cdc_spark.operators.graph import pagerank_int

        # r0 = scale/2 = 5e17; 17 * 5e17 * 2 = 1.7e19 > 2^63-1 ≈ 9.2e18
        edges = spark.createDataFrame(
            [(1, 2, 2), (2, 1, 2)], "src long, dst long, w long"
        )
        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        with pytest.raises(Exception, match="overflows int64"):
            pagerank_int(edges, nodes, 2, iters=1, scale=10**18).collect()
        spark.catalog.clearCache()


class TestBfsHops:
    def _bfs(self, spark, edges, seeds, **kw):
        from postgresql_cdc_spark.operators.graph import bfs_hops

        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seeds], "id long")
        return {r.id: r.hops for r in bfs_hops(e, s, **kw).collect()}

    def test_chain_distances(self, spark):
        # 1->2->3->4 directed chain from seed {1}
        got = self._bfs(spark, [(1, 2), (2, 3), (3, 4)], [1])
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_multi_source_takes_min(self, spark):
        # seeds {1, 5} on 1->2->3<-4<-5: node 3 is 2 hops from both
        got = self._bfs(spark, [(1, 2), (2, 3), (5, 4), (4, 3)], [1, 5])
        assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}

    def test_unreachable_nodes_absent(self, spark):
        got = self._bfs(spark, [(1, 2), (10, 11)], [1])
        assert got == {1: 0, 2: 1}

    def test_cycle_terminates(self, spark):
        got = self._bfs(spark, [(1, 2), (2, 3), (3, 1)], [1])
        assert got == {1: 0, 2: 1, 3: 2}

    def test_non_convergence_raises(self, spark):
        with pytest.raises(RuntimeError, match="did not converge"):
            self._bfs(
                spark, [(i, i + 1) for i in range(1, 6)], [1], max_iter=2
            )


class TestBfsHopsRandomized:
    def test_random_digraphs_vs_python_bfs(self, spark):
        import collections
        import random

        from postgresql_cdc_spark.operators.graph import bfs_hops

        rng = random.Random(8)
        for trial in range(3):
            n = 40
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(90)
            ]
            seeds = sorted(rng.sample(range(n), 3))

            adj = collections.defaultdict(list)
            for s, t in edges:
                adj[s].append(t)
            want = {s: 0 for s in seeds}
            q = collections.deque(seeds)
            while q:
                u = q.popleft()
                for v in adj[u]:
                    if v not in want:
                        want[v] = want[u] + 1
                        q.append(v)

            e = spark.createDataFrame(edges, "src long, dst long")
            sd = spark.createDataFrame([(x,) for x in seeds], "id long")
            got = {
                r.id: r.hops
                for r in bfs_hops(e, sd, max_iter=50).collect()
            }
            assert got == want, f"trial={trial}"
