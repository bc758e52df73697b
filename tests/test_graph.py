"""Connected-components operator: label propagation semantics on known
graphs (the oracle-paired query covers the near-dup integration)."""

from __future__ import annotations

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
