"""Physical-plan assertions for the scale-pattern queries: the point of the
patterns is the exchange structure, so the tests pin the plan shape, not just
the (oracle-checked) values."""

from __future__ import annotations

import re

from postgresql_cdc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].spark(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class TestBucketedJoin:
    def test_join_has_no_shuffle(self, spark):
        plan = _plan(spark, "bucketed_join_order_revenue")
        # the join must consume the bucket layout directly: no shuffle
        # exchange may feed the join (the only allowed one is the final
        # groupBy's). At tiny SF the optimizer may choose a broadcast join —
        # still exchange-free; at scale the same bucketed scans feed an SMJ.
        assert re.search(r"SortMergeJoin|BroadcastHashJoin", plan), plan[:2000]
        exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
        assert exchanges <= 1, f"bucketed join still shuffles: {exchanges} exchanges"
        # both scans advertise the bucket layout
        assert len(re.findall(r"Bucketed: true", plan)) == 2, \
            "scans did not use buckets"


class TestSaltedAgg:
    def test_two_phase_shape(self, spark):
        plan = _plan(spark, "agg_salted_hot_keys")
        # phase 1 groups by (key, salt); phase 2 by key alone
        assert "__salt" in plan
        aggs = len(re.findall(r"HashAggregate", plan))
        # partial+final for each of the two phases -> at least 3 HashAggregate
        # nodes (AQE may merge adjacent ones)
        assert aggs >= 3, plan[:2000]
