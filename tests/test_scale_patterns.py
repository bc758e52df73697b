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


class TestZOrder:
    def test_morton_interleave_matches_python(self, spark):
        from postgresql_cdc_spark.operators.layout import zvalue

        def py_z(a, b, bits=8):
            z = 0
            for k in range(bits):
                z |= ((a >> k) & 1) << (2 * k + 1)
                z |= ((b >> k) & 1) << (2 * k)
            return z

        import random

        rng = random.Random(7)
        rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(200)]
        df = spark.createDataFrame(rows, "px INT, sy INT")
        got = df.select("px", "sy", zvalue("px", "sy").alias("z")).collect()
        for r in got:
            assert r.z == py_z(r.px, r.sy)

    def test_z_range_buckets_bound_both_dims(self, spark):
        # The layout property the file stats query reports: every fixed
        # Z-range confines BOTH dimensions (a 2048-wide Z-range leaves 11
        # free low Z-bits: 5 of px — the high bit of each pair — and 6 of
        # sy, so boxes are at most 32 px values x 64 sy values).
        from postgresql_cdc_spark.operators.layout import z_sql
        from pyspark.sql import functions as F

        df = spark.range(0, 65536).select(
            (F.col("id") % 256).cast("int").alias("px"),
            ((F.col("id") / 256).cast("int")).alias("sy"),
        )
        stats = (
            df.select("px", "sy",
                      F.expr(f"{z_sql('px', 'sy', 8)} div 2048").alias("f"))
            .groupBy("f")
            .agg((F.max("px") - F.min("px")).alias("wx"),
                 (F.max("sy") - F.min("sy")).alias("wy"))
            .collect()
        )
        assert len(stats) == 32
        for r in stats:
            assert r.wx <= 31 and r.wy <= 63


class TestBloomlikePrefilter:
    def test_semi_prefilter_sits_below_the_fact_shuffle(self, spark):
        """The point of the pattern: the broadcast LeftSemi bucket filter
        must apply to the lineitem scan BEFORE any exchange of fact rows —
        if it floats above the shuffle (or disappears), the rewrite no
        longer saves the fact-table exchange it exists for."""
        from postgresql_cdc_spark.plans import QUERIES

        df = QUERIES["join_bloomlike_prefilter"].spark(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
        semi = plan.index("LeftSemi")
        # the lineitem scan feeding the semi join is below it in the tree
        assert "lineitem" in plan[semi:]
        assert "CartesianProduct" not in plan

    def test_prefilter_result_equals_plain_join(self, spark):
        from pyspark.sql import functions as F

        from postgresql_cdc_spark.plans import QUERIES
        from postgresql_cdc_spark.plans.common import D, DEC, ONE_MINUS, T

        sf = "/root/testdata/sf0.001"
        got = {
            r.l_returnflag: (r.revenue, r.n_items)
            for r in QUERIES["join_bloomlike_prefilter"].spark(spark, sf).collect()
        }
        li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .where(F.col("o_orderpriority") == "1-URGENT")
            .groupBy("l_returnflag")
            .agg(
                D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount")))
                .alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
        )
        want = {r.l_returnflag: (r.revenue, r.n_items) for r in plain.collect()}
        assert got == want


class TestPreaggPushdown:
    def test_preagg_equals_naive_join_then_agg(self, spark):
        from pyspark.sql import functions as F

        from postgresql_cdc_spark.plans import QUERIES
        from postgresql_cdc_spark.plans.common import D, DEC, T

        sf = "/root/testdata/sf0.001"
        got = {
            r.o_orderpriority: (r.n_orders, r.n_items, r.total_qty)
            for r in QUERIES["join_preagg_pushdown"].spark(spark, sf).collect()
        }
        li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
        naive = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count_distinct("o_orderkey").alias("n_orders"),
                F.count(F.lit(1)).alias("n_items"),
                D(F.sum(DEC("l_quantity"))).alias("total_qty"),
            )
        )
        want = {
            r.o_orderpriority: (r.n_orders, r.n_items, r.total_qty)
            for r in naive.collect()
        }
        assert got == want
