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
