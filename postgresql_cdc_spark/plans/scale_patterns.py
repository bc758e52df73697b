"""Scale-pattern queries: the shuffle-engineering techniques a 100 TB
deployment leans on, each verified against the straightforward formulation's
oracle — the pattern must be a pure physical rewrite (identical results,
different exchange structure).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.operators.skew import salted_agg, write_bucketed
from postgresql_cdc_spark.plans.common import D, DEC, ONE_MINUS, T
from postgresql_cdc_spark.plans.registry import register


@register(
    "agg_salted_hot_keys",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(SUM(1) AS BIGINT) AS n_items,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_order,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_order
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Salted two-phase aggregation over a genuinely skewed key "
        "(l_returnflag: 3 values over the whole fact table). Phase 1 "
        "aggregates on (key, salt) so 16 reducers share each hot key; phase "
        "2 combines one row per (key, salt). Decimal sums are associative, "
        "so the rewrite is result-identical to the oracle's plain GROUP BY.",
)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    out = salted_agg(
        l,
        keys=["l_returnflag"],
        aggs={
            "revenue_dec": (
                "sum",
                F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount")),
            ),
            "n_items": ("sum", F.count(F.lit(1))),
            "min_order": ("min", F.min("l_orderkey")),
            "max_order": ("max", F.max("l_orderkey")),
        },
        n_salts=16,
        salt_on="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        D(F.col("revenue_dec")).alias("revenue"),
        F.col("n_items").cast("long").alias("n_items"),
        F.col("min_order").cast("long").alias("min_order"),
        F.col("max_order").cast("long").alias("max_order"),
    )


@register(
    "bucketed_join_order_revenue",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Exchange-free fact-to-fact join via bucketed tables: orders and "
        "lineitem are written bucketed+sorted on orderkey (8 buckets, one "
        "up-front shuffle), after which the join reads matching buckets with "
        "NO exchange on either side — the 100 TB pattern for a fact join "
        "repeated across a workload. The write is part of the query here so "
        "it is self-contained per session; a deployment does it once.",
)
def bucketed_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scratch path and table names carry the applicationId so two concurrent
    # harness processes at the same scale factor never overwrite each other's
    # bucket files or session-catalog tables mid-query (same convention as
    # streaming_gate's tmpdirs).
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = (os.path.basename(sf_dir.rstrip("/")) or "sf") + "_" + app
    base = os.path.join(tempfile.gettempdir(), f"pgcdc_spark_buckets_{tag}")
    ot, lt = f"pgcdc_orders_b_{tag}".replace(".", "_"), \
        f"pgcdc_lineitem_b_{tag}".replace(".", "_")
    write_bucketed(
        T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        ot, "o_orderkey", 8, os.path.join(base, "orders"),
    )
    write_bucketed(
        T(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        lt, "l_orderkey", 8, os.path.join(base, "lineitem"),
    )
    o = spark.table(ot)
    l = spark.table(lt)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
