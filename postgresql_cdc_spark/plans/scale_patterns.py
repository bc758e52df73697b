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


from postgresql_cdc_spark.operators.layout import z_sql  # noqa: E402


_Z_ORACLE = f"""
WITH b AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % 256 AS px, l_suppkey % 256 AS sy
  FROM lineitem
),
z AS (SELECT *, {z_sql('px', 'sy', 8, 'duckdb')} AS zval FROM b),
f AS (SELECT *, zval // 2048 AS file_id FROM z)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
       CAST(MIN(sy) AS BIGINT) AS min_sy, CAST(MAX(sy) AS BIGINT) AS max_sy,
       CAST((MAX(px) - MIN(px) + 1) * (MAX(sy) - MIN(sy) + 1) AS BIGINT)
         AS bbox_area
FROM f GROUP BY file_id
"""


@register(
    "layout_zorder_file_stats",
    _Z_ORACLE,
    doc="Z-order (Morton) layout statistics: interleave the bits of two "
        "bucketed dimensions (l_partkey, l_suppkey mod 256) into one "
        "Z-value, range-bucket into 32 'files', and report each file's "
        "min/max bounding box in BOTH dimensions. Tight boxes are the point: "
        "at 100 TB the write path is repartitionByRange(zval) + "
        "sortWithinPartitions before the parquet write, and the min/max file "
        "stats then prune scans on EITHER dimension — the OPTIMIZE ZORDER "
        "layout. Pure integer bit math (scan-speed projection + one hash "
        "agg), bit-identical in any engine.",
)
def layout_zorder_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    b = l.select(
        (F.col("l_partkey") % 256).alias("px"),
        (F.col("l_suppkey") % 256).alias("sy"),
    )
    # Fixed Z-ranges (zval div 2048 over the 16-bit Z space) stand in for the
    # range partitioner's split points: a pure projection here, so the whole
    # query is scan + one agg — no global sort/window anywhere.
    f = b.select(
        "px", "sy",
        F.expr(f"{z_sql('px', 'sy', 8)} div 2048").alias("file_id"),
    )
    return f.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("px").alias("min_px"), F.max("px").alias("max_px"),
        F.min("sy").alias("min_sy"), F.max("sy").alias("max_sy"),
        ((F.max("px") - F.min("px") + 1)
         * (F.max("sy") - F.min("sy") + 1)).alias("bbox_area"),
    )


@register(
    "join_bloomlike_prefilter",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    doc="Runtime-filter join pattern (the manual form of Spark's injected "
        "bloom filter, whose aggregate is not in the public registry): the "
        "selective build side (urgent orders) is compressed to its DISTINCT "
        "coarse hash buckets — at most 65,536 rows no matter how large the "
        "build side, so ALWAYS broadcastable — and the fact table is "
        "semi-joined against that broadcast BEFORE its shuffle, so "
        "non-matching lineitems never enter the exchange. False-positive "
        "bucket collisions pass the prefilter and are eliminated by the "
        "exact equi-join that follows: a pure physical rewrite, result-"
        "identical to the oracle's plain join. At 100 TB this is the "
        "difference between shuffling the whole fact table and shuffling "
        "only the ~matching fraction.",
)
def join_bloomlike_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    buckets = urgent.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(65536)).alias("kb")
    ).distinct()
    li_pre = li.withColumn(
        "kb", F.pmod(F.xxhash64("l_orderkey"), F.lit(65536))
    ).join(F.broadcast(buckets), "kb", "left_semi")
    return (
        li_pre.join(urgent, li_pre.l_orderkey == urgent.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount")))
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_preagg_pushdown",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(items) AS BIGINT) AS n_items,
           CAST(SUM(qty_dec) AS DOUBLE) AS total_qty
    FROM orders JOIN (
        SELECT l_orderkey,
               COUNT(*) AS items,
               SUM(CAST(l_quantity AS DECIMAL(12,4))) AS qty_dec
        FROM lineitem GROUP BY l_orderkey
    ) li ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Partial-aggregation pushdown below a join (eager aggregation, "
        "Yan & Larson VLDB'95): lineitem collapses to one row per orderkey "
        "BEFORE meeting orders, so the join input shrinks from ~4 rows per "
        "order to 1 and the post-join re-aggregate handles the tiny "
        "priority rollup. COUNT/SUM are decomposable, so the rewrite is "
        "result-identical to joining raw lineitems first (the oracle states "
        "the same rewritten form; equality to the naive form is pinned in "
        "tests). At 100 TB this is the difference between shuffling the "
        "full fact table into the join and shuffling its per-key summary — "
        "Catalyst does not do this rewrite itself, so the pipeline author "
        "states it.",
)
def join_preagg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    pre = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("items"),
        F.sum(DEC("l_quantity")).alias("qty_dec"),
    )
    return (
        o.join(pre, o.o_orderkey == pre.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("items").cast("bigint").alias("n_items"),
            D(F.sum("qty_dec")).alias("total_qty"),
        )
    )
