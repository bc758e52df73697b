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


# --- large x large interval-overlap join via time-bucket blocking ------------

from postgresql_cdc_spark.plans.common import (  # noqa: E402
    SESSIONIZED_EVENTS_CTE,
    sessionized_events,
)


@register(
    "join_interval_overlap",
    f"""
    WITH {SESSIONIZED_EVENTS_CTE},
    spans AS (
        SELECT user_id, session_id,
               MIN(ts_ms) AS s, MAX(ts_ms) AS e
        FROM sessions GROUP BY user_id, session_id)
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
               AS overlap_ms
    FROM spans a JOIN spans b
      ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id, b.user_id
    """,
    doc="Large x large interval-overlap join (concurrent sessions across "
        "users) via TIME-BUCKET BLOCKING: each session explodes into the "
        "hour buckets it covers, candidates come from a plain equi-join on "
        "the bucket (overlapping intervals ALWAYS share the bucket holding "
        "the later start, so recall is exact), a distinct collapses multi-"
        "bucket pairs, and the exact predicate prunes co-bucketed non-"
        "overlaps. The naive theta-join is a quadratic nested loop Spark "
        "cannot hash; bucketing turns it into a shuffle join whose fan-out "
        "per bucket is bounded by concurrency, not corpus size — the same "
        "blocking every interval-join engine (and this repo's as-of join) "
        "builds on. The oracle states the naive theta-join (tractable at "
        "oracle scale; DuckDB plans an IEJoin): equality proves the "
        "blocking loses nothing. Bucket width tunes fan-out vs explode "
        "factor; sessions here are minutes-long, so hour buckets explode "
        "~1.02x.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    _BUCKET_MS = 3_600_000
    sess = (
        sessionized_events(spark, sf_dir)  # the canonical 30-min gap rule
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_ms").alias("s"), F.max("ts_ms").alias("e"))
    )
    # skinny (user, session, s, e) persists: exploded twice below
    sess = sess.persist()
    bucketed = sess.select(
        "user_id", "session_id", "s", "e",
        F.explode(
            F.sequence(
                F.expr(f"s div {_BUCKET_MS}"), F.expr(f"e div {_BUCKET_MS}")
            )
        ).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_id").alias("sa"),
            F.col("a.s").alias("s_a"), F.col("a.e").alias("e_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_id").alias("sb"),
            F.col("b.s").alias("s_b"), F.col("b.e").alias("e_b"),
        )
        .distinct()  # a pair sharing n buckets appears n times
        .where((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
    )
    return cand.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("e_a", "e_b") - F.greatest("s_a", "s_b")
        ).alias("overlap_ms"),
    )


# --- skew-resistant two-phase per-group top-k --------------------------------

@register(
    "window_topk_two_phase",
    """
    SELECT o_orderpriority, rank, o_orderkey, total_tm
    FROM (
        SELECT o_orderpriority, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 10000 AS BIGINT)
                   AS total_tm,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 10000
                                 AS BIGINT) DESC, o_orderkey ASC)
                   AS rank
        FROM orders)
    WHERE rank <= 3
    """,
    doc="Skew-resistant two-phase per-group top-k: o_orderpriority has FIVE "
        "values over the whole fact table, so a single "
        "row_number-over-group window funnels ~1/5 of 100 TB through each "
        "of five reducers. Phase 1 ranks within (group, salt=key%16) — a "
        "balanced 80-partition shuffle — and keeps k rows per salt; phase "
        "2 re-ranks the <= groups*salts*k survivors (240 rows at ANY "
        "scale). The group top-k is always contained in the union of its "
        "per-salt top-ks, so the rewrite is result-identical — the same "
        "guarantee behind salted_agg, applied to an order-statistic. The "
        "ordering includes the key, so ranks are total-order "
        "deterministic; the oracle states the naive single window.",
)
def window_topk_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey",
        (DEC("o_totalprice") * 10000).cast("bigint").alias("total_tm"),
    )
    salted = o.withColumn("__salt", F.col("o_orderkey") % 16)
    w1 = Window.partitionBy("o_orderpriority", "__salt").orderBy(
        F.desc("total_tm"), F.asc("o_orderkey")
    )
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= 3)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("total_tm"), F.asc("o_orderkey")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", "total_tm")
    )
