"""Relational query surface (SURVEY.md §2.2).

The reference implements zero relational operators — its consumers query change
records procedurally (`wal/TableRecord.java:20-24`). In our engine the whole
Spark SQL surface is the consumer API; this module declares the inventory the
correctness gate runs: scans, projection/filter, every join flavor, hash aggs
(incl. rollup/cube/grouping sets/distinct), window functions, sorts/top-k,
set ops, scalar string/date/json functions, event-time windows, sessionization,
and an as-of join.

Exactness convention: monetary doubles are cast to exact decimals *before* any
arithmetic (`DEC(c)`), summed exactly, and cast to double at the end — the
resulting bits match DuckDB's regardless of execution order. Per-row double
arithmetic (deterministic IEEE) is allowed in outputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.registry import register


# Shared helpers live in plans/common.py (registration-free) so sibling
# modules can import them without transitively registering this inventory;
# re-exported here for backward compatibility.
from postgresql_cdc_spark.plans.common import (  # noqa: F401
    D,
    DEC,
    EV,
    ONE_MINUS,
    ONE_PLUS,
    SESSIONIZED_EVENTS_CTE,
    T,
    sessionized_events,
)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))
                    * (1.00::DECIMAL(3,2) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan filter + hash agg with exact-decimal sums.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            D(F.sum(DEC("l_quantity"))).alias("sum_qty"),
            D(F.sum(DEC("l_extendedprice"))).alias("sum_base_price"),
            D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias("sum_disc_price"),
            D(
                F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount") * ONE_PLUS("l_tax"))
            ).alias("sum_charge"),
            (D(F.sum(DEC("l_quantity"))) / cnt).alias("avg_qty"),
            (D(F.sum(DEC("l_extendedprice"))) / cnt).alias("avg_price"),
            (D(F.sum(F.col("l_discount").cast("decimal(4,2)"))) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + agg + top-k; customer side broadcasts.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey   = c_custkey
                JOIN lineitem ON l_orderkey  = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    doc="TPC-H Q5 shape: 5-way star join; dims broadcast, fact shuffles once.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        )
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dim, o.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure pushed-down filter + global agg (no shuffle of data, partial aggs only).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            D(F.sum(DEC("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Join flavors
# ---------------------------------------------------------------------------


@register(
    "join_semi_customers_with_final_orders",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    doc="left-semi join (EXISTS).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti_customers_without_pending_orders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    doc="left-anti join (NOT EXISTS).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_outer_order_counts",
    """
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="left-outer join preserving order-less customers + null-safe agg.",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            D(F.coalesce(F.sum(DEC("o_totalprice", 14, 2)), F.lit(0))).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_region_nation",
    """
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_acctbal
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy subtotals.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            D(F.sum(DEC("c_acctbal", 14, 2))).alias("sum_acctbal"),
        )
    )


@register(
    "agg_cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two low-cardinality dims.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), D(F.sum(DEC("l_quantity"))).alias("sum_qty")
    )


@register(
    "agg_grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="explicit GROUPING SETS via Spark SQL.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="multi distinct-aggregate (expand + two-phase agg).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) t
    WHERE rk <= 3
    """,
    doc="top-k per group via ROW_NUMBER (load-bearing pattern for CDC upsert).",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "window_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
    doc="running decimal sum per customer (exact, order made deterministic by key tiebreak).",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        D(F.sum(DEC("o_totalprice", 14, 2)).over(w)).alias("running_spend"),
    )


@register(
    "window_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
    doc="LAG: days since the customer's previous order.",
)
def window_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag(F.col("o_orderdate").cast("date")).over(w)
        ).alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# Sorts / set ops / scalar functions
# ---------------------------------------------------------------------------


@register(
    "sort_topn_lineitems",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net
    FROM lineitem
    ORDER BY net DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
    doc="global top-N (TakeOrderedAndProject — no full sort).",
)
def sort_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            D(DEC("l_extendedprice") * ONE_MINUS("l_discount")).alias("net"),
        )
        .orderBy(F.desc("net"), "l_orderkey", "l_linenumber")
        .limit(15)
    )


_SETOP_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SETOP_B = "SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000"


def _setop_frames(spark, sf_dir):
    a = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a, b


@register(
    "setop_union",
    f"SELECT c_custkey FROM ({_SETOP_A} UNION {_SETOP_B}) t",
    doc="UNION DISTINCT.",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_frames(spark, sf_dir)
    return a.union(b).distinct()


@register(
    "setop_intersect",
    f"SELECT c_custkey FROM ({_SETOP_A} INTERSECT {_SETOP_B}) t",
    doc="INTERSECT.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_frames(spark, sf_dir)
    return a.intersect(b)


@register(
    "setop_except",
    f"SELECT c_custkey FROM ({_SETOP_A} EXCEPT {_SETOP_B}) t",
    doc="EXCEPT DISTINCT.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_frames(spark, sf_dir)
    return a.exceptAll(b).distinct()


@register(
    "scalar_string_funcs",
    """
    SELECT p_brand,
           COUNT(*) AS n,
           CAST(SUM(length(p_name)) AS BIGINT) AS total_name_len,
           COUNT(DISTINCT upper(p_type)) AS n_types,
           MIN(substr(p_name, 1, 5)) AS min_prefix,
           CAST(SUM(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_a
    FROM part
    GROUP BY p_brand
    """,
    doc="string scalar functions inside codegen (length/upper/substr/LIKE).",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("p_name")).alias("total_name_len"),
        F.countDistinct(F.upper("p_type")).alias("n_types"),
        F.min(F.substring("p_name", 1, 5)).alias("min_prefix"),
        F.sum(F.when(F.col("p_name").like("%a%"), 1).otherwise(0)).alias("n_with_a"),
    )


@register(
    "scalar_date_funcs",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
    doc="date part extraction + agg.",
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"), F.month("o_orderdate").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        D(F.sum(DEC("o_totalprice", 14, 2))).alias("total"),
    )


@register(
    "json_events_extract",
    r"""
    SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON column: Spark from_json vs oracle regexp ground truth.",
)
def json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    parsed = e.select(
        F.from_json("props", "k INT").getField("k").alias("k"), F.col("value")
    )
    return parsed.groupBy((F.col("k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        D(F.sum(DEC("value", 12, 2))).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Event-time patterns (batch analogs of the streaming operators)
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_hourly",
    """
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h event-time window (same op as streaming window()).",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            D(F.sum(DEC("value", 12, 2))).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sessionize",
    f"""
    WITH {SESSIONIZED_EVENTS_CTE}
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MAX(ts_ms) - MIN(ts_ms) AS duration_ms
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30 min) via windowed cumulative flag.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionized_events(spark, sf_dir).groupBy(
        "user_id", "session_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


@register(
    "asof_purchase_to_signup",
    """
    WITH tiers AS (
        SELECT user_id, ts, MAX(event_id) AS signup_event_id
        FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
    purchases AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, t.signup_event_id, p.value
    FROM purchases p ASOF JOIN tiers t
      ON p.user_id = t.user_id AND p.ts >= t.ts
    """,
    doc="as-of join: each purchase matched to the user's latest prior signup.",
)
def asof_purchase_to_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.asof import asof_join

    e = EV(spark, sf_dir)
    tiers = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases, tiers, on="user_id", left_time="ts", right_time="ts", how="inner"
    )
    return joined.select("event_id", "user_id", "signup_event_id", "value")


@register(
    "asof_tolerance_recent_signups",
    """
    WITH tiers AS (
        SELECT user_id, ts, MAX(event_id) AS signup_event_id
        FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
    purchases AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
    matched AS (
        SELECT p.event_id, p.user_id, t.signup_event_id, p.value,
               epoch_ms(p.ts) - epoch_ms(t.ts) AS lag_ms
        FROM purchases p ASOF JOIN tiers t
          ON p.user_id = t.user_id AND p.ts >= t.ts)
    SELECT event_id, user_id, signup_event_id, value
    FROM matched WHERE lag_ms <= 7 * 86400000
    """,
    doc="as-of join with a 7-day tolerance (pandas merge_asof semantics): a "
        "purchase whose nearest prior signup is older than the tolerance is "
        "unmatched and drops under 'inner'. Same single-shuffle union+window "
        "plan as the unbounded as-of; the tolerance is a post-match filter, "
        "never a range join.",
)
def asof_tolerance_recent_signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.asof import asof_join

    e = EV(spark, sf_dir)
    tiers = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases, tiers, on="user_id", left_time="ts", right_time="ts",
        how="inner", tolerance=F.expr("INTERVAL 7 DAYS"),
    )
    return joined.select("event_id", "user_id", "signup_event_id", "value")
