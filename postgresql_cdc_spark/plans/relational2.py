"""Relational coverage, part 2: subquery flavors (correlated scalar, EXISTS /
NOT EXISTS, HAVING-derived semijoin), disjunctive predicate pushdown, math /
array / struct scalar functions, and ranking-window functions — TPC-H Q4/Q12/
Q14/Q17/Q18/Q19/Q22 shapes adapted to the driver fixture's columns
(FIXTURES.md §3; the fixture has no partsupp/shipmode/phone columns).

Exactness rules follow plans/relational.py: monetary doubles go through exact
decimals before summation; double-typed aggregates are only used where every
addend is integer-valued (exact in IEEE double regardless of order) or where
the aggregate is order-insensitive (MIN/MAX/COUNT). Array-valued outputs are
serialized to comma-joined strings so the harness canonicalizer can hash them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.plans.common import DEC, D, ONE_MINUS, T


@register(
    "q4_priority_count",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS semijoin + priority count.",
)
def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q12_late_priority_class",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE date_diff('day', o_orderdate, l_shipdate) > 90
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: late shipments classified by order priority "
        "(two-way conditional agg after join).",
)
def q12_late_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.datediff(F.col("l_shipdate").cast("date"),
                       F.col("o_orderdate").cast("date")) > 90
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,4))
                              * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))
                         END) AS DOUBLE) * 100.0
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                      * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share (conditional decimal sums, "
        "one double division at the end).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    net = DEC("l_extendedprice") * ONE_MINUS("l_discount")
    # No forced broadcast: part is unfiltered and scales with the fact tables,
    # so a hard F.broadcast OOMs at 100x where AQE would pick SMJ; at small SF
    # AQE still chooses broadcast-hash from the runtime size.
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                D(F.sum(F.when(F.col("p_type") == "PROMO", net))) * 100.0
                / D(F.sum(net))
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part avg quantity). "
        "l_quantity is integer-valued so the double AVG is order-exact.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brand filter first, broadcast into lineitem, THEN compute the correlated
    # per-part average over only the surviving rows: the window-style agg sees
    # ~1/25th of lineitem instead of all of it, and both the groupBy and the
    # self-join hash on l_partkey so the exchange is reused.
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    # p is pre-filtered to one brand (~1/25 of part) — small enough that AQE
    # broadcasts it from runtime stats; no forced broadcast (see q14 note).
    lb = l.join(p, l.l_partkey == p.p_partkey)
    per_part = lb.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_q")
    )
    return (
        lb.join(per_part, lb.l_partkey == per_part.pk)
        .where(F.col("l_quantity") < F.lit(0.2).cast("double") * F.col("avg_q"))
        .agg(
            (D(F.sum(DEC("l_extendedprice"))) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_orders",
    """
    SELECT c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 250)
    GROUP BY c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: HAVING-derived IN-subquery semijoin + top-N.",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One pass over lineitem computes per-order quantity; the >250 filter
    # leaves a tiny set, which then BROADCASTS into orders and again into
    # customer. Never re-joins lineitem (the oracle's re-aggregation of the
    # joined fact collapses to the already-computed per-order sum), and never
    # broadcasts the big customer table — the small derived side ships instead.
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    # heavy_orders is the per-order aggregate AFTER the >250 filter — a tiny
    # derived set (not the lineitem fact), hence safe to broadcast.
    heavy_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum(DEC("l_quantity")).alias("sq"))
        .where(F.col("sq") > 250)
    )
    small = o.join(
        F.broadcast(heavy_orders), o.o_orderkey == heavy_orders.l_orderkey
    ).select(
        "o_custkey", "o_orderkey", "o_totalprice", D(F.col("sq")).alias("total_qty")
    )
    return (
        c.join(F.broadcast(small), F.col("c_custkey") == small.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive ranges — exercises OR "
        "predicate pushdown / CNF conversion across a join.",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem")
    # No forced broadcast of the unfiltered part table (see q14 note).
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_idle_rich_customers",
    """
    WITH thresh AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: scalar subquery threshold (exact-decimal mean) + "
        "NOT EXISTS anti-join. The fixture gives every customer at least one "
        "order, so the anti-join targets *pending* orders to stay non-trivial.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    pos = c.where(F.col("c_acctbal") > 0.0)
    thresh = pos.agg(
        (D(F.sum(DEC("c_acctbal", 14, 2))) / F.count(F.lit(1))).alias("ab")
    )
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            D(F.sum(DEC("c_acctbal", 14, 2))).alias("total_bal"),
        )
    )


@register(
    "scalar_math_funcs",
    """
    SELECT l_returnflag,
           MIN(round(sqrt(l_quantity), 6)) AS min_sqrt_qty,
           MAX(round(sqrt(l_extendedprice), 6)) AS max_sqrt_price,
           MAX(abs(l_discount - 0.05)) AS max_abs_disc,
           CAST(SUM(CAST(floor(l_extendedprice / 1000.0) AS BIGINT)) AS BIGINT)
             AS sum_floor_k,
           CAST(SUM(CAST(ceil(l_tax * 100.0) AS BIGINT)) AS BIGINT) AS sum_ceil_tax,
           MIN(l_orderkey % 97) AS min_mod,
           MAX(greatest(l_discount, l_tax)) AS max_rate,
           MIN(least(l_discount, l_tax)) AS min_rate
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Math scalar functions in codegen: sqrt/abs/floor/ceil/mod/greatest/"
        "least. Aggregates are order-insensitive (MIN/MAX) or integer-exact "
        "sums, so doubles hash identically across engines.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.min(F.round(F.sqrt("l_quantity"), 6)).alias("min_sqrt_qty"),
        F.max(F.round(F.sqrt("l_extendedprice"), 6)).alias("max_sqrt_price"),
        F.max(F.abs(F.col("l_discount") - 0.05)).alias("max_abs_disc"),
        F.sum(F.floor(F.col("l_extendedprice") / 1000.0).cast("long"))
        .cast("long").alias("sum_floor_k"),
        F.sum(F.ceil(F.col("l_tax") * 100.0).cast("long"))
        .cast("long").alias("sum_ceil_tax"),
        F.min(F.col("l_orderkey") % 97).alias("min_mod"),
        F.max(F.greatest("l_discount", "l_tax")).alias("max_rate"),
        F.min(F.least("l_discount", "l_tax")).alias("min_rate"),
    )


@register(
    "scalar_array_struct_funcs",
    """
    SELECT p_partkey,
           3 AS arr_len,
           p_size * 2 AS second_elem,
           list_contains([p_size, p_size * 2, 7], 7) AS has_seven,
           array_to_string(list_transform(
               list_sort([p_size, p_size * 2, 7]), x -> CAST(x AS VARCHAR)), ',')
             AS sorted_csv,
           array_to_string(list_transform(
               list_reverse_sort([p_size, p_size * 2, 7]), x -> CAST(x AS VARCHAR)), ',')
             AS desc_csv,
           p_size + p_size * 2 + 7 AS arr_sum,
           p_brand AS s_brand, p_size AS s_size
    FROM part
    """,
    doc="Array + struct scalar surface: construction, element access, "
        "contains, sort asc/desc, HOF fold, struct field access. The oracle "
        "states the expected VALUES directly (struct/map layouts differ "
        "across engines; their contents must not). Arrays serialize to CSV "
        "strings for the hash gate.",
)
def scalar_array_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    arr = F.array(
        F.col("p_size"), F.col("p_size") * 2, F.lit(7)
    )
    st = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
    return p.select(
        "p_partkey",
        F.size(arr).alias("arr_len"),
        F.element_at(arr, 2).alias("second_elem"),
        F.array_contains(arr, 7).alias("has_seven"),
        F.array_join(F.array_sort(arr).cast("array<string>"), ",").alias("sorted_csv"),
        F.array_join(
            F.reverse(F.array_sort(arr)).cast("array<string>"), ","
        ).alias("desc_csv"),
        F.aggregate(arr, F.lit(0), lambda a, x: a + x).alias("arr_sum"),
        st.getField("brand").alias("s_brand"),
        st.getField("size").alias("s_size"),
    )


@register(
    "window_rank_funcs",
    """
    SELECT o_custkey, o_orderkey,
           DENSE_RANK()   OVER w AS drk,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prk,
           NTILE(4)       OVER w AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LEAD(o_orderkey) OVER w AS next_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Ranking-window surface: dense_rank / percent_rank / ntile / "
        "first_value / lead with a deterministic tie-broken frame.",
)
def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("drk"),
        F.percent_rank().over(w).cast("double").alias("prk"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.lead("o_orderkey").over(w).alias("next_ok"),
    )
