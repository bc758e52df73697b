"""Relational coverage, part 4: the six remaining canonical TPC-H shapes,
adapted to the fixture star schema (no partsupp table, no comment columns —
lineitem's (l_partkey, l_suppkey) plays the part-supplier link, and
attribute filters stand in for comment LIKE patterns):

- Q2  — correlated scalar subquery over MIN (cheapest regional supplier)
- Q8  — market share: conditional fraction of a grouped aggregate
- Q11 — HAVING over a fraction of a global scalar aggregate
- Q13 — left-join count distribution (customers by order count)
- Q15 — CTE revenue view + scalar MAX equality (top supplier)
- Q16 — NOT IN anti-join + COUNT(DISTINCT) grouped rollup

Exactness rules follow plans/relational.py: money math in exact decimals,
cast to double only at the output boundary; scalar-subquery comparisons
happen either on exact decimals (Q15) or on identically-shaped double
expressions (Q11) so both engines branch the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.plans.common import DEC, D, ONE_MINUS, T


@register(
    "q2_min_cost_supplier",
    """
    WITH regional AS (
        SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice,
               s.s_acctbal, s.s_name, n.n_name
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT DISTINCT rg.s_acctbal, rg.s_name, rg.n_name,
           p.p_partkey, p.p_brand, rg.l_extendedprice AS min_price
    FROM part p JOIN regional rg ON rg.l_partkey = p.p_partkey
    WHERE p.p_size = 15
      AND rg.l_extendedprice = (
          SELECT MIN(r2.l_extendedprice) FROM regional r2
          WHERE r2.l_partkey = p.p_partkey)
    ORDER BY rg.s_acctbal DESC, rg.s_name, rg.n_name, p.p_partkey, min_price
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: per-part correlated MIN subquery — cheapest European "
        "offer per size-15 part (lineitem stands in for partsupp). Spark "
        "plan: groupBy-min per part, joined back (no per-row subquery); "
        "doubles compare for equality because both engines read the same "
        "parquet bits and never do arithmetic on them.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = T(spark, sf_dir, "part").where(F.col("p_size") == 15).select(
        "p_partkey", "p_brand"
    )
    # supplier -> nation -> region is dimension-sized: broadcast the map.
    smap = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # regional feeds BOTH the per-part MIN and the final equality join; the
    # branches differ (one aggregates first) so Catalyst cannot reuse the
    # exchange and would otherwise scan the lineitem chain twice. Persist the
    # skinny filtered intermediate — at 100 TB this is the difference between
    # one and two fact scans. The harness clears the cache between queries.
    regional = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(smap, F.col("l_suppkey") == smap.s_suppkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .persist()
    )
    # The correlated MIN becomes one hash-agg per part; both the agg and the
    # join back hash on l_partkey so the exchange is reused.
    min_price = regional.groupBy(F.col("l_partkey").alias("mp_pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    out = (
        regional.join(
            min_price,
            (regional.l_partkey == min_price.mp_pk)
            & (regional.l_extendedprice == min_price.min_price),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "min_price")
        .distinct()
    )
    return out.orderBy(
        F.desc("s_acctbal"), "s_name", "n_name", "p_partkey", "min_price"
    ).limit(100)


@register(
    "q8_market_share",
    """
    WITH vols AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(12,4))
                 * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_items
    FROM vols GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_3 suppliers' share of European customers' "
        "order volume per year. Numerator and denominator sum as exact "
        "decimals; the division is the only double op, identical on both "
        "engines. Dimension maps broadcast; facts shuffle once on orderkey.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cmap = F.broadcast(
        T(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    smap = F.broadcast(
        T(spark, sf_dir, "supplier")
        .join(
            n.select("n_nationkey", F.col("n_name").alias("supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vols = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cmap, o.o_custkey == cmap.c_custkey)
        .join(smap, l.l_suppkey == smap.s_suppkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (DEC("l_extendedprice") * ONE_MINUS("l_discount")).alias("volume"),
            "supp_nation",
        )
    )
    return vols.groupBy("o_year").agg(
        (
            D(F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))))
            / D(F.sum("volume"))
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q11_important_stock",
    """
    WITH held AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                   * CAST(l_quantity AS DECIMAL(12,4))) AS value_dec
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey = 3
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM held
    WHERE CAST(value_dec AS DOUBLE)
          > 0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM held)
    """,
    doc="TPC-H Q11 shape: parts whose NATION_3-supplied value exceeds a "
        "fraction of the global total — HAVING over a scalar aggregate. "
        "Per-part values sum exactly in decimal; the threshold compare runs "
        "in double with the identical expression on both engines.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3)
    # held feeds the global total AND the threshold filter — persist the
    # per-part aggregate (vocabulary-sized) so lineitem scans once.
    held = (
        l.join(F.broadcast(s.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(DEC("l_extendedprice") * DEC("l_quantity")).alias("value_dec"))
        .persist()
    )
    # Global total: a one-row aggregate broadcast into the filter — no second
    # scan of lineitem, no shuffle (AQE turns the cross join into BNLJ with a
    # single-row build side).
    total = held.agg(D(F.sum("value_dec")).alias("__total"))
    return (
        held.crossJoin(F.broadcast(total))
        .where(D(F.col("value_dec")) > F.lit(0.001) * F.col("__total"))
        .select("l_partkey", D(F.col("value_dec")).alias("part_value"))
    )


@register(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: distribution of customers by non-urgent order "
        "count — left join keeps order-less customers (c_count 0), "
        "COUNT(col) skips the null-extended rows. Two hash aggs; the first "
        "reuses the join's custkey partitioning.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                   * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2))))
                 AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape: quarterly revenue view + scalar MAX equality picks "
        "the top supplier(s). The MAX compare happens on exact decimals, so "
        "ties are engine-independent; the revenue CTE computes once and "
        "feeds both the MAX and the final join.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    # revenue feeds the MAX and the equality filter — persist the supplier-
    # sized aggregate so the quarter's lineitem slice scans once.
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount")).alias("total_rev")
    ).persist()
    mx = revenue.agg(F.max("total_rev").alias("__mx"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("__mx"))
        .select("supplier_no", D(F.col("total_rev")).alias("total_revenue"))
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(F.broadcast(top), s.s_suppkey == top.supplier_no).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute combo, "
        "excluding negative-balance suppliers (the comment-LIKE analog) via "
        "NOT IN -> broadcast anti-join. s_suppkey is non-null so NOT IN and "
        "ANTI JOIN agree.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
    )
    bad = T(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def _prof_sql(col: str, min_s: str, max_s: str) -> str:
    return f"""
    SELECT '{col}' AS col,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
           {min_s} AS min_s, {max_s} AS max_s
    FROM orders"""


@register(
    "stats_column_profile",
    " UNION ALL ".join(
        [
            _prof_sql("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)",
                      "CAST(MAX(o_orderkey) AS VARCHAR)"),
            _prof_sql("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)",
                      "CAST(MAX(o_custkey) AS VARCHAR)"),
            _prof_sql("o_orderstatus", "MIN(o_orderstatus)",
                      "MAX(o_orderstatus)"),
            _prof_sql("o_orderpriority", "MIN(o_orderpriority)",
                      "MAX(o_orderpriority)"),
            _prof_sql("o_orderdate",
                      "CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR)",
                      "CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)"),
            _prof_sql("o_totalprice",
                      "CAST(CAST(floor(MIN(o_totalprice) * 100) AS BIGINT)"
                      " AS VARCHAR)",
                      "CAST(CAST(floor(MAX(o_totalprice) * 100) AS BIGINT)"
                      " AS VARCHAR)"),
        ]
    ),
    doc="ANALYZE-style column profiling: per-column row count, null count, "
        "exact NDV, and min/max (rendered engine-neutrally: integers and "
        "strings directly, timestamps via their date part, money as floored "
        "cents) — the table-statistics pass that feeds CBO join ordering "
        "and file-skipping metadata. The Spark side is ONE scan computing "
        "every column's aggregates in a single multi-distinct agg, then a "
        "stack() melt to the long (col, stats) shape — at 100 TB the "
        "single-pass formulation is the entire point (the oracle states the "
        "semantically identical per-column UNION, which DuckDB can afford "
        "at gate scale).",
)
def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    cents_mn = F.floor(F.min("o_totalprice") * 100).cast("bigint")
    cents_mx = F.floor(F.max("o_totalprice") * 100).cast("bigint")
    a = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            x
            for c in (
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority", "o_orderdate",
            )
            for x in (
                F.count(c).alias(f"cnt_{c}"),
                F.count_distinct(F.col(c)).alias(f"ndv_{c}"),
            )
        ],
        F.count("o_totalprice").alias("cnt_o_totalprice"),
        F.count_distinct(F.col("o_totalprice")).alias("ndv_o_totalprice"),
        F.min("o_orderkey").cast("string").alias("mn_o_orderkey"),
        F.max("o_orderkey").cast("string").alias("mx_o_orderkey"),
        F.min("o_custkey").cast("string").alias("mn_o_custkey"),
        F.max("o_custkey").cast("string").alias("mx_o_custkey"),
        F.min("o_orderstatus").alias("mn_o_orderstatus"),
        F.max("o_orderstatus").alias("mx_o_orderstatus"),
        F.min("o_orderpriority").alias("mn_o_orderpriority"),
        F.max("o_orderpriority").alias("mx_o_orderpriority"),
        F.min("o_orderdate").cast("date").cast("string")
        .alias("mn_o_orderdate"),
        F.max("o_orderdate").cast("date").cast("string")
        .alias("mx_o_orderdate"),
        cents_mn.cast("string").alias("mn_o_totalprice"),
        cents_mx.cast("string").alias("mx_o_totalprice"),
    )
    cols = (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate", "o_totalprice",
    )
    stack_args = ", ".join(
        f"'{c}', n - cnt_{c}, ndv_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return a.selectExpr(
        "n",
        f"stack({len(cols)}, {stack_args})"
        " AS (col, n_null, ndv, min_s, max_s)",
    ).select("col", "n", "n_null", "ndv", "min_s", "max_s")
