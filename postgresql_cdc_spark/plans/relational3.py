"""Relational coverage, part 3: supplier-side join shapes (TPC-H Q7/Q9/Q20/
Q21 adapted to the fixture — lineitem carries l_suppkey, supplier carries
s_nationkey), a genuine non-equi range join, RANGE window frames, approximate
sketches gated by bounded-error checks, and statistical aggregates computed
from exact decimal moments.

Exactness rules follow plans/relational.py. Two additional conventions here:

- Approximate operators (HLL count-distinct, quantile sketch) cannot hash-
  match an exact oracle, so the query emits the EXACT value (oracle-checked)
  plus a BOOLEAN asserting the sketch landed within its error bound; the
  oracle emits literal TRUE. A sketch drifting out of bounds fails the gate.
- Moment statistics (stddev/corr) are order-sensitive in IEEE double, so the
  moments (Σx, Σx², Σxy) are summed as exact decimals and the closed-form
  combination happens in double with an identical expression shape on both
  engines — bit-identical results without trusting either engine's
  accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.plans.common import DEC, D, ONE_MINUS, T


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice, l_discount
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, o_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair shipping volume by year. "
        "Fact tables shuffle once on orderkey; the nation-filtered customer "
        "and supplier maps broadcast.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_3", "NATION_7")
    cmap = F.broadcast(
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n.where(pair)), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    smap = F.broadcast(
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n.where(pair)), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    j = (
        l.join(smap, l.l_suppkey == smap.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cmap, o.o_custkey == cmap.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            D(F.sum(DEC("l_extendedprice") * ONE_MINUS("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1.00::DECIMAL(3,2) - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,4)) * 0.10::DECIMAL(3,2))
                AS DOUBLE) AS profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice, l_discount, p_retailprice, l_quantity
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year for parts "
        "matching a name pattern (supply cost modeled as 10% of retail price "
        "— the fixture has no partsupp). Part filter broadcasts into the "
        "fact; one orderkey shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    p = T(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    smap = F.broadcast(
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit_term = (
        DEC("l_extendedprice") * ONE_MINUS("l_discount")
        - DEC("p_retailprice", 12, 2) * DEC("l_quantity")
        * F.lit("0.10").cast("decimal(3,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(smap, l.l_suppkey == smap.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(D(F.sum(profit_term)).alias("profit"))
    )


@register(
    "q20_part_shippers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 40
    )
    """,
    doc="TPC-H Q20 shape: suppliers who shipped a large volume of any PROMO "
        "part — IN-subquery over a grouped HAVING, realized as semijoin on "
        "the aggregated (supplier, part) set.",
)
def q20_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(DEC("l_quantity")).alias("sq"))
        .where(F.col("sq") > 40)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_last_shippers",
    """
    WITH marked AS (
        SELECT l_suppkey, l_orderkey, l_shipdate,
               MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
               COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier JOIN (
        SELECT DISTINCT l_suppkey, l_orderkey FROM marked
        WHERE l_shipdate = max_ship AND n_supp > 1
    ) ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape: suppliers who shipped LAST in multi-supplier "
        "finished orders — the correlated MAX and EXISTS subqueries collapse "
        "into two window functions over one orderkey partition.",
)
def q21_last_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("l_orderkey")
    marked = (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"), "left_semi")
        .select(
            "l_suppkey", "l_orderkey", "l_shipdate",
            F.max("l_shipdate").over(w).alias("max_ship"),
            F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        )
        .where((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") > 1))
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    return (
        marked.join(F.broadcast(s), marked.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "join_range_buckets",
    """
    WITH buckets(bucket_name, b_start, b_end) AS (VALUES
        ('1996Q1', TIMESTAMP '1996-01-01 00:00:00', TIMESTAMP '1996-04-01 00:00:00'),
        ('1996Q2', TIMESTAMP '1996-04-01 00:00:00', TIMESTAMP '1996-07-01 00:00:00'),
        ('1996Q3', TIMESTAMP '1996-07-01 00:00:00', TIMESTAMP '1996-10-01 00:00:00'),
        ('1996Q4', TIMESTAMP '1996-10-01 00:00:00', TIMESTAMP '1997-01-01 00:00:00'))
    SELECT bucket_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM orders JOIN buckets
      ON o_orderdate >= b_start AND o_orderdate < b_end
    GROUP BY bucket_name
    """,
    doc="Non-equi (theta/range) join: orders against a tiny interval "
        "dimension on a BETWEEN-style predicate — broadcast nested-loop "
        "join, the correct physical plan when one side is literal-small.",
)
def join_range_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    rows = [
        ("1996Q1", "1996-01-01 00:00:00", "1996-04-01 00:00:00"),
        ("1996Q2", "1996-04-01 00:00:00", "1996-07-01 00:00:00"),
        ("1996Q3", "1996-07-01 00:00:00", "1996-10-01 00:00:00"),
        ("1996Q4", "1996-10-01 00:00:00", "1997-01-01 00:00:00"),
    ]
    b = spark.createDataFrame(
        rows, "bucket_name string, b_start string, b_end string"
    ).select(
        "bucket_name",
        F.col("b_start").cast("timestamp").alias("b_start"),
        F.col("b_end").cast("timestamp").alias("b_end"),
    )
    return (
        o.join(
            F.broadcast(b),
            (o.o_orderdate >= F.col("b_start")) & (o.o_orderdate < F.col("b_end")),
        )
        .groupBy("bucket_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            D(F.sum(DEC("o_totalprice", 14, 2))).alias("total_value"),
        )
    )


@register(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey, cents,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY cents
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
             AS n_within_100,
           CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY cents
                                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cents_within_100
    FROM (SELECT o_orderkey, o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders)
    """,
    doc="RANGE window frame (value-based, not row-based): per customer, how "
        "many of their orders fall within $100 below each order's value. "
        "Order key is exact integer cents so frame bounds agree bit-for-bit.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (DEC("o_totalprice", 12, 2) * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("cents")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey", "o_custkey", "cents",
        F.count(F.lit(1)).over(w).alias("n_within_100"),
        F.sum("cents").over(w).cast("long").alias("cents_within_100"),
    )


@register(
    "agg_approx_sketches",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts_exact,
           TRUE AS hll_within_5pct,
           CAST(quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0.5)
                AS DOUBLE) AS median_cents,
           TRUE AS quantile_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Sketch aggregates with bounded-error gates: HyperLogLog "
        "approx_count_distinct and the quantile sketch each run alongside "
        "their exact twin; the query emits the exact value plus a boolean "
        "asserting the sketch landed within its error bound (oracle expects "
        "literal TRUE, so sketch drift fails the hash gate).",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey",
        (DEC("l_extendedprice", 12, 2) * 100).cast("long").alias("cents"),
    )
    g = l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts_exact"),
        F.approx_count_distinct("l_partkey").alias("__hll"),
        F.expr("percentile(cents, 0.5)").alias("median_cents"),
        F.expr("approx_percentile(cents, 0.5)").alias("__apct"),
    )
    return g.select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("__hll") - F.col("n_parts_exact"))
            <= 0.05 * F.col("n_parts_exact")
        ).alias("hll_within_5pct"),
        "median_cents",
        (
            F.abs(F.col("__apct") - F.col("median_cents"))
            <= 0.02 * F.col("median_cents")
        ).alias("quantile_within_2pct"),
    )


@register(
    "scalar_stats_funcs",
    """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               -- DECIMAL(19,4) forces int128 storage in DuckDB so the
               -- product doesn't overflow the int64 decimal fast path;
               -- values are identical to Spark's (12,4)x(12,4) products.
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                        * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                        * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                        * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 9) AS stddev_qty,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS corr_qty_price
    FROM m
    """,
    doc="Statistical aggregates (sample stddev, Pearson corr) from exact "
        "decimal moments: Σx/Σx²/Σxy accumulate exactly, the closed-form "
        "combination runs in double with identical expression shape on both "
        "engines, rounded to 9 dp to absorb the 1-ulp decimal->double cast difference between engines on >2^53 scaled values. (The "
        "builtin stddev/corr are order-sensitive; a unit test checks they "
        "agree with these to float tolerance.)",
)
def scalar_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    qd, pd_ = DEC("l_quantity"), DEC("l_extendedprice")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        D(F.sum(qd)).alias("sx"),
        D(F.sum(qd * qd)).alias("sxx"),
        D(F.sum(pd_)).alias("sy"),
        D(F.sum(pd_ * pd_)).alias("syy"),
        D(F.sum(qd * pd_)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                   / (nd * (nd - F.lit(1.0)))), 9).alias("stddev_qty"),
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
               * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))),
            9).alias("corr_qty_price"),
    )


@register(
    "agg_percentile_disc",
    """
    SELECT l_returnflag,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)
             AS p99_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="ANSI discrete percentiles (PERCENTILE_DISC WITHIN GROUP): the "
        "returned value is an actual data element (smallest value whose "
        "cumulative distribution >= p), so doubles compare exactly across "
        "engines — no interpolation formula to disagree on. Exact "
        "percentiles inherently buffer the group (SortAggregate); the "
        "bounded-memory scale path is approx_percentile, gated in "
        "agg_approx_sketches.",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
        .alias("p50_qty"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)")
        .alias("p90_qty"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)")
        .alias("p99_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_pivot_linestatus",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS F_cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F_qty,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS O_cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="PIVOT (long-to-wide): per return flag, one column pair per line "
        "status, with the pivot values enumerated explicitly — on a real "
        "cluster an unenumerated pivot first runs a distinct scan to collect "
        "them, an avoidable job. Plans as ONE hash aggregate with "
        "conditional aggregation buffers (exactly the FILTER-clause twin the "
        "oracle runs); quantities route through exact decimals per the DEC "
        "convention.",
)
def agg_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            D(F.sum(DEC("l_quantity"))).alias("qty"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("F_cnt"), F.col("F_qty"), F.col("O_cnt"), F.col("O_qty"),
    )


@register(
    "agg_unpivot_measures",
    """
    WITH u AS (
        SELECT l_returnflag, 'l_quantity' AS measure,
               CAST(l_quantity AS DECIMAL(14,4)) AS v FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice',
               CAST(l_extendedprice AS DECIMAL(14,4)) FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount',
               CAST(l_discount AS DECIMAL(14,4)) FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax',
               CAST(l_tax AS DECIMAL(14,4)) FROM lineitem
    )
    SELECT l_returnflag, measure, COUNT(*) AS n,
           CAST(SUM(v) AS DOUBLE) AS total
    FROM u GROUP BY l_returnflag, measure
    """,
    doc="UNPIVOT (wide-to-long, pivot's inverse): four measure columns melt "
        "into (measure, value) rows via the native unpivot operator — a "
        "per-row Expand projection, NO extra scan, where the oracle's "
        "UNION-ALL formulation reads the table four times (Spark's unpivot "
        "is the operator a metrics-catalog export runs at scale). Exact "
        "decimal sums; one hash aggregate after the expand.",
)
def agg_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = li.select(
        "l_returnflag",
        *[F.col(c).cast("decimal(14,4)").alias(c) for c in measures],
    ).unpivot(
        ids=["l_returnflag"], values=measures,
        variableColumnName="measure", valueColumnName="v",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("total"),
    )
