"""Extension-operator query surface, part 19: null-safe join equality pin
and the monthly seasonality index.

Design rules follow plans/extensions.py: exact BIGINT counts/sums, one
IEEE division per reported ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.common import DEC, T
from postgresql_cdc_spark.plans.registry import register


@register(
    "join_null_safe_equality",
    """
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_custkey % 37 = 5 THEN NULL
                    ELSE o_custkey END AS k
        FROM orders),
    r AS (
        SELECT c_custkey AS k FROM customer
        UNION ALL SELECT NULL),
    plain AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM l JOIN r ON l.k = r.k),
    nullsafe AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l) AS n_left,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM l WHERE k IS NULL)
               AS n_null_keys,
           (SELECT n FROM plain) AS n_plain_matched,
           (SELECT n FROM nullsafe) AS n_nullsafe_matched
    """,
    doc="NULL-SAFE join equality pin: the same planted-NULL key column "
        "joined to a dimension (carrying one NULL member) under plain "
        "`=` and under null-safe equality — Spark's `<=>` vs standard "
        "SQL's IS NOT DISTINCT FROM. Load-bearing because plain "
        "equi-joins silently DROP every NULL-keyed row (three-valued "
        "logic: NULL = NULL is UNKNOWN), the classic source of quietly "
        "missing rows when a foreign key is nullable; the null-safe "
        "spelling keeps them, and the two matched counts differ by "
        "exactly the planted NULL population, which the output exposes "
        "alongside both counts. Completes the NULL-semantics pin family "
        "(join_not_in_null_semantics for anti-joins, sort_null_ordering "
        "for ordering). Plan note: Spark recognizes `<=>` as an "
        "EQUI-join key (hash/SMJ, null buckets co-partitioned) — not a "
        "nested loop — which is the reason to prefer it over "
        "coalesce-to-sentinel rewrites that corrupt real sentinel "
        "values.",
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % 37 == 5, None)
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    r = (
        T(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .unionByName(
            spark.range(1).select(F.lit(None).cast("long").alias("k"))
        )
    )
    n_left = l.agg(F.count(F.lit(1)).cast("bigint").alias("n_left"))
    n_nulls = l.where(F.col("k").isNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_null_keys")
    )
    plain = (
        l.join(r, l["k"] == r["k"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_plain_matched"))
    )
    nullsafe = (
        l.join(r, l["k"].eqNullSafe(r["k"]))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nullsafe_matched"))
    )
    return (
        n_left.crossJoin(F.broadcast(n_nulls))
        .crossJoin(F.broadcast(plain))
        .crossJoin(F.broadcast(nullsafe))
    )


_SIDX = "CAST(rev AS DOUBLE) / (CAST(total AS DOUBLE) / 12.0)"


@register(
    "orders_seasonality_index",
    f"""
    WITH m AS (
        SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS month_,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM m)
    SELECT m.month_, m.rev, t.total, {_SIDX} AS seasonality_index
    FROM m CROSS JOIN t
    """,
    doc="Monthly SEASONALITY INDEX of order revenue: each calendar "
        "month's revenue relative to the uniform 1/12 share (index > 1 "
        "= peak month) — the retail planning table that complements "
        "orders_mom_revenue_trend (sequential deltas) with the "
        "calendar-position view, aggregating across years so each "
        "month's index pools every year's occurrence. Exact BIGINT "
        "cents to 12 rows, a 1-row total broadcast, and one "
        "fixed-order shared-IEEE kernel per row. Scan-shaped at any "
        "scale.",
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        T(spark, sf_dir, "orders")
        .groupBy(F.month("o_orderdate").cast("int").alias("month_"))
        .agg(
            F.sum((DEC("o_totalprice", 12, 2) * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    t = m.agg(F.sum("rev").cast("bigint").alias("total"))
    return m.crossJoin(F.broadcast(t)).select(
        "month_", "rev", "total", F.expr(_SIDX).alias("seasonality_index")
    )
