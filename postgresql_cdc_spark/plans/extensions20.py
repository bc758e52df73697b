"""Extension-operator query surface, part 20: time-based trailing RANGE
window.

Design rules follow plans/extensions.py: the range key is exact integer
epoch-days, so frame membership agrees bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.common import DEC, T
from postgresql_cdc_spark.plans.registry import register


@register(
    "window_time_range_rolling",
    """
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS d,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders)
    SELECT o_orderkey, o_custkey, d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(cents) OVER w AS BIGINT) AS rev_7d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="TIME-based trailing RANGE window: per customer, the rolling "
        "7-day order count and revenue as of each order — the single "
        "most common production window shape (trailing-period spend, "
        "velocity checks, rate limits), distinct from "
        "window_range_frame's VALUE-based range and from tumbling "
        "calendar buckets: the frame is [t-6d, t] anchored at EVERY "
        "row, and RANGE (not ROWS) means same-day orders all see each "
        "other regardless of intra-day order. The range key is exact "
        "integer epoch-days (epoch_ms // 86400000, engine-identical "
        "floor division), so frame membership never hits timestamp or "
        "timezone semantics. One customer-keyed window pass; sums in "
        "BIGINT cents.",
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000"
            " AS BIGINT)"
        ).alias("d"),
        (DEC("o_totalprice", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_7d"),
        F.sum("cents").over(w).cast("bigint").alias("rev_7d"),
    )
