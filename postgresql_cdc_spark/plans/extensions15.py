"""Extension-operator query surface, part 15: per-user CUSUM drift
detection and the case-collation sort pin.

Design rules follow plans/extensions.py: exact BIGINT arithmetic
end-to-end (CUSUM here needs no IEEE ops at all — the reference value is
a PERCENTILE_DISC data element, so deltas stay integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.common import DEC, EV, T
from postgresql_cdc_spark.plans.registry import register


@register(
    "events_cusum_user_drift",
    """
    WITH e AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    med AS (
        SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS med
        FROM e),
    pre0 AS (
        SELECT user_id, ts_ms, event_id, med,
               CAST(SUM(cents - med) OVER (PARTITION BY user_id
                    ORDER BY ts_ms, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
        FROM e CROSS JOIN med),
    pre AS (
        SELECT user_id, ts_ms, event_id, med, prefix,
               CAST(MIN(prefix) OVER (PARTITION BY user_id
                    ORDER BY ts_ms, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runmin
        FROM pre0),
    s AS (
        SELECT user_id, med,
               prefix - CASE WHEN runmin < 0 THEN runmin ELSE 0 END AS cusum,
               LAG(prefix - CASE WHEN runmin < 0 THEN runmin ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
                   AS prev
        FROM pre)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum,
           CAST(SUM(CASE WHEN COALESCE(prev, 0) < 2 * med
                          AND cusum >= 2 * med THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarms
    FROM s GROUP BY user_id
    """,
    doc="Per-user CUSUM drift alarm (Page's sequential changepoint test, "
        "the monitoring kernel behind spend-anomaly and metric-drift "
        "alerting): accumulate max(0, S + (x - ref)) over each user's "
        "event sequence and raise an alarm whenever the statistic "
        "crosses the decision band H = 2*ref upward. Fully integer-"
        "exact: the reference is the global PERCENTILE_DISC median (a "
        "data element, so deltas are BIGINT cents — a mean reference "
        "would drag every delta through a division), and the clamped "
        "recursion is replaced by the floored-prefix identity "
        "S = prefix - min(0, runmin) (property-tested in "
        "test_extensions_kernels), so the 'inherently sequential' "
        "statistic is two user-keyed cumulative windows plus a LAG for "
        "upward-crossing detection — no state machine, no UDF. Reports "
        "per user: events, high-water CUSUM, alarm count.",
)
def events_cusum_user_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_id",
        (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    med = e.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("bigint")
        .alias("med")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    pre = (
        e.crossJoin(F.broadcast(med))
        .withColumn(
            "prefix",
            F.sum(F.col("cents") - F.col("med")).over(w).cast("bigint"),
        )
        .withColumn("runmin", F.min("prefix").over(w).cast("bigint"))
    )
    cusum = F.col("prefix") - F.when(
        F.col("runmin") < 0, F.col("runmin")
    ).otherwise(0)
    s = pre.select(
        "user_id",
        "med",
        cusum.alias("cusum"),
        F.lag(cusum).over(w_lag).alias("prev"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("cusum").cast("bigint").alias("max_cusum"),
        F.sum(
            F.when(
                (F.coalesce(F.col("prev"), F.lit(0)) < 2 * F.col("med"))
                & (F.col("cusum") >= 2 * F.col("med")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alarms"),
    )


@register(
    "sort_case_sensitivity_pin",
    """
    WITH m AS (
        SELECT s_suppkey, s_nationkey,
               CASE WHEN s_suppkey % 3 = 0 THEN upper(s_name)
                    WHEN s_suppkey % 3 = 1 THEN lower(s_name)
                    ELSE s_name END AS mixed
        FROM supplier)
    SELECT s_suppkey, mixed,
           CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
                ORDER BY mixed, s_suppkey) AS BIGINT) AS binary_rank,
           CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
                ORDER BY lower(mixed), s_suppkey) AS BIGINT) AS folded_rank
    FROM m
    """,
    doc="Case-collation sort pin: the same planted mixed-case name column "
        "ranked under raw BINARY byte order (where 'Z' < 'a' because "
        "uppercase code points sort first) and under explicit lower() "
        "case-folding — stated side by side because engines and locales "
        "silently disagree on default collation (ICU/locale builds of "
        "either engine would reorder the binary ranking); both engines "
        "here default to binary UTF-8 comparison and the gate proves the "
        "two rankings agree bit-for-bit, with the key tiebreak making "
        "every rank total-order deterministic. Companion of "
        "sort_null_ordering on the collation axis. Ranks are per-nation "
        "so the windows stay key-partitioned — an unpartitioned rank "
        "over a dimension that is SF-proportional in TPC-H would funnel "
        "it through one task at scale.",
)
def sort_case_sensitivity_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.when(F.col("s_suppkey") % 3 == 0, F.upper("s_name"))
        .when(F.col("s_suppkey") % 3 == 1, F.lower("s_name"))
        .otherwise(F.col("s_name"))
        .alias("mixed"),
    )
    w_bin = Window.partitionBy("s_nationkey").orderBy("mixed", "s_suppkey")
    w_fold = Window.partitionBy("s_nationkey").orderBy(
        F.lower("mixed"), "s_suppkey"
    )
    return m.select(
        "s_suppkey",
        "mixed",
        F.row_number().over(w_bin).cast("bigint").alias("binary_rank"),
        F.row_number().over(w_fold).cast("bigint").alias("folded_rank"),
    )
