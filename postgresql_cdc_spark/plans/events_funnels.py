"""Event-time semantics, part 3: the product-analytics operators every
events warehouse runs — retention cohorts and ordered funnels.

Both are pure built-ins over the ``events`` fixture; all time math is
integer (epoch-milliseconds / whole-day differences of midnight-truncated
buckets), so the DuckDB twins are bit-exact.

Scale shapes:

- retention: two hash-aggregations plus one user-keyed equi-join — the
  word-count profile; the output is cohort x offset, tiny at any corpus
  size.
- funnel: one filtered min-aggregation per stage, chained by user-keyed
  joins with an ordering predicate — each stage's frame shrinks (only
  users who reached the previous stage), so the deepest stage is the
  cheapest, and nothing is ever windowed over the full event stream.

Reference parity: the reference has no event-time notion (SURVEY.md §2.2);
north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.plans.common import EV


@register(
    "events_retention_cohorts",
    """
    WITH activity AS (
        SELECT user_id, date_trunc('day', ts) AS d FROM events GROUP BY 1, 2
    ),
    cohort AS (SELECT user_id, MIN(d) AS c FROM activity GROUP BY 1)
    SELECT CAST(c AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', c, d) AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users bucketed by first-activity day, "
        "counted per whole-day offset of each later active day — the "
        "dashboard behind every retention curve. Distinct (user, day) "
        "activity first, so a burst of events one day counts once. All "
        "integer day arithmetic on midnight-truncated buckets.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("d").alias("c"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            # DuckDB's date_trunc('day', ts) yields a DATE, so the twin's
            # VARCHAR cast has no time part — format date-only to match.
            F.date_format("c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("c")).cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_funnel_steps",
    """
    WITH s1 AS (SELECT user_id, MIN(epoch_ms(ts)) AS t1
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2.t2
           GROUP BY e.user_id)
    SELECT s1.user_id, s1.t1 AS view_ms, s2.t2 AS click_ms, s3.t3 AS purchase_ms
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    doc="Ordered funnel (view -> click -> purchase): per user, the first "
        "view, the first click strictly after it, and the first purchase "
        "strictly after that — users who stall mid-funnel keep NULLs, so "
        "per-stage conversion is a COUNT over this frame. Chained "
        "filtered-min aggregations joined on user (each stage only scans "
        "users who reached the previous one); integer epoch-ms throughout.",
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ms").alias("view_ms"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ms") > F.col("view_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("click_ms"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ms") > F.col("click_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("purchase_ms"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "view_ms", "click_ms", "purchase_ms")
    )
