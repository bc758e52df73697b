"""Event-time semantics, part 2: the streaming-window operators the core
module doesn't cover — sliding windows, Spark's native ``session_window``,
and a grouped-map (``applyInPandas``) per-key sequence featurization.

All three run on the batch ``events`` table (the same expressions drive
``readStream`` inputs — event-time windows are trigger-agnostic in Spark),
and all window math happens in integer epoch-milliseconds so the DuckDB
oracle is bit-exact.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.plans.common import EV


@register(
    "events_sliding_windows",
    """
    WITH e AS (SELECT epoch_ms(ts) AS ts_ms, value FROM events),
    w AS (
        SELECT ts_ms - (ts_ms % 900000) - k * 900000 AS w_start, value
        FROM e, LATERAL unnest([0, 1, 2, 3]) AS t(k)
    )
    SELECT w_start,
           w_start + 3600000 AS w_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM w
    WHERE w_start >= 0
    GROUP BY w_start
    """,
    doc="Sliding event-time windows (1 h length, 15 min slide): every event "
        "lands in 4 overlapping windows. Spark's window() explodes the "
        "assignment exactly like the oracle's unnest of the 4 window starts; "
        "output bounds in epoch-ms, sums in exact decimal.",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_millis("w.start").alias("w_start"),
            F.unix_millis("w.end").alias("w_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_session_native",
    """
    WITH flagged AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                        > 1800000 THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, ts_ms,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
        FROM flagged)
    SELECT user_id,
           MIN(ts_ms) AS session_start,
           MAX(ts_ms) + 1800000 AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Spark's native session_window (30 min gap): session end = last "
        "event + gap, matching the oracle's gap-flag cumulative-sum "
        "formulation. Exercises the built-in session merge operator the "
        "window-function sessionization (events_sessionize) reimplements. "
        "ts is truncated to milliseconds first so Spark's merge decisions "
        "happen at the same precision as the oracle's epoch_ms diff (both "
        "keep an event exactly at the gap in the same session — verified "
        "empirically: session_window merges when diff <= gap); without the "
        "truncation a microsecond-tail diff could split where the ms-floored "
        "oracle merges.",
)
def events_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).withColumn("ts", F.timestamp_millis(F.unix_millis("ts")))
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy("user_id", sw.alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis("s.start").alias("session_start"),
            F.unix_millis("s.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "events_value_median",
    """
    SELECT event_type,
           median(value) AS median_value,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDAF (the one UDF surface the other "
        "queries don't touch): per-type median of event values via an "
        "Arrow-batched numpy kernel. Median interpolates (a+b)/2 in float64 "
        "identically in numpy and DuckDB, so the compare is exact. Order-"
        "statistics genuinely need the group's values together — the "
        "legitimate use of a grouped-agg UDF over built-ins.",
)
def events_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    # Spark cannot mix grouped-agg pandas UDFs with JVM aggregates in one
    # agg, so the count is a (trivial) pandas UDAF too.
    @pandas_udf("long")
    def count_udf(v: pd.Series) -> int:
        return len(v)

    e = EV(spark, sf_dir)
    return e.groupBy("event_type").agg(
        median_udf("value").alias("median_value"),
        count_udf("value").alias("n_events"),
    )


@register(
    "events_user_journeys",
    """
    WITH o AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS rn,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ms(ts), event_id) AS prev_type
        FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN prev_type IS NOT NULL
                          AND prev_type <> event_type THEN 1 ELSE 0 END) AS INT)
             AS n_transitions,
           MIN(CASE WHEN rn = 1 THEN event_type END) AS first_type,
           MAX(ts_ms) - MIN(ts_ms) AS span_ms
    FROM o GROUP BY user_id
    """,
    doc="Per-user event-sequence featurization via applyInPandas (grouped "
        "map): each group arrives as one pandas frame, is sorted by "
        "(ts_ms, event_id), and reduces to sequence features — the escape "
        "hatch for per-key logic Spark expressions can't say. State is one "
        "group in memory at a time; the shuffle is the same single hash "
        "exchange a groupBy needs.",
)
def events_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )

    def journey(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_ms", "event_id"])
        types = pdf["event_type"].to_numpy()
        transitions = int((types[1:] != types[:-1]).sum()) if len(types) > 1 else 0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "n_transitions": [transitions],
                "first_type": [types[0]],
                "span_ms": [int(pdf["ts_ms"].max() - pdf["ts_ms"].min())],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        journey,
        schema="user_id long, n_events long, n_transitions int, "
               "first_type string, span_ms long",
    )


@register(
    "events_gapfill_locf",
    """
    WITH obs AS (
        SELECT user_id AS k, date_trunc('day', ts) AS bucket, value AS v,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id,
                              date_trunc('day', ts)) AS n_events
        FROM events
    ),
    b AS (SELECT k, bucket, v, n_events FROM obs WHERE rn = 1),
    rng AS (SELECT k, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY k),
    spine AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
              FROM rng),
    j AS (SELECT s.k, s.bucket, b.v, b.n_events
          FROM spine s LEFT JOIN b ON s.k = b.k AND s.bucket = b.bucket)
    SELECT k AS user_id,
           CAST(bucket AS VARCHAR) AS bucket_start,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
           v IS NULL AS is_filled
    FROM j
    """,
    doc="Hypertable-style gap-filled rollup (TimescaleDB time_bucket_gapfill"
        " + locf): per-user DAILY buckets over each user's observed range, "
        "missing days emitted with the last observed value carried forward "
        "and n_events=0. The deterministic last observation (ordered by ts, "
        "event_id) and the verbatim value carry keep both engines "
        "bit-identical with no float arithmetic. Scale: one (key, bucket) "
        "window pass + a per-key spine explode bounded by range/bucket — "
        "the continuous-aggregate shape of any metrics store.",
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.timeseries import gapfill_locf

    e = EV(spark, sf_dir)
    out = gapfill_locf(e, "ts", "user_id", "value", "event_id", unit="day")
    return out.select(
        "user_id",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_start"
        ),
        "value",
        "n_events",
        "is_filled",
    )
