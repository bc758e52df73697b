"""Shared query-building helpers, free of registrations.

Lives outside ``relational.py`` so that plan modules importing a helper do
NOT transitively register relational's query inventory first — registration
order is the order a budget-capped correctness harness visits queries, and
``plans/__init__`` controls it by import order alone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def EV(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with `ts` normalized to TimestampType, fixture-agnostic.

    Fixtures have shipped two physical encodings of `ts` across driver
    regenerations: INT64 TIMESTAMP(NANOS) (read as long under
    legacy.parquet.nanosAsLong) and plain TIMESTAMP(MICROS) (read natively
    as a timestamp). Branch on the *read* dtype: bigint means nanos — floor
    to micros with integer `div` (ns values overflow double mantissa, so no
    `/`); any timestamp flavor is already micros and passes through.

    The conf is set here (runtime-settable) rather than only in our session
    factory because the correctness/bench harness constructs its own
    SparkSession and calls these query callables directly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = T(spark, sf_dir, "events")
    ts_type = dict(e.dtypes)["ts"]
    if ts_type == "bigint":
        return e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type.startswith("timestamp"):
        # TIMESTAMP_NTZ compares/bins identically to TIMESTAMP for our
        # session-UTC harness; cast so downstream window() sees one type.
        return e.withColumn("ts", F.col("ts").cast("timestamp"))
    raise TypeError(f"events.ts has unsupported type {ts_type!r}")


def DEC(c, prec: int = 12, scale: int = 4):
    """Exact-decimal view of a monetary double column (data has <=4 dp)."""
    return F.col(c).cast(f"decimal({prec},{scale})")


def D(x):
    return x.cast("double")


# (1 - l_discount) / (1 + l_tax) as exact decimals: 2 dp in the data.
def ONE_MINUS(c):
    return F.lit(1).cast("decimal(3,2)") - F.col(c).cast("decimal(4,2)")


def ONE_PLUS(c):
    return F.lit(1).cast("decimal(3,2)") + F.col(c).cast("decimal(4,2)")


# THE canonical 30-minute gap sessionizer — every session-derived query
# (events_sessionize, length hist, interval overlap, ...) builds on these
# two definitions so a boundary-rule change propagates everywhere by
# construction. The CTE ends with
# `sessions(user_id, event_id, ts_ms, session_id)`.
SESSIONIZED_EVENTS_CTE = """
    flagged AS (
        -- order by epoch_ms(ts) (NOT raw nanosecond ts): Spark's window orders
        -- by ts_ms, and a same-user same-millisecond tie could legally order
        -- differently and move a session boundary
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                        > 1800000 THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        -- DuckDB's windowed SUM yields HUGEINT; cast to BIGINT to match
        -- Spark's long session_id
        SELECT user_id, event_id, ts_ms,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged)
"""


def sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_id, ts_ms, session_id) under the canonical 30-min
    gap rule — the Spark twin of SESSIONIZED_EVENTS_CTE."""
    from pyspark.sql.window import Window

    e = EV(spark, sf_dir).select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(F.col("ts_ms") - F.lag("ts_ms").over(w) > 1800000, 1)
        .otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_id", F.sum("new_session").over(cum)
    ).select("user_id", "event_id", "ts_ms", "session_id")
