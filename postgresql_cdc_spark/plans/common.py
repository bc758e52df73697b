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
    """events table with its INT64-nanos `ts` converted to TimestampType.

    Spark reads TIMESTAMP(NANOS) as long (legacy.parquet.nanosAsLong); truncate
    to microseconds — same floor DuckDB's epoch_ms/date functions apply.

    The conf is set here (runtime-settable) rather than only in our session
    factory because the correctness/bench harness constructs its own
    SparkSession and calls these query callables directly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = T(spark, sf_dir, "events")
    # integer `div`, not `/`: ns values overflow double mantissa precision
    return e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
