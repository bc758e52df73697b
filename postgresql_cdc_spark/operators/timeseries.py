"""Time-series operators: hypertable-style bucket rollup with gap-filling.

TimescaleDB's ``time_bucket_gapfill(...) + locf(...)`` — the continuous-
aggregate shape every monitoring/metrics pipeline needs — has no Spark
built-in. The Spark-first composition:

1. bucket events with ``date_trunc`` (a scan-side projection);
2. ONE window pass per (key, bucket) computes the event count and picks the
   deterministic last observation (ordered by event time then id — ties
   can't flip the result between engines);
3. the per-key spine is ``sequence(min_bucket, max_bucket, interval)``
   exploded — fan-out is bounded by each series' own observed range divided
   by the bucket width, never by the table size;
4. a left join of spine to observations, then LOCF =
   ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
   per key.

Scale: everything shuffles on (key) or (key, bucket) — the natural
partitioning of any metrics store; the spine explode emits empty buckets
exactly where a downstream dashboard needs rows, and nothing is ever
collected to the driver.

Reference parity: the reference has no event-time notion at all (SURVEY.md
§2.2 — LSN is its only order); this is a north-star extension over the
``events`` fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_UNIT_INTERVAL = {
    "day": "interval 1 day",
    "hour": "interval 1 hour",
    "week": "interval 1 week",
}


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    val_col: str,
    id_col: str,
    unit: str = "day",
) -> DataFrame:
    """Per-key bucketed rollup over a dense time spine, missing buckets
    filled by last-observation-carried-forward.

    Returns (key, bucket_start [timestamp], value, n_events, is_filled):
    one row per key per bucket between that key's first and last observed
    bucket; ``is_filled`` marks spine rows with no observations (their
    ``value`` is the LOCF carry, ``n_events`` is 0). The first bucket of
    every key is observed by construction, so ``value`` is never NULL.
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = df.select(
        F.col(key_col).alias("k"),
        bucket.alias("bucket"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(val_col).alias("v"),
    )
    # one exchange on (k, bucket): ordered row_number picks the last
    # observation deterministically, unordered count shares the partition
    w_last = Window.partitionBy("k", "bucket").orderBy(
        F.col("__ts").desc(), F.col("__id").desc()
    )
    w_cnt = Window.partitionBy("k", "bucket")
    bucketed = (
        obs.withColumn("rn", F.row_number().over(w_last))
        .withColumn("n_events", F.count(F.lit(1)).over(w_cnt))
        .where(F.col("rn") == 1)
        .select("k", "bucket", "v", "n_events")
    )

    rng = bucketed.groupBy("k").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = rng.select(
        "k",
        F.explode(
            F.sequence("lo", "hi", F.expr(_UNIT_INTERVAL[unit]))
        ).alias("bucket"),
    )

    joined = spine.join(bucketed, ["k", "bucket"], "left")
    w_fill = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("k").alias(key_col),
        F.col("bucket").alias("bucket_start"),
        F.last("v", ignorenulls=True).over(w_fill).alias("value"),
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.col("v").isNull().alias("is_filled"),
    )


def interval_union_coverage(
    intervals: DataFrame,
    key: str = "user_id",
    t0: str = "t0",
    t1: str = "t1",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per ``key``: merge overlapping/adjacent [t0, t1) intervals and report
    (key, n_intervals, covered) where covered = total merged length.

    Gaps-and-islands in one key-partitioned window pass: running max of t1
    over the open ROWS frame marks island starts, a running sum numbers
    islands, two hash aggs fold islands to per-key totals. ONE shuffle on
    the key; both aggs map-side combine.

    BOTH windows (the island-start flag and the island-numbering running
    sum) MUST order by the same total order: with start-time ties, a
    differently-ordered running sum could place a new-island row after its
    tie peers, absorbing them into the previous island and inflating
    ``covered`` nondeterministically. ``order_tiebreak`` (or t1 when
    absent) makes that order total, and both windows share it.
    """
    order_cols = [t0] + ([order_tiebreak] if order_tiebreak else [t1])
    w_prev = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.select(
        key, t0, t1, *([order_tiebreak] if order_tiebreak else []),
        F.when(F.max(t1).over(w_prev) >= F.col(t0), 0)
        .otherwise(1)
        .alias("__new_island"),
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        key, t0, t1,
        F.sum("__new_island").over(w_run).cast("bigint").alias("__island"),
    )
    merged = islands.groupBy(key, "__island").agg(
        F.min(t0).alias("__s"), F.max(t1).alias("__e")
    )
    return merged.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("__e") - F.col("__s")).cast("bigint").alias("covered"),
    )
