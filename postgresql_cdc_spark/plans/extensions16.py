"""Extension-operator query surface, part 16: distributed sequence-gap
audit.

Design rules follow plans/extensions.py: all-BIGINT outputs, and the
consecutive-difference scan is decomposed so no window ever spans more
than one key bucket — the gap detector stays shuffle-light at any key
density.

Reference parity: the completeness audit a CDC consumer runs over
replicated key/LSN sequences (the reference's at-least-once contract,
CdcEngine.java:132-137, makes holes a real failure mode to monitor for);
the reference itself ships no such operator (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.common import T
from postgresql_cdc_spark.plans.registry import register


@register(
    "dq_sequence_gaps",
    """
    WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders
               WHERE o_orderkey % 97 <> 3 AND o_orderkey % 101 <> 7),
    led AS (
        SELECT key, LEAD(key) OVER (ORDER BY key) AS nxt FROM k)
    SELECT CAST(key + 1 AS BIGINT) AS gap_start,
           CAST(nxt - 1 AS BIGINT) AS gap_end,
           CAST(nxt - key - 1 AS BIGINT) AS gap_len
    FROM led WHERE nxt - key > 1
    """,
    doc="Sequence-gap audit: every maximal run of missing keys in the "
        "order-key sequence as [gap_start, gap_end] intervals — the "
        "completeness check a CDC consumer runs over replicated keys or "
        "LSNs to prove the at-least-once stream dropped nothing. The "
        "fixture's keys are dense, so the query PLANTS deterministic "
        "drops (two coprime residue classes, which also collide into a "
        "few length-2 runs) and the detector must recover exactly those "
        "holes — a 0-row audit over already-complete data would gate "
        "nothing. The oracle states the textbook global LEAD scan; "
        "the Spark plan must not (one unpartitioned window = one task "
        "holding every key), so it decomposes: keys bucket by div 8192, "
        "LEAD runs WITHIN each bucket, and the per-bucket (min, max) "
        "summary — thousands of times smaller — closes the seams with "
        "a TWO-LEVEL stitched LEAD (operators/seams.py: partitioned "
        "in-super-bucket LEAD + a rollup seam pass, so no task holds "
        "more than range/8192^2 rows at any key range), emitting a "
        "boundary gap when the "
        "next bucket's min does not continue the previous bucket's max. "
        "In-bucket and boundary gaps union to exactly the global answer "
        "(a maximal gap never spans a SEAM unseen: bucket ids derive "
        "from present keys only, so consecutive summary rows are "
        "precisely the consecutive present keys across the seam).",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = (
        T(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderkey") % 97 != 3) & (F.col("o_orderkey") % 101 != 7)
        )
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
        .withColumn("bkt", F.expr("key div 8192"))
    )
    w_in = Window.partitionBy("bkt").orderBy("key")
    inside = (
        k.withColumn("nxt", F.lead("key").over(w_in))
        .where(F.col("nxt") - F.col("key") > 1)
        .select(
            (F.col("key") + 1).cast("bigint").alias("gap_start"),
            (F.col("nxt") - 1).cast("bigint").alias("gap_end"),
        )
    )
    # bucket summary: tiny (|keys| / 8192 rows). Seams stitch TWO-LEVEL
    # (operators/seams.py): the in-super-bucket LEAD runs partitioned, and
    # the only unpartitioned window left is over the super-bucket rollup —
    # at most range / 8192^2 rows at ANY key range, so no single task ever
    # holds a table that scales with the data.
    summ = k.groupBy("bkt").agg(
        F.min("key").alias("bmin"), F.max("key").alias("bmax")
    )
    from postgresql_cdc_spark.operators.seams import two_level_next

    seams = (
        two_level_next(summ, "bkt", {"bmin": "nmin"})
        .where(F.col("nmin") - F.col("bmax") > 1)
        .select(
            (F.col("bmax") + 1).cast("bigint").alias("gap_start"),
            (F.col("nmin") - 1).cast("bigint").alias("gap_end"),
        )
    )
    return inside.unionByName(seams).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1)
        .cast("bigint")
        .alias("gap_len"),
    )
