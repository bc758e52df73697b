"""Extension-operator query surface, part 13: weighted median via the
crossing-bucket decomposition, deterministic mode, and out-of-vocabulary
scoring.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only — where a double is unavoidable it is one IEEE division of
exact BIGINTs. The weighted median introduces the CROSSING-BUCKET variant
of the sort-rank decomposition: instead of ranking every row, only the
single value-bucket containing the weighted-half crossing is opened, so
the per-key work after the bucket rollup is O(bucket), not O(n) — the
selection analogue of events_value_gini's ranking decomposition.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2); these extend the warehouse surface a CDC consumer
builds on top of replicated tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.plans.common import DEC, T
from postgresql_cdc_spark.plans.registry import register


# --- weighted median -----------------------------------------------------------

@register(
    "stats_weighted_median",
    """
    WITH e AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(CAST(l_quantity AS DECIMAL(12,4)) AS BIGINT) AS w
        FROM lineitem),
    vals AS (
        SELECT l_returnflag, cents, CAST(SUM(w) AS BIGINT) AS w
        FROM e GROUP BY 1, 2),
    cum AS (
        SELECT l_returnflag, cents,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
        FROM vals),
    tot AS (SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS tw
            FROM vals GROUP BY 1)
    SELECT c.l_returnflag, t.tw AS total_weight,
           CAST(MIN(CASE WHEN 2 * c.cw >= t.tw THEN c.cents END)
                AS BIGINT) AS median_cents
    FROM cum c JOIN tot t USING (l_returnflag)
    GROUP BY c.l_returnflag, t.tw
    """,
    doc="Weighted (lower) median of line price per return flag, weighted "
        "by quantity: the smallest value v with 2*cumweight(v) >= "
        "totalweight — all-BIGINT selection, no interpolation. The oracle "
        "states the textbook per-key cumulative window; the Spark plan "
        "must NOT (a 3-key partition window funnels a third of the fact "
        "table through one task), so it runs the CROSSING-BUCKET "
        "decomposition: roll distinct values up to $10 buckets, cumulate "
        "the tiny bucket table to find carry-in weights, select the ONE "
        "bucket per key where the half crosses (2*carry < tw <= "
        "2*(carry+bucketweight)), and open only that bucket's rows for "
        "the final within-bucket scan — selection work after the rollup "
        "is O(one bucket), not O(n). New pattern vs events_value_gini, "
        "which ranks EVERY row; selection needs just the crossing.",
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (DEC("l_extendedprice", 12, 2) * 100).cast("bigint").alias("cents"),
        DEC("l_quantity", 12, 4).cast("bigint").alias("w"),
    )
    # skinny distinct-value rollup, read 3x (buckets, totals, crossing
    # open): persist per the dedup.py contract.
    vals = (
        e.groupBy("l_returnflag", "cents")
        .agg(F.sum("w").cast("bigint").alias("w"))
        .withColumn("bkt", F.expr("cents div 1000"))
        .persist()
    )
    bw = vals.groupBy("l_returnflag", "bkt").agg(
        F.sum("w").cast("bigint").alias("bw")
    )
    # exclusive prefix per flag, stitched TWO-LEVEL (operators/seams.py):
    # l_returnflag has only 3 values, so the per-flag bucket window would
    # still funnel value-range/1000 rows through 3 tasks; the stitch caps
    # every window task at max(8192, range/1000/8192) rows per flag.
    from postgresql_cdc_spark.operators.seams import (
        two_level_exclusive_prefix,
    )

    carry = two_level_exclusive_prefix(
        bw, "bkt", {"bw": "carry"}, part=("l_returnflag",)
    ).select("l_returnflag", "bkt", "carry", "bw")
    tot = vals.groupBy("l_returnflag").agg(
        F.sum("w").cast("bigint").alias("tw")
    )
    # exactly one bucket per key satisfies 2*carry < tw <= 2*(carry+bw)
    crossing = (
        carry.join(F.broadcast(tot), "l_returnflag")
        .where(
            (2 * F.col("carry") < F.col("tw"))
            & (2 * (F.col("carry") + F.col("bw")) >= F.col("tw"))
        )
        .select("l_returnflag", "bkt", "carry", "tw")
    )
    # open only the crossing bucket's distinct values (a handful of rows)
    w_in = Window.partitionBy("l_returnflag", "bkt").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    opened = vals.join(F.broadcast(crossing), ["l_returnflag", "bkt"]).withColumn(
        "cw", (F.col("carry") + F.sum("w").over(w_in)).cast("bigint")
    )
    return (
        opened.groupBy("l_returnflag", "tw")
        .agg(
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents"))
            )
            .cast("bigint")
            .alias("median_cents")
        )
        .select(
            "l_returnflag",
            F.col("tw").alias("total_weight"),
            "median_cents",
        )
    )


# --- deterministic mode ---------------------------------------------------------

@register(
    "agg_mode_tiebreak",
    """
    WITH c AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT event_type, cents, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, cents) AS rn
        FROM c)
    SELECT event_type, cents AS mode_cents, n AS mode_count
    FROM r WHERE rn = 1
    """,
    doc="Deterministic MODE per event type: the most frequent value, ties "
        "broken by smallest value — stated explicitly because both "
        "engines' native mode()/any-tie aggregates leave tie order "
        "unspecified, the classic source of flaky cross-engine results. "
        "Plan: one hash aggregate to the distinct-value count table, then "
        "a top-1 window over that SKINNY rollup (never over raw rows) — "
        "the standard argmax-with-tiebreak shape at any scale.",
)
def agg_mode_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.plans.common import EV

    c = (
        EV(spark, sf_dir)
        .groupBy(
            "event_type",
            (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("cents"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("cents").alias("mode_cents"),
            F.col("n").alias("mode_count"),
        )
    )


# --- out-of-vocabulary rate ------------------------------------------------------

_OOV = "CAST(n_oov AS DOUBLE) / CAST(n_tok AS DOUBLE)"


@register(
    "text_oov_rate",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(text), '[^a-z0-9]+'),
            t -> t <> '')) AS tok
        FROM documents),
    freq AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY 1),
    vocab AS (
        SELECT tok FROM freq
        ORDER BY n DESC, tok LIMIT 1000),
    scored AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY 1)
    SELECT doc_id, n_tok, n_oov, {_OOV} AS oov_rate
    FROM scored WHERE n_tok > 0
    """,
    doc="Out-of-vocabulary rate per document against the corpus's own "
        "top-1000 token vocabulary (frequency-ranked, ties "
        "alphabetical): the tokenizer-fit / domain-shift score an LLM "
        "data pipeline computes before committing to a vocab — high OOV "
        "means the tokenizer will shatter the document into bytes. "
        "Complements corpus_vocab (which BUILDS the ranked vocab) and "
        "text_source_divergence (distribution-level drift) with a "
        "per-document serving-shape score. Scale: the vocab is a "
        "1000-row broadcast, the token stream joins it map-side with no "
        "shuffle beyond the per-doc rollup; rate is one IEEE division "
        "of exact counts.",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.orderBy(F.desc("n"), F.asc("tok"))
        .limit(1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .where(F.col("n_tok") > 0)
    )
    return scored.select("doc_id", "n_tok", "n_oov", F.expr(_OOV).alias("oov_rate"))
