"""Extension-operator query surface, part 14: corpus-level tokenizer
fertility and the per-source exact-duplication report — the two summary
tables an LLM data pipeline publishes before committing a crawl snapshot
to training.

Design rules follow plans/extensions.py: exact BIGINT sums, one IEEE
division per reported ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.plans.common import T
from postgresql_cdc_spark.plans.extensions import _TOKS
from postgresql_cdc_spark.plans.extensions2 import _BPE_SQL_PAT
from postgresql_cdc_spark.plans.registry import register

_FERT = "CAST(tp AS DOUBLE) / CAST(tw AS DOUBLE)"


@register(
    "text_fertility_by_lang",
    f"""
    WITH g AS (
        SELECT lang,
               CAST(len(regexp_extract_all(lower(text),
                                           '{_BPE_SQL_PAT}')) AS BIGINT)
                   AS np,
               CAST(len({_TOKS}) AS BIGINT) AS nw
        FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(np) AS BIGINT) AS tp,
           CAST(SUM(nw) AS BIGINT) AS tw,
           {_FERT} AS fertility
    FROM g GROUP BY lang HAVING SUM(nw) > 0
    """,
    doc="Corpus-level tokenizer FERTILITY per language: total BPE-ish "
        "pre-tokenizer pieces over total whitespace-ish words — the "
        "tokens-per-word cost curve that decides whether a tokenizer is "
        "fit for a language mix (fertility >> 1 for a language means its "
        "documents burn training budget on fragment tokens). The "
        "language-level rollup of text_bpe_token_count's per-document "
        "ratio, but computed from EXACT corpus sums (a mean of per-doc "
        "ratios would weight short docs equally with long ones — the "
        "classic ratio-of-sums vs mean-of-ratios trap, resolved here to "
        "ratio-of-sums). One scan-side regex projection, one hash "
        "aggregate to |langs| rows, one shared IEEE division.",
)
def text_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import bpe_tokens

    g = T(spark, sf_dir, "documents").select(
        "lang",
        F.size(bpe_tokens(F.col("text"))).cast("bigint").alias("np"),
        F.size(tx.tokens(F.col("text"))).cast("bigint").alias("nw"),
    )
    return (
        g.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("np").cast("bigint").alias("tp"),
            F.sum("nw").cast("bigint").alias("tw"),
        )
        .where(F.col("tw") > 0)
        .select("lang", "n_docs", "tp", "tw", F.expr(_FERT).alias("fertility"))
    )


_DUP = "CAST(n_redundant AS DOUBLE) / CAST(n_docs AS DOUBLE)"


@register(
    "corpus_dedup_rate_by_source",
    f"""
    WITH h AS (SELECT source, md5(text) AS sig FROM documents),
    c AS (SELECT source, sig, CAST(COUNT(*) AS BIGINT) AS n
          FROM h GROUP BY 1, 2),
    s AS (SELECT source,
                 CAST(SUM(n) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_unique,
                 CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_redundant
          FROM c GROUP BY source)
    SELECT source, n_docs, n_unique, n_redundant, {_DUP} AS dup_rate
    FROM s
    """,
    doc="Per-source exact-duplication report: documents, distinct "
        "content signatures, redundant copies, and the within-source "
        "duplication rate — the per-feed data-quality table that decides "
        "which crawl sources get demoted before training (a feed that is "
        "40% self-copies is a boilerplate mill). Complements dedup_exact "
        "(row-level survivors), dedup_cluster_size_hist (global cluster "
        "shape), and source_overlap_matrix (CROSS-source leakage) with "
        "the per-source summary. Two map-side-combinable hash "
        "aggregates — (source, md5) then source — text never shuffles, "
        "only 16-byte signatures do.",
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        T(spark, sf_dir, "documents")
        .select("source", F.md5("text").alias("sig"))
        .groupBy("source", "sig")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = c.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("n_redundant"),
    )
    return s.select(
        "source", "n_docs", "n_unique", "n_redundant",
        F.expr(_DUP).alias("dup_rate"),
    )
