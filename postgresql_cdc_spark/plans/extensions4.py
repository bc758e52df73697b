"""Later-round corpus operators: exact substring dedup and corpus-statistics
quality scoring.

``operators/dedup.duplicate_span_pairs`` finds duplicated token SPANS shared
across documents (Lee et al. 2021, arXiv:2107.06499) via gaps-and-islands
over matching positional k-gram hashes — the distributable stand-in for the
suffix-array pass, and the only dedup family here that catches a document
quoting a 200-token block of another verbatim while their overall Jaccard
stays below any near-dup threshold.

The fixture corpus has no planted partial copies, so the query plants its own
(both engines construct the identical corpus): every 9th document gets a
copy (id + 200000) made of its first 20 tokens, a unique marker token, then
its tokens from position 31 on — two disjoint shared runs, exercising
multi-island pairs, while the marker and the dropped tokens 21–30 keep the
copy from being an exact dup.

Reference parity: the reference implements no text operators (SURVEY.md §2.2);
this is a north-star extension over the `documents` fixture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.operators import dedup as dd
from postgresql_cdc_spark.operators.text import tokens
from postgresql_cdc_spark.plans.registry import register

_K = 8          # k-gram width (tokens)
_MIN_SPAN = 12  # report spans of at least this many tokens
_MAX_DF = 20    # drop k-grams seen in more distinct docs (boilerplate)
_MAX_OCC = 10   # drop (doc, k-gram) repeated more often within one doc

_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"

_SPAN_ORACLE = f"""
    WITH tk0 AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    copies AS (
        SELECT doc_id + 200000 AS doc_id,
               array_to_string(
                   list_concat(
                       list_concat(list_slice(tk, 1, 20),
                                   ['qzmarker' || CAST(doc_id AS VARCHAR)]),
                       list_slice(tk, 31, len(tk))), ' ') AS text
        FROM (SELECT doc_id, tk FROM tk0 WHERE doc_id % 9 = 0)
    ),
    corpus AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id, text FROM copies),
    tk AS (SELECT doc_id, {_TOKS} AS tk FROM corpus),
    p AS (
        SELECT doc_id, pos,
               {_H60.format(x=f"array_to_string(list_slice(tk, pos, pos + {_K - 1}), ' ')")} AS h
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - {_K} + 2)) AS pos
              FROM tk WHERE len(tk) >= {_K})
    ),
    hot AS (SELECT h FROM p GROUP BY h HAVING COUNT(DISTINCT doc_id) > {_MAX_DF}),
    spam AS (SELECT doc_id, h FROM p GROUP BY doc_id, h HAVING COUNT(*) > {_MAX_OCC}),
    pf AS (SELECT p.* FROM p ANTI JOIN hot USING (h)
                       ANTI JOIN spam USING (doc_id, h)),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.pos AS pos_a, a.pos - b.pos AS diag
        FROM pf a JOIN pf b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    spans AS (
        SELECT id_a, id_b, COUNT(*) + {_K - 1} AS span_tokens
        FROM (SELECT id_a, id_b, diag, pos_a,
                     pos_a - ROW_NUMBER() OVER (
                         PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
              FROM pairs)
        GROUP BY id_a, id_b, diag, grp
        HAVING COUNT(*) + {_K - 1} >= {_MIN_SPAN}
    )
    SELECT id_a, id_b,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
           CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY id_a, id_b
"""


def _span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    tk = d.where(F.col("doc_id") % 9 == 0).select(
        "doc_id", tokens(F.col("text")).alias("tk")
    )
    copies = tk.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.slice("tk", 1, 20),
                F.array(F.concat(F.lit("qzmarker"), F.col("doc_id").cast("string"))),
                F.expr("slice(tk, 31, greatest(size(tk) - 30, 0))"),
            ),
        ).alias("text"),
    )
    return d.unionByName(copies)


@register(
    "dedup_substring_spans",
    _SPAN_ORACLE,
    doc="Exact substring dedup (Lee et al. 2021): maximal duplicated token "
        "spans >= 12 tokens per document pair, via gaps-and-islands over "
        "matching positional 8-gram hashes — the partial-copy detector "
        "Jaccard-style doc-level dedup misses. Planted split copies "
        "(first 20 tokens + marker + tokens 31..) exercise multi-island "
        "pairs. Scale: posting equi-join capped by df and within-doc "
        "occurrence; island window partitions by (pair, diagonal).",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.duplicate_span_pairs(
        _span_corpus(spark, sf_dir), "text", "doc_id",
        k=_K, min_span=_MIN_SPAN, max_df=_MAX_DF, max_occ=_MAX_OCC,
    )


@register(
    "text_quality_unigram",
    f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    occ AS (SELECT doc_id, unnest(tk) AS t FROM tk WHERE len(tk) > 0),
    dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY t)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(df) AS DOUBLE) / COUNT(*), 6) AS mean_df,
           round(CAST(SUM(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS rare_frac
    FROM occ JOIN dfreq USING (t)
    GROUP BY doc_id
    """,
    doc="Corpus-statistics quality scoring (integer-exact CCNet-style LM "
        "filter proxy): per doc, mean corpus document-frequency of its "
        "token occurrences and the corpus-rare (df<=2) occurrence fraction "
        "— low mean_df / high rare_frac flags gibberish and OCR noise. Two "
        "word-count-shaped passes: vocabulary groupBy(token), then one "
        "token-keyed equi-join back to occurrences + per-doc agg.",
)
def text_quality_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import unigram_df_scores

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return unigram_df_scores(d, "text", "doc_id").withColumnRenamed(
        "id", "doc_id"
    )
