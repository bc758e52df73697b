"""Extension-operator query surface, part 17: multiclass classifier
evaluation — the language-ID confusion matrix.

Design rules follow plans/extensions.py: exact BIGINT counts, one IEEE
division per reported rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.plans.common import T
from postgresql_cdc_spark.plans.extensions import (
    _DE_SW,
    _EN_SW,
    _ES_SW,
    _FR_SW,
    _TOKS,
)
from postgresql_cdc_spark.plans.registry import register

_RATE = "CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE)"


@register(
    "text_langid_confusion",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    s AS (
        SELECT lang,
               len(list_filter(toks, x -> list_contains({_DE_SW}, x))) AS s_de,
               len(list_filter(toks, x -> list_contains({_EN_SW}, x))) AS s_en,
               len(list_filter(toks, x -> list_contains({_ES_SW}, x))) AS s_es,
               len(list_filter(toks, x -> list_contains({_FR_SW}, x))) AS s_fr
        FROM t),
    p AS (
        SELECT lang,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM s),
    c AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
          FROM p GROUP BY 1, 2),
    r AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n FROM c GROUP BY 1)
    SELECT c.lang, c.lang_pred, c.n, r.row_n, {_RATE} AS row_rate
    FROM c JOIN r USING (lang)
    """,
    doc="Multiclass CONFUSION MATRIX for the stopword-overlap language-ID "
        "classifier against the fixture's labeled lang column: per "
        "(truth, prediction) cell, the count and its row-normalized rate "
        "(the diagonal is per-class recall; off-diagonal rows show WHICH "
        "language pairs the classifier muddles — the table that decides "
        "whether a cheap heuristic is fit to route documents before an "
        "expensive model). Completes the evaluation family: "
        "eval_confusion_metrics covers the binary threshold case, "
        "eval_auc_exact the ranking case, this the multiclass case. The "
        "predictor is text_langid's EXACT argmax (deterministic "
        "first-match tie order, shared by both engines); one scan-side "
        "projection, one hash aggregate to |langs|^2 cells, one "
        "broadcast of the |langs| row totals.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    c = (
        d.select(
            "lang",
            tx.lang_best(tx.tokens(F.col("text"))).alias("lang_pred"),
        )
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    r = c.groupBy("lang").agg(F.sum("n").cast("bigint").alias("row_n"))
    return c.join(F.broadcast(r), "lang").select(
        "lang", "lang_pred", "n", "row_n", F.expr(_RATE).alias("row_rate")
    )
