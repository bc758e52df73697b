"""Extension-operator query surface, part 5: corpus-engineering stages a
training-data build runs around the dedup/similarity core — deterministic
split assignment, collocation mining, asymmetric (containment) near-dup,
random-projection dimensionality reduction, and robust outlier screening.

Design rules follow plans/extensions.py: every output column is an integer,
string, or a value both engines compute bit-identically (portable h60/md5
hash, integer-quantized arithmetic, discrete percentiles), so the DuckDB
oracle hash-matches exactly; every pipeline is a projection, explode, or
hash-agg — no driver collects, nothing quadratic.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2) — these are north-star extensions over the `documents`,
`embeddings`, and `events` fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.operators import dedup as dd
from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.operators.similarity import hyperplane_weights
from postgresql_cdc_spark.plans.extensions import T, _SHINGLES3, _TOKS
from postgresql_cdc_spark.plans.registry import register

_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# --- deterministic train/val/test split --------------------------------------

@register(
    "corpus_split_assign",
    f"""
    SELECT doc_id,
           CAST(h % 100 AS INT) AS bucket,
           CASE WHEN h % 100 < 90 THEN 'train'
                WHEN h % 100 < 95 THEN 'val'
                ELSE 'test' END AS split,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM (SELECT doc_id, n_chars,
                 {_H60.format(x="'split:' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents)
    """,
    doc="Deterministic 90/5/5 train/val/test split assignment by salted "
        "portable hash of the stable document id — reproducible across "
        "engines, runs, and data layouts (never random() or row position, "
        "both of which reshuffle membership when the corpus is re-sharded). "
        "Per-row projection: scan speed, no shuffle at any scale; the "
        "assignment commutes with any later filter, so split integrity "
        "survives pipeline re-runs.",
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    h = tx.h60(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    bucket = (h % 100).cast("int")
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


# --- collocation mining (bigram PMI) -----------------------------------------

@register(
    "text_collocations",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    big AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)),
    uni AS (SELECT unnest(toks) AS w FROM t),
    cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM uni),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
           FROM big GROUP BY w1, w2 HAVING COUNT(*) >= 5)
    SELECT cb.w1, cb.w2, cb.c_xy,
           CAST((cb.c_xy * 1000 * n.nt) // (c1.c * c2.c) AS BIGINT)
             AS pmi_milli
    FROM cb CROSS JOIN n
            JOIN cu c1 ON cb.w1 = c1.w
            JOIN cu c2 ON cb.w2 = c2.w
    WHERE (cb.c_xy * 1000 * n.nt) // (c1.c * c2.c) >= 1300
    """,
    doc="Collocation mining: bigrams whose integer-scaled pointwise mutual "
        "information (1000 * P(xy) / (P(x)P(y)), truncated — exact on both "
        "engines, no float log) is at least 1.3x the independence baseline "
        "with support >= 5. The vocabulary-building pass that promotes "
        "multi-word units (named entities, idioms) to single tokens. "
        "Bigrams come from an index transform over the token array (no "
        "positional explode); counts are two hash-aggs; the corpus total "
        "rides in as a one-row scalar broadcast (same declared shape as "
        "TPC-H Q11/Q15), and the two unigram-count joins are plain "
        "equi-joins that scale as word-count jobs.",
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    t = d.select(tx.tokens(F.col("text")).alias("toks"))
    big = (
        t.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i -> "
                    "struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    uni = t.select(F.explode("toks").alias("w"))
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = uni.agg(F.count(F.lit(1)).alias("nt"))
    cb = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= 5)
    )
    pmi = F.expr("(c_xy * 1000 * nt) DIV (c1 * c2)")
    return (
        # one-row global-total broadcast: the same scalar-broadcast BNLJ
        # shape as q11/q15/q22, declared in the plan sweep's allowlist
        cb.crossJoin(F.broadcast(n))
        .join(cu.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .select("w1", "w2", "c_xy", pmi.alias("pmi_milli"))
        .where(F.col("pmi_milli") >= 1300)
    )


# --- asymmetric near-dup: containment ----------------------------------------

# Planted doc-in-doc cases: every 7th document gets an "excerpt" page
# (id + 300000) made of its first 25 tokens plus a 2-token marker — low
# Jaccard against the original (the union is original-sized) but containment
# ~0.9 (23 of its 25 shingles appear in the original). Both engines build
# the identical corpus.
_CONT_CORPUS = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 300000,
           array_to_string(list_slice({_TOKS}, 1, 25), ' ') || ' zq yq'
    FROM documents WHERE doc_id % 7 = 0
"""

_CONT_ORACLE = f"""
    WITH c AS ({_CONT_CORPUS}),
    t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM c),
    s AS (SELECT id, {_SHINGLES3} AS sh FROM t),
    base AS (SELECT id, sh FROM s WHERE len(sh) > 0),
    posting0 AS (SELECT id, len(sh) AS n_sh, {_H60.format(x='s')} AS sh_hash
                 FROM (SELECT id, sh, unnest(sh) AS s FROM base)),
    hot AS (SELECT sh_hash FROM posting0 GROUP BY 1 HAVING COUNT(*) > 100),
    posting AS (SELECT posting0.* FROM posting0 ANTI JOIN hot USING (sh_hash)),
    common AS (SELECT pa.id AS id_a, pb.id AS id_b,
                      pa.n_sh AS na, pb.n_sh AS nb, COUNT(*) AS n_common
               FROM posting pa JOIN posting pb USING (sh_hash)
               WHERE pa.id < pb.id
               GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / least(na, nb), 6) AS containment
    FROM common
    WHERE round(CAST(n_common AS DOUBLE) / least(na, nb), 6) >= 0.8
"""


def _containment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    quotes = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(tx.tokens(F.col("text")), 1, 25)),
            F.lit(" zq yq"),
        ).alias("text"),
    )
    return d.unionByName(quotes)


@register(
    "dedup_containment",
    _CONT_ORACLE,
    doc="Asymmetric near-dup via exact n-gram containment "
        "(|A∩B| / min(|A|,|B|), Broder SEQUENCES'97): catches a short page "
        "quoted whole inside a long one, which Jaccard structurally misses. "
        "Same posting-join shape as dedup_ngram_jaccard, WITHOUT the "
        "size-ratio prefilter (asymmetric pairs are the point); the "
        "stop-shingle cap still bounds fan-out. The query plants excerpt "
        "documents (first 25 tokens + marker) so the oracle has true "
        "positives to verify.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.containment_pairs(
        _containment_corpus(spark, sf_dir), "text", "doc_id", threshold=0.8
    )


# --- random-projection dimensionality reduction ------------------------------

_RP_PLANES = 8
_RP_DIM = 64


def _rp_wmat_duck() -> str:
    w = hyperplane_weights("rp", _RP_PLANES, _RP_DIM)
    return "[" + ", ".join(
        "[" + ", ".join(f"CAST({int(x)} AS BIGINT)" for x in p) + "]"
        for p in w
    ) + "]"


def _rp_wmat_spark() -> str:
    w = hyperplane_weights("rp", _RP_PLANES, _RP_DIM)
    return "array(" + ", ".join(
        "array(" + ", ".join(f"{int(x)}L" for x in p) + ")" for p in w
    ) + ")"


@register(
    "emb_random_projection",
    f"""
    WITH b AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000)
                                    AS BIGINT)) AS q
               FROM embeddings),
    p AS (SELECT vec_id, CAST(len(q) AS BIGINT) AS n_dims,
                 list_transform({_rp_wmat_duck()}, wp ->
                     list_reduce(
                         list_concat([CAST(0 AS BIGINT)],
                             list_transform(list_zip(q, wp),
                                            s -> s[1] * s[2])),
                         (a, x) -> a + x)) AS proj
          FROM b)
    SELECT vec_id, n_dims,
           proj[1] AS p0, proj[2] AS p1, proj[3] AS p2, proj[4] AS p3,
           proj[5] AS p4, proj[6] AS p5, proj[7] AS p6, proj[8] AS p7
    FROM p
    """,
    doc="Random-projection dimensionality reduction (Johnson-Lindenstrauss "
        "with a ±1 Achlioptas-style matrix): 64-dim embeddings down to 8 "
        "integer components. Embeddings are floor-quantized to int "
        "millis first so the projection arithmetic is integer-exact across "
        "engines — the same determinism trick the sign-LSH coder uses, here "
        "keeping the projected VALUES (not just sign bits) as the compact "
        "representation a coarse-quantizer or filter stage trains on. One "
        "nested weight literal + transform/zip_with/aggregate, per-row "
        "projection: scan speed, no shuffle, no stored model.",
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 1000) AS BIGINT))"
        ).alias("q"),
    )
    p = b.select(
        "vec_id",
        F.size("q").cast("bigint").alias("n_dims"),
        F.expr(
            f"transform({_rp_wmat_spark()}, wp -> "
            "aggregate(zip_with(q, wp, (x, y) -> x * y), "
            "0L, (acc, x) -> acc + x))"
        ).alias("proj"),
    )
    return p.select(
        "vec_id", "n_dims",
        *[F.element_at("proj", i + 1).alias(f"p{i}") for i in range(_RP_PLANES)],
    )


# --- robust outlier screening (IQR fences) -----------------------------------

@register(
    "events_outliers_iqr",
    """
    WITH s AS (SELECT event_type,
                      CAST(floor(value * 1000000) AS BIGINT) AS vmic
               FROM events),
    q AS (SELECT event_type,
                 percentile_disc(0.25) WITHIN GROUP (ORDER BY vmic) AS p25,
                 percentile_disc(0.75) WITHIN GROUP (ORDER BY vmic) AS p75
          FROM s GROUP BY event_type)
    SELECT s.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN vmic > p75 + 3 * (p75 - p25)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           CAST(SUM(CASE WHEN vmic < p25 - 3 * (p75 - p25)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
           q.p25 AS p25_micros, q.p75 AS p75_micros
    FROM s JOIN q USING (event_type)
    GROUP BY s.event_type, q.p25, q.p75
    """,
    doc="Robust outlier screening with Tukey-style IQR fences (3x) per "
        "event type — the data-quality pass that flags sensor glitches and "
        "log spam before metrics aggregation. Mean/stddev fences are "
        "float-accumulation-order dependent AND skew-sensitive; discrete "
        "quartiles over floor-quantized integer micros are exact on both "
        "engines and robust to the very outliers being hunted. Two hash "
        "aggs + one broadcast joinback of the tiny per-type fence table.",
)
def events_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("vmic"),
    )
    q = s.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY vmic)")
        .alias("p25"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY vmic)")
        .alias("p75"),
    )
    return (
        s.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "p25", "p75")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("vmic") > F.col("p75") + 3 * (F.col("p75") - F.col("p25")),
                    1,
                ).otherwise(0)
            ).alias("n_hi"),
            F.sum(
                F.when(
                    F.col("vmic") < F.col("p25") - 3 * (F.col("p75") - F.col("p25")),
                    1,
                ).otherwise(0)
            ).alias("n_lo"),
        )
        .select(
            "event_type", "n", "n_hi", "n_lo",
            # Spark's percentile_disc yields DOUBLE even over integer input;
            # the value is an actual data element, so the bigint cast is
            # lossless and matches the oracle's integer micros.
            F.col("p25").cast("bigint").alias("p25_micros"),
            F.col("p75").cast("bigint").alias("p75_micros"),
        )
    )


# --- iterative graph analytics: PageRank over the trade graph ----------------

_PR_SCALE = 10**12


def _pr_oracle(iters: int = 3) -> str:
    head = f"""
    WITH e0 AS MATERIALIZED (SELECT c_nationkey AS src, s_nationkey AS dst,
                       CAST(COUNT(*) AS BIGINT) AS w
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
                GROUP BY 1, 2),
    outw AS (SELECT src, SUM(w) AS wout FROM e0 GROUP BY src),
    e AS MATERIALIZED (SELECT e0.src, e0.dst, e0.w, outw.wout
          FROM e0 JOIN outw USING (src)),
    nodes AS (SELECT n_nationkey AS id, n_name FROM nation),
    c AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT id, (SELECT {_PR_SCALE} // n FROM c) AS r FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    r{k} AS (SELECT nodes.id,
                  CAST((SELECT 3 * {_PR_SCALE} // (20 * n) FROM c)
                       + COALESCE(SUM((17 * rr.r * e.w) // (20 * e.wout)), 0)
                       AS BIGINT) AS r
           FROM nodes
           LEFT JOIN e ON e.dst = nodes.id
           LEFT JOIN r{k - 1} rr ON e.src = rr.id
           GROUP BY nodes.id)""")
    return (
        head + "," + ",".join(steps)
        + f"""
    SELECT n_name, r{iters}.r AS rank
    FROM r{iters} JOIN nodes USING (id)"""
    )


@register(
    "graph_pagerank_trade",
    _pr_oracle(3),
    doc="Weighted PageRank (3 power iterations, damping 17/20) over the "
        "nation-to-nation trade graph — customer nation -> supplier nation, "
        "edge weight = lineitems shipped. The canonical ITERATIVE dataflow "
        "algorithm, stated as plain join+agg rounds with integer-exact "
        "scaled-rank arithmetic (operators/graph.pagerank_int), so the "
        "DuckDB oracle replays the identical chain bit-for-bit — no float "
        "accumulation order to disagree on. The fact-table star join "
        "collapses to a <=N^2-row edge list before any iteration; each "
        "round then shuffles only the skinny rank table. Node count is "
        "metadata from the 25-row dimension (cf. similarity.infer_dim).",
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.graph import pagerank_int

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = n.select("n_nationkey")
    n_nodes = nodes.count()  # 25-row dimension: metadata, not a data path
    r = pagerank_int(edges, nodes, n_nodes, iters=3, scale=_PR_SCALE)
    return r.join(F.broadcast(n), r.id == n.n_nationkey).select(
        "n_name", F.col("r").alias("rank")
    )


# --- canonical survivor selection per dedup cluster --------------------------

from postgresql_cdc_spark.plans.extensions import (  # noqa: E402
    _CORPUS,
    _NGRAM_ORACLE,
    _near_dup_corpus,
)


@register(
    "dedup_survivor_selection",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_NGRAM_ORACLE}),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT DISTINCT a, a FROM sym
        UNION
        SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
    ),
    comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
    c AS ({_CORPUS}),
    m AS (SELECT comp.component, comp.doc_id, length(c.text) AS n_chars
          FROM comp JOIN c ON c.doc_id = comp.doc_id),
    rk AS (SELECT component, doc_id, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY component
                                     ORDER BY n_chars DESC, doc_id) AS rn
           FROM m)
    SELECT component,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
             AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM rk GROUP BY component
    """,
    doc="The last step of the dedup pipeline: pairs -> connected components "
        "-> ONE canonical survivor per cluster, chosen by a quality policy "
        "(longest text, doc_id tie-break) rather than the arbitrary min-id "
        "— the policy hook where real pipelines prefer the highest-quality "
        "or most-recent copy. One window ranking partitioned by component "
        "(clusters are tiny, so no skew) + one agg; the oracle replays the "
        "same policy over its recursive-CTE components.",
)
def dedup_survivor_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.dedup import ngram_jaccard_pairs
    from postgresql_cdc_spark.operators.graph import connected_components
    from pyspark.sql.window import Window

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, "text", "doc_id", threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "component"
    )
    m = comp.join(corpus, "doc_id").select(
        "component", "doc_id", F.length("text").alias("n_chars")
    )
    rk = m.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("component")
            .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        ),
    )
    return rk.groupBy("component").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("survivor_id"),
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
    )
