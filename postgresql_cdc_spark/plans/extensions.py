"""Extension-operator query surface: dedup, similarity search, text analysis,
multimodal — the training-data-pipeline operators (SURVEY.md §2.2 north-star
row; driver fixtures ``documents`` and ``embeddings``).

Every oracle replicates the Spark pipeline exactly in DuckDB SQL, sharing the
same portable primitives:

- tokens    : list_filter(regexp_split_to_array(lower(t),'[^a-z0-9]+'), x<>'')
- h60(x)    : CAST('0x' || substr(md5(x),1,15) AS BIGINT)  (md5 = same bits
              in both engines; Spark-side twin in operators/text.py)
- dot(a,b)  : left fold over index-ordered float64 products (bit-identical)

Near-dup queries run on a *synthetic near-dup corpus*: documents ∪ perturbed
copies (doc_id+100000, two tokens appended) — the fixture itself has no dups,
so this makes detection observable while staying SQL-derivable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.operators import dedup as dd
from postgresql_cdc_spark.operators import similarity as sim
from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.operators.similarity import (
    BANDS as _LSH_BANDS,
    EMBED_DIM as _LSH_DIM,
    MAX_BUCKET as _LSH_MAX_BUCKET,
    PLANES_PER_BAND as _LSH_PLANES,
    hyperplane_weights,
)
from postgresql_cdc_spark.plans.registry import register


def T(spark: SparkSession, sf_dir: str, name: str,
      fanout: bool = True) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if fanout and name in ("documents", "embeddings"):
        # These corpora feed per-row kernels (md5 shingle hashing, minhash
        # signatures, plane folds) whose cost dwarfs the scan. A real corpus
        # arrives in thousands of splits and parallelizes for free; the
        # single-file fixture scans as ONE task (one parquet row group) and
        # would serialize the whole pipeline, so fan out only when the scan
        # itself under-parallelizes. The exchange moves kilobytes here and
        # never fires on real inputs. Fan out to the FULL core count: the
        # md5-shingle kernel measured 0.8 s at 32 slices vs 1.1 s at the old
        # 16-slice cap vs 4.4 s unspread (r17, sf0.1 documents); the target
        # tracks defaultParallelism so lower-core runs fan out less, not more.
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


# --- shared DuckDB fragments -------------------------------------------------

_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"

_SHINGLES3 = """
    CASE WHEN len(toks) >= 3
         THEN list_distinct(list_transform(range(1, len(toks)-1),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
         ELSE [] END
"""

_EN_SW = "['the','a','of','and','to','in','is','that','it','for']"
_DE_SW = "['der','die','das','und','ist','von','mit','den','ein','zu']"
_FR_SW = "['le','la','les','et','est','de','un','une','que','pour']"
_ES_SW = "['el','la','los','las','es','de','un','una','que','por']"


# --- text analysis -----------------------------------------------------------


@register(
    "text_token_stats",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_uniq,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
           CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                            (a,b) -> a+b) AS DOUBLE) / len(toks) AS mean_token_len
    FROM t WHERE len(toks) > 0
    """,
    doc="Token counting over documents: counts, uniq ratio, mean token length.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hoist tokenization AND array_distinct into projected columns computed
    # once — Catalyst does not CSE identical HOF subtrees across output
    # columns, so inlining them re-tokenized/re-deduped per stat.
    d = T(spark, sf_dir, "documents")
    d = d.select("doc_id", tx.tokens(F.col("text")).alias("toks")).where(
        F.size("toks") > 0
    )
    d = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        # separator-free concat length == sum of token lengths (no HOF fold)
        F.length(F.concat_ws("", F.col("toks"))).cast("long").alias("len_sum"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_uniq",
        (F.col("n_uniq") / F.col("n_tokens")).alias("uniq_ratio"),
        (F.col("len_sum") / F.col("n_tokens")).alias("mean_token_len"),
    )


@register(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           round((
               (CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
             + CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1)
             + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains({_EN_SW}, x))) AS DOUBLE)
                          / len(toks) > 0.02 THEN 1 ELSE 0 END)
           ) / 4.0, 6) AS quality
    FROM t WHERE len(toks) > 0
    """,
    doc="Heuristic document quality score (length/alpha/uniq/stopword bands).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.where(F.size(tx.tokens(F.col("text"))) > 0).select(
        "doc_id", tx.quality_score(F.col("text")).alias("quality")
    )


@register(
    "text_langid",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    s AS (
        SELECT doc_id, lang,
               len(list_filter(toks, x -> list_contains({_DE_SW}, x))) AS s_de,
               len(list_filter(toks, x -> list_contains({_EN_SW}, x))) AS s_en,
               len(list_filter(toks, x -> list_contains({_ES_SW}, x))) AS s_es,
               len(list_filter(toks, x -> list_contains({_FR_SW}, x))) AS s_fr
        FROM t
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
    doc="Stopword-overlap language ID (cheap n-gram heuristic).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", tx.lang_best(tx.tokens(F.col("text"))).alias("lang_pred")
    )


@register(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks, {_SHINGLES3} AS sh FROM t)
    SELECT doc_id,
           md5(array_to_string(toks, ' ')) AS content_md5,
           CASE WHEN len(sh) > 0
                THEN list_min(list_transform(sh, x -> {_H60.format(x='x')}))
                ELSE NULL END AS min_shingle_hash
    FROM s
    """,
    doc="Document fingerprinting: normalized content md5 + min-shingle hash.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.doc_fingerprint(F.col("text")).alias("content_md5"),
        tx.min_shingle_hash(F.col("text")).alias("min_shingle_hash"),
    )


# --- deduplication -----------------------------------------------------------

# Synthetic near-dup corpus: fixture has no duplicates, so near-dup pipelines
# run over documents ∪ perturbed copies (id+100000, two tokens appended).
_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text || ' qq zz' FROM documents WHERE doc_id % 5 = 0
"""


def _near_dup_corpus(spark: SparkSession, sf_dir: str,
                     fanout: bool = True) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=fanout).select("doc_id", "text")
    pert = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq zz")).alias("text"),
    )
    return d.unionByName(pert)


@register(
    "dedup_exact",
    f"""
    WITH c AS ({_CORPUS}),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM c)
    SELECT {_H60.format(x="array_to_string(toks, ' ')")} AS content_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_dups
    FROM t GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized content hash.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fanout=False (r18): this kernel hashes each doc ONCE (one md5 +
    # tokenize) — ~1/32 of the minhash weight the fan-out exists for — and
    # the r17 scaling block measured the 32-way exchange COSTING more than
    # it buys here (c8/c32 = 0.63 on the single-row-group fixture). At real
    # scale the fan-out guard never fires anyway (multi-split inputs), so
    # opting out only removes the tiny-corpus overshoot.
    return dd.exact_dedup(
        _near_dup_corpus(spark, sf_dir, fanout=False), "text", "doc_id"
    )


# --- minhash LSH near-dup ----------------------------------------------------

def _mh_sql(i: int) -> str:
    # Mirrors operators/dedup.MH_AB: one h60 per shingle (pre-hashed in
    # `shh`), k affine mixes (A*h%P + B) % P in exact signed-64 arithmetic.
    a, b = dd.MH_AB[i]
    return (f"list_min(list_transform(shh, h -> "
            f"({a}::BIGINT * (h % {dd.MH_P}) + {b}) % {dd.MH_P})) AS m{i}")


def _band_sql(b: int, rows: int = 3) -> str:
    parts = ", ".join(f"CAST(m{b*rows+r} AS VARCHAR)" for r in range(rows))
    return (f"SELECT id, {b} AS band, "
            + _H60.format(x=f"concat_ws(',', {parts})")
            + " AS bucket FROM sig")


_MINHASH_ORACLE = f"""
    WITH c AS ({_CORPUS}),
    t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM c),
    s AS (SELECT id, {_SHINGLES3} AS sh FROM t),
    base AS (SELECT id, list_transform(sh, s -> {_H60.format(x='s')}) AS shh
             FROM s WHERE len(sh) > 0),
    sig AS (SELECT id, {", ".join(_mh_sql(i) for i in range(12))} FROM base),
    bands AS ({" UNION ALL ".join(_band_sql(b) for b in range(4))}),
    wide AS (SELECT band, bucket FROM bands GROUP BY 1, 2 HAVING COUNT(*) > 50),
    bk AS (SELECT bands.* FROM bands ANTI JOIN wide USING (band, bucket)),
    cand0 AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bk a JOIN bk b USING (band, bucket) WHERE a.id < b.id),
    sizes AS (SELECT id, len(shh) AS n_sh FROM base),
    cand AS (SELECT cd.id_a, cd.id_b, sa.n_sh AS na, sb.n_sh AS nb
             FROM cand0 cd
             JOIN sizes sa ON sa.id = cd.id_a
             JOIN sizes sb ON sb.id = cd.id_b
             WHERE least(sa.n_sh, sb.n_sh)
                   >= (0.5 - 1e-6) * greatest(sa.n_sh, sb.n_sh)),
    posting AS (SELECT id, unnest(shh) AS sh_hash FROM base),
    common AS (SELECT cd.id_a, cd.id_b, cd.na, cd.nb, COUNT(*) AS n_common
               FROM cand cd
               JOIN posting pa ON pa.id = cd.id_a
               JOIN posting pb ON pb.id = cd.id_b AND pb.sh_hash = pa.sh_hash
               GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6) AS jaccard
    FROM common
    WHERE round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6) >= 0.5
"""


@register(
    "dedup_minhash_lsh",
    _MINHASH_ORACLE,
    doc="MinHash+LSH near-dup: shingle→12 minhashes→4 bands→bucket join→"
        "exact-Jaccard verify (LSH only prunes).",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_pairs(
        _near_dup_corpus(spark, sf_dir), "text", "doc_id", threshold=0.5
    )


# --- simhash near-dup --------------------------------------------------------

def _simhash_fp_sql(bits: int = 60) -> str:
    terms = []
    for b in range(bits):
        hits = f"len(list_filter(hh, h -> ((h >> {b}) & 1) = 1))"
        terms.append(
            f"(CASE WHEN 2*{hits} - len(hh) > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        )
    return " + ".join(terms)


_SIMHASH_ORACLE = f"""
    WITH c AS ({_CORPUS}),
    t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM c),
    h AS (SELECT id, list_transform(list_distinct(toks),
                  x -> {_H60.format(x='x')}) AS hh
          FROM t WHERE len(toks) > 0),
    fps AS (SELECT id, {_simhash_fp_sql()} AS fp FROM h),
    chunked0 AS ({" UNION ALL ".join(
        f"SELECT id, fp, {c} AS chunk, (fp >> {c * 15}) & 32767 AS val FROM fps"
        for c in range(4))}),
    hotc AS (SELECT chunk, val FROM chunked0 GROUP BY 1, 2
             HAVING COUNT(*) > 100),
    chunked AS (SELECT chunked0.* FROM chunked0 ANTI JOIN hotc USING (chunk, val)),
    pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                     bit_count(xor(a.fp, b.fp)) AS hamming
              FROM chunked a JOIN chunked b USING (chunk, val)
              WHERE a.id < b.id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
"""


@register(
    "dedup_simhash",
    _SIMHASH_ORACLE,
    doc="SimHash near-dup: 60-bit fingerprint, 15-bit-chunk pigeonhole "
        "blocking (32,768 values/chunk) with hot-chunk cap, exact Hamming "
        "filter.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_pairs(
        _near_dup_corpus(spark, sf_dir), "text", "doc_id", max_hamming=3
    )


# --- exact n-gram Jaccard ----------------------------------------------------

_NGRAM_ORACLE = f"""
    WITH c AS ({_CORPUS}),
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
                 AND least(pa.n_sh, pb.n_sh)
                     >= (0.5 - 1e-6) * greatest(pa.n_sh, pb.n_sh)
               GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6) AS jaccard
    FROM common
    WHERE round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6) >= 0.5
"""


@register(
    "dedup_ngram_jaccard",
    _NGRAM_ORACLE,
    doc="Exact n-gram Jaccard pairs via shingle-posting equi-join with "
        "stop-shingle (df>100) pruning.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(
        _near_dup_corpus(spark, sf_dir), "text", "doc_id", threshold=0.5
    )


# --- similarity search over embeddings ---------------------------------------

def _dot_sql(a: str, b: str) -> str:
    """Exact float64 dot product, left fold in index order — bit-identical to
    operators/similarity.dot (init 0.0 prepended so fold order matches)."""
    prod = (f"list_transform(list_zip({a}, {b}), "
            "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))")
    return (f"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], {prod}), "
            "(x, y) -> x + y)")


def _cos_sql(a: str, b: str) -> str:
    return (f"round({_dot_sql(a, b)} / "
            f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})), 6)")


def _plane_sum_sql(vecvar: str, seed: str, p: int) -> str:
    """Signed sum ±v[i] with the SAME driver-side md5-derived weights the
    Spark operator embeds (hyperplane_weights). 0.0-seeded left-assoc sum ==
    Spark's index-ordered fold bit-for-bit (±1 multiplies are exact)."""
    w = hyperplane_weights(seed, _LSH_PLANES, _LSH_DIM)[p]
    terms = "".join(
        ("+" if x > 0 else "-") + f"{vecvar}[{i + 1}]" for i, x in enumerate(w)
    )
    return f"(0.0{terms})"


def _code_sql(vecvar: str, seed: str, planes: int = _LSH_PLANES) -> str:
    terms = [
        f"(CASE WHEN {_plane_sum_sql(vecvar, seed, p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_TOPK_BRUTE_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_cos_sql('e.embedding', 'q.qe')} AS cos_sim
        FROM embeddings e JOIN q ON e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""


@register(
    "sim_topk_brute",
    _TOPK_BRUTE_ORACLE,
    doc="Exact top-5 cosine neighbors per query vector (brute-force baseline; "
        "broadcast queries, one corpus scan).",
)
def sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.topk_brute(e, q, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


def _codes_union_sql(src: str, idc: str, vec: str, bands: int = _LSH_BANDS) -> str:
    """One row per (row, band) with the hyperplane code; ``dv`` is the
    double-cast embedding the signed plane sums index into."""
    inner = f"(SELECT *, list_transform({vec}, x -> CAST(x AS DOUBLE)) AS dv FROM {src})"
    return " UNION ALL ".join(
        f"SELECT {idc}, {vec} AS v, {b} AS band, "
        f"{_code_sql('dv', f'hp{b}')} AS code FROM {inner}"
        for b in range(bands)
    )


_TOPK_LSH_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding
               FROM embeddings WHERE vec_id % 100 = 0),
    qc AS ({_codes_union_sql('q', 'query_id', 'embedding')}),
    cc0 AS ({_codes_union_sql('embeddings', 'vec_id AS neighbor_id', 'embedding')}),
    hot AS (SELECT band, code FROM cc0 GROUP BY 1, 2
            HAVING COUNT(*) > {_LSH_MAX_BUCKET}),
    cc AS (SELECT cc0.* FROM cc0 ANTI JOIN hot USING (band, code)),
    cand AS (
        SELECT DISTINCT qc.query_id, cc.neighbor_id, qc.v AS qe, cc.v AS ne
        FROM cc JOIN qc USING (band, code)
        WHERE cc.neighbor_id <> qc.query_id
    ),
    scored AS (
        SELECT query_id, neighbor_id, {_cos_sql('ne', 'qe')} AS cos_sim
        FROM cand
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""


@register(
    "sim_topk_lsh",
    _TOPK_LSH_ORACLE,
    doc="ANN top-5: hyperplane-LSH band buckets prune candidates, exact "
        "cosine re-rank — the 100 TB scale path (equi-join, no full scan "
        "per query).",
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.topk_lsh(e, q, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


def _l2_sql(a: str, b: str) -> str:
    """Exact float64 squared-L2, left fold in index order — bit-identical to
    operators/similarity.l2sq."""
    d = (f"list_transform(list_zip({a}, {b}), "
         "s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))"
         " * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))")
    return (f"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], {d}), "
            "(x, y) -> x + y)")


_TOPK_IVF_ORACLE = f"""
    WITH cent AS (SELECT vec_id AS cell, embedding AS cv
                  FROM embeddings ORDER BY vec_id LIMIT 16),
    assign AS (
        SELECT vec_id AS neighbor_id, embedding AS ne, cell
        FROM (
            SELECT e.vec_id, e.embedding, cent.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_l2_sql('e.embedding', 'cent.cv')} ASC,
                                cent.cell ASC) AS rn
            FROM embeddings e CROSS JOIN cent
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id % 100 = 0),
    probes AS (
        SELECT query_id, qe, cell
        FROM (
            SELECT q.query_id, q.qe, cent.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_l2_sql('q.qe', 'cent.cv')} ASC,
                                cent.cell ASC) AS rn
            FROM q CROSS JOIN cent
        ) WHERE rn <= 4
    ),
    scored AS (
        SELECT p.query_id, a.neighbor_id,
               {_cos_sql('a.ne', 'p.qe')} AS cos_sim
        FROM assign a JOIN probes p USING (cell)
        WHERE a.neighbor_id <> p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""


@register(
    "sim_topk_ivf",
    _TOPK_IVF_ORACLE,
    doc="ANN top-5 via IVF-Flat: deterministic coarse centroids, squared-L2 "
        "cell assignment (one broadcast-join scan), 4-of-16 cell probing, "
        "exact cosine re-rank. No self-join anywhere — the no-quadratic-mode "
        "scale path; recall tunes with n_probe.",
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.topk_ivf(e, q, k=5, n_centroids=16, n_probe=4)
    return out.withColumn("rank", F.col("rank").cast("int"))


_EMB_CORPUS = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0
"""


@register(
    "dedup_embedding_cosine",
    f"""
    WITH c AS ({_EMB_CORPUS}),
    coded0 AS ({_codes_union_sql('c', 'vec_id AS id', 'embedding')}),
    hot AS (SELECT band, code FROM coded0 GROUP BY 1, 2
            HAVING COUNT(*) > {_LSH_MAX_BUCKET}),
    coded AS (SELECT coded0.* FROM coded0 ANTI JOIN hot USING (band, code)),
    pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               {_cos_sql('a.v', 'b.v')} AS cos_sim
        FROM coded a JOIN coded b USING (band, code)
        WHERE a.id < b.id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.999
    """,
    doc="Embedding-cosine near-dup: LSH bucket self-join + exact cosine "
        "filter over corpus ∪ duplicated vectors.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return sim.near_dup_pairs(e.unionByName(dup), threshold=0.999)


# --- multimodal columns ------------------------------------------------------

# Byte-accurate first byte of the UTF-8 payload (NOT ascii(substr(...,1,1)),
# which returns the first *codepoint* and diverges on multi-byte-leading text).
_HEAD_BYTE = (
    "CASE WHEN octet_length(encode(text)) > 0 "
    "THEN CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) ELSE -1 END"
)


@register(
    "mm_binary_features",
    f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           {_HEAD_BYTE} AS head_byte
    FROM documents
    """,
    doc="Binary-column plumbing: UTF-8 payload, Arrow-batched mapInPandas "
        "feature extraction (length/md5/head byte).",
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import multimodal as mm

    d = T(spark, sf_dir, "documents")
    return mm.binary_features(mm.attach_binary(d))


@register(
    "mm_decode_resize",
    f"""
    WITH hb AS (SELECT doc_id,
                       CASE WHEN octet_length(encode(text)) > 0
                            THEN 1 + ({_HEAD_BYTE}) % 64 ELSE 1 END AS width,
                       1 + octet_length(encode(text)) % 64 AS height
                FROM documents)
    SELECT doc_id, width, height,
           CAST(width * height AS BIGINT) AS n_pixels,
           32 AS resize_w, 32 AS resize_h
    FROM hb
    """,
    doc="Image decode+resize pipeline with deterministic fake decoder "
        "(real codec stubbed: operators/multimodal.decode_image).",
)
def mm_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import multimodal as mm

    d = T(spark, sf_dir, "documents")
    return mm.decode_resize(mm.attach_binary(d))


@register(
    "mm_frame_sample",
    """
    WITH b AS (SELECT doc_id, octet_length(encode(text)) // 256 AS n_frames
               FROM documents)
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           coalesce(array_to_string(list_transform(
               CASE WHEN n_frames > 0
                    THEN range(0, CAST(greatest(n_frames - 1, 0) AS BIGINT) + 1, 10)
                    ELSE [] END,
               i -> CAST(i AS VARCHAR)), ','), '') AS sampled_frames,
           coalesce(array_to_string(list_transform(
               CASE WHEN n_frames > 0
                    THEN list_transform(
                        range(0, CAST(greatest(n_frames - 1, 0) AS BIGINT) + 1, 10),
                        i -> i * 256)
                    ELSE [] END,
               i -> CAST(i AS VARCHAR)), ','), '') AS byte_offsets
    FROM b
    """,
    doc="Video-style frame sampling over opaque byte streams (every 10th "
        "256-byte frame) — pure built-in byte math. Array outputs are "
        "serialized to comma-joined strings so the harness's canonicalizer "
        "(pandas sort) can hash them.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import multimodal as mm

    d = T(spark, sf_dir, "documents")
    out = mm.frame_sample_offsets(mm.attach_binary(d))
    return out.select(
        "doc_id",
        "n_frames",
        F.array_join(F.col("sampled_frames").cast("array<string>"), ",").alias(
            "sampled_frames"
        ),
        F.array_join(F.col("byte_offsets").cast("array<string>"), ",").alias(
            "byte_offsets"
        ),
    )
