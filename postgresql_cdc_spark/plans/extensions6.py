"""Extension-operator query surface, part 6: entity resolution, event
analytics, and index-compression stages — fuzzy record linkage via
symmetric-delete blocking, marketing attribution, distribution histograms,
quantile bucketing, A/B readout, perceptual-hash multimodal near-dup,
product-quantization codes, and a triangle census.

Design rules follow plans/extensions.py: integer/string outputs or portable
h60-derived values only, so the DuckDB oracle hash-matches exactly; blocked
equi-joins and hash-aggs only — nothing all-pairs, nothing driver-side.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2); these are north-star extensions over the `customer` and
`events` fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.common import EV, T
from postgresql_cdc_spark.plans.registry import register

_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# --- fuzzy record linkage (symmetric-delete blocking + exact verify) ---------

# Planted dirty registry: every 11th customer reappears (id + 100000) with
# ONE character of its name replaced by 'X' at an h60-derived digit position
# (10..18 of 'Customer#ddddddddd') — the single-substitution corruption a
# data-entry feed produces. Both engines construct the identical dirty side.
_FUZZ_POS = (
    "({h} % 9) + 10".format(h=_H60.format(x="'fz:' || CAST(c_custkey AS VARCHAR)"))
)

_FUZZ_DIRTY = f"""
    SELECT c_custkey + 100000 AS dirty_id,
           substr(c_name, 1, CAST({_FUZZ_POS} AS INT) - 1) || 'X'
             || substr(c_name, CAST({_FUZZ_POS} AS INT) + 1,
                       length(c_name)) AS dirty_name
    FROM customer WHERE c_custkey % 11 = 0
"""

# Symmetric-delete neighborhood: the name ITSELF (0-deletion identity key)
# plus the name with character i removed, for every i. The identity key is
# load-bearing: for an insertion/deletion pair like 'abc' vs 'abcd' the
# shorter string's 1-deletion keys are all length-2 while the longer's are
# length-3, so without indexing 'abc' under itself the true match shares no
# key and is silently missed — true SymSpell indexes term + deletions.
_DEL_KEYS = (
    "list_concat([{nm}], "
    "list_transform(range(1, length({nm}) + 1), "
    "i -> substr({nm}, 1, i - 1) || substr({nm}, i + 1, length({nm}))))"
)


def sym_del_keys(nm: str):
    """Spark twin of _DEL_KEYS: identity key + every 1-deletion variant of
    string column expression ``nm``. Guarantees any pair within edit
    distance 1 (substitution, insertion, OR deletion) shares ≥1 key."""
    return F.expr(
        f"concat(array({nm}), "
        f"transform(sequence(1, length({nm})), "
        f"i -> concat(substr({nm}, 1, i - 1), "
        f"substr({nm}, i + 1, length({nm})))))"
    )


@register(
    "fuzzy_name_match",
    f"""
    WITH dirty AS ({_FUZZ_DIRTY}),
    mk AS (SELECT c_custkey AS master_id, c_name AS master_name,
                  unnest({_DEL_KEYS.format(nm='c_name')}) AS k
           FROM customer),
    dk AS (SELECT dirty_id, dirty_name,
                  unnest({_DEL_KEYS.format(nm='dirty_name')}) AS k
           FROM dirty),
    cand AS (SELECT DISTINCT dirty_id, dirty_name, master_id, master_name
             FROM dk JOIN mk USING (k))
    SELECT dirty_id, master_id,
           CAST(levenshtein(dirty_name, master_name) AS INT) AS lev
    FROM cand
    WHERE levenshtein(dirty_name, master_name) <= 1
    """,
    doc="Fuzzy record linkage with symmetric-delete blocking (SymSpell, "
        "Garbe 2012): every name is indexed under itself AND all its "
        "1-deletion variants; two names within edit distance 1 "
        "(substitution, insertion, or deletion) are GUARANTEED to share a "
        "key — substitutions meet at the common 1-deletion, insertions/"
        "deletions meet at the shorter string's identity key — so "
        "candidates come from a plain equi-join on the key — never an "
        "all-pairs scan — and an exact levenshtein verify (built-in on both "
        "engines) prunes block collisions. The blocking index grows "
        "linearly (length(name) keys per record) and the verify runs only "
        "on candidates: the standard scalable shape for dedupe/linkage at "
        "corpus size. The query plants single-substitution dirty copies of "
        "every 11th customer so the gate has known true matches.",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pos = (
        (h60(F.concat(F.lit("fz:"), F.col("c_custkey").cast("string"))) % 9)
        + 10
    ).cast("int")
    dirty = (
        c.where(F.col("c_custkey") % 11 == 0)
        .withColumn("__p", pos)
        .select(
            (F.col("c_custkey") + 100000).alias("dirty_id"),
            F.concat(
                F.expr("substr(c_name, 1, __p - 1)"),
                F.lit("X"),
                F.expr("substr(c_name, __p + 1, length(c_name))"),
            ).alias("dirty_name"),
        )
    )

    mk = c.select(
        F.col("c_custkey").alias("master_id"),
        F.col("c_name").alias("master_name"),
        F.explode(sym_del_keys("c_name")).alias("k"),
    )
    dk = dirty.select(
        "dirty_id", "dirty_name",
        F.explode(sym_del_keys("dirty_name")).alias("k"),
    )
    cand = (
        dk.join(mk, "k")
        .select("dirty_id", "dirty_name", "master_id", "master_name")
        .distinct()
    )
    lev = F.levenshtein("dirty_name", "master_name")
    return (
        cand.where(lev <= 1)
        .select("dirty_id", "master_id", lev.cast("int").alias("lev"))
    )


# --- marketing attribution (last non-purchase touch before each purchase) ----

@register(
    "events_attribution_last_touch",
    """
    WITH o AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                      last_value(CASE WHEN event_type <> 'purchase'
                                      THEN event_type END IGNORE NULLS)
                          OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS touch
               FROM events)
    SELECT COALESCE(touch, 'none') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM o WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch, 'none')
    """,
    doc="Last-touch attribution: each purchase credits the user's most "
        "recent preceding non-purchase event (ties broken by event_id, both "
        "engines). One user-partitioned window (IGNORE NULLS last_value "
        "over the preceding frame) + one hash agg — the window shuffles on "
        "user_id exactly once, the same partitioning every sessionization "
        "query reuses. Purchases with no prior touch attribute to 'none'.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = EV(spark, sf_dir).select(
        "user_id", "event_id", "event_type",
        F.unix_millis("ts").alias("ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    o = e.withColumn("touch", touch)
    return (
        o.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


# --- distribution histogram ---------------------------------------------------

@register(
    "events_value_histogram",
    """
    SELECT event_type,
           CAST(floor(value / 5.0) AS BIGINT) AS bin,
           CAST(floor(value / 5.0) * 5 AS BIGINT) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, floor(value / 5.0)
    """,
    doc="Fixed-width histogram of event values per type (width 5): the "
        "distribution summary a monitoring pipeline emits per batch. floor "
        "binning is engine-exact on doubles; one hash agg, fully partial-"
        "aggregatable, so at 100 TB it map-side combines to "
        "types x bins rows before the exchange.",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    b = F.floor(F.col("value") / 5.0)
    return (
        e.groupBy(
            "event_type",
            b.cast("bigint").alias("bin"),
            (b * 5).cast("bigint").alias("bin_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "bin", "bin_lo", "n")
    )


# --- quantile bucketing + distribution ranks ---------------------------------

@register(
    "window_ntile_cume",
    """
    SELECT c_mktsegment, c_custkey,
           CAST(ntile(4) OVER w AS INT) AS balance_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Quantile bucketing and distribution ranks (NTILE / PERCENT_RANK / "
        "CUME_DIST): the feature-engineering pass that turns a raw score "
        "into segment-relative quartiles and percentiles. The order key "
        "includes the primary key so ranks are total-order deterministic; "
        "percent_rank and cume_dist are small-integer ratios, so the "
        "doubles agree bit-for-bit across engines. One window shuffle on "
        "the segment key.",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment", "c_custkey",
        F.ntile(4).over(w).cast("int").alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --- deterministic A/B assignment + conversion lift --------------------------

@register(
    "events_ab_test_lift",
    f"""
    WITH a AS (SELECT user_id,
                      CASE WHEN {_H60.format(x="'ab:' || CAST(user_id AS VARCHAR)")}
                                % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                      MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS exposed,
                      MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS converted
               FROM events GROUP BY 1, 2)
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(exposed) AS BIGINT) AS n_exposed,
           CAST(SUM(CASE WHEN exposed = 1 THEN converted ELSE 0 END)
                AS BIGINT) AS n_converted,
           CAST((1000 * SUM(CASE WHEN exposed = 1 THEN converted ELSE 0 END))
                // NULLIF(SUM(exposed), 0) AS BIGINT) AS conv_milli
    FROM a GROUP BY arm
    """,
    doc="Deterministic A/B experiment readout: users hash into stable arms "
        "(salted portable hash — assignment survives re-runs and "
        "re-sharding, same property as corpus_split_assign), and per arm "
        "the exposed-user conversion rate lands as an exact integer "
        "per-mille. Two hash aggs (user rollup, then arm rollup) — the "
        "user rollup is the same shuffle key every per-user query reuses.",
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    e = EV(spark, sf_dir)
    arm = F.when(
        h60(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))) % 2 == 0,
        "A",
    ).otherwise("B")
    a = (
        e.groupBy("user_id", arm.alias("arm"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("exposed"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    conv = F.sum(
        F.when(F.col("exposed") == 1, F.col("converted")).otherwise(0)
    )
    return a.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("exposed").cast("bigint").alias("n_exposed"),
        conv.cast("bigint").alias("n_converted"),
        F.expr(
            "CAST((1000 * SUM(CASE WHEN exposed = 1 THEN converted ELSE 0 END))"
            " DIV NULLIF(SUM(exposed), 0) AS BIGINT)"
        ).alias("conv_milli"),
    )


# --- multimodal near-dup: perceptual hash (aHash) + Hamming pairing ----------

# The phash oracle verifies against the SAME corpus the Spark side builds
# (_near_dup_corpus); import its SQL twin so an edit to the perturbation in
# plans/extensions.py moves both engines together.
from postgresql_cdc_spark.plans.extensions import _CORPUS as _PHASH_CORPUS  # noqa: E402

# byte i (0-based) of the UTF-8 payload, zero-padded past the end
_PH_BYTE = "CASE WHEN i < least(n, 64) THEN CAST('0x' || substr(hx, i * 2 + 1, 2) AS BIGINT) ELSE CAST(0 AS BIGINT) END"

_PHASH_ORACLE = f"""
    WITH c AS ({_PHASH_CORPUS}),
    b AS (SELECT doc_id, hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS n FROM c),
    arrs AS (SELECT doc_id,
                    list_transform(range(0, 64), i -> {_PH_BYTE}) AS arr
             FROM b),
    m AS (SELECT doc_id, arr, list_sum(arr) // 64 AS mean FROM arrs),
    h AS (SELECT doc_id,
                 list_transform(range(0, 4), k ->
                     list_sum(list_transform(range(0, 16), j ->
                         CASE WHEN arr[k * 16 + j + 1] > mean
                              THEN CAST(1 AS BIGINT) << j
                              ELSE CAST(0 AS BIGINT) END))) AS ch
          FROM m),
    hx AS (SELECT doc_id, ch[1] AS c0, ch[2] AS c1, ch[3] AS c2, ch[4] AS c3
           FROM h),
    posting AS (
        SELECT doc_id, 0 AS k, c0 AS v FROM hx UNION ALL
        SELECT doc_id, 1, c1 FROM hx UNION ALL
        SELECT doc_id, 2, c2 FROM hx UNION ALL
        SELECT doc_id, 3, c3 FROM hx),
    hot AS (SELECT k, v FROM posting GROUP BY k, v HAVING COUNT(*) > 200),
    pf AS (SELECT posting.* FROM posting ANTI JOIN hot USING (k, v)),
    cand AS (SELECT DISTINCT pa.doc_id AS id_a, pb.doc_id AS id_b
             FROM pf pa JOIN pf pb USING (k, v)
             WHERE pa.doc_id < pb.doc_id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(a.c0, bb.c0)) + bit_count(xor(a.c1, bb.c1))
              + bit_count(xor(a.c2, bb.c2)) + bit_count(xor(a.c3, bb.c3))
              AS INT) AS hamming
    FROM cand JOIN hx a ON cand.id_a = a.doc_id
              JOIN hx bb ON cand.id_b = bb.doc_id
    WHERE bit_count(xor(a.c0, bb.c0)) + bit_count(xor(a.c1, bb.c1))
        + bit_count(xor(a.c2, bb.c2)) + bit_count(xor(a.c3, bb.c3)) <= 3
"""


@register(
    "mm_phash_dedup",
    _PHASH_ORACLE,
    doc="Multimodal near-dup via perceptual hash: 64-bit average-hash "
        "(aHash) of the payload head — integer-mean threshold bitmap, the "
        "image-dedup standard — computed in a numpy mapInPandas kernel "
        "(operators/multimodal.perceptual_ahash_chunks), then all pairs "
        "within Hamming distance 3 via pigeonhole chunk blocking "
        "(4x16-bit chunks: distance <=3 guarantees a shared chunk), a "
        "capped posting equi-join, and an exact popcount verify — the "
        "image-side twin of SimHash text dedup, end-to-end over the "
        "binary-column plumbing. Byte-level oracle (hex-pair arithmetic) "
        "replays the identical hash and pairing.",
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import multimodal as mm

    corpus = _near_dup_corpus(spark, sf_dir)
    hashes = mm.perceptual_ahash_chunks(mm.attach_binary(corpus))
    return mm.phash_dup_pairs(hashes, max_distance=3, max_bucket=200)


# --- product quantization (PQ) codes -----------------------------------------

_PQ_SUB = 8      # subspaces
_PQ_DIM = 8      # dims per subspace
_PQ_K = 16       # codewords per subspace (first 16 vectors, like the IVF seed)


@register(
    "emb_pq_codes",
    f"""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000)
                                    AS BIGINT)) AS qv
               FROM embeddings),
    cb AS (SELECT vec_id AS c, qv AS cv FROM q
           ORDER BY vec_id LIMIT {_PQ_K}),
    sub AS (SELECT vec_id, qv, unnest(range(0, {_PQ_SUB})) AS s FROM q),
    dists AS (SELECT sub.vec_id, sub.s, cb.c,
                     list_sum(list_transform(
                         range(1, {_PQ_DIM} + 1),
                         j -> (qv[s * {_PQ_DIM} + j] - cv[s * {_PQ_DIM} + j])
                            * (qv[s * {_PQ_DIM} + j] - cv[s * {_PQ_DIM} + j])
                     )) AS d
              FROM sub CROSS JOIN cb),
    w AS (SELECT vec_id, s, c, d,
                 MIN(d) OVER (PARTITION BY vec_id, s) AS dmin
          FROM dists)
    SELECT vec_id, CAST(s AS INT) AS subspace,
           CAST(MIN(c) AS INT) AS code,
           CAST(MIN(dmin) AS BIGINT) AS distortion
    FROM w WHERE d = dmin
    GROUP BY vec_id, s
    """,
    doc="Product quantization (PQ, Jegou et al. TPAMI'11): each 64-dim "
        "embedding splits into 8 subvectors, each assigned to its nearest "
        "of 16 codewords (seeded from the first 16 vectors, same "
        "convention as the IVF coarse quantizer) — the vector-compression "
        "standard behind IVF-PQ indexes, 64 dims -> 8 bytes. Arithmetic is "
        "integer-quantized squared-L2 with a smallest-index tie-break, so "
        "codes and per-subspace distortion match the oracle exactly. "
        "Shape: corpus x tiny broadcast codebook (the declared IVF-style "
        "nested-loop), one window min per (vector, subspace) — linear in "
        "the corpus, no self-joins.",
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    cb = (
        q.orderBy("vec_id")
        .limit(_PQ_K)
        .select(F.col("vec_id").alias("c"), F.col("qv").alias("cv"))
    )
    sub = q.select(
        "vec_id", "qv",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_SUB - 1))).alias("s"),
    )
    d = F.expr(
        f"aggregate(zip_with(slice(qv, s * {_PQ_DIM} + 1, {_PQ_DIM}), "
        f"slice(cv, s * {_PQ_DIM} + 1, {_PQ_DIM}), "
        "(x, y) -> (x - y) * (x - y)), 0L, (a, z) -> a + z)"
    )
    dists = sub.crossJoin(F.broadcast(cb)).select(
        "vec_id", "s", "c", d.alias("d")
    )
    w = dists.withColumn(
        "dmin", F.min("d").over(Window.partitionBy("vec_id", "s"))
    )
    return (
        w.where(F.col("d") == F.col("dmin"))
        .groupBy("vec_id", "s")
        .agg(
            F.min("c").cast("int").alias("code"),
            F.min("dmin").cast("bigint").alias("distortion"),
        )
        .select(
            "vec_id", F.col("s").cast("int").alias("subspace"),
            "code", "distortion",
        )
    )


# --- triangle census on the trade graph --------------------------------------

@register(
    "graph_triangle_census",
    """
    WITH e0 AS MATERIALIZED (SELECT DISTINCT
                    least(c_nationkey, s_nationkey) AS a,
                    greatest(c_nationkey, s_nationkey) AS b
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
                WHERE c_nationkey <> s_nationkey),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e0 e1
            JOIN e0 e2 ON e2.a = e1.b
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT CAST((SELECT COUNT(DISTINCT n)
                 FROM (SELECT a AS n FROM e0
                       UNION SELECT b FROM e0)) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
    """,
    doc="Triangle census of the undirected trade graph: canonical a<b edge "
        "orientation, then the standard two-join triangle enumeration "
        "(x<y<z once each). At scale this is the degree-ordered edge-join "
        "shape (each triangle counted exactly once, no candidate "
        "duplication); the fact-table star collapses to the <=N^2 edge "
        "list first.",
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
        .persist()
    )
    e1, e2, e3 = e0.alias("e1"), e0.alias("e2"), e0.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
    )
    nodes = e0.select(F.col("a").alias("n")).union(
        e0.select(F.col("b").alias("n"))
    )
    return (
        nodes.agg(F.count_distinct(F.col("n")).alias("n_nodes"))
        .crossJoin(F.broadcast(e0.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(tri.agg(F.count(F.lit(1)).alias("n_triangles"))))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint"),
            F.col("n_triangles").cast("bigint"),
        )
    )


# --- dedup-pipeline recall evaluation ----------------------------------------

from postgresql_cdc_spark.plans.extensions import (  # noqa: E402
    _MINHASH_ORACLE,
    _NGRAM_ORACLE,
    _near_dup_corpus,
)


@register(
    "dedup_minhash_recall_eval",
    f"""
    WITH truth AS MATERIALIZED ({_NGRAM_ORACLE}),
    found AS MATERIALIZED ({_MINHASH_ORACLE}),
    nt AS (SELECT COUNT(*) AS n_truth FROM truth),
    nf AS (SELECT COUNT(*) AS n_found FROM found),
    nh AS (SELECT COUNT(*) AS n_hit
           FROM truth SEMI JOIN found USING (id_a, id_b))
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_found AS BIGINT) AS n_found,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST((1000 * n_hit) // NULLIF(n_truth, 0) AS BIGINT)
             AS recall_milli
    FROM nt CROSS JOIN nf CROSS JOIN nh
    """,
    doc="Quality evaluation of the MinHash+LSH dedup pipeline against the "
        "exact n-gram-Jaccard truth on the same corpus — the dedup-family "
        "twin of ivf_recall_eval: band geometry and hot-bucket caps trade "
        "recall for scalability, and this query MEASURES the trade "
        "(pair-set hit count and integer per-mille recall) instead of "
        "assuming it. Both pair sets are the already-gated pipelines; the "
        "comparison is two counts and a semi join on the pair key.",
)
def dedup_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import dedup as dd

    corpus = _near_dup_corpus(spark, sf_dir)
    truth = dd.ngram_jaccard_pairs(
        corpus, "text", "doc_id", threshold=0.5
    ).select("id_a", "id_b").persist()
    found = dd.minhash_lsh_pairs(
        corpus, "text", "doc_id", threshold=0.5
    ).select("id_a", "id_b").persist()
    hit = truth.join(found, ["id_a", "id_b"], "left_semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_truth.crossJoin(F.broadcast(n_found))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_truth", "n_found", "n_hit",
            F.expr(
                "CAST((1000 * n_hit) DIV NULLIF(n_truth, 0) AS BIGINT)"
            ).alias("recall_milli"),
        )
    )


# --- session-length histogram (bounce report) --------------------------------

@register(
    "events_session_length_hist",
    """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_id)
                        > 1800000 THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                           ORDER BY ts_ms, event_id
                                           ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM flagged),
    per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id)
    SELECT CAST(n_events AS BIGINT) AS session_len,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM per_session GROUP BY n_events
    """,
    doc="Session-length distribution over gap-sessionized events (30 min, "
        "same boundary rules as events_sessionize): the bounce report — "
        "the session_len=1 row IS the bounce count, and the full histogram "
        "is what an engagement dashboard plots. One user-partitioned "
        "window + two hash aggs; the user shuffle is shared with every "
        "other sessionization query.",
)
def events_session_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reuse the canonical sessionizer — the "same boundary rules" promise
    # holds by construction instead of by a third hand-copied pipeline.
    # Function-body import: a module-level one would register relational's
    # whole inventory ahead of its place in the registration order.
    from postgresql_cdc_spark.plans.relational import events_sessionize

    per_session = events_sessionize(spark, sf_dir)
    return per_session.groupBy(
        F.col("n_events").cast("bigint").alias("session_len")
    ).agg(F.count(F.lit(1)).alias("n_sessions"))


# --- market-basket affinity (association lift) -------------------------------

@register(
    "basket_part_affinity",
    """
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    freq AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
             FROM items GROUP BY l_partkey),
    pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                     CAST(COUNT(*) AS BIGINT) AS c_ab
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT part_a, part_b, c_ab,
           CAST((1000 * c_ab * n.n_orders) // (fa.c * fb.c) AS BIGINT)
             AS lift_milli
    FROM pairs CROSS JOIN n
         JOIN freq fa ON part_a = fa.l_partkey
         JOIN freq fb ON part_b = fb.l_partkey
    """,
    doc="Market-basket association mining: part pairs co-purchased in >= 3 "
        "orders, scored by integer-scaled lift (1000 * P(ab)/(P(a)P(b)) "
        "truncated — no float log, exact both engines). The within-order "
        "pair fan-out is bounded by basket size squared (baskets are "
        "small; a degenerate mega-basket would get a basket-size cap, the "
        "same guard as stop-shingles), then two hash aggs and two "
        "part-frequency equi-joins — the same word-count shape as "
        "collocation mining, one level up the cart.",
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().persist()
    n = items.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= 3)
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(
            freq.select(F.col("l_partkey").alias("part_a"),
                        F.col("c").alias("ca")), "part_a")
        .join(
            freq.select(F.col("l_partkey").alias("part_b"),
                        F.col("c").alias("cb")), "part_b")
        .select(
            "part_a", "part_b", "c_ab",
            F.expr("CAST((1000 * c_ab * n_orders) DIV (ca * cb) AS BIGINT)")
            .alias("lift_milli"),
        )
    )


# --- month-over-month trend ---------------------------------------------------

@register(
    "orders_mom_revenue_trend",
    """
    WITH m AS (SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
                           AS VARCHAR) AS month_start,
                      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                    * 100 AS BIGINT)) AS BIGINT) AS rev_cents,
                      CAST(COUNT(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1)
    SELECT month_start, rev_cents, n_orders,
           lag(rev_cents) OVER (ORDER BY month_start) AS prev_cents,
           CAST((1000 * (rev_cents - lag(rev_cents) OVER (ORDER BY month_start)))
                // NULLIF(lag(rev_cents) OVER (ORDER BY month_start), 0)
                AS BIGINT) AS growth_milli
    FROM m
    """,
    doc="Month-over-month revenue trend: monthly rollup in true cents (the "
        "repo's DECIMAL money idiom — floor(double*100) would lose a cent "
        "on half the orders) with LAG growth in integer per-mille. The "
        "heavy work is one partial-aggregatable hash agg over the fact "
        "table; the trend window runs over the tiny month table (one row "
        "per month — a single-partition window is CORRECT here, unlike "
        "over fact rows). The dashboard time-series every warehouse "
        "serves.",
)
def orders_mom_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date").cast("string").alias("month_start")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
        ).cast("bigint").alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month_start")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "month_start", "rev_cents", "n_orders",
        prev.alias("prev_cents"),
        F.expr(
            "CAST((1000 * (rev_cents - lag(rev_cents) OVER (ORDER BY month_start)))"
            " DIV NULLIF(lag(rev_cents) OVER (ORDER BY month_start), 0) AS BIGINT)"
        ).alias("growth_milli"),
    )


# --- as-of join, nearest direction -------------------------------------------

@register(
    "asof_nearest_purchase_to_view",
    """
    WITH views AS (SELECT user_id, ts, MAX(event_id) AS view_event_id
                   FROM events WHERE event_type = 'view'
                   GROUP BY user_id, ts),
    purch AS (SELECT user_id, ts, event_id, value FROM events
              WHERE event_type = 'purchase'),
    cand AS (SELECT p.event_id, p.user_id, p.value, v.view_event_id,
                    abs(epoch_ms(p.ts) - epoch_ms(v.ts)) AS dist,
                    CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END AS fwd
             FROM purch p JOIN views v USING (user_id)),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                       ORDER BY dist, fwd) AS rn
          FROM cand)
    SELECT event_id, user_id, view_event_id, value
    FROM r WHERE rn = 1
    """,
    doc="merge_asof direction='nearest': each purchase matched to the "
        "user's CLOSEST view on either side of it (exact tie -> the prior "
        "one, the operator's documented rule). Same single-shuffle "
        "union+window as-of machinery — nearest adds a window over the "
        "following frame, not a second exchange; the oracle enumerates "
        "per-user candidates and argmins, tractable at gate scale only "
        "(DuckDB ASOF JOIN itself is backward-only).",
)
def asof_nearest_purchase_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.asof import asof_join

    e = EV(spark, sf_dir)
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purch, views, on="user_id", left_time="ts", right_time="ts",
        how="inner", direction="nearest",
    )
    return joined.select("event_id", "user_id", "view_event_id", "value")
