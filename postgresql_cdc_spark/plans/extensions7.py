"""Extension-operator query surface, part 7: incremental view maintenance
from the CDC changelog, snapshot diffing (the inverse of materialize),
leakage-safe dataset splits, robust MAD outliers, RFM segmentation,
activity streaks, Matryoshka-truncation recall, and importance resampling.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only, so the DuckDB oracle hash-matches exactly; blocked equi-joins,
windows, and hash-aggs only — nothing all-pairs, nothing driver-side.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2); the two CDC-flavored queries here extend its changelog
semantics (`PgWalMessageDecoder.java:101-180`, TOAST-sparse images
`:206-207`) into the warehouse patterns a CDC consumer actually builds:
maintained aggregates and snapshot-derived changelogs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.common import EV, T
from postgresql_cdc_spark.plans.extensions import (
    _CORPUS,
    _NGRAM_ORACLE,
    _cos_sql,
)
from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.sources.changelog import LINEITEM_STATE_ORACLE

_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# --- incremental view maintenance from the changelog -------------------------

@register(
    "cdc_incremental_agg_maintenance",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM ({LINEITEM_STATE_ORACLE})
    GROUP BY l_returnflag
    """,
    doc="Incremental view maintenance (IVM): SUM/COUNT per l_returnflag "
        "maintained purely from I/U/D retract deltas — each event emits "
        "(-old image, +new image) against the grouping column WITHOUT ever "
        "materializing row state, the way a streaming CDC consumer keeps an "
        "aggregate fresh at a fraction of recompute cost. The prior image "
        "per key comes from ONE window (running last() fill for the two "
        "needed columns + lag — far lighter than full materialization, and "
        "TOAST-sparse UPDATE images inherit correctly because the fill "
        "skips absent entries). The oracle recomputes the aggregate from "
        "the fully-replayed final state: equality IS the IVM correctness "
        "proof. Shape: one key-partitioned window + one explode + one hash "
        "agg; at 100 TB the window shuffle is the same key partitioning "
        "every materialization query uses, and the final agg is "
        "map-side-combinable to |groups| rows.",
)
def cdc_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.plans.cdc import _changelog

    log = _changelog(spark, sf_dir)
    m = F.col("columns")
    ev = log.select(
        F.element_at(m, "l_orderkey").cast("long").alias("k1"),
        F.element_at(m, "l_linenumber").cast("int").alias("k2"),
        "lsn",
        "op",
        # presence-aware: absent (TOAST-unchanged / delete tuple) -> null,
        # so the running fill inherits the prior image's value
        F.when(F.map_contains_key(m, "l_quantity"),
               F.element_at(m, "l_quantity").cast("double").cast("long"))
        .alias("q"),
        F.when(F.map_contains_key(m, "l_returnflag"),
               F.element_at(m, "l_returnflag")).alias("rf"),
    )
    w = (
        Window.partitionBy("k1", "k2")
        .orderBy("lsn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("k1", "k2").orderBy("lsn")
    filled = ev.select(
        "k1", "k2", "lsn", "op",
        F.last("q", ignorenulls=True).over(w).alias("cq"),
        F.last("rf", ignorenulls=True).over(w).alias("crf"),
    ).select(
        "op", "cq", "crf",
        F.lag("cq").over(w_lag).alias("pq"),
        F.lag("crf").over(w_lag).alias("prf"),
    )
    minus = F.when(
        F.col("op").isin("U", "D"),
        F.struct(F.col("prf").alias("rf"), (-F.col("pq")).alias("dq"),
                 F.lit(-1).cast("long").alias("dn")),
    )
    plus = F.when(
        F.col("op").isin("I", "U"),
        F.struct(F.col("crf").alias("rf"), F.col("cq").alias("dq"),
                 F.lit(1).cast("long").alias("dn")),
    )
    deltas = filled.select(
        F.explode(F.array_compact(F.array(minus, plus))).alias("d")
    )
    return (
        deltas.groupBy(F.col("d.rf").alias("l_returnflag"))
        .agg(
            F.sum("d.dn").alias("n_rows"),
            F.sum("d.dq").alias("total_qty"),
        )
    )


# --- snapshot diff -> changelog (the inverse of materialize) -----------------

# Planted new snapshot of customer: every 17th row dropped (DELETE), every
# 13th surviving row gets +10 acctbal (UPDATE), every 19th row re-appears
# cloned at custkey+900000 (INSERT). Both engines construct the identical
# new side, so the diff has known true rows of every op kind.
_DIFF_NEW = """
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 10
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey % 17 <> 0
    UNION ALL
    SELECT c_custkey + 900000, c_name || '_new', c_nationkey, c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey % 19 = 0
"""

_DIFF_COLS = ("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


@register(
    "cdc_snapshot_diff",
    f"""
    WITH new_snap AS ({_DIFF_NEW}),
    j AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
                 o.c_custkey IS NULL AS is_i, n.c_custkey IS NULL AS is_d,
                 {', '.join(
                     f"(o.{c} IS DISTINCT FROM n.{c}) AS ch_{c}"
                     for c in _DIFF_COLS
                 )}
          FROM customer o FULL OUTER JOIN new_snap n
            ON o.c_custkey = n.c_custkey)
    SELECT CASE WHEN is_i THEN 'I' WHEN is_d THEN 'D' ELSE 'U' END AS op,
           c_custkey,
           CASE WHEN is_i OR is_d THEN ''
                ELSE concat_ws(',', {', '.join(
                    f"CASE WHEN ch_{c} THEN '{c}' END" for c in _DIFF_COLS
                )}) END AS changed_cols
    FROM j
    WHERE is_i OR is_d OR {' OR '.join(f'ch_{c}' for c in _DIFF_COLS)}
    """,
    doc="Snapshot diff -> changelog: the INVERSE of materialize — given two "
        "table snapshots, emit the minimal I/U/D changelog between them "
        "(the bootstrap every CDC deployment needs when a source has no "
        "WAL retention, and the audit that verifies a replica). One "
        "null-safe FULL OUTER JOIN on the key classifies each row; UPDATE "
        "rows carry the exact changed-column list via IS DISTINCT FROM "
        "(null-safe on both engines). Shape: a single co-partitioned "
        "shuffle join on the key — the 100 TB plan is two sorted scans + "
        "merge, identical to the backup-verification jobs warehouses "
        "already run; unchanged rows are filtered before any projection "
        "fan-out.",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    old = T(spark, sf_dir, "customer")
    keep = old.where(F.col("c_custkey") % 17 != 0).select(
        "c_custkey", "c_name", "c_nationkey",
        F.when(F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 10)
        .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    ins = old.where(F.col("c_custkey") % 19 == 0).select(
        (F.col("c_custkey") + 900000).alias("c_custkey"),
        F.concat(F.col("c_name"), F.lit("_new")).alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    new = keep.unionByName(ins)

    o = old.alias("o")
    n = new.alias("n")
    j = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    is_i = F.col("o.c_custkey").isNull()
    is_d = F.col("n.c_custkey").isNull()
    ch = {
        c: ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in _DIFF_COLS
    }
    any_ch = None
    for c in _DIFF_COLS:
        any_ch = ch[c] if any_ch is None else (any_ch | ch[c])
    return (
        j.where(is_i | is_d | any_ch)
        .select(
            F.when(is_i, "I").when(is_d, "D").otherwise("U").alias("op"),
            F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey"))
            .alias("c_custkey"),
            F.when(is_i | is_d, "").otherwise(
                F.concat_ws(",", *[
                    F.when(ch[c], c) for c in _DIFF_COLS
                ])
            ).alias("changed_cols"),
        )
    )


# --- leakage-safe train/val/test split (near-dup-group-aware) ----------------

@register(
    "corpus_split_leakage_safe",
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
    corpus AS ({_CORPUS}),
    allc AS (SELECT c.doc_id, coalesce(comp.component, c.doc_id) AS component
             FROM corpus c LEFT JOIN comp USING (doc_id)),
    sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
           FROM allc GROUP BY component),
    assigned AS (
        SELECT doc_id, component, csize,
               CASE WHEN pm < 90 THEN 'train'
                    WHEN pm < 95 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT a.doc_id, a.component, sz.csize,
                     {_H60.format(
                         x="'lsplit:' || CAST(a.component AS VARCHAR)"
                     )} % 100 AS pm
              FROM allc a JOIN sz USING (component))
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
           CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clustered_docs
    FROM assigned GROUP BY split
    """,
    doc="Leakage-safe train/val/test split: near-duplicate documents MUST "
        "land in the same split (a train doc whose near-copy sits in test "
        "inflates eval — the contamination mode plain per-doc hashing "
        "can't prevent), so split assignment hashes the near-dup COMPONENT "
        "id, not the doc id: pairs -> connected components -> salted "
        "h60(component) %% 100 -> 90/5/5. Isolated docs are their own "
        "component, so the split stays deterministic and "
        "re-shard-reproducible for the whole corpus. The oracle replays "
        "components via a recursive CTE and the identical hash, so "
        "equality pins both the grouping and the assignment. Shape: the "
        "pair join is the capped posting equi-join, CC is the bounded "
        "label-propagation loop, and the split itself is a projection + "
        "two hash aggs.",
)
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.dedup import ngram_jaccard_pairs
    from postgresql_cdc_spark.operators.graph import connected_components
    from postgresql_cdc_spark.operators.text import h60
    from postgresql_cdc_spark.plans.extensions import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir).select("doc_id")
    pairs = ngram_jaccard_pairs(
        _near_dup_corpus(spark, sf_dir), "text", "doc_id", threshold=0.5
    )
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "component"
    )
    allc = corpus.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("component"),
    )
    sz = allc.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    pm = (
        h60(F.concat(F.lit("lsplit:"), F.col("component").cast("string")))
        % 100
    )
    assigned = allc.join(F.broadcast(sz), "component").select(
        "doc_id", "component", "csize",
        F.when(pm < 90, "train").when(pm < 95, "val").otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("component").alias("n_components"),
        F.sum(F.when(F.col("csize") > 1, 1).otherwise(0))
        .alias("n_clustered_docs"),
    )


# --- robust outliers: median absolute deviation ------------------------------

@register(
    "events_outliers_mad",
    """
    WITH s AS (SELECT event_type,
                      CAST(floor(value * 1000000) AS BIGINT) AS vmic
               FROM events),
    med AS (SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic) AS med
            FROM s GROUP BY event_type),
    d AS (SELECT s.event_type, vmic, med, abs(vmic - med) AS adev
          FROM s JOIN med USING (event_type)),
    mad AS (SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
            FROM d GROUP BY event_type)
    SELECT d.event_type,
           CAST(MIN(d.med) AS BIGINT) AS median_micros,
           CAST(MIN(mad.mad) AS BIGINT) AS mad_micros,
           CAST(SUM(CASE WHEN abs(d.vmic - d.med) > 10 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier screening via Median Absolute Deviation (Hampel "
        "identifier, 10x fence) per event type — MAD survives up to 50% "
        "contamination where the IQR fence breaks at 25%, the standard "
        "escalation when a feed is badly polluted. Discrete medians over "
        "floor-quantized integer micros are exact on both engines (no "
        "float accumulation order). Shape: two grouped percentile passes "
        "+ two broadcast joinbacks of per-type scalars — the detail table "
        "shuffles on event_type once per pass, fully partial-aggregatable "
        "at the final count.",
)
def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("vmic"),
    )
    med = s.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)")
        .cast("bigint").alias("med")
    )
    d = s.join(F.broadcast(med), "event_type").select(
        "event_type", "vmic", "med",
        F.abs(F.col("vmic") - F.col("med")).alias("adev"),
    )
    mad = d.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
        .cast("bigint").alias("mad")
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("median_micros"),
            F.min("mad").alias("mad_micros"),
            F.sum(
                F.when(
                    F.abs(F.col("vmic") - F.col("med"))
                    > 10 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --- RFM customer segmentation ----------------------------------------------

_RFM_CM = """
    SELECT o_custkey,
           CAST(epoch_ms(MAX(o_orderdate)) AS BIGINT) AS rec,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) * 10000 AS BIGINT)
               AS mon
    FROM orders GROUP BY o_custkey
"""


@register(
    "customer_rfm_segments",
    f"""
    WITH cm AS ({_RFM_CM}),
    q AS (SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY rec) AS r1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY rec) AS r2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY rec) AS r3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY freq) AS f1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY freq) AS f2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY freq) AS f3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY mon) AS m1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY mon) AS m2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY mon) AS m3
      FROM cm)
    SELECT CAST((1 + CAST(rec > r1 AS INT) + CAST(rec > r2 AS INT)
                    + CAST(rec > r3 AS INT)) * 100
              + (1 + CAST(freq > f1 AS INT) + CAST(freq > f2 AS INT)
                    + CAST(freq > f3 AS INT)) * 10
              + (1 + CAST(mon > m1 AS INT) + CAST(mon > m2 AS INT)
                    + CAST(mon > m3 AS INT)) AS INT)
               AS rfm_segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM cm CROSS JOIN q
    GROUP BY 1
    """,
    doc="RFM customer segmentation (recency / frequency / monetary "
        "quartiles -> 64 segments): the classic CRM partitioning, stated "
        "scale-correctly — quartile FENCES come from percentile_disc over "
        "the per-customer rollup (nine scalars, broadcast back), NOT a "
        "global NTILE window, which would funnel every customer through "
        "one partition at 100 TB. Monetary is exact tenth-mils via the "
        "repo's DECIMAL money idiom; all fence comparisons are integer, "
        "so bucketing is engine-exact. Shape: one fact-table hash agg + "
        "one single-row broadcast + one final hash agg to <=64 rows.",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    cm = o.groupBy("o_custkey").agg(
        F.unix_millis(F.max("o_orderdate").cast("timestamp")).alias("rec"),
        F.count(F.lit(1)).alias("freq"),
        (F.sum(F.col("o_totalprice").cast("decimal(12,4)")) * 10000)
        .cast("bigint").alias("mon"),
    )
    q = cm.agg(*[
        F.expr(f"percentile_disc(0.{p}) WITHIN GROUP (ORDER BY {c})")
        .cast("bigint").alias(f"{c[0]}{i + 1}")
        for c in ("rec", "freq", "mon")
        for i, p in enumerate(("25", "50", "75"))
    ])

    def bucket(c: str):
        x = F.col(c)
        return (
            F.lit(1)
            + (x > F.col(f"{c[0]}1")).cast("int")
            + (x > F.col(f"{c[0]}2")).cast("int")
            + (x > F.col(f"{c[0]}3")).cast("int")
        )

    seg = (
        bucket("rec") * 100 + bucket("freq") * 10 + bucket("mon")
    ).cast("int")
    return (
        cm.crossJoin(F.broadcast(q))
        .select(seg.alias("rfm_segment"))
        .groupBy("rfm_segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- activity streaks (gaps and islands) -------------------------------------

@register(
    "events_activity_streaks",
    """
    WITH days AS (SELECT DISTINCT user_id,
                         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                             AS d
                  FROM events),
    isl AS (SELECT user_id,
                   d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                       AS g
            FROM days),
    st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
           FROM isl GROUP BY user_id, g),
    mx AS (SELECT user_id, MAX(len) AS max_streak FROM st GROUP BY user_id)
    SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM mx GROUP BY max_streak
    """,
    doc="Longest consecutive-day activity streak per user, reported as a "
        "distribution (streak length -> user count): the engagement metric "
        "behind every 'N-day streak' product surface. Classic gaps-and-"
        "islands — day_number minus row_number is constant within a "
        "consecutive run — all integer arithmetic on UTC day ordinals. "
        "Shape: one distinct + one user-partitioned window + two hash "
        "aggs; the user shuffle is the same key every sessionization "
        "query reuses, and the output is bounded by max streak length.",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id", (F.col("d") - F.row_number().over(w)).alias("g")
    )
    st = isl.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    mx = st.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return mx.groupBy("max_streak").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# --- Matryoshka-truncation ANN recall ----------------------------------------

_MRL_DIMS = 16


@register(
    "emb_matryoshka_recall",
    f"""
    WITH qr AS (SELECT vec_id AS query_id, embedding AS qe,
                       embedding[1:{_MRL_DIMS}] AS tqe
                FROM embeddings WHERE vec_id % 100 = 0
                  AND len(embedding) > 0),
    full_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC)
                 AS rank
      FROM (SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql('e.embedding', 'q.qe')} AS cos_sim
            FROM embeddings e JOIN qr q ON e.vec_id <> q.query_id)
    ),
    trunc_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC)
                 AS rank
      FROM (SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql(f'e.embedding[1:{_MRL_DIMS}]', 'q.tqe')}
                       AS cos_sim
            FROM embeddings e JOIN qr q ON e.vec_id <> q.query_id)
    ),
    overlap AS (
      SELECT t.query_id, COUNT(*) AS n_overlap
      FROM trunc_ranked t JOIN full_ranked f
        ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
      WHERE t.rank <= 5 AND f.rank <= 5
      GROUP BY t.query_id
    )
    SELECT qr.query_id,
           CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap
    FROM qr LEFT JOIN overlap o USING (query_id)
    """,
    doc=f"Matryoshka (MRL, Kusupati et al. 2022) truncation quality gate: "
        f"top-5 neighbors computed on the first {_MRL_DIMS} of 64 "
        f"dimensions vs the full-dimension exact top-5 — the "
        f"measure-don't-guess eval run before serving truncated "
        f"embeddings for the 4x memory/bandwidth win. Truncation is a "
        f"zero-cost slice (no reprojection); both sides are the "
        f"documented brute baseline over the 1% query sample with the "
        f"rounded-cosine determinism convention. A production index swaps "
        f"the truncated side for its IVF path; recall-vs-dims is the "
        f"curve this query traces.",
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    import postgresql_cdc_spark.operators.similarity as sim

    e = T(spark, sf_dir, "embeddings")
    q = e.where(
        (F.col("vec_id") % 100 == 0) & (F.size("embedding") > 0)
    ).select(F.col("vec_id").alias("query_id"), "embedding")

    full = sim.topk_brute(e, q, k=5)
    et = e.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIMS).alias("embedding")
    )
    qt = q.select(
        "query_id", F.slice("embedding", 1, _MRL_DIMS).alias("embedding")
    )
    trunc = sim.topk_brute(et, qt, k=5)
    ov = (
        trunc.select("query_id", "neighbor_id")
        .join(full.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return q.select("query_id").join(ov, "query_id", "left").select(
        "query_id", F.coalesce(F.col("__n"), F.lit(0)).alias("n_overlap")
    )


# --- importance resampling to a target corpus mix ----------------------------

@register(
    "corpus_importance_resample",
    f"""
    WITH cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS ns FROM cnt),
    kp AS (SELECT source, n,
                  LEAST(1000, (1000 * (t // ns)) // n) AS keep_permille
           FROM cnt CROSS JOIN tot)
    SELECT d.source,
           MIN(kp.n) AS n_docs,
           CAST(MIN(kp.keep_permille) AS BIGINT) AS keep_permille,
           CAST(SUM(CASE WHEN {_H60.format(
               x="'mix:' || CAST(d.doc_id AS VARCHAR)"
           )} % 1000 < kp.keep_permille THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM documents d JOIN kp USING (source)
    GROUP BY d.source
    """,
    doc="Importance resampling to a target corpus mix (uniform-over-"
        "sources here): per source, keep probability = min(1, target/"
        "actual) in integer per-mille, applied as a deterministic salted-"
        "hash threshold on the doc id — downsampling over-represented "
        "sources is how a pretraining run enforces its data mixture, and "
        "hash-threshold sampling keeps membership reproducible across "
        "runs and re-shards (never rand()). Shape: one tiny per-source "
        "count agg broadcast back (the CROSS JOIN is a one-row scalar), "
        "then a scan-speed per-row keep decision folded into the final "
        "per-source agg.",
)
def corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("ns")
    )
    kp = cnt.crossJoin(F.broadcast(tot)).select(
        "source", "n",
        F.least(
            F.lit(1000).cast("bigint"),
            F.expr("(1000 * (t div ns)) div n"),
        ).alias("keep_permille"),
    )
    keep = (
        h60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000
        < F.col("keep_permille")
    )
    return (
        d.join(F.broadcast(kp), "source")
        .groupBy("source")
        .agg(
            F.min("n").alias("n_docs"),
            F.min("keep_permille").alias("keep_permille"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        )
    )
