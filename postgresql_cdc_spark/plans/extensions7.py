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
    from postgresql_cdc_spark.operators.ivm import incremental_group_agg
    from postgresql_cdc_spark.plans.cdc import _changelog

    log = _changelog(spark, sf_dir)
    out = incremental_group_agg(
        log,
        keys=["l_orderkey", "l_linenumber"],
        group_col="l_returnflag",
        sum_col="l_quantity",
    )
    return out.select(
        "l_returnflag", "n_rows", F.col("total").alias("total_qty")
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
    # plain equi-join on component: sz has one row PER COMPONENT (isolated
    # docs are their own), so it scales with the corpus — broadcasting it
    # would ship the whole table to every executor at 100 TB
    assigned = allc.join(sz, "component").select(
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


# --- rolling 7-day active users (WAU spine) ----------------------------------

@register(
    "events_rolling_wau",
    """
    WITH ud AS (SELECT DISTINCT user_id,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS d
                FROM events),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
    contrib AS (SELECT DISTINCT user_id, d + g AS target_d
                FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS g)),
    wau AS (SELECT target_d, CAST(COUNT(*) AS BIGINT) AS wau
            FROM contrib GROUP BY target_d)
    SELECT w.target_d AS day_num, w.wau
    FROM wau w CROSS JOIN bounds
    WHERE w.target_d BETWEEN bounds.d0 AND bounds.d1
    """,
    doc="Rolling 7-day active users per day (WAU) via CONTRIBUTION "
        "EXPLODE: each (user, active-day) fans out to the 7 report days "
        "it makes the user active on, a distinct collapses multi-visit "
        "weeks, and one hash agg counts per day — rolling DISTINCT is not "
        "decomposable over a window (you cannot merge adjacent days' "
        "distinct counts), so the window formulation would re-scan 7 days "
        "of raw events per day; the explode states the 7x fan-out ONCE on "
        "the deduped (user, day) table, which is already |users| x |days| "
        "bounded. Report days clamp to the observed range so edge days "
        "with partial windows still report (pandas rolling-style). "
        "Integer day ordinals, engine-exact.",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint").alias("d"),
    ).distinct()
    ud = ud.persist()  # consumed by bounds AND contrib; harness unpersists
    bounds = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("target_d"),
    ).distinct()
    wau = contrib.groupBy("target_d").agg(
        F.count(F.lit(1)).alias("wau")
    )
    return (
        wau.crossJoin(F.broadcast(bounds))
        .where(F.col("target_d").between(F.col("d0"), F.col("d1")))
        .select(F.col("target_d").alias("day_num"), "wau")
    )


# --- join-key skew diagnostics ----------------------------------------------

@register(
    "stats_key_skew_profile",
    """
    WITH k AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
               FROM orders GROUP BY o_custkey),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(MAX(n) AS BIGINT) AS mx FROM k),
    top AS (SELECT key, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS rank
            FROM k)
    SELECT top.rank, top.key, top.n,
           CAST((1000 * top.n) // tot.t AS BIGINT) AS share_permille,
           CAST((1000 * tot.mx * tot.nk) // tot.t AS BIGINT)
               AS skew_x1000
    FROM top CROSS JOIN tot
    WHERE top.rank <= 10
    """,
    doc="Join-key skew diagnostic: the top-10 heaviest o_custkey values "
        "with integer per-mille share, plus the skew factor (max key "
        "frequency over mean, x1000) every row repeats — the profile an "
        "engineer reads BEFORE picking broadcast/salt/AQE strategy for a "
        "big join, and exactly what this repo's salted patterns act on. "
        "Shape: one hash agg to the key histogram, one one-row scalar "
        "broadcast, and a top-10 rank over the (already aggregated) "
        "histogram — at 100 TB the histogram is |distinct keys| rows, and "
        "the global window runs on its top slice only after a "
        "partial-top-k pushdown (TakeOrdered); nothing touches raw fact "
        "rows twice.",
)
def stats_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    k = k.persist()  # histogram feeds tot AND top; harness unpersists
    tot = k.agg(
        F.sum("n").alias("t"),
        F.count(F.lit(1)).alias("nk"),
        F.max("n").alias("mx"),
    )
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    top = (
        k.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "rank", "key", "n",
        F.expr("(1000 * n) div t").alias("share_permille"),
        F.expr("(1000 * mx * nk) div t").alias("skew_x1000"),
    )


# --- integer-exact TF-IDF top terms ------------------------------------------

_TOKS7 = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "t -> t <> '')"
)


@register(
    "text_tfidf_topterms",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS7}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               (1000 * tf.tf * nd.n) // df.df AS score
        FROM tf JOIN df USING (tok) CROSS JOIN nd),
    ranked AS (
        SELECT doc_id, tok, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, tok ASC) AS rank
        FROM scored)
    SELECT doc_id, rank, tok, CAST(score AS BIGINT) AS score
    FROM ranked WHERE rank <= 3
    """,
    doc="Top-3 characteristic terms per document by tf-idf-style "
        "weighting, in the LOG-FREE integer form floor(1000 * tf * N / "
        "df) — monotone in tf and 1/df exactly like tf x idf, but every "
        "score is exact integer arithmetic, so the cross-engine ranking "
        "(and the rank ties, broken on the term) is bit-deterministic "
        "where a float ln() could disagree in the last ulp at a rank "
        "boundary. The keyword-extraction pass behind search snippets and "
        "topic labeling. Shape: two word-count hash aggs (tf, then df), "
        "one token-keyed equi-join back, a one-row corpus-size broadcast, "
        "and a per-doc top-3 window — every stage is the word-count "
        "shape that defined map-reduce scalability.",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = t.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.persist()  # feeds df, nd, and scored; harness unpersists
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "tok",
            F.expr("(1000 * tf * n) div df").alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "tok", "score")
    )


# --- BPE merge candidates (tokenizer training inner loop) --------------------

@register(
    "text_bpe_merge_candidates",
    f"""
    WITH w AS (SELECT unnest({_TOKS7}) AS word FROM documents),
    wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
           FROM w GROUP BY word),
    pairs AS (
        SELECT substr(word, i, 1) AS left_sym,
               substr(word, i + 1, 1) AS right_sym,
               freq
        FROM wc CROSS JOIN LATERAL (
            SELECT unnest(range(1, length(word))) AS i)
        WHERE length(word) >= 2),
    pc AS (SELECT left_sym, right_sym,
                  CAST(SUM(freq) AS BIGINT) AS pair_count
           FROM pairs GROUP BY left_sym, right_sym)
    SELECT left_sym, right_sym, pair_count,
           CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC,
                                   left_sym ASC, right_sym ASC) AS BIGINT)
               AS rank
    FROM pc
    ORDER BY rank LIMIT 20
    """,
    doc="BPE tokenizer training, one inner-loop round: the 20 most "
        "frequent adjacent CHARACTER pairs across the corpus, weighted by "
        "word frequency — exactly the statistic byte-pair encoding "
        "(Sennrich et al. 2016) greedily merges each round. Counting runs "
        "on the word-frequency table, not raw text (the standard BPE "
        "trick: a word seen 10k times contributes its pairs once with "
        "weight 10k), so the pair explode is |vocab| x word-length, "
        "corpus-size independent. Shape: two word-count hash aggs + one "
        "positional explode; the final rank runs over the tiny "
        "symbol-pair table.",
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    w = d.select(F.explode(tokens(F.col("text"))).alias("word"))
    wc = w.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wc.where(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substr(word, i, 1) AS left_sym, "
                "substr(word, i + 1, 1) AS right_sym))"
            )
        ).alias("p"),
    )
    pc = pairs.groupBy(
        F.col("p.left_sym").alias("left_sym"),
        F.col("p.right_sym").alias("right_sym"),
    ).agg(F.sum("freq").alias("pair_count"))
    wn = Window.orderBy(
        F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")
    )
    return (
        pc.withColumn("rank", F.row_number().over(wn).cast("bigint"))
        .where(F.col("rank") <= 20)
        .select("left_sym", "right_sym", "pair_count", "rank")
    )


# --- order-vs-ship backlog time series ---------------------------------------

@register(
    "orders_backlog_timeseries",
    """
    WITH li AS (
        SELECT CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS od,
               CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS sd,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    daily AS (
        SELECT d, CAST(SUM(ordered) AS BIGINT) AS ordered_qty,
               CAST(SUM(shipped) AS BIGINT) AS shipped_qty
        FROM (
            SELECT od AS d, qty AS ordered, 0 AS shipped FROM li
            UNION ALL
            SELECT sd, 0, qty FROM li)
        GROUP BY d)
    SELECT d AS day_num, ordered_qty, shipped_qty,
           CAST(SUM(ordered_qty - shipped_qty)
                OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS backlog_qty
    FROM daily
    """,
    doc="Order-vs-ship backlog time series: daily ordered quantity (by "
        "order date) and shipped quantity (by ship date) from ONE pass "
        "over the joined fact — each lineitem explodes into its two "
        "(day, measure) contributions, so the double rollup costs one "
        "shuffle instead of two scans — then the running difference is "
        "the open backlog, cumulated by a window over the aggregated "
        "per-day table (hundreds of rows at ANY fact size, so the "
        "unpartitioned cumsum window is correct here, unlike over raw "
        "rows). The operations-dashboard staple for fulfillment lag. "
        "Integer day ordinals and integral quantities: engine-exact.",
)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint").alias("sd"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint").alias("od"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    contrib = j.select(
        F.explode(
            F.array(
                F.struct(F.col("od").alias("d"), F.col("qty").alias("ordered"),
                         F.lit(0).cast("bigint").alias("shipped")),
                F.struct(F.col("sd").alias("d"), F.lit(0).cast("bigint").alias("ordered"),
                         F.col("qty").alias("shipped")),
            )
        ).alias("c")
    )
    daily = contrib.groupBy(F.col("c.d").alias("d")).agg(
        F.sum("c.ordered").alias("ordered_qty"),
        F.sum("c.shipped").alias("shipped_qty"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    return daily.select(
        F.col("d").alias("day_num"), "ordered_qty", "shipped_qty",
        F.sum(F.col("ordered_qty") - F.col("shipped_qty")).over(w)
        .alias("backlog_qty"),
    )


# --- k-anonymity audit -------------------------------------------------------

@register(
    "privacy_k_anonymity_audit",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) < 5 AS violates_k5
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
    doc="k-anonymity audit over the quasi-identifier (nation, market "
        "segment): any equivalence class smaller than k=5 re-identifies "
        "its members and is flagged for suppression/generalization before "
        "the table ships to analysts or a training corpus — the standard "
        "privacy gate (Sweeney 2002) next to PII scrubbing. One "
        "partial-aggregatable hash agg; output is bounded by the "
        "quasi-identifier domain, not row count.",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_nationkey", "c_mktsegment", "group_size",
            (F.col("group_size") < 5).alias("violates_k5"),
        )
    )


# --- data-quality constraint audit -------------------------------------------

@register(
    "dq_constraint_audit",
    """
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
        SELECT 'orders_orphan_custkey' AS rule, COUNT(*) AS n_violations
        FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'orders_nonpositive_total', COUNT(*)
        FROM orders WHERE o_totalprice <= 0
        UNION ALL
        SELECT 'lineitem_discount_range', COUNT(*)
        FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        UNION ALL
        SELECT 'lineitem_nonpositive_qty', COUNT(*)
        FROM lineitem WHERE l_quantity <= 0
        UNION ALL
        SELECT 'customer_duplicate_pk', COUNT(*) FROM (
            SELECT c_custkey FROM customer
            GROUP BY c_custkey HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'customer_null_pk', COUNT(*)
        FROM customer WHERE c_custkey IS NULL)
    """,
    doc="Data-contract audit (dbt-test style) in one report: referential "
        "integrity (orders whose custkey has no customer — LEFT ANTI "
        "join), domain ranges (non-positive totals/quantities, discount "
        "outside [0,1]), primary-key uniqueness and non-null. Each rule is "
        "a partial-aggregatable count over exactly the columns it needs "
        "(scans column-prune to 1-2 columns); the anti join broadcasts "
        "the key side when small and degrades to a shuffle join at scale. "
        "A healthy fixture reports all zeros — the value is the harness "
        "proving the CHECKS agree across engines, so a real violation "
        "count would too.",
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    li = T(spark, sf_dir, "lineitem")

    def one(rule: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    orphan = o.join(c, o.o_custkey == c.c_custkey, "left_anti")
    dup_pk = (
        c.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    parts = [
        one("orders_orphan_custkey", orphan),
        one("orders_nonpositive_total", o.where(F.col("o_totalprice") <= 0)),
        one("lineitem_discount_range",
            li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
        one("lineitem_nonpositive_qty", li.where(F.col("l_quantity") <= 0)),
        one("customer_duplicate_pk", dup_pk),
        one("customer_null_pk", c.where(F.col("c_custkey").isNull())),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- embedding distribution drift between batches ----------------------------

@register(
    "emb_drift_report",
    """
    WITH q AS (SELECT vec_id, vec_id % 2 AS half,
                      unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {'pos': i,
                                'x': CAST(floor(CAST(embedding[i] AS DOUBLE)
                                          * 1000000) AS BIGINT)}),
                          recursive := true)
               FROM embeddings WHERE len(embedding) > 0),
    h AS (SELECT half, pos, SUM(x) AS s, COUNT(*) AS n
          FROM q GROUP BY half, pos),
    m AS (SELECT half, pos,
                 (s - ((s % n + n) % n)) // n AS mean_micros
          FROM h)
    SELECT a.pos AS dim,
           CAST(a.mean_micros AS BIGINT) AS mean_a_micros,
           CAST(b.mean_micros AS BIGINT) AS mean_b_micros,
           CAST(abs(a.mean_micros - b.mean_micros) AS BIGINT)
               AS drift_micros
    FROM m a JOIN m b ON a.pos = b.pos AND a.half = 0 AND b.half = 1
    """,
    doc="Embedding distribution drift between two batches (even vs odd "
        "vec_ids standing in for yesterday-vs-today): per dimension, the "
        "floor-quantized integer mean of each batch and the absolute "
        "delta — the monitoring gate that catches an upstream encoder "
        "change or corrupt ingest before a retrieval index degrades. "
        "Exact floored division over integer micros (the kmeans recenter "
        "trick), so both engines agree bit-for-bit. Shape: one positional "
        "explode + one (half, dim)-keyed hash agg — word-count scalable; "
        "output is 64 rows at any corpus size.",
)
def emb_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").where(F.size("embedding") > 0)
    q = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.expr(
                "transform(embedding, "
                "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("pos0", "x"),
    )
    h = q.groupBy("half", (F.col("pos0") + 1).alias("pos")).agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    m = h.select(
        "half", "pos",
        F.expr("(s - ((s % n + n) % n)) div n").alias("mean_micros"),
    )
    a = m.where(F.col("half") == 0).select(
        F.col("pos").alias("dim"), F.col("mean_micros").alias("mean_a_micros")
    )
    b = m.where(F.col("half") == 1).select(
        F.col("pos").alias("pos_b"), F.col("mean_micros").alias("mean_b_micros")
    )
    return (
        a.join(b, a.dim == b.pos_b)
        .select(
            "dim", "mean_a_micros", "mean_b_micros",
            F.abs(
                F.col("mean_a_micros") - F.col("mean_b_micros")
            ).alias("drift_micros"),
        )
    )


# --- exact AUC (Mann-Whitney with tie correction) ----------------------------

@register(
    "eval_auc_exact",
    """
    WITH s AS (
        SELECT vec_id,
               CAST(label < 5 AS INT) AS pos,
               list_reduce(list_concat([CAST(0 AS BIGINT)],
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
                   (a, b) -> a + b) AS score
        FROM embeddings WHERE len(embedding) > 0),
    r AS (
        SELECT pos,
               2 * RANK() OVER (ORDER BY score ASC)
                 + COUNT(*) OVER (PARTITION BY score) - 1 AS avg_rank_x2
        FROM s),
    agg AS (
        SELECT CAST(SUM(CASE WHEN pos = 1 THEN avg_rank_x2 END) AS BIGINT)
                   AS s2,
               CAST(SUM(pos) AS BIGINT) AS npos,
               CAST(SUM(1 - pos) AS BIGINT) AS nneg
        FROM r)
    SELECT npos, nneg,
           CAST(s2 - npos * (npos + 1) AS BIGINT) AS u_x2,
           CAST((1000000 * (s2 - npos * (npos + 1)))
                // (2 * npos * nneg) AS BIGINT) AS auc_ppm
    FROM agg
    """,
    doc="Exact AUC / Mann-Whitney U for a binary task (label < 5) scored "
        "by an integer embedding statistic, with PROPER tie handling: "
        "average ranks carried doubled (2*min_rank + tie_count - 1) so "
        "every intermediate stays integer and the final AUC lands as "
        "exact parts-per-million — the classifier-eval primitive, "
        "computed at corpus scale without sampling. The oracle states "
        "the textbook per-row global RANK; the Spark plan deliberately "
        "does not run one: ranks collapse onto the DISTINCT-SCORE "
        "histogram (every row of score v shares doubled midrank "
        "2*(smaller+1) + ties - 1), and the strictly-smaller counts come "
        "from the two-level stitched exclusive prefix "
        "(operators/seams.py), so no window task holds more than "
        "max(8192, score-range/1000/8192) rows at any corpus size.",
)
def eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").where(F.size("embedding") > 0)
    s = e.select(
        (F.col("label") < 5).cast("int").alias("pos"),
        F.expr(
            "aggregate(transform(embedding, "
            "x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)), "
            "0L, (a, b) -> a + b)"
        ).alias("score"),
    )
    # distinct-score rollup: scores can be negative, so the bucket id uses
    # floor division (div truncates toward zero and would fold -1/+1
    # buckets together around zero).
    vals = (
        s.groupBy("score")
        .agg(
            F.sum("pos").cast("bigint").alias("cp"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
        .withColumn(
            "bkt", F.floor(F.col("score") / F.lit(1000)).cast("bigint")
        )
        .persist()  # feeds bcounts AND ranked; harness unpersists
    )
    bcounts = vals.groupBy("bkt").agg(F.sum("c").alias("bn"))
    from postgresql_cdc_spark.operators.seams import (
        two_level_exclusive_prefix,
    )

    carry = two_level_exclusive_prefix(
        bcounts, "bkt", {"bn": "carry"}
    ).select("bkt", "carry")
    w_in = Window.partitionBy("bkt").orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vals.join(carry, "bkt").withColumn(
        "smaller", F.col("carry") + F.sum("c").over(w_in) - F.col("c")
    )
    # all cp positives at score v share doubled midrank
    # 2*(smaller+1) + c - 1 (= 2*RANK + tie_count - 1 of the oracle)
    agg = ranked.agg(
        F.sum(
            F.col("cp") * (2 * (F.col("smaller") + 1) + F.col("c") - 1)
        )
        .cast("bigint")
        .alias("s2"),
        F.sum("cp").cast("bigint").alias("npos"),
        (F.sum("c") - F.sum("cp")).cast("bigint").alias("nneg"),
    )
    return agg.select(
        "npos", "nneg",
        (F.col("s2") - F.col("npos") * (F.col("npos") + 1)).alias("u_x2"),
        F.expr(
            "(1000000 * (s2 - npos * (npos + 1))) div (2 * npos * nneg)"
        ).alias("auc_ppm"),
    )


# --- scaling-ladder corpus subsets -------------------------------------------

_LADDER = (10, 50, 100, 250, 500, 1000)


@register(
    "corpus_scaling_ladder",
    f"""
    WITH t AS (
        SELECT doc_id,
               {_H60.format(x="'lad:' || CAST(doc_id AS VARCHAR)")} % 1000
                   AS h,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS tok
        FROM documents)
    SELECT f.permille,
           CAST(COUNT(DISTINCT CASE WHEN t.h < f.permille
                                    THEN t.doc_id END) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN t.h < f.permille THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tokens,
           CAST(COUNT(DISTINCT CASE WHEN t.h < f.permille
                                    THEN t.tok END) AS BIGINT) AS vocab
    FROM t CROSS JOIN (SELECT unnest({list(_LADDER)}) AS permille) f
    GROUP BY f.permille
    """,
    doc="Scaling-law data ladder: NESTED corpus subsets at 1%%..100%% by "
        "salted-hash threshold (h < 10 is a strict subset of h < 50, so "
        "every ladder rung trains on a superset of the last — the "
        "prerequisite for clean scaling curves, which independent random "
        "samples violate), reporting docs, token occurrences, and vocab "
        "size per rung. One token explode crossed with the 6-rung "
        "literal; the multi-distinct aggregate expands 6x on the deduped "
        "stream — bounded, and each rung's membership is reproducible "
        "across runs and re-shards (hash, never rand()).",
)
def corpus_scaling_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60, tokens

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select(
        "doc_id",
        (h60(F.concat(F.lit("lad:"), F.col("doc_id").cast("string")))
         % 1000).alias("h"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    f = spark.createDataFrame([(p,) for p in _LADDER], "permille int")
    j = t.crossJoin(F.broadcast(f))
    return j.groupBy("permille").agg(
        F.countDistinct(
            F.when(F.col("h") < F.col("permille"), F.col("doc_id"))
        ).alias("n_docs"),
        F.sum(
            F.when(F.col("h") < F.col("permille"), 1).otherwise(0)
        ).alias("n_tokens"),
        F.countDistinct(
            F.when(F.col("h") < F.col("permille"), F.col("tok"))
        ).alias("vocab"),
    )


# --- content-defined chunking dedup (storage-dedup primitive) ----------------

_CDC_W, _CDC_M = 8, 32

# Corpus with a PREFIX-shifted copy ('zz ' prepended) of every 9th doc: the
# 3-byte shift moves every byte, so fixed-size chunking shares nothing, but
# content-defined boundaries re-align after the edit and the tail chunks
# hash identically — the property this query exists to demonstrate.
_CDC_CORPUS = """
    SELECT doc_id, text FROM documents WHERE length(text) > 0
    UNION ALL
    SELECT doc_id + 200000, 'zz ' || text FROM documents
    WHERE doc_id % 9 = 0 AND length(text) > 0
"""

_CDC_CONV = (
    "list_reduce(list_concat([CAST(0 AS BIGINT)], "
    f"list_transform(range(1, {_CDC_W} + 1), "
    f"j -> bl[p - {_CDC_W} + j] * j)), (a, b) -> a + b)"
)


@register(
    "mm_cdc_chunk_dedup",
    f"""
    WITH c AS ({_CDC_CORPUS}),
    b AS (SELECT doc_id, text,
                 list_transform(range(1, length(text) + 1),
                     i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bl
          FROM c),
    cut AS (SELECT doc_id, text,
                   list_concat(list_concat([CAST(0 AS BIGINT)],
                       list_filter(range({_CDC_W}, length(text)),
                           p -> {_CDC_CONV} % {_CDC_M} = 0)),
                       [CAST(length(text) AS BIGINT)]) AS cuts
            FROM b),
    chunks AS (
        SELECT doc_id,
               substr(text, CAST(cuts[k] + 1 AS INT),
                      CAST(cuts[k + 1] - cuts[k] AS INT)) AS chunk
        FROM cut CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(cuts))) AS k))
    SELECT CAST('0x' || substr(md5(chunk), 1, 15) AS BIGINT) AS chunk_h60,
           CAST(MIN(length(chunk)) AS BIGINT) AS chunk_len,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM chunks
    GROUP BY 1
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    doc="Content-defined chunking dedup (rsync/borg/restic primitive) over "
        "binary payloads: chunks split where a rolling window statistic "
        "hits a target, so boundaries depend only on local content — the "
        "planted PREFIX-shifted copies ('zz ' prepended, every byte "
        "moved) still share every post-edit chunk with their originals, "
        "which fixed-size chunking structurally cannot achieve. Reports "
        "each chunk stored once but referenced by >= 2 documents (the "
        "chunk-store dedup win). Spark side: numpy sliding-window kernel "
        "in mapInPandas (operators/multimodal.content_defined_chunks), "
        "bytes never shuffle; the byte-level DuckDB oracle replays the "
        "identical boundary rule via ord() lists. One hash agg on the "
        "skinny chunk-hash rows.",
)
def mm_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import postgresql_cdc_spark.operators.multimodal as mm

    d = T(spark, sf_dir, "documents").where(F.length("text") > 0)
    shifted = d.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("zz "), F.col("text")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(shifted)
    chunks = mm.content_defined_chunks(
        mm.attach_binary(corpus), window=_CDC_W, mod=_CDC_M
    )
    return (
        chunks.groupBy("chunk_h60")
        .agg(
            F.min("chunk_len").alias("chunk_len"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )


# --- day-over-day rate-change alerts -----------------------------------------

@register(
    "events_rate_change_alerts",
    """
    WITH d AS (SELECT event_type,
                      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                          AS day_num,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    l AS (SELECT event_type, day_num, n,
                 lag(n) OVER (PARTITION BY event_type ORDER BY day_num)
                     AS prev_n
          FROM d)
    SELECT event_type, day_num, n, prev_n,
           CAST((1000 * (n - prev_n)) // prev_n AS BIGINT)
               AS change_permille,
           abs(1000 * (n - prev_n)) // prev_n > 300 AS alert
    FROM l WHERE prev_n IS NOT NULL
    """,
    doc="Day-over-day event-rate change monitor: per (type, day), the "
        "integer per-mille change vs the previous observed day, flagging "
        "swings beyond +/-30% — the pipeline-health alert that catches a "
        "dead producer or a runaway retry loop before downstream metrics "
        "drift. One hash agg to the tiny (type, day) table, then a window "
        "over it (hundreds of rows at any event volume). Integer "
        "arithmetic throughout; floored division keeps both engines "
        "bit-identical on negative changes too.",
)
def events_rate_change_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    d = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint").alias("day_num"),
    ).groupBy("event_type", "day_num").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day_num")
    l = d.withColumn("prev_n", F.lag("n").over(w)).where(
        F.col("prev_n").isNotNull()
    )
    change = F.expr("(1000 * (n - prev_n)) div prev_n")
    return l.select(
        "event_type", "day_num", "n", "prev_n",
        change.alias("change_permille"),
        (F.expr("abs(1000 * (n - prev_n)) div prev_n") > 300).alias("alert"),
    )


# --- embedding class-separability report -------------------------------------

@register(
    "emb_class_separability",
    """
    WITH q AS (SELECT label,
                      unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {'pos': i,
                                'x': CAST(floor(CAST(embedding[i] AS DOUBLE)
                                          * 1000) AS BIGINT)}),
                          recursive := true)
               FROM embeddings WHERE len(embedding) > 0),
    c AS (SELECT label, pos, SUM(x) AS s, COUNT(*) AS n FROM q GROUP BY 1, 2),
    m AS (SELECT label, pos,
                 (s - ((s % n + n) % n)) // n AS mu FROM c)
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(SUM((a.mu - b.mu) * (a.mu - b.mu)) AS BIGINT) AS centroid_l2sq
    FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
    GROUP BY 1, 2
    """,
    doc="Embedding class-separability report: exact integer squared-L2 "
        "between every pair of label centroids (floor-quantized millis, "
        "exact floored-division means — the kmeans recenter trick) — the "
        "embedding-quality screen run before trusting labels for kNN or "
        "linear probes: collapsed centroid pairs predict confusable "
        "classes. Shape: one positional explode + one (label, dim) hash "
        "agg, then the pair join runs on the 10x64-row centroid table — "
        "output is label-pairs, corpus-size independent.",
)
def emb_class_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").where(F.size("embedding") > 0)
    q = e.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, "
                "x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            )
        ).alias("pos0", "x"),
    )
    c = q.groupBy("label", (F.col("pos0") + 1).alias("pos")).agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    m = c.select(
        "label", "pos",
        F.expr("(s - ((s % n + n) % n)) div n").alias("mu"),
    )
    a = m.select(F.col("label").alias("label_a"), "pos",
                 F.col("mu").alias("mu_a"))
    b = m.select(F.col("label").alias("label_b"),
                 F.col("pos").alias("pos_b"), F.col("mu").alias("mu_b"))
    return (
        a.join(b, (a.pos == b.pos_b) & (a.label_a < b.label_b))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                (F.col("mu_a") - F.col("mu_b"))
                * (F.col("mu_a") - F.col("mu_b"))
            ).alias("centroid_l2sq")
        )
    )


# --- hourly latency-style percentile monitoring ------------------------------

@register(
    "events_windowed_percentiles",
    """
    WITH s AS (SELECT event_type,
                      epoch_ms(ts) // 3600000 AS hour_num,
                      CAST(floor(value * 1000000) AS BIGINT) AS vmic
               FROM events)
    SELECT event_type, CAST(hour_num AS BIGINT) AS hour_num,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)
                AS BIGINT) AS p50_micros,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY vmic)
                AS BIGINT) AS p95_micros
    FROM s GROUP BY event_type, hour_num
    """,
    doc="Hourly p50/p95 per event type — the latency-dashboard staple, "
        "computed as EXACT discrete percentiles over floor-quantized "
        "integer micros so both engines agree bit-for-bit (approximate "
        "t-digest sketches are the usual scale answer but are engine-"
        "specific and unverifiable cross-engine; the exact form shuffles "
        "once on (type, hour), whose cardinality — not raw volume — "
        "bounds every group's sort). One hash-partitioned sorted "
        "aggregate; fully parallel across the type x hour grid.",
)
def events_windowed_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    s = ev.select(
        "event_type",
        F.expr("unix_millis(ts) div 3600000").alias("hour_num"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("vmic"),
    )
    return s.groupBy("event_type", "hour_num").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)")
        .cast("bigint").alias("p50_micros"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY vmic)")
        .cast("bigint").alias("p95_micros"),
    )


# --- watermark lateness profile (two-phase distributed prefix-max) -----------

_ARR = _H60.format(x="'arr:' || CAST(event_id AS VARCHAR)")


@register(
    "events_lateness_profile",
    f"""
    WITH o AS (SELECT event_id, {_ARR} AS arr, epoch_ms(ts) AS ts_ms
               FROM events),
    r AS (SELECT arr, event_id, ts_ms,
                 MAX(ts_ms) OVER (ORDER BY arr, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS hwm
          FROM o)
    SELECT CAST(greatest(hwm - ts_ms, 0) // 3600000 AS BIGINT) AS late_hours,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r WHERE hwm IS NOT NULL
    GROUP BY 1
    """,
    doc="Watermark design diagnostic: per event, lateness = (high-water "
        "mark of event time over all EARLIER-ARRIVING events) minus its "
        "own event time, as an hours histogram — read off the p99 to "
        "choose withWatermark() so state stays bounded while dropping "
        "almost nothing. The fixture has no arrival column (event_ids are "
        "time-ordered), so arrival order is modeled as a deterministic "
        "salted-hash shuffle of event_id — same stand-in on both engines. "
        "The running max is a GLOBAL prefix scan, which a single window "
        "funnels through one partition; the Spark side runs the classic "
        "TWO-PHASE distributed scan instead: per-chunk maxima (tiny "
        "table) -> exclusive cumulative max across chunks (window over "
        "|chunks| rows) -> broadcast back and combine with the in-chunk "
        "exclusive running max. Identical result, all heavy stages "
        "partitioned by chunk (contiguous hash ranges, uniform by "
        "construction). The oracle states the naive single window.",
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    ev = EV(spark, sf_dir)
    o = ev.select(
        "event_id", F.unix_millis("ts").alias("ts_ms"),
        h60(F.concat(F.lit("arr:"), F.col("event_id").cast("string")))
        .alias("arr"),
    ).withColumn("chunk", F.expr(f"arr div {2 ** 50}"))
    # phase 1: per-chunk max (tiny table, |chunks| rows)
    cmax = o.groupBy("chunk").agg(F.max("ts_ms").alias("cmax"))
    w_excl = Window.orderBy("chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = cmax.select(
        "chunk", F.max("cmax").over(w_excl).alias("carry_in")
    )
    # phase 2: in-chunk exclusive running max, combined with the carry-in
    w_chunk = (
        Window.partitionBy("chunk")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = (
        o.join(F.broadcast(carry), "chunk")
        .withColumn("in_chunk", F.max("ts_ms").over(w_chunk))
        .select(
            "ts_ms",
            F.when(
                F.col("in_chunk").isNotNull() | F.col("carry_in").isNotNull(),
                F.greatest(
                    F.coalesce("in_chunk", "carry_in"),
                    F.coalesce("carry_in", "in_chunk"),
                ),
            ).alias("hwm"),
        )
    )
    return (
        r.where(F.col("hwm").isNotNull())
        .select(
            F.expr("greatest(hwm - ts_ms, 0L) div 3600000")
            .alias("late_hours")
        )
        .groupBy("late_hours")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
