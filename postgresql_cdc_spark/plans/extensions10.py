"""Extension-operator query surface, part 10: recursive-hierarchy rollup,
time-weighted averages, group-wise OLS, multi-touch attribution, purged
time-series CV folds, recsys negative sampling, Heaps-law vocabulary
growth, and distributed Gini concentration.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only — where a double is unavoidable it is produced by basic
IEEE ops (+,-,*,/) in an op-order written once and shared verbatim
between the Spark plan and the DuckDB oracle (basic IEEE-754 ops are
exactly rounded, so identical operand order gives bit-identical results
on both engines; transcendentals are banned). Every window is
key-partitioned except the explicitly bounded tiny-table passes
documented inline; both engines' integer division truncates toward zero
(verified: DuckDB ``-7 // 2 = -3``), and all quotients here are
non-negative anyway.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2); these extend the warehouse surface a CDC consumer
builds on top of replicated tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.plans.common import DEC, EV, T
from postgresql_cdc_spark.plans.registry import register

_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "t -> t <> '')"
)


# --- recursive hierarchy rollup ----------------------------------------------

@register(
    "hier_subtree_rollup",
    """
    WITH RECURSIVE p AS (
        SELECT p_partkey AS node,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM part),
    walk AS (
        SELECT node, node AS anc, cents FROM p
        UNION ALL
        SELECT node, anc // 2 AS anc, cents FROM walk WHERE anc > 1)
    SELECT anc, CAST(length(bin(anc)) - 1 AS INT) AS depth,
           COUNT(*) AS n_desc,
           CAST(SUM(cents) AS BIGINT) AS subtree_cents
    FROM walk GROUP BY anc
    """,
    doc="Recursive-CTE emulation (WITH RECURSIVE, which Spark lacks): "
        "subtree rollup over the implicit binary hierarchy parent(k) = "
        "k div 2 on part keys — each node's descendant count and total "
        "retail value, exact cents. The oracle states it as a genuine "
        "recursive walk; the Spark plan exploits that this parent "
        "function makes ancestors CLOSED-FORM (the ancestors of k are "
        "its binary prefixes, i.e. shiftright(k, i) for every i below "
        "bit length), so the unbounded recursion compiles to ONE "
        "explode of a <=2*log2(maxkey)-element array plus one hash agg "
        "— no iteration, no driver loop, scan-shaped at any scale. "
        "Depth is length(bin(anc))-1, identical in both engines (no "
        "float log2 whose last-bit error could mis-floor a power of 2).",
)
def hier_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        (DEC("p_retailprice", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    # ancestors-or-self of k = shiftright(k, i) for i = 0 .. bitlen-1
    walk = p.select(
        F.explode(
            F.expr(
                "transform(sequence(0, length(bin(node)) - 1), "
                "i -> shiftright(node, i))"
            )
        ).alias("anc"),
        "cents",
    )
    return (
        walk.groupBy("anc")
        .agg(
            F.count(F.lit(1)).alias("n_desc"),
            F.sum("cents").cast("bigint").alias("subtree_cents"),
        )
        .select(
            "anc",
            F.expr("CAST(length(bin(anc)) - 1 AS INT)").alias("depth"),
            "n_desc",
            "subtree_cents",
        )
    )


# --- time-weighted average (TWAP) --------------------------------------------

@register(
    "events_twap_daily",
    """
    WITH e AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
               epoch_ms(ts) // 86400000 AS day_idx,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    seg AS (
        SELECT user_id, day_idx, ts_ms, cents,
               LEAD(ts_ms) OVER (PARTITION BY user_id, day_idx
                                 ORDER BY ts_ms, event_id) - ts_ms AS dur
        FROM e),
    agg AS (
        SELECT user_id, day_idx,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(ts_ms) - MIN(ts_ms) AS BIGINT) AS span_ms,
               CAST(SUM(CASE WHEN dur IS NOT NULL THEN cents * dur END)
                    AS BIGINT) AS integral
        FROM seg GROUP BY 1, 2)
    SELECT user_id, day_idx, n_events, span_ms,
           CAST(integral * 1000 // span_ms AS BIGINT) AS twap_millicents
    FROM agg WHERE span_ms > 0
    """,
    doc="Time-weighted average price (TimescaleDB time_weight / kdb+ "
        "twap): per user-day, the step-function (LOCF) integral of the "
        "value series divided by the observed span — the correct average "
        "for irregularly-sampled series where the plain AVG over-weights "
        "bursts. Integral = sum(cents x ms-until-next-event), exact "
        "BIGINT throughout; the quotient is emitted in millicents via "
        "integer division (all quantities non-negative, so trunc == "
        "floor on both engines). One user/day-keyed LEAD window + one "
        "hash agg — the window partition is a user-day, never global, "
        "so the plan is scan-shaped at 100 TB. Single-event days (zero "
        "span) are excluded: a point has no time-weighted mean.",
)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_id",
        F.expr("unix_millis(ts) div 86400000").alias("day_idx"),
        (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id", "day_idx").orderBy("ts_ms", "event_id")
    seg = e.withColumn("dur", F.lead("ts_ms").over(w) - F.col("ts_ms"))
    agg = seg.groupBy("user_id", "day_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("ts_ms") - F.min("ts_ms")).cast("bigint").alias("span_ms"),
        F.sum(
            F.when(F.col("dur").isNotNull(), F.col("cents") * F.col("dur"))
        ).cast("bigint").alias("integral"),
    )
    return agg.where(F.col("span_ms") > 0).select(
        "user_id",
        "day_idx",
        "n_events",
        "span_ms",
        F.expr("CAST(integral * 1000 div span_ms AS BIGINT)").alias(
            "twap_millicents"
        ),
    )


# --- group-wise OLS trend ----------------------------------------------------

# Shared-source slope/intercept kernel: numerator and denominator are exact
# BIGINTs; slope is ONE IEEE division (exactly rounded -> bit-identical);
# intercept is three IEEE ops in one fixed order.
_SLOPE = "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"
_INTERCEPT = (
    "(CAST(sy AS DOUBLE) - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) "
    "* CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"
)


@register(
    "stats_groupwise_ols",
    f"""
    WITH c AS (SELECT c_custkey, c_nationkey FROM customer),
    monthly AS (
        SELECT c.c_nationkey,
               CAST(date_part('year', o.o_orderdate) * 12
                    + date_part('month', o.o_orderdate) - 23940 AS BIGINT)
                   AS x,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders o JOIN c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    sums AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM monthly GROUP BY 1),
    k AS (SELECT c_nationkey, n, sx, sy,
                 n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
          FROM sums)
    SELECT nn.n_name, k.n AS n_months, {_SLOPE} AS slope_cents_per_month,
           {_INTERCEPT} AS intercept_cents
    FROM k JOIN nation nn ON k.c_nationkey = nn.n_nationkey
    WHERE den > 0
    """,
    doc="Group-wise ordinary least squares (regr_slope/regr_intercept, "
        "which Spark lacks as exact-testable builtins): per-nation linear "
        "trend of monthly order revenue. The five sufficient statistics "
        "(n, Sx, Sy, Sxy, Sxx) are EXACT BIGINTs from one hash agg — the "
        "month index is re-based to Jan-1995 so the cross products stay "
        "far from 2^63 even at 100 TB — and the closed-form slope is one "
        "IEEE division of exact integers (exactly rounded => "
        "bit-identical across engines; the intercept kernel's three-op "
        "order is shared verbatim). Two map-side-partial aggs + a "
        "25-row broadcast join to nation names; no windows, no sorts. "
        "Degenerate single-month groups (den = 0) are excluded.",
)
def stats_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 23940)
        .cast("bigint")
        .alias("x"),
        (DEC("o_totalprice", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "x")
        .agg(F.sum("cents").cast("bigint").alias("y"))
    )
    sums = monthly.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    k = sums.select(
        "c_nationkey",
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    nn = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        k.where(F.col("den") > 0)
        .join(F.broadcast(nn), k.c_nationkey == nn.n_nationkey)
        .select(
            "n_name",
            F.col("n").alias("n_months"),
            F.expr(_SLOPE).alias("slope_cents_per_month"),
            F.expr(_INTERCEPT).alias("intercept_cents"),
        )
    )


# --- multi-touch linear attribution ------------------------------------------

@register(
    "events_attribution_linear",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    seg AS (
        SELECT user_id, event_id, ts_ms, event_type, is_p,
               CAST(COALESCE(SUM(is_p) OVER (
                   PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS grp
        FROM e),
    converted AS (
        SELECT DISTINCT user_id, grp FROM seg WHERE is_p = 1),
    touches AS (
        SELECT s.user_id, s.grp, s.event_type,
               ROW_NUMBER() OVER (PARTITION BY s.user_id, s.grp
                                  ORDER BY s.ts_ms, s.event_id) AS tr,
               COUNT(*) OVER (PARTITION BY s.user_id, s.grp) AS t
        FROM seg s JOIN converted c
          ON s.user_id = c.user_id AND s.grp = c.grp
        WHERE s.is_p = 0),
    credited AS (
        SELECT user_id, grp, event_type,
               CAST(1000000 // t
                    + CASE WHEN tr = 1 THEN 1000000 % t ELSE 0 END
                    AS BIGINT) AS credit
        FROM touches),
    per_conv AS (
        SELECT event_type, user_id, grp,
               CAST(SUM(credit) AS BIGINT) AS credit
        FROM credited GROUP BY 1, 2, 3)
    SELECT event_type, CAST(SUM(credit) AS BIGINT) AS micro_credits,
           COUNT(*) AS n_conversions_touched
    FROM per_conv GROUP BY 1
    """,
    doc="Multi-touch LINEAR attribution (the equal-credit companion of "
        "events_attribution_last_touch): each purchase distributes "
        "exactly 1,000,000 micro-credits equally across the touchpoint "
        "events since the user's previous purchase, integer-exactly — "
        "quotient per touch, remainder to the EARLIEST touch, so credits "
        "sum to 1e6 per conversion by construction (float split would "
        "neither sum exactly nor compare across engines). Conversion "
        "segments come from an exclusive-prefix purchase count (purchase "
        "#p and its preceding touches share segment p-1); trailing "
        "touches with no closing purchase drop out via the semi-join "
        "shape on converted segments. All windows are user- or "
        "user-segment-keyed; the final rollup counts conversions per "
        "type from a pre-aggregated per-conversion table — no COUNT "
        "DISTINCT over composite keys. Scan-shaped at any scale.",
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_type",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_p"
        ),
    )
    w_ex = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = e.withColumn(
        "grp",
        F.coalesce(F.sum("is_p").over(w_ex), F.lit(0)).cast("bigint"),
    )
    converted = (
        seg.where(F.col("is_p") == 1).select("user_id", "grp").distinct()
    )
    w_rank = Window.partitionBy("user_id", "grp").orderBy("ts_ms", "event_id")
    w_cnt = Window.partitionBy("user_id", "grp")
    touches = (
        seg.where(F.col("is_p") == 0)
        .join(converted, ["user_id", "grp"])
        .withColumn("tr", F.row_number().over(w_rank))
        .withColumn("t", F.count(F.lit(1)).over(w_cnt))
    )
    credited = touches.select(
        "user_id",
        "grp",
        "event_type",
        (
            F.expr("1000000 div t")
            + F.when(F.col("tr") == 1, F.expr("1000000 % t")).otherwise(0)
        )
        .cast("bigint")
        .alias("credit"),
    )
    per_conv = credited.groupBy("event_type", "user_id", "grp").agg(
        F.sum("credit").cast("bigint").alias("credit")
    )
    return per_conv.groupBy("event_type").agg(
        F.sum("credit").cast("bigint").alias("micro_credits"),
        F.count(F.lit(1)).alias("n_conversions_touched"),
    )


# --- purged time-series CV folds ---------------------------------------------

_EMBARGO_MS = 3600000  # 1 hour


@register(
    "feat_purged_time_folds",
    f"""
    WITH b AS (SELECT min(epoch_ms(ts)) AS t0, max(epoch_ms(ts)) + 1 AS t1
               FROM events),
    e AS (
        SELECT ev.event_id, epoch_ms(ev.ts) AS ts_ms,
               CASE WHEN (epoch_ms(ev.ts) - b.t0) * 5 // (b.t1 - b.t0) > 4
                    THEN 4
                    ELSE (epoch_ms(ev.ts) - b.t0) * 5 // (b.t1 - b.t0)
               END AS fold
        FROM events ev CROSS JOIN b),
    spans AS (
        SELECT fold, min(ts_ms) AS f0, max(ts_ms) AS f1, COUNT(*) AS val_rows
        FROM e GROUP BY 1),
    lab AS (
        SELECT s.fold, e.event_id,
               CASE WHEN e.fold = s.fold THEN 'val'
                    WHEN e.ts_ms >= s.f0 - {_EMBARGO_MS}
                     AND e.ts_ms <= s.f1 + {_EMBARGO_MS} THEN 'purged'
                    ELSE 'train' END AS role
        FROM e CROSS JOIN spans s)
    SELECT fold,
           CAST(COUNT(CASE WHEN role = 'val' THEN 1 END) AS BIGINT)
               AS val_rows,
           CAST(COUNT(CASE WHEN role = 'purged' THEN 1 END) AS BIGINT)
               AS purged_rows,
           CAST(COUNT(CASE WHEN role = 'train' THEN 1 END) AS BIGINT)
               AS train_rows
    FROM lab GROUP BY fold
    """,
    doc="Purged K-fold time-series cross-validation (de Prado's purged "
        "CV, the leakage-safe protocol for temporally-correlated training "
        "data): 5 contiguous equal-TIME-span folds over the event stream; "
        "for each validation fold, training rows within a 1-hour embargo "
        "of the fold's observed span are PURGED (neither train nor val) "
        "so look-ahead correlation can't leak across the boundary. Fold "
        "assignment is closed-form integer arithmetic from the global "
        "[min,max] timestamp pair — a 1-row broadcast, NOT an ntile "
        "window (a global ntile would funnel 100 TB through one "
        "partition); per-fold role labeling is a 5-row broadcast "
        "nested-loop (rows x folds), then one hash agg. The whole plan "
        "is two tiny broadcasts and two scans.",
)
def feat_purged_time_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir).select(
        "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    b = ev.agg(
        F.min("ts_ms").alias("t0"), (F.max("ts_ms") + 1).alias("t1")
    )
    e = ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        "ts_ms",
        F.least(
            F.lit(4),
            F.expr("(ts_ms - t0) * 5 div (t1 - t0)"),
        ).alias("fold"),
    )
    spans = e.groupBy("fold").agg(
        F.min("ts_ms").alias("f0"),
        F.max("ts_ms").alias("f1"),
        F.count(F.lit(1)).alias("val_rows"),
    )
    s = F.broadcast(
        spans.select(
            F.col("fold").alias("s_fold"), "f0", "f1"
        )
    )
    lab = e.crossJoin(s).select(
        F.col("s_fold").alias("fold"),
        F.when(F.col("fold") == F.col("s_fold"), "val")
        .when(
            (F.col("ts_ms") >= F.col("f0") - _EMBARGO_MS)
            & (F.col("ts_ms") <= F.col("f1") + _EMBARGO_MS),
            "purged",
        )
        .otherwise("train")
        .alias("role"),
    )
    return lab.groupBy("fold").agg(
        F.count(F.when(F.col("role") == "val", 1)).cast("bigint").alias(
            "val_rows"
        ),
        F.count(F.when(F.col("role") == "purged", 1)).cast("bigint").alias(
            "purged_rows"
        ),
        F.count(F.when(F.col("role") == "train", 1)).cast("bigint").alias(
            "train_rows"
        ),
    )


# --- recsys negative sampling ------------------------------------------------

@register(
    "feat_negative_sampling",
    f"""
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'),
    np AS (SELECT COUNT(*) AS n_parts FROM part),
    cand AS (
        SELECT p.custkey,
               ({_H60.format(x="'neg:' || CAST(p.custkey AS VARCHAR) || ':' "
                               "|| CAST(p.partkey AS VARCHAR) || ':' "
                               "|| CAST(j AS VARCHAR)")}) % np.n_parts + 1
                   AS partkey
        FROM pos p
        CROSS JOIN (SELECT unnest([1, 2]) AS j)
        CROSS JOIN np),
    negs AS (
        SELECT DISTINCT c.custkey, c.partkey
        FROM cand c ANTI JOIN pos USING (custkey, partkey))
    SELECT custkey, partkey, 1 AS label FROM pos
    UNION ALL
    SELECT custkey, partkey, 0 AS label FROM negs
    """,
    doc="Deterministic negative sampling for implicit-feedback recsys / "
        "contrastive training sets: positives are distinct "
        "(customer, part) purchase pairs from urgent orders; each "
        "positive spawns 2 candidate negatives by a salted portable "
        "60-bit hash mapped onto the part-key range, and candidates that "
        "collide with ANY true positive are removed by an anti-join "
        "(the correctness step naive random sampling skips). The hash "
        "depends only on the (custkey, partkey, j) identity, so the "
        "sample is reproducible under any partitioning and any engine — "
        "per-positive sampling also matches the standard practice of "
        "giving active users proportionally more negatives. Plan: one "
        "equi-join for positives, a 1-row count broadcast, a x2 literal "
        "explode, one hash-distributed anti-join; no windows, no "
        "all-pairs anywhere.",
)
def feat_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    np_ = T(spark, sf_dir, "part").agg(F.count(F.lit(1)).alias("n_parts"))
    h = tx.h60(
        F.concat(
            F.lit("neg:"),
            F.col("custkey").cast("string"),
            F.lit(":"),
            F.col("partkey").cast("string"),
            F.lit(":"),
            F.col("j").cast("string"),
        )
    )
    cand = (
        pos.select(
            "custkey", "partkey", F.explode(F.array(F.lit(1), F.lit(2))).alias("j")
        )
        .crossJoin(F.broadcast(np_))
        .select("custkey", (h % F.col("n_parts") + 1).alias("partkey"))
    )
    negs = cand.join(pos, ["custkey", "partkey"], "left_anti").distinct()
    return pos.select(
        "custkey", "partkey", F.lit(1).alias("label")
    ).unionAll(negs.select("custkey", "partkey", F.lit(0).alias("label")))


# --- Heaps-law vocabulary growth ---------------------------------------------

_LADDER = (32, 64, 128, 256, 512, 1024, 2048, 4096)


@register(
    "text_heaps_law",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    firsts AS (
        SELECT token, CAST(MIN(doc_id) AS BIGINT) AS first_doc
        FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t)
        GROUP BY token),
    dlens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM t),
    ladder AS (SELECT unnest({list(_LADDER)}) AS n_docs),
    lad AS (SELECT n_docs FROM ladder
            WHERE n_docs <= (SELECT MAX(doc_id) + 1 FROM t))
    SELECT l.n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts f
             WHERE f.first_doc < l.n_docs) AS vocab_size,
           (SELECT CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM dlens d
             WHERE d.doc_id < l.n_docs) AS tokens_seen
    FROM lad l
    """,
    doc="Heaps-law vocabulary growth curve (the V(n) ~ K*n^beta "
        "diagnostic used to size tokenizer vocabularies and detect "
        "near-duplicate-inflated corpora): distinct-token count and "
        "total token instances within the first N documents (by doc_id "
        "ingestion order) for a doubling ladder of N. The scalable "
        "rewrite: the cumulative-prefix semantics reduce to each "
        "token's FIRST document id (one hash agg over exploded distinct "
        "tokens) and per-doc token counts — then the ladder is an 8-row "
        "broadcast over those two SMALL aggregates. No global "
        "row-number window over documents (doc_id thresholds stand in "
        "for ranks), no re-scan per ladder step. Ladder rungs beyond "
        "the corpus size are dropped identically in both engines.",
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tx.tokens(F.col("text")).alias("toks")
    )
    firsts = (
        d.select(
            "doc_id", F.explode(F.array_distinct("toks")).alias("token")
        )
        .groupBy("token")
        .agg(F.min("doc_id").cast("bigint").alias("first_doc"))
    )
    dlens = d.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_toks")
    )
    max_doc = d.agg((F.max("doc_id") + 1).alias("n_total"))
    ladder = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(n) for n in _LADDER])
            ).alias("n_docs")
        )
        .crossJoin(F.broadcast(max_doc))
        .where(F.col("n_docs") <= F.col("n_total"))
        .select(F.col("n_docs").cast("bigint").alias("n_docs"))
    )
    vocab = (
        firsts.crossJoin(F.broadcast(ladder))
        .where(F.col("first_doc") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_size"))
    )
    toks_seen = (
        dlens.crossJoin(F.broadcast(ladder))
        .where(F.col("doc_id") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.coalesce(F.sum("n_toks"), F.lit(0)).cast("bigint").alias(
            "tokens_seen"
        ))
    )
    return ladder.join(vocab, "n_docs").join(toks_seen, "n_docs").select(
        "n_docs", "vocab_size", "tokens_seen"
    )


# --- distributed Gini concentration ------------------------------------------

# G = (2*S1 - (n+1)*sy) / (n*sy), S1 = sum of rank*value over ascending
# value order. Exact BIGINT numerator/denominator, ONE IEEE division.
_GINI = "CAST(2 * s1 - (n + 1) * sy AS DOUBLE) / CAST(n * sy AS DOUBLE)"


@register(
    "events_value_gini",
    f"""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    ranked AS (
        SELECT event_type, cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY cents, event_id) AS BIGINT)
                   AS rk
        FROM e),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sy,
               CAST(SUM(rk * cents) AS BIGINT) AS s1
        FROM ranked GROUP BY 1)
    SELECT event_type, n, sy AS sum_cents, {_GINI} AS gini
    FROM sums WHERE sy > 0
    """,
    doc="Gini concentration of event value per event type (whale-"
        "detection / revenue-concentration metric): the rank-formula "
        "Gini G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over "
        "ascending values, exact BIGINT sums then ONE IEEE division. "
        "Rank ties on equal cents are harmless: swapping equal values "
        "between adjacent ranks leaves sum(i*x_i) unchanged, so the "
        "result is deterministic even though the tie order isn't. The "
        "Spark plan does NOT lean on a 5-partition global-ish window "
        "(which would crush a 100-TB scan into one task per type): it "
        "uses the distributed sort-rank decomposition — per-row ranks "
        "come from a window partitioned by (type, $10 value bucket) "
        "plus a per-bucket carry-in cumulated over the tiny "
        "(type x bucket) count table, the same scan decomposition as "
        "events_peak_concurrency. The oracle states the plain global "
        "rank formula; equality of the two IS the test.",
)
def events_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "event_type",
        "event_id",
        (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    # distributed rank: bucket by $10 bands, rank within (type, bucket),
    # add the count of all rows in lower buckets of the same type.
    e = e.withColumn("bkt", F.expr("cents div 1000"))
    bcounts = e.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = bcounts.select(
        "event_type",
        "bkt",
        (F.sum("bn").over(w_carry) - F.col("bn")).alias("carry"),
    )
    w_in = Window.partitionBy("event_type", "bkt").orderBy(
        "cents", "event_id"
    )
    ranked = (
        e.join(F.broadcast(carry), ["event_type", "bkt"])
        .withColumn(
            "rk",
            (F.col("carry") + F.row_number().over(w_in)).cast("bigint"),
        )
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("s1"),
    )
    return sums.where(F.col("sy") > 0).select(
        "event_type", "n", F.col("sy").alias("sum_cents"),
        F.expr(_GINI).alias("gini"),
    )
