"""Extension-operator query surface, part 11: exact Mann-Whitney rank-sum
A/B readout, trimmed means, clamped running balances, item-item cosine
recommendations, and a Benford first-digit audit.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only — where a double is unavoidable it is produced by basic
IEEE ops (+,-,*,/,sqrt; all exactly rounded per IEEE-754) in an op-order
written once and shared verbatim between the Spark plan and the DuckDB
oracle; transcendentals (ln/exp/pow) are banned, but spec CONSTANTS
(Benford's log10 proportions) may appear as shared literals. Global
ranks are never a single-partition window: they use the distributed
sort-rank decomposition (value-bucket carry-in + bucket-keyed window)
introduced in events_value_gini.

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


# --- exact Mann-Whitney rank-sum A/B test ------------------------------------

# z = (U - nA*nB/2) / sqrt(nA*nB*(nA+nB+1)/12), the no-tie normal
# approximation, from DOUBLED quantities so every intermediate is exact
# BIGINT until the two divisions and the sqrt (all exactly rounded).
_MWU_Z = (
    "(CAST(u2 AS DOUBLE) / 2.0 - CAST(na * nb AS DOUBLE) / 2.0) "
    "/ sqrt(CAST(na * nb * (na + nb + 1) AS DOUBLE) / 12.0)"
)


@register(
    "events_ab_rank_sum",
    f"""
    WITH outcomes AS (
        SELECT user_id,
               CASE WHEN ({_H60.format(x="'ab:' || CAST(user_id AS VARCHAR)")})
                         % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cents
        FROM events GROUP BY 1),
    ranked AS (
        SELECT arm, cents,
               CAST(2 * RANK() OVER (ORDER BY cents)
                    + COUNT(*) OVER (PARTITION BY cents) - 1 AS BIGINT)
                   AS mid2
        FROM outcomes),
    sums AS (
        SELECT CAST(SUM(CASE WHEN arm = 'A' THEN mid2 END) AS BIGINT) AS r2a,
               CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS na,
               CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS nb
        FROM ranked),
    u AS (SELECT na, nb, r2a - na * (na + 1) AS u2 FROM sums)
    SELECT na, nb, u2, {_MWU_Z} AS z
    FROM u
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) A/B readout on per-user "
        "purchase totals — the nonparametric companion of "
        "events_ab_test_lift (same salted-hash arm assignment), robust "
        "to the heavy-tailed revenue distributions where a mean lift is "
        "whale-driven. Tie-safe EXACT integer ranks: doubled midranks "
        "2*rank + ties - 1 keep the half-integer tie averages in BIGINT, "
        "so U2 = 2*U is exact and engine-comparable; the z-score kernel "
        "(no-tie variance, documented) is shared-source IEEE with one "
        "sqrt. The oracle states the textbook global RANK(); the Spark "
        "plan computes identical midranks WITHOUT a one-partition sort: "
        "per-value counts roll up into value-buckets whose carry-in "
        "cumulates over a tiny bucket table (sort-rank decomposition), "
        "and ties collapse into one arithmetic term per distinct value.",
)
def events_ab_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    outcomes = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (DEC("value", 12, 2) * 100).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("cents")
        )
        .select(
            F.when(
                tx.h60(
                    F.concat(F.lit("ab:"), F.col("user_id").cast("string"))
                )
                % 2
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("arm"),
            "cents",
        )
    )
    # distinct-value rollup: (cents, per-arm counts); ranks follow from
    # counts of strictly-smaller values, never a per-row global window.
    # Skinny and read twice (bucket counts, ranked join): persist so the
    # per-user groupBy upstream never recomputes (dedup.py contract).
    vals = (
        outcomes.groupBy("cents")
        .agg(
            F.count(F.when(F.col("arm") == "A", 1)).alias("ca"),
            F.count(F.lit(1)).alias("c"),
        )
        .withColumn("bkt", F.expr("cents div 10000"))
        .persist()
    )
    bcounts = vals.groupBy("bkt").agg(F.sum("c").alias("bn"))
    # exclusive prefix over the $100-bucket table, stitched TWO-LEVEL
    # (operators/seams.py): the residual unpartitioned window sees only the
    # super-bucket rollup — value-range/8192^2 rows at any range, so no
    # single task holds a table that scales with the data.
    from postgresql_cdc_spark.operators.seams import (
        two_level_exclusive_prefix,
    )

    carry = two_level_exclusive_prefix(
        bcounts, "bkt", {"bn": "carry"}
    ).select("bkt", "carry")
    w_in = Window.partitionBy("bkt").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vals.join(carry, "bkt").withColumn(
        "before", F.col("carry") + F.sum("c").over(w_in) - F.col("c")
    )
    # all `ca` ties of value v share doubled midrank 2*(before+1) + c - 1
    sums = ranked.agg(
        F.sum(
            F.col("ca") * (2 * (F.col("before") + 1) + F.col("c") - 1)
        )
        .cast("bigint")
        .alias("r2a"),
        F.sum("ca").cast("bigint").alias("na"),
        (F.sum("c") - F.sum("ca")).cast("bigint").alias("nb"),
    )
    u = sums.select(
        "na", "nb", (F.col("r2a") - F.col("na") * (F.col("na") + 1)).alias("u2")
    )
    return u.select("na", "nb", "u2", F.expr(_MWU_Z).alias("z"))


# --- trimmed mean ------------------------------------------------------------

@register(
    "stats_trimmed_mean",
    """
    WITH e AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               event_id
        FROM events),
    ranked AS (
        SELECT event_type, cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY cents, event_id) AS BIGINT)
                   AS rk,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM e),
    kept AS (
        SELECT event_type, n, cents
        FROM ranked
        WHERE rk > n * 5 // 100 AND rk <= n - n * 5 // 100)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) AS BIGINT) AS kept_cents,
           CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS trimmed_mean_cents
    FROM kept GROUP BY event_type
    """,
    doc="5%-trimmed mean of event value per type (the robust location "
        "estimate that ignores both whale and dust tails; companion to "
        "events_outliers_iqr/mad): drop the k = floor(n*0.05) smallest "
        "and largest observations by rank, average the rest — sum and "
        "count exact BIGINT, the mean ONE IEEE division. Ranks in the "
        "Spark plan come from the distributed sort-rank decomposition "
        "(value-bucket carry + bucket-keyed window, as events_value_gini) "
        "rather than the oracle's textbook per-type ROW_NUMBER, so no "
        "event_type partition ever funnels a full scan into one task; "
        "rank ties on equal cents are harmless because trimming cuts by "
        "rank COUNT and equal values make cut membership value-"
        "deterministic.",
)
def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "event_type",
        "event_id",
        (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    e = e.withColumn("bkt", F.expr("cents div 1000"))
    # skinny per-(type, $10-bucket) counts, read twice (totals + carry);
    # the fact table itself is deliberately NOT persisted — the second
    # fact scan (agg-then-join-back, as TPC-H q15) is the scale answer.
    bcounts = e.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).alias("bn")
    ).persist()
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = bcounts.groupBy("event_type").agg(
        F.sum("bn").cast("bigint").alias("n")
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
        e.join(carry, ["event_type", "bkt"])
        .join(F.broadcast(totals), "event_type")
        .withColumn(
            "rk",
            (F.col("carry") + F.row_number().over(w_in)).cast("bigint"),
        )
    )
    kept = ranked.where(
        (F.col("rk") > F.expr("n * 5 div 100"))
        & (F.col("rk") <= F.col("n") - F.expr("n * 5 div 100"))
    )
    return kept.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("cents").cast("bigint").alias("kept_cents"),
        (
            F.sum("cents").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("trimmed_mean_cents"),
    )


# --- clamped (floored) running balance ---------------------------------------

@register(
    "events_floored_running_balance",
    """
    WITH e AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
               END AS delta
        FROM events),
    pre AS (
        SELECT user_id, ts_ms, event_id, delta,
               CAST(SUM(delta) OVER (PARTITION BY user_id
                                     ORDER BY ts_ms, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS prefix
        FROM e),
    run AS (
        SELECT user_id, delta, prefix,
               CAST(MIN(prefix) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS runmin,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts_ms DESC, event_id DESC) AS rev
        FROM pre)
    SELECT user_id,
           CAST(MAX(CASE WHEN rev = 1 THEN
                prefix - CASE WHEN runmin < 0 THEN runmin ELSE 0 END END)
                AS BIGINT) AS final_balance,
           CAST(MIN(runmin) AS BIGINT) AS min_prefix,
           CAST(SUM(CASE WHEN delta < 0 AND prefix =
                    CASE WHEN runmin < 0 THEN runmin ELSE 0 END
                    AND prefix <= 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_floor_hits,
           COUNT(*) AS n_events
    FROM run GROUP BY user_id
    """,
    doc="Running balance with a FLOOR AT ZERO (prepaid-wallet / inventory "
        "semantics: purchases debit, other activity credits, and the "
        "balance can never go negative) — the textbook example of a "
        "clamped prefix scan that looks inherently sequential. The "
        "scalable identity: with a floor-only clamp, "
        "balance_i = prefix_i - min(0, running_min(prefix_i)) — the "
        "clamp lifts the series by its worst historical deficit — so "
        "TWO ordinary user-keyed cumulative windows replace any "
        "row-at-a-time state machine, exactly (all BIGINT cents). A "
        "floor HIT is a debit row whose prefix touches the current "
        "waterline while non-positive; the per-user rollup reports "
        "final clamped balance, deepest deficit, hit count.",
)
def events_floored_running_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cents = (DEC("value", 12, 2) * 100).cast("bigint")
    e = EV(spark, sf_dir).select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_id",
        F.when(F.col("event_type") == "purchase", -cents)
        .otherwise(cents)
        .alias("delta"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rev = Window.partitionBy("user_id").orderBy(
        F.desc("ts_ms"), F.desc("event_id")
    )
    run = (
        e.withColumn("prefix", F.sum("delta").over(w).cast("bigint"))
        .withColumn("runmin", F.min("prefix").over(w).cast("bigint"))
        .withColumn("rev", F.row_number().over(w_rev))
    )
    waterline = F.when(F.col("runmin") < 0, F.col("runmin")).otherwise(0)
    return run.groupBy("user_id").agg(
        F.max(
            F.when(F.col("rev") == 1, F.col("prefix") - waterline)
        )
        .cast("bigint")
        .alias("final_balance"),
        F.min("runmin").cast("bigint").alias("min_prefix"),
        F.sum(
            F.when(
                (F.col("delta") < 0)
                & (F.col("prefix") == waterline)
                & (F.col("prefix") <= 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_floor_hits"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- item-item cosine recommendations ----------------------------------------

# cosine = co / (sqrt(da) * sqrt(db)): three exactly-rounded IEEE ops in
# one shared order.
_COS = (
    "CAST(co AS DOUBLE) / (sqrt(CAST(da AS DOUBLE)) "
    "* sqrt(CAST(db AS DOUBLE)))"
)


@register(
    "rec_item_item_cosine",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS d
            FROM b GROUP BY 1),
    co AS (
        SELECT a.l_partkey AS pa, c.l_partkey AS pb,
               CAST(COUNT(*) AS BIGINT) AS co
        FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                         AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    scored AS (
        SELECT co.pa, co.pb, co.co, x.d AS da, y.d AS db
        FROM co JOIN deg x ON co.pa = x.l_partkey
                JOIN deg y ON co.pb = y.l_partkey),
    ranked AS (
        SELECT pa, pb, co, da, db,
               ROW_NUMBER() OVER (PARTITION BY pa
                                  ORDER BY co DESC, pb) AS rn
        FROM scored)
    SELECT pa, pb, co, CAST(rn AS INT) AS rn, {_COS} AS cosine
    FROM ranked WHERE rn <= 10
    """,
    doc="Item-item collaborative filtering (Sarwar et al. WWW'01, the "
        "Amazon-style 'customers also bought' kernel): parts scored by "
        "the cosine of their order-membership vectors, top-10 neighbors "
        "per item. Differs from basket_part_affinity's lift in both "
        "statistic (degree-normalized cosine, one shared sqrt kernel on "
        "exact counts) and serving shape (per-item ranked neighbor "
        "lists). Scale: the pair fan-out is a self-equi-join on the "
        "basket key, quadratic only in BASKET SIZE (TPC-H orders hold "
        "<= 7 items; a 100-TB run caps oversized baskets the same way "
        "dedup's hot-bucket caps do), co >= 2 prunes the singleton tail "
        "before the degree joins, and the neighbor cut is an item-keyed "
        "top-k window — never a global sort.",
)
def rec_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the deduped basket table feeds THREE consumers (degrees + both sides
    # of the self-join): persist it (dedup.py's posting-list precedent) or
    # the distinct's full shuffle re-runs per consumer; deg is skinny but
    # referenced twice in the same plan, so it gets the same treatment.
    b = (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()
    )
    deg = b.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).persist()
    a = b.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa")
    )
    c = b.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb")
    )
    co = (
        a.join(c, "k")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .where(F.col("co") >= 2)
    )
    scored = (
        co.join(
            deg.select(F.col("l_partkey").alias("pa"), F.col("d").alias("da")),
            "pa",
        ).join(
            deg.select(F.col("l_partkey").alias("pb"), F.col("d").alias("db")),
            "pb",
        )
    )
    w = Window.partitionBy("pa").orderBy(F.desc("co"), F.asc("pb"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select(
            "pa", "pb", "co", F.col("rn").cast("int").alias("rn"),
            F.expr(_COS).alias("cosine"),
        )
    )


# --- Benford first-digit audit -----------------------------------------------

# Benford proportions log10(1 + 1/d) as SPEC LITERALS (shared verbatim;
# computing them would need log10, a transcendental). 15 significant
# digits — well past double round-trip.
_BENFORD = {
    1: "0.301029995663981",
    2: "0.176091259055681",
    3: "0.124938736608300",
    4: "0.096910013008056",
    5: "0.079181246047625",
    6: "0.066946789630613",
    7: "0.057991946977687",
    8: "0.051152522447381",
    9: "0.045757490560675",
}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD.items()
) + " END"
# chi-square term per digit, shared op order: (obs - n*p)^2 / (n*p)
_CHI_TERM = (
    f"(CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE})) "
    f"* (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE})) "
    f"/ (CAST(n AS DOUBLE) * ({_BENFORD_CASE}))"
)


@register(
    "dq_benford_first_digit",
    f"""
    WITH v AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                   * 100 AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit
        FROM orders
        WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) > 0),
    counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs FROM v GROUP BY 1),
    tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM counts)
    SELECT c.digit, c.obs,
           CAST(n AS DOUBLE) * ({_BENFORD_CASE}) AS expected,
           {_CHI_TERM} AS chi2_term
    FROM counts c CROSS JOIN tot
    """,
    doc="Benford's-law first-digit audit of order totals (the classic "
        "fraud/data-fabrication screen): observed leading-digit counts "
        "vs the log10(1+1/d) expectation, with per-digit chi-square "
        "terms. The Benford proportions are SPEC LITERALS shared "
        "verbatim by both engines (computing them would need a "
        "transcendental log; a constant is engine-proof), and each "
        "expected/chi2 value is a fixed-order basic-IEEE kernel over "
        "the exact BIGINT counts. Leading digit = first character of "
        "the integer cents rendering (cents > 0, so no sign/zero "
        "edge). One hash agg to 9 rows + a 1-row total broadcast: "
        "scan-shaped at any scale.",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = (DEC("o_totalprice", 12, 2) * 100).cast("bigint")
    v = (
        T(spark, sf_dir, "orders")
        .where(cents > 0)
        .select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias(
                "digit"
            )
        )
    )
    counts = v.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    tot = counts.agg(F.sum("obs").cast("bigint").alias("n"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "obs",
            F.expr(f"CAST(n AS DOUBLE) * ({_BENFORD_CASE})").alias(
                "expected"
            ),
            F.expr(_CHI_TERM).alias("chi2_term"),
        )
    )
