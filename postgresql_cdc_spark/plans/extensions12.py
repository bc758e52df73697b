"""Extension-operator query surface, part 12: Kolmogorov-Smirnov two-sample
test, chi-square independence, confusion-matrix metrics, deterministic
bootstrap confidence intervals, and higher-order array-function parity.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only — where a double is unavoidable it is produced by basic
IEEE ops (+,-,*,/,sqrt; all exactly rounded per IEEE-754) in an op-order
written once and shared verbatim between the Spark plan and the DuckDB
oracle; transcendentals are banned. Global cumulative ranks use the
distributed sort-rank decomposition (value-bucket carry-in + bucket-keyed
window) introduced in events_value_gini — never a one-partition window
over row-scale data.

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


# --- Kolmogorov-Smirnov two-sample test ---------------------------------------

# KS distance with the division DEFERRED: at each distinct value the scaled
# ECDF gap |cumA*nB - cumB*nA| is exact BIGINT; the statistic divides the
# max once, at the end (one exactly-rounded IEEE op).
_KS = "CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"


@register(
    "stats_ks_two_sample",
    f"""
    WITH outcomes AS (
        SELECT user_id,
               CASE WHEN ({_H60.format(x="'ab:' || CAST(user_id AS VARCHAR)")})
                         % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cents
        FROM events GROUP BY 1),
    vals AS (
        SELECT cents,
               CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS ca,
               CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS cb
        FROM outcomes GROUP BY 1),
    cum AS (
        SELECT cents,
               CAST(SUM(ca) OVER (ORDER BY cents
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER (ORDER BY cents
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
        FROM vals),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb FROM vals),
    diffs AS (
        SELECT cents, abs(cuma * nb - cumb * na) AS dnum
        FROM cum CROSS JOIN tot),
    mx AS (SELECT CAST(MAX(dnum) AS BIGINT) AS d_num FROM diffs)
    SELECT na, nb, d_num,
           CAST((SELECT MIN(cents) FROM diffs WHERE dnum = d_num)
                AS BIGINT) AS at_cents,
           {_KS} AS ks
    FROM tot CROSS JOIN mx
    """,
    doc="Kolmogorov-Smirnov two-sample statistic on per-user purchase "
        "totals between the salted-hash A/B arms — the distribution-"
        "free companion of events_ab_rank_sum (MWU tests location; KS "
        "sees ANY distributional difference, shape included). Exactness "
        "by deferred division: at each distinct value the ECDF gap is "
        "kept as the cross-multiplied BIGINT |cumA*nB - cumB*nA|, so "
        "max-finding involves no floats; D divides once at the end "
        "(shared one-op IEEE kernel), and at_cents reports the smallest "
        "value attaining the max. The oracle states textbook running "
        "sums over the distinct-value table; the Spark plan computes "
        "the same cumulatives WITHOUT a one-partition window via the "
        "value-bucket carry decomposition (events_value_gini).",
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # skinny (one row per distinct cents value) and read three times below
    # (bucket counts, cumulative join, totals): persist per the dedup.py
    # caching contract so the per-user groupBy never recomputes.
    vals = (
        outcomes.groupBy("cents")
        .agg(
            F.count(F.when(F.col("arm") == "A", 1)).cast("bigint").alias("ca"),
            F.count(F.when(F.col("arm") == "B", 1)).cast("bigint").alias("cb"),
        )
        .withColumn("bkt", F.expr("cents div 10000"))
        .persist()
    )
    bcounts = vals.groupBy("bkt").agg(
        F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
    )
    # exclusive prefixes over the $100-bucket table, stitched TWO-LEVEL
    # (operators/seams.py): the residual unpartitioned window sees only the
    # super-bucket rollup — value-range/8192^2 rows at any range.
    from postgresql_cdc_spark.operators.seams import (
        two_level_exclusive_prefix,
    )

    carry = two_level_exclusive_prefix(
        bcounts, "bkt", {"ba": "carrya", "bb": "carryb"}
    ).select("bkt", "carrya", "carryb")
    w_in = Window.partitionBy("bkt").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vals.join(carry, "bkt").select(
        "cents",
        (F.col("carrya") + F.sum("ca").over(w_in)).cast("bigint").alias(
            "cuma"
        ),
        (F.col("carryb") + F.sum("cb").over(w_in)).cast("bigint").alias(
            "cumb"
        ),
    )
    tot = vals.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    # read twice (max, then argmin-at-max): persist the skinny gap table
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
        .alias("dnum"),
    ).persist()
    mx = diffs.agg(F.max("dnum").cast("bigint").alias("d_num"))
    at = (
        diffs.join(F.broadcast(mx), diffs["dnum"] == mx["d_num"])
        .agg(F.min("cents").cast("bigint").alias("at_cents"))
    )
    return (
        tot.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(at))
        .select("na", "nb", "d_num", "at_cents", F.expr(_KS).alias("ks"))
    )


# --- chi-square test of independence ------------------------------------------

# expected count under independence and its chi-square term, one shared
# op order (obs, rt, ct, n all exact BIGINT).
_EXP = "CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)"
_CHI_IND = (
    f"(CAST(obs AS DOUBLE) - ({_EXP})) * (CAST(obs AS DOUBLE) - ({_EXP})) "
    f"/ ({_EXP})"
)


@register(
    "stats_chi2_independence",
    f"""
    WITH obs AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM orders GROUP BY 1, 2),
    rt AS (SELECT o_orderpriority, CAST(SUM(obs) AS BIGINT) AS rt
           FROM obs GROUP BY 1),
    ct AS (SELECT o_orderstatus, CAST(SUM(obs) AS BIGINT) AS ct
           FROM obs GROUP BY 1),
    tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM obs)
    SELECT o.o_orderpriority, o.o_orderstatus, o.obs, rt.rt, ct.ct,
           {_EXP} AS expected, {_CHI_IND} AS chi2_term
    FROM obs o
    JOIN rt USING (o_orderpriority)
    JOIN ct USING (o_orderstatus)
    CROSS JOIN tot
    """,
    doc="Chi-square test of independence between order priority and "
        "order status (the contingency-table screen behind 'does segment "
        "X behave differently' dashboards) — differs from "
        "dq_benford_first_digit's goodness-of-fit in that the expected "
        "counts come from the DATA's own marginal products rt*ct/n, not "
        "a fixed spec distribution. All four inputs to each cell kernel "
        "(obs, row total, column total, grand total) are exact BIGINTs "
        "from one hash aggregate plus two rollups; the expected/chi2 "
        "doubles are a fixed-order shared-IEEE kernel. Plan shape: one "
        "shuffle to the 15-cell table, then broadcast joins of the "
        "5-row/3-row/1-row marginals — scan-bound at any scale.",
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    rt = obs.groupBy("o_orderpriority").agg(
        F.sum("obs").cast("bigint").alias("rt")
    )
    ct = obs.groupBy("o_orderstatus").agg(
        F.sum("obs").cast("bigint").alias("ct")
    )
    tot = obs.agg(F.sum("obs").cast("bigint").alias("n"))
    return (
        obs.join(F.broadcast(rt), "o_orderpriority")
        .join(F.broadcast(ct), "o_orderstatus")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "obs",
            "rt",
            "ct",
            F.expr(_EXP).alias("expected"),
            F.expr(_CHI_IND).alias("chi2_term"),
        )
    )


# --- confusion-matrix metrics --------------------------------------------------

# precision/recall/F1/accuracy/MCC over exact BIGINT cell counts, each a
# fixed-order shared-IEEE kernel. F1 uses the algebraic single-division
# form 2tp/(2tp+fp+fn) so there is exactly one op order to share. MCC
# casts each factor to double BEFORE multiplying (the 4-way product of
# marginals overflows BIGINT long before the scan does).
_PREC = "CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)"
_REC = "CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)"
_F1 = (
    "2.0 * CAST(tp AS DOUBLE) "
    "/ (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE))"
)
_ACC = "CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)"
_MCC = (
    "(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) "
    "- CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) "
    "/ sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE) "
    "* CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))"
)


@register(
    "eval_confusion_metrics",
    f"""
    WITH scored AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS label,
               CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) >= 15000000 THEN 1 ELSE 0 END AS pred
        FROM orders),
    cm AS (
        SELECT
            CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
            CAST(SUM(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
            CAST(SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn,
            CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tn
        FROM scored)
    SELECT tp, fp, fn, tn,
           {_PREC} AS precision_, {_REC} AS recall_,
           {_F1} AS f1, {_ACC} AS accuracy, {_MCC} AS mcc
    FROM cm
    """,
    doc="Binary-classifier evaluation from a confusion matrix (the "
        "threshold-metric companion of eval_auc_exact's ranking metric): "
        "label = order priority is urgent/high, prediction = total >= "
        "$150k, cells TP/FP/FN/TN as exact BIGINTs from ONE conditional "
        "aggregate over the scan — no join, no shuffle beyond the final "
        "1-row reduce. Precision/recall/accuracy are one-division "
        "kernels; F1 uses the single-division algebraic form "
        "2tp/(2tp+fp+fn); MCC's marginal product is computed in doubles "
        "factor-by-factor in a fixed shared order (the BIGINT product "
        "would overflow at warehouse scale). Column names precision_/"
        "recall_ avoid reserved-word friction in both engines.",
)
def eval_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("label"),
        F.when(
            (DEC("o_totalprice", 12, 2) * 100).cast("bigint") >= 15000000, 1
        )
        .otherwise(0)
        .alias("pred"),
    )
    cm = o.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(_PREC).alias("precision_"),
        F.expr(_REC).alias("recall_"),
        F.expr(_F1).alias("f1"),
        F.expr(_ACC).alias("accuracy"),
        F.expr(_MCC).alias("mcc"),
    )


# --- deterministic bootstrap confidence interval --------------------------------

_BOOT_MEAN = "CAST(s AS DOUBLE) / CAST(c AS DOUBLE)"


@register(
    "stats_bootstrap_ci",
    f"""
    WITH e AS (
        SELECT event_type,
               ({_H60.format(x="'bs:' || CAST(event_id AS VARCHAR)")}) AS h,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    reps AS (
        SELECT e.event_type, r.b,
               CAST(SUM(e.cents) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM e CROSS JOIN range(32) r(b)
        WHERE (e.h >> r.b) % 2 = 0
        GROUP BY 1, 2),
    means AS (SELECT event_type, {_BOOT_MEAN} AS m FROM reps),
    full_ AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM e GROUP BY 1)
    SELECT f.event_type, f.n,
           CAST(f.s AS DOUBLE) / CAST(f.n AS DOUBLE) AS mean_cents,
           percentile_disc(0.05) WITHIN GROUP (ORDER BY m.m) AS boot_lo,
           percentile_disc(0.95) WITHIN GROUP (ORDER BY m.m) AS boot_hi,
           CAST(COUNT(*) AS BIGINT) AS n_reps
    FROM full_ f JOIN means m USING (event_type)
    GROUP BY f.event_type, f.n, f.s
    """,
    doc="Deterministic half-sample bootstrap CI for the mean event value "
        "per type: 32 replicates, replicate b keeping a row iff BIT b of "
        "the row's single salted hash h60('bs:'||event_id) is zero — the "
        "same salted-hash determinism as the A/B assignments, so both "
        "engines draw IDENTICAL resamples with no RNG to disagree on, "
        "and ONE md5 per event serves all 32 replicates (an md5 per "
        "(event, replicate) would be 32x the hashing, the dominant cost "
        "at warehouse scale; bits of one 60-bit hash are independent "
        "fair coins for this purpose). Each replicate mean is one IEEE "
        "division of exact BIGINT sum/count; the CI bounds are "
        "PERCENTILE_DISC order statistics over the 32 means (selected "
        "elements, not interpolations, hence engine-exact). Scale shape: "
        "the 32x fan-out is a flatMap before the hash aggregate — "
        "map-side combine absorbs it, state is 32 rows per (type, "
        "replicate), and no window or sort touches row-scale data. The "
        "textbook with-replacement bootstrap needs Poisson "
        "multiplicities; half-sampling (Kleiner et al.'s b-of-n idea) "
        "keeps membership a pure hash predicate. Bit test spelled "
        "(h >> b) % 2 / shiftright(h, b) % 2 — integer-exact in both "
        "engines, no shared-IEEE concern.",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "event_type",
        tx.h60(
            F.concat(F.lit("bs:"), F.col("event_id").cast("string"))
        ).alias("h"),
        (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    reps = (
        e.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31))))
        .where(F.expr("shiftright(h, b) % 2") == 0)
        .groupBy("event_type", "b")
        .agg(
            F.sum("cents").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )
    means = reps.select("event_type", F.expr(_BOOT_MEAN).alias("m"))
    full = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    return (
        full.join(means, "event_type")
        .groupBy("event_type", "n", "s")
        .agg(
            F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY m)")
            .alias("boot_lo"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY m)")
            .alias("boot_hi"),
            F.count(F.lit(1)).cast("bigint").alias("n_reps"),
        )
        .select(
            "event_type",
            "n",
            (F.col("s").cast("double") / F.col("n").cast("double"))
            .alias("mean_cents"),
            "boot_lo",
            "boot_hi",
            "n_reps",
        )
    )


# --- higher-order array functions ----------------------------------------------

@register(
    "scalar_higher_order_funcs",
    """
    WITH q AS (
        SELECT l_orderkey,
               CAST(CAST(l_quantity AS DECIMAL(12,4)) AS BIGINT) AS qty
        FROM lineitem),
    arrs AS (
        SELECT l_orderkey, list_sort(list(qty)) AS arr
        FROM q GROUP BY 1)
    SELECT l_orderkey,
           array_to_string(arr, ',') AS arr_csv,
           CAST(len(arr) AS INTEGER) AS arr_n,
           array_to_string(list_transform(arr, x -> x * 2 + 1), ',')
               AS doubled_csv,
           COALESCE(array_to_string(list_filter(arr, x -> x > 25), ','), '')
               AS big_csv,
           CAST(len(list_filter(arr, x -> x > 25)) AS INTEGER) AS big_n,
           CAST(list_sum(arr) AS BIGINT) AS total,
           len(list_filter(arr, x -> x > 45)) > 0 AS anybig,
           len(list_filter(arr, x -> x <= 0)) = 0 AS allpos,
           array_to_string(list_transform(range(1, len(arr) + 1),
                          i -> arr[i] + arr[len(arr) + 1 - i]), ',') AS zsum_csv
    FROM arrs
    """,
    doc="Higher-order array-function parity sweep — the lambda surface "
        "(transform / filter / aggregate-reduce / exists / forall / "
        "zip_with) exercised end-to-end on per-order quantity arrays, "
        "complementing scalar_array_setops' value-level operators. "
        "Arrays are sort_array(collect_list(...)) so the nondeterministic "
        "collect order never reaches the output; quantities pass through "
        "exact decimal to BIGINT so every lambda is integer arithmetic. "
        "Output scalarization (r11): every array result is emitted as a "
        "canonical array_join CSV plus a size column — the driver's pandas "
        "canonicalizer sorts values and cannot hash raw lists, so raw "
        "array/map output columns are banned repo-wide "
        "(tests/test_plan_shapes.py output-schema sweep); the lambda "
        "surface under test is unchanged, only the final projection "
        "scalarizes. DuckDB's array_to_string returns NULL on an empty "
        "list where Spark's array_join returns '' — the oracle COALESCEs "
        "the one filter output that can be empty. "
        "Engine mapping notes: Spark exists/forall become length-of-"
        "filter predicates in DuckDB, zip_with(arr, reverse(arr), +) "
        "becomes an index-lambda over range(1, n+1) against DuckDB's "
        "1-indexed lists, and DuckDB's HUGEINT list_sum is cast back to "
        "BIGINT. Plan shape: one hash aggregate builds the arrays; every "
        "lambda then runs element-wise in the same projection — no "
        "further shuffle, codegen-friendly, array length bounded by "
        "order size (TPC-H <= 7).",
)
def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", DEC("l_quantity", 12, 4).cast("bigint").alias("qty")
    )
    arrs = q.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("qty")).alias("arr")
    )
    big = F.filter("arr", lambda x: x > 25)
    return arrs.select(
        "l_orderkey",
        F.array_join("arr", ",").alias("arr_csv"),
        F.size("arr").alias("arr_n"),
        F.array_join(
            F.transform("arr", lambda x: x * 2 + 1), ","
        ).alias("doubled_csv"),
        F.array_join(big, ",").alias("big_csv"),
        F.size(big).alias("big_n"),
        F.aggregate(
            "arr", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("total"),
        F.exists("arr", lambda x: x > 45).alias("anybig"),
        F.forall("arr", lambda x: x > 0).alias("allpos"),
        F.array_join(
            F.expr("zip_with(arr, reverse(arr), (a, b) -> a + b)"), ","
        ).alias("zsum_csv"),
    )
