"""Extension-operator query surface, part 9: MATCH_RECOGNIZE-style event
sequence matching, weighted priority sampling, gap-fill with linear
interpolation, leave-one-out target encoding, and sweep-line peak
concurrency.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only — where a double is unavoidable it is produced by IEEE
basic ops (+,-,*,/) in an op-order written once and shared verbatim
between the Spark plan and the DuckDB oracle (basic IEEE-754 ops are
exactly rounded, so identical operand order gives bit-identical
results on both engines; transcendentals like pow/ln are banned because
libm implementations differ in the last bits). Blocked equi-joins,
windows, and hash-aggs only; every window is key-partitioned except the
two explicitly bounded tiny-table scans documented inline.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2); these extend the warehouse surface a CDC consumer
builds on top of replicated tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.operators import text as tx
from postgresql_cdc_spark.plans.common import (
    DEC,
    EV,
    SESSIONIZED_EVENTS_CTE,
    T,
    sessionized_events,
)
from postgresql_cdc_spark.plans.registry import register

_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# --- MATCH_RECOGNIZE-style sequence matching ---------------------------------

# Browse-to-buy run: a view, then any noise of clicks/errors, closed by a
# purchase. The character classes are DISJOINT from the terminator 'p' on
# purpose: with disjoint classes the greedy match is unique, so Java-regex
# (Spark, backtracking leftmost-first) and RE2 (DuckDB, leftmost-longest)
# provably agree — the one regex-engine divergence class this query could
# otherwise hit. Event types map to their (unique) first letters:
# signup->s, error->e, click->c, view->v, purchase->p.
_SEQ_PAT = "v[ce]*p"


@register(
    "events_sequence_match",
    f"""
    WITH {SESSIONIZED_EVENTS_CTE},
    typed AS (
        SELECT s.user_id, s.session_id, s.ts_ms, s.event_id,
               substr(e.event_type, 1, 1) AS ch
        FROM sessions s JOIN events e USING (event_id)),
    seqs AS (
        SELECT user_id, session_id,
               string_agg(ch, '' ORDER BY ts_ms, event_id) AS seq
        FROM typed GROUP BY user_id, session_id)
    SELECT user_id, session_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, '{_SEQ_PAT}')) AS BIGINT)
               AS n_matches,
           regexp_extract(seq, '{_SEQ_PAT}', 0) AS first_match
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{_SEQ_PAT}')) > 0
    """,
    doc="MATCH_RECOGNIZE emulation (SQL:2016 row-pattern matching, which "
        "Spark lacks): per session, encode the event-type sequence as a "
        "character string in deterministic (ts, event_id) order and run "
        "the row-pattern as a regex — here `view (click|error)* purchase`"
        ", reporting match count and the first matched run. The encode-"
        "then-regex rewrite is the standard scalable emulation: one "
        "session-keyed ordered aggregation (the sequence string is "
        "bounded by session length, not table size) and a per-row regex "
        "— no self-joins, no per-event state machine. Pattern classes "
        "are kept disjoint from the terminator so backtracking (Java) "
        "and leftmost-longest (RE2) regex semantics provably coincide.",
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = sessionized_events(spark, sf_dir)
    ty = EV(spark, sf_dir).select(
        "event_id", F.substring("event_type", 1, 1).alias("ch")
    )
    j = se.join(ty, "event_id")
    seqs = j.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_ms", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq")
    )
    n = F.regexp_count(F.col("seq"), F.lit(_SEQ_PAT))
    return (
        seqs.select(
            "user_id",
            "session_id",
            F.length("seq").cast("bigint").alias("seq_len"),
            n.cast("bigint").alias("n_matches"),
            F.regexp_extract("seq", _SEQ_PAT, 0).alias("first_match"),
        )
        .where(F.col("n_matches") > 0)
    )


# --- weighted priority sampling ----------------------------------------------

@register(
    "sample_weighted_priority",
    f"""
    WITH keyed AS (
        SELECT event_type, event_id, value,
               ({_H60.format(x="'prio:' || CAST(event_id AS VARCHAR)")} + 1)
                   / CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                          AS DOUBLE) AS skey
        FROM events
        WHERE CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) > 0),
    ranked AS (
        SELECT event_type, event_id, value, skey,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY skey, event_id) AS rn
        FROM keyed)
    SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id, value
    FROM ranked WHERE rn <= 20
    """,
    doc="Weighted sampling without replacement via PRIORITY SAMPLING "
        "(Duffield-Lund-Thorup, JACM'07): per stratum keep the k rows "
        "minimizing u/w, u a salted portable 60-bit hash of the stable "
        "row id, w the row weight in exact cents. Unlike the uniform "
        "per-group reservoir (sample_reservoir_per_group), inclusion "
        "probability scales with weight, and the estimator it induces "
        "is unbiased for subset sums. The sort key is ONE IEEE division "
        "of exact integers — deterministic and bit-identical across "
        "engines, no pow()/ln() (classic A-ES exponential keys would "
        "hit libm last-bit divergence); zero-weight rows are excluded "
        "(they can never be sampled). One per-row projection + one "
        "stratum-keyed top-k window: scan-speed at any scale, and the "
        "selection commutes with re-sharding because the key depends "
        "only on row identity.",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir)
    w_cents = (DEC("value", 12, 2) * 100).cast("bigint")
    h = tx.h60(F.concat(F.lit("prio:"), F.col("event_id").cast("string")))
    keyed = e.select(
        "event_type",
        "event_id",
        "value",
        ((h + F.lit(1)) / w_cents.cast("double")).alias("skey"),
        w_cents.alias("w_cents"),
    ).where(F.col("w_cents") > 0)
    w = Window.partitionBy("event_type").orderBy("skey", "event_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select(
            "event_type", F.col("rn").cast("bigint").alias("rn"),
            "event_id", "value",
        )
    )


# --- gap-fill with linear interpolation --------------------------------------

# Interpolated value in MICRO-dollars, computed entirely in BIGINT
# arithmetic with one integer floor division — no doubles anywhere, so no
# round() half-boundary can diverge between engines (a 6-dp double round
# hit exactly that on the first run: 65.4046875 rounds differently under
# Spark's BigDecimal HALF_UP vs DuckDB's float-multiply round). The
# rational midpoint (prev*(gap-off) + next*off)/gap is scaled to micros
# BEFORE the division; all quantities are non-negative so floor == trunc
# and Spark's `div` matches DuckDB's `//`.
_INTERP_MICROS = (
    "(prev_c * ((next_hr - prev_hr) - (hr - prev_hr)) "
    "+ next_c * (hr - prev_hr)) * 10000 {div} (next_hr - prev_hr)"
)


@register(
    "events_gapfill_interpolate",
    f"""
    WITH hourly AS (
        SELECT user_id, epoch_ms(ts) // 3600000 AS hr,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS hr_cents
        FROM events GROUP BY 1, 2),
    span AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
             FROM hourly GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr
             FROM span),
    j AS (SELECT g.user_id, g.hr, h.hr_cents
          FROM grid g LEFT JOIN hourly h USING (user_id, hr)),
    f AS (SELECT user_id, hr, hr_cents,
            LAST_VALUE(hr_cents IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY hr
               ROWS UNBOUNDED PRECEDING) AS prev_c,
            LAST_VALUE(CASE WHEN hr_cents IS NOT NULL THEN hr END
                       IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY hr
               ROWS UNBOUNDED PRECEDING) AS prev_hr,
            FIRST_VALUE(hr_cents IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
            FIRST_VALUE(CASE WHEN hr_cents IS NOT NULL THEN hr END
                        IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_hr
          FROM j)
    SELECT user_id, hr,
           CAST(CASE WHEN hr_cents IS NOT NULL
                THEN hr_cents * 10000
                ELSE {_INTERP_MICROS.format(div="//")} END AS BIGINT)
               AS val_micros,
           CAST(CASE WHEN hr_cents IS NULL THEN 1 ELSE 0 END AS INT)
               AS is_gap
    FROM f
    """,
    doc="Hypertable gap-fill with LINEAR INTERPOLATION (TimescaleDB "
        "time_bucket_gapfill + interpolate(); the companion of "
        "events_gapfill_locf's carry-forward): per-user HOURLY buckets "
        "over the observed span, missing hours filled by the straight "
        "line between the neighboring observed buckets. Bucket sums are "
        "exact cents and the interpolation is pure BIGINT arithmetic "
        "emitted in micro-dollars (one integer floor division — no "
        "double round() boundary to diverge between engines). "
        "Grid = sequence-explode of per-user [min,max] hour (never a "
        "calendar cross-join); fills = the same two ignore-nulls window "
        "passes as LOCF, all partitioned by user — no global window, "
        "no shuffle beyond the user-key exchange, linear at any scale. "
        "Interior gaps always have both neighbors by construction.",
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id",
        F.expr("unix_millis(ts) div 3600000").alias("hr"),
        (DEC("value", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    hourly = e.groupBy("user_id", "hr").agg(
        F.sum("cents").alias("hr_cents")
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    j = grid.join(hourly, ["user_id", "hr"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("hr_cents").isNotNull(), F.col("hr"))
    f = j.select(
        "user_id",
        "hr",
        "hr_cents",
        F.last("hr_cents", ignorenulls=True).over(wp).alias("prev_c"),
        F.last(obs_hr, ignorenulls=True).over(wp).alias("prev_hr"),
        F.first("hr_cents", ignorenulls=True).over(wn).alias("next_c"),
        F.first(obs_hr, ignorenulls=True).over(wn).alias("next_hr"),
    )
    return f.select(
        "user_id",
        "hr",
        F.when(F.col("hr_cents").isNotNull(), F.col("hr_cents") * 10000)
        .otherwise(F.expr(_INTERP_MICROS.format(div="div")))
        .cast("bigint")
        .alias("val_micros"),
        F.when(F.col("hr_cents").isNull(), 1).otherwise(0)
        .cast("int")
        .alias("is_gap"),
    )


# --- leave-one-out target encoding -------------------------------------------

# Shared-source encoder arithmetic (basic IEEE ops, identical order both
# engines). Smoothing m=10 rows of the global mean; leave-one-out removes
# the row's own target so the feature leaks nothing about its own label.
_ENC = (
    "round(((sum_c - cents) + 10.0 * (CAST(tot_c AS DOUBLE) "
    "/ CAST(tot_n AS DOUBLE))) "
    "/ (CAST(cnt_c AS DOUBLE) - 1.0 + 10.0) / 100.0, 6)"
)


@register(
    "feat_target_encoding",
    f"""
    WITH o AS (SELECT o_orderkey, o_orderpriority,
                      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT) AS cents
               FROM orders),
    bycat AS (SELECT o_orderpriority,
                     CAST(SUM(cents) AS BIGINT) AS sum_c,
                     COUNT(*) AS cnt_c
              FROM o GROUP BY 1),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot_c,
                   COUNT(*) AS tot_n FROM o)
    SELECT o.o_orderkey, o.o_orderpriority, {_ENC} AS enc
    FROM o JOIN bycat USING (o_orderpriority) CROSS JOIN tot
    """,
    doc="Leave-one-out target encoding with additive smoothing (the "
        "standard high-cardinality categorical feature for tabular "
        "training sets): encode o_orderpriority by the mean order value "
        "of the OTHER rows in the category, shrunk toward the global "
        "mean by m=10 pseudo-rows — LOO prevents the row's own label "
        "leaking into its feature, smoothing keeps rare categories from "
        "memorizing. Sums are exact cents; the encoder is one shared-"
        "source IEEE kernel. Scale shape: category stats via map-side "
        "partial agg to a TINY table, broadcast back (never a window "
        "over 5 category partitions, which would crush a 100-TB scan "
        "into 5 tasks); the global mean is a 1-row broadcast cross "
        "join. Per-row cost after the broadcasts; zero wide shuffles.",
)
def feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (DEC("o_totalprice", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    bycat = o.groupBy("o_orderpriority").agg(
        F.sum("cents").cast("bigint").alias("sum_c"),
        F.count(F.lit(1)).alias("cnt_c"),
    )
    tot = o.agg(
        F.sum("cents").cast("bigint").alias("tot_c"),
        F.count(F.lit(1)).alias("tot_n"),
    )
    return (
        o.join(F.broadcast(bycat), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey", "o_orderpriority", F.expr(_ENC).alias("enc")
        )
    )


# --- sweep-line peak concurrency ---------------------------------------------

@register(
    "events_peak_concurrency",
    f"""
    WITH {SESSIONIZED_EVENTS_CTE},
    iv AS (SELECT user_id, session_id,
                  min(ts_ms) AS s_ms, max(ts_ms) + 1 AS e_ms
           FROM sessions GROUP BY 1, 2),
    cp AS (SELECT s_ms AS ms, 1 AS delta FROM iv
           UNION ALL
           SELECT e_ms AS ms, -1 AS delta FROM iv),
    net AS (SELECT ms, CAST(SUM(delta) AS BIGINT) AS net_d
            FROM cp GROUP BY ms),
    run AS (SELECT ms, ms // 3600000 AS hr,
                   CAST(SUM(net_d) OVER (ORDER BY ms
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
            FROM net)
    SELECT hr, CAST(MAX(conc) AS BIGINT) AS peak,
           COUNT(*) AS n_change_ms
    FROM run GROUP BY hr
    """,
    doc="Sweep-line peak concurrency: how many sessions are open "
        "simultaneously, reported as the per-hour maximum (capacity "
        "planning's load profile; the counting dual of "
        "events_interval_coverage's union length). Sessions become "
        "+1/-1 deltas at start and end+1 (end-inclusive intervals); "
        "deltas are netted per millisecond FIRST, which removes any "
        "intra-timestamp ordering ambiguity, then prefix-summed. The "
        "Spark plan decomposes the global prefix sum the distributed "
        "way (the classic scan decomposition): per-hour running totals "
        "within hour-keyed partitions plus an hour-level carry-in from "
        "the TWO-LEVEL seam stitch (operators/seams.py) over the per-"
        "hour net table, so the only residual unpartitioned window sees "
        "the per-8192-hour rollup — no task scales with the span even "
        "over a century of hours; the DuckDB oracle states the same "
        "semantics as one global cumulative sum. Change points are 2x "
        "sessions, orders of magnitude smaller than events, and every "
        "wide op is keyed.",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    se = sessionized_events(spark, sf_dir)
    iv = se.groupBy("user_id", "session_id").agg(
        F.min("ts_ms").alias("s_ms"),
        (F.max("ts_ms") + 1).alias("e_ms"),
    )
    cp = iv.select(F.col("s_ms").alias("ms"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e_ms").alias("ms"), F.lit(-1).alias("delta"))
    )
    net = cp.groupBy("ms").agg(F.sum("delta").cast("bigint").alias("net_d"))
    net = net.withColumn("hr", F.expr("ms div 3600000"))

    # Distributed prefix sum: (1) per-hour partial running sums stay inside
    # hour-keyed partitions; (2) the carry-in cumulates per-hour nets with
    # the TWO-LEVEL seam stitch (operators/seams.py) — the residual
    # unpartitioned window sees only the per-8192-hour rollup, so no task
    # scales with the span even over a century of hours.
    hour_net = net.groupBy("hr").agg(F.sum("net_d").alias("h_net"))
    from postgresql_cdc_spark.operators.seams import (
        two_level_exclusive_prefix,
    )

    carry = two_level_exclusive_prefix(
        hour_net, "hr", {"h_net": "carry"}
    ).select("hr", "carry")
    w_in_hr = (
        Window.partitionBy("hr")
        .orderBy("ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.join(carry, "hr").select(
        "hr",
        "ms",
        (F.col("carry") + F.sum("net_d").over(w_in_hr)).alias("conc"),
    )
    return run.groupBy("hr").agg(
        F.max("conc").cast("bigint").alias("peak"),
        F.count(F.lit(1)).alias("n_change_ms"),
    )
