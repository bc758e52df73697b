"""Extension-operator query surface, part 8: BFS hop distance on the trade
graph, Pareto-frontier (skyline) selection, interval-union coverage,
equal-frequency quantile binning, seasonal-baseline anomaly detection,
entity-resolution golden records, cohort LTV curves, two-stage PQ-rerank
ANN, ABC revenue classification, C4-style boilerplate removal, session
Markov transitions, Kneser-Ney bigram counts, GDPR erasure-cascade audit,
and seasonal-naive forecast backtesting.

Design rules follow plans/extensions.py: integer/string/decimal-exact
outputs only, so the DuckDB oracle hash-matches exactly; blocked equi-joins,
windows, and hash-aggs only — nothing all-pairs, nothing driver-side beyond
per-round convergence scalars in the bounded graph loop.

Reference parity: the reference implements no analytics operators
(SURVEY.md §2.2); these extend the warehouse surface a CDC consumer builds
on top of replicated tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.common import (
    DEC,
    EV,
    SESSIONIZED_EVENTS_CTE,
    T,
)
from postgresql_cdc_spark.plans.registry import register


# --- BFS hop distance on the nation trade graph ------------------------------

# Undirected trade edges: nation pairs connected by at least one lineitem
# whose customer and supplier sit in different nations. Both engines build
# the identical symmetric directed edge list.
_TRADE_EDGES = """
    SELECT DISTINCT c_nationkey AS s, s_nationkey AS t
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE c_nationkey <> s_nationkey
    UNION
    SELECT DISTINCT s_nationkey AS s, c_nationkey AS t
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE c_nationkey <> s_nationkey
"""


@register(
    "graph_bfs_hops",
    f"""
    WITH RECURSIVE e AS MATERIALIZED ({_TRADE_EDGES}),
    seed AS (SELECT n_nationkey FROM nation
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'AFRICA'),
    walk(id, d) AS (
        SELECT n_nationkey, 0 FROM seed
        UNION
        SELECT e.t, w.d + 1 FROM walk w JOIN e ON e.s = w.id
        WHERE w.d < 11
    )
    SELECT n_name, CAST(MIN(d) AS BIGINT) AS hops
    FROM walk JOIN nation ON id = n_nationkey
    GROUP BY n_name
    """,
    doc="Multi-source BFS: shortest hop count from every AFRICA nation "
        "through the undirected trade graph (nations linked by any "
        "cross-nation lineitem). The missing graph primitive next to "
        "components/PageRank/triangles: reachability radius, supply-chain "
        "blast distance. Implemented as bounded min-distance relaxation "
        "(operators/graph.bfs_hops) — per round ONE equi-join of the "
        "skinny (id, d) table against the edge list plus one min-agg, "
        "both keyed on node id, with localCheckpoint lineage truncation "
        "and a monotonicity-based convergence probe (reached-count + "
        "distance-sum invariant <=> fixpoint, so no join against prior "
        "state). Hops are integers: bit-identical to the oracle's "
        "recursive CTE with the same depth bound. At 100 TB the fact-star "
        "collapses to a <=N^2 nation edge list before any iteration "
        "touches it; rounds = graph diameter, single digits on real "
        "trade topologies.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.graph import bfs_hops

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region")

    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .distinct()
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    seeds = (
        nat.join(
            F.broadcast(reg.where(F.col("r_name") == "AFRICA")),
            nat.n_regionkey == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    dist = bfs_hops(sym, seeds, max_iter=12)
    return (
        dist.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            dist.id == F.col("n_nationkey"),
        )
        .select("n_name", F.col("hops").cast("bigint").alias("hops"))
    )


# --- Pareto frontier (skyline) ----------------------------------------------

@register(
    "skyline_pareto_parts",
    """
    WITH p AS (SELECT p_partkey,
                      CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                           AS BIGINT) AS price_c,
                      CAST(p_size AS BIGINT) AS p_size
               FROM part),
    w AS (SELECT *,
                 max(p_size) OVER (ORDER BY price_c RANGE BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_lt,
                 max(p_size) OVER (ORDER BY price_c RANGE BETWEEN
                     UNBOUNDED PRECEDING AND CURRENT ROW) AS m_le
          FROM p)
    SELECT p_partkey, price_c, p_size
    FROM w
    WHERE (m_lt IS NULL OR m_lt < p_size) AND m_le <= p_size
    """,
    doc="Skyline / Pareto frontier over parts: minimize price, maximize "
        "size — keep exactly the parts no other part dominates (<= price "
        "and >= size with one strict; equal pairs both survive). The "
        "classic multi-objective OLAP operator (Borzsonyi et al., ICDE "
        "2001). 2-D skyline needs no pair join: sort by price and a part "
        "is dominated iff a strictly-cheaper part has >= size (running "
        "max over the open range frame) or a <=-priced part has strictly "
        "greater size (closed frame). Implemented TWO-PHASE for scale: "
        "phase 1 runs the same two range-frame windows PARTITIONED BY a "
        "price band (fully parallel; removing locally-dominated rows can "
        "never change the frontier since dominance is transitive within "
        "<=-price and bands are price ranges), phase 2 runs the exact "
        "global windows on the survivors only — bounded by bands x "
        "distinct sizes (p_size has <=50 values), thousands of rows at "
        "any corpus scale, so the single-partition global sort that makes "
        "naive windowed skylines a 100 TB scale-killer touches a "
        "vanishing survivor set. Price goes through decimal cents so "
        "both engines agree bit-for-bit.",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.frontier import pareto_skyline_2d

    p = T(spark, sf_dir, "part").select(
        "p_partkey",
        (DEC("p_retailprice", 12, 2) * 100).cast("bigint").alias("price_c"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    return pareto_skyline_2d(p, cost="price_c", gain="p_size")


# --- interval-union coverage (gaps-and-islands) ------------------------------

_COVER_MS = 300000  # each event opens a 5-minute presence interval


@register(
    "events_interval_coverage",
    f"""
    WITH iv AS (SELECT user_id, event_id,
                       epoch_ms(ts) AS t0,
                       epoch_ms(ts) + {_COVER_MS} AS t1
                FROM events),
    flagged AS (
        SELECT user_id, event_id, t0, t1,
               CASE WHEN max(t1) OVER (PARTITION BY user_id
                        ORDER BY t0, event_id ROWS BETWEEN
                        UNBOUNDED PRECEDING AND 1 PRECEDING) >= t0
                    THEN 0 ELSE 1 END AS new_island
        FROM iv),
    islands AS (
        SELECT user_id, t0, t1,
               CAST(SUM(new_island) OVER (PARTITION BY user_id
                    ORDER BY t0, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS island
        FROM flagged),
    merged AS (
        SELECT user_id, island, MIN(t0) AS s, MAX(t1) AS e
        FROM islands GROUP BY user_id, island)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(e - s) AS BIGINT) AS covered_ms
    FROM merged GROUP BY user_id
    """,
    doc="Interval-union coverage: each event opens a 5-minute presence "
        "interval; per user, merge overlapping/adjacent intervals and "
        "report merged-interval count and total covered milliseconds — "
        "the billing/SLA/uptime primitive (distinct from sessionization: "
        "union length, not gap-bounded grouping). Gaps-and-islands in one "
        "user-keyed window pass: running max of interval end over the "
        "open ROWS frame marks island starts, a running sum numbers "
        "islands over the SAME (t0, event_id) total order — both windows "
        "must share one total order or tie rows can be absorbed into the "
        "wrong island — and two hash aggs fold islands to per-user totals. Shape: ONE shuffle on user_id; "
        "everything after is partition-local — the island window, both "
        "aggs (map-side combinable). All-integer milliseconds, "
        "bit-identical across engines.",
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.timeseries import (
        interval_union_coverage,
    )

    ev = EV(spark, sf_dir)
    iv = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_millis(ts)").alias("t0"),
        (F.expr("unix_millis(ts)") + _COVER_MS).alias("t1"),
    )
    out = interval_union_coverage(
        iv, key="user_id", t0="t0", t1="t1", order_tiebreak="event_id"
    )
    return out.select(
        "user_id", "n_intervals", F.col("covered").alias("covered_ms")
    )


# --- equal-frequency quantile binning ----------------------------------------

_QB_PROBS = tuple(i / 10 for i in range(1, 10))


@register(
    "feat_quantile_binning",
    f"""
    WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT) AS cents
               FROM orders),
    b AS (SELECT {', '.join(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY cents) AS b{i}"
        for i, p in enumerate(_QB_PROBS, start=1)
    )} FROM o)
    SELECT CAST(({' + '.join(
        f'CAST(cents > b{i} AS INT)' for i in range(1, 10)
    )}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM o CROSS JOIN b
    GROUP BY 1
    """,
    doc="Equal-frequency quantile binning (decile discretization) of order "
        "totals — the standard feature-engineering transform for "
        "gradient-boosted trees and monotone-feature bucketing. Two-phase: "
        "phase 1 computes the 9 interior cut points as EXACT discrete "
        "percentiles over integer cents (one sorted agg to a single row), "
        "phase 2 broadcasts that row and assigns each order its bin by "
        "counting exceeded cuts — a pure projection, no second shuffle "
        "until the per-bin rollup (map-side combinable to 10 rows). "
        "percentile_disc picks an actual data value, so cut points — and "
        "therefore every bin assignment — are bit-identical across "
        "engines, unlike interpolating percentile. The broadcast of a "
        "one-row bounds frame is the same scale shape as the IVF "
        "centroid literals: O(1) data to every executor.",
)
def feat_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        (DEC("o_totalprice", 14, 2) * 100).cast("bigint").alias("cents")
    )
    bounds = o.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY cents)"
            ).alias(f"b{i}")
            for i, p in enumerate(_QB_PROBS, start=1)
        ]
    )
    bin_expr = " + ".join(
        f"CAST(cents > b{i} AS INT)" for i in range(1, 10)
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(F.expr(bin_expr).cast("bigint").alias("bin"), "cents")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# --- seasonal-baseline anomaly detection -------------------------------------

@register(
    "events_seasonal_anomaly",
    """
    WITH s AS (SELECT event_type,
                      epoch_ms(ts) // 3600000 AS hour_num,
                      (epoch_ms(ts) // 3600000) % 168 AS how,
                      CAST(floor(value * 1000000) AS BIGINT) AS vmic
               FROM events),
    hourly AS (SELECT event_type, hour_num, how,
                      percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)
                        AS med_h
               FROM s GROUP BY event_type, hour_num, how),
    base AS (SELECT event_type, how,
                    percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)
                      AS med_b
             FROM s GROUP BY event_type, how),
    mad AS (SELECT s.event_type, s.how,
                   percentile_disc(0.5) WITHIN GROUP
                     (ORDER BY abs(s.vmic - b.med_b)) AS mad_b
            FROM s JOIN base b
              ON s.event_type = b.event_type AND s.how = b.how
            GROUP BY s.event_type, s.how)
    SELECT h.event_type, CAST(h.hour_num AS BIGINT) AS hour_num,
           CAST(h.med_h AS BIGINT) AS med_micros,
           CAST(b.med_b AS BIGINT) AS baseline_micros,
           CAST(m.mad_b AS BIGINT) AS mad_micros
    FROM hourly h
    JOIN base b ON h.event_type = b.event_type AND h.how = b.how
    JOIN mad  m ON h.event_type = m.event_type AND h.how = m.how
    WHERE abs(h.med_h - b.med_b) > 3 * greatest(m.mad_b, 1)
    """,
    doc="Seasonal-baseline anomaly detection: each (event_type, hour) "
        "bucket's median value is compared against the hour-of-week "
        "seasonal baseline (median over every same-slot hour) with a "
        "robust MAD threshold — the monitoring pattern that catches "
        "'this Tuesday 3pm is unlike every other Tuesday 3pm', which "
        "adjacent-bucket rate alerts (events_rate_change_alerts) are "
        "blind to. Hour-of-week comes from pure epoch arithmetic "
        "(engine-neutral, no calendar functions); medians and MAD are "
        "exact discrete percentiles over floor-quantized integer micros, "
        "so both engines agree bit-for-bit. Shape: two grouped sorted "
        "aggs keyed on (type, hour-of-week) — 168 x |types| groups — one "
        "keyed on (type, hour), and a broadcast-size join of the "
        "baseline frame back to hourly rows; no window over raw events.",
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    s = ev.select(
        "event_type",
        F.expr("unix_millis(ts) div 3600000").alias("hour_num"),
        (F.expr("unix_millis(ts) div 3600000") % 168).alias("how"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("vmic"),
    ).persist()
    hourly = s.groupBy("event_type", "hour_num", "how").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)")
        .alias("med_h")
    )
    base = s.groupBy("event_type", "how").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY vmic)")
        .alias("med_b")
    )
    mad = (
        s.join(F.broadcast(base), ["event_type", "how"])
        .select(
            "event_type", "how",
            F.abs(F.col("vmic") - F.col("med_b")).alias("dev"),
        )
        .groupBy("event_type", "how")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)")
            .alias("mad_b")
        )
    )
    return (
        hourly.join(F.broadcast(base), ["event_type", "how"])
        .join(F.broadcast(mad), ["event_type", "how"])
        .where(
            F.abs(F.col("med_h") - F.col("med_b"))
            > 3 * F.greatest(F.col("mad_b"), F.lit(1))
        )
        .select(
            "event_type",
            F.col("hour_num").cast("bigint").alias("hour_num"),
            F.col("med_h").cast("bigint").alias("med_micros"),
            F.col("med_b").cast("bigint").alias("baseline_micros"),
            F.col("mad_b").cast("bigint").alias("mad_micros"),
        )
    )


# --- entity resolution: blocking -> verify -> components -> golden record ----

# Synthetic mention table, identical on both engines: every customer key
# becomes a distinctive 11-char entity name ('E' + 10 md5 hex chars — no
# cross-entity edit-distance-1 collisions, unlike sequential c_name digits),
# every 7th entity gains a substituted mention ('q' never occurs in hex, so
# lev = 1 exactly), every 13th a deleted-character mention (exercises the
# identity-key half of the SymSpell index).
_ER_POS = (
    "(CAST('0x' || substr(md5('erp:' || CAST(c_custkey AS VARCHAR)), 1, 15) "
    "AS BIGINT) % 10) + 2"
)

_ER_MENTIONS = f"""
    SELECT c_custkey AS mid,
           'E' || substr(md5('er:' || CAST(c_custkey AS VARCHAR)), 1, 10)
             AS name
    FROM customer
    UNION ALL
    SELECT c_custkey + 200000,
           substr(nm, 1, p - 1) || 'q' || substr(nm, p + 1, length(nm))
    FROM (SELECT c_custkey,
                 'E' || substr(md5('er:' || CAST(c_custkey AS VARCHAR)), 1, 10)
                   AS nm,
                 CAST({_ER_POS} AS INT) AS p
          FROM customer WHERE c_custkey % 7 = 0)
    UNION ALL
    SELECT c_custkey + 400000,
           substr(nm, 1, p - 1) || substr(nm, p + 1, length(nm))
    FROM (SELECT c_custkey,
                 'E' || substr(md5('er:' || CAST(c_custkey AS VARCHAR)), 1, 10)
                   AS nm,
                 CAST({_ER_POS} AS INT) AS p
          FROM customer WHERE c_custkey % 13 = 0)
"""

_ER_DEL_KEYS = (
    "list_concat([name], "
    "list_transform(range(1, length(name) + 1), "
    "i -> substr(name, 1, i - 1) || substr(name, i + 1, length(name))))"
)


@register(
    "er_golden_record",
    f"""
    WITH RECURSIVE m AS MATERIALIZED ({_ER_MENTIONS}),
    mk AS (SELECT mid, name, unnest({_ER_DEL_KEYS}) AS k FROM m),
    pairs AS MATERIALIZED (
        SELECT DISTINCT a.mid AS ma, b.mid AS mb
        FROM mk a JOIN mk b ON a.k = b.k AND a.mid < b.mid
        WHERE levenshtein(a.name, b.name) <= 1),
    sym AS (SELECT ma AS a, mb AS b FROM pairs
            UNION SELECT mb, ma FROM pairs),
    reach(id, r) AS (
        SELECT DISTINCT a, a FROM sym
        UNION
        SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b),
    lab AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    allm AS (SELECT m.mid, m.name, coalesce(l.comp, m.mid) AS comp
             FROM m LEFT JOIN lab l ON m.mid = l.id),
    g AS (SELECT comp, MIN(mid) AS entity_id,
                 COUNT(*) AS n_mentions,
                 MAX(length(name)) AS mxl
          FROM allm GROUP BY comp)
    SELECT g.entity_id,
           CAST(g.n_mentions AS BIGINT) AS n_mentions,
           MIN(f.name) AS canonical_name
    FROM g JOIN allm f ON f.comp = g.comp AND length(f.name) = g.mxl
    GROUP BY g.entity_id, g.n_mentions
    """,
    doc="End-to-end entity resolution: mentions -> symmetric-delete "
        "blocking (identity + 1-deletion keys, guaranteed recall at edit "
        "distance 1) -> exact levenshtein verify -> connected components "
        "(substituted and deleted mentions of one entity meet only "
        "TRANSITIVELY through the clean mention — pair lists alone are "
        "not entities) -> survivorship golden record per component "
        "(canonical name = longest, ties broken lexicographically; "
        "entity_id = min mention id; singleton mentions are their own "
        "entity via the left join, not dropped). This is the full "
        "master-data-management pipeline assembled from the engine's "
        "linkage + graph primitives. Shape: candidates only ever come "
        "from the deletion-key equi-join (never all-pairs), components "
        "from the bounded dataflow loop, survivorship from two keyed "
        "aggs; every stage hash-partitions on mention/component id.",
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.graph import connected_components
    from postgresql_cdc_spark.operators.text import h60
    from postgresql_cdc_spark.plans.extensions6 import sym_del_keys

    c = T(spark, sf_dir, "customer").select("c_custkey")
    nm = F.concat(
        F.lit("E"),
        F.expr("substr(md5(concat('er:', CAST(c_custkey AS STRING))), 1, 10)"),
    )
    p = (
        (h60(F.concat(F.lit("erp:"), F.col("c_custkey").cast("string"))) % 10)
        + 2
    ).cast("int")
    base = c.select(F.col("c_custkey"), nm.alias("nm"), p.alias("p"))
    clean = base.select(
        F.col("c_custkey").alias("mid"), F.col("nm").alias("name")
    )
    sub = base.where(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + 200000).alias("mid"),
        F.expr(
            "concat(substr(nm, 1, p - 1), 'q', "
            "substr(nm, p + 1, length(nm)))"
        ).alias("name"),
    )
    dele = base.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 400000).alias("mid"),
        F.expr(
            "concat(substr(nm, 1, p - 1), substr(nm, p + 1, length(nm)))"
        ).alias("name"),
    )
    m = clean.unionByName(sub).unionByName(dele).persist()

    mk = m.select("mid", "name", F.explode(sym_del_keys("name")).alias("k"))
    a, b = mk.alias("a"), mk.alias("b")
    pairs = (
        a.join(b, (F.col("a.k") == F.col("b.k"))
               & (F.col("a.mid") < F.col("b.mid")))
        .where(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 1)
        .select(F.col("a.mid").alias("ma"), F.col("b.mid").alias("mb"))
        .distinct()
    )
    lab = connected_components(pairs, src="ma", dst="mb")
    allm = (
        m.join(lab, m.mid == lab.id, "left")
        .select(
            "mid", "name",
            F.coalesce(F.col("component"), F.col("mid")).alias("comp"),
        )
        .persist()
    )
    g = allm.groupBy("comp").agg(
        F.min("mid").alias("entity_id"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.max(F.length("name")).alias("mxl"),
    )
    return (
        g.join(
            allm,
            (g.comp == allm.comp) & (F.length(allm.name) == g.mxl),
        )
        .groupBy("entity_id", "n_mentions")
        .agg(F.min("name").alias("canonical_name"))
        .select(
            "entity_id",
            F.col("n_mentions").cast("bigint").alias("n_mentions"),
            "canonical_name",
        )
    )


# --- cohort LTV curves -------------------------------------------------------

@register(
    "events_cohort_ltv",
    """
    WITH d AS (SELECT user_id, event_type,
                      epoch_ms(ts) // 86400000 AS day_num,
                      CAST(floor(value * 1000000) AS BIGINT) AS vmic
               FROM events),
    first_day AS (SELECT user_id, MIN(day_num) AS cohort_day
                  FROM d GROUP BY user_id),
    purch AS (SELECT f.cohort_day,
                     (d.day_num - f.cohort_day) // 7 AS week_offset,
                     d.user_id, d.vmic
              FROM d JOIN first_day f ON d.user_id = f.user_id
              WHERE d.event_type = 'purchase'),
    wk AS (SELECT cohort_day, week_offset,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
                  CAST(SUM(vmic) AS BIGINT) AS rev_micros
           FROM purch GROUP BY cohort_day, week_offset)
    SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
           CAST(week_offset AS BIGINT) AS week_offset,
           n_buyers, rev_micros,
           CAST(SUM(rev_micros) OVER (PARTITION BY cohort_day
                ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS BIGINT) AS cum_rev_micros
    FROM wk
    """,
    doc="Cohort LTV curves: users cohorted by first-seen day, purchase "
        "revenue rolled up per (cohort, weeks-since-first-seen) with a "
        "running cumulative — the lifetime-value complement of "
        "events_retention_cohorts (which counts presence, not value). "
        "Day/week indices come from pure epoch integer arithmetic and "
        "revenue is floor-quantized micros, so both engines agree "
        "bit-for-bit. Shape: one user-keyed agg for cohort assignment, "
        "one user-keyed join (co-partitioned with it under AQE), one "
        "(cohort, week) hash agg — map-side combinable — and a window "
        "over the tiny rollup, partitioned by cohort (never over raw "
        "events).",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    d = ev.select(
        "user_id", "event_type",
        F.expr("unix_millis(ts) div 86400000").alias("day_num"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("vmic"),
    )
    first_day = d.groupBy("user_id").agg(
        F.min("day_num").alias("cohort_day")
    )
    purch = (
        d.where(F.col("event_type") == "purchase")
        .join(first_day, "user_id")
        .select(
            "cohort_day",
            F.expr("(day_num - cohort_day) div 7").alias("week_offset"),
            "user_id", "vmic",
        )
    )
    wk = purch.groupBy("cohort_day", "week_offset").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_buyers"),
        F.sum("vmic").cast("bigint").alias("rev_micros"),
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return wk.select(
        F.col("cohort_day").cast("bigint").alias("cohort_day"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "n_buyers", "rev_micros",
        F.sum("rev_micros").over(w).cast("bigint").alias("cum_rev_micros"),
    )


# --- two-stage ANN: PQ ADC scan -> exact re-rank -----------------------------

_PQ_SUB8 = 8   # subspaces (matches emb_pq_codes)
_PQ_DIM8 = 8   # dims per subspace
_PQ_K16 = 16   # codewords per subspace
_RERANK_R = 50  # candidates kept from the approximate stage


def _l2q_sql(a: str, b: str, s: str, dim: int) -> str:
    """Integer squared L2 between 1-indexed slices of two quantized lists."""
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"j -> ({a}[{s} * {dim} + j] - {b}[{s} * {dim} + j])"
        f" * ({a}[{s} * {dim} + j] - {b}[{s} * {dim} + j])))"
    )


@register(
    "sim_topk_pq_rerank",
    f"""
    WITH q0 AS (SELECT vec_id,
                       list_transform(embedding,
                           x -> CAST(floor(CAST(x AS DOUBLE) * 1000)
                                     AS BIGINT)) AS qv
                FROM embeddings),
    cb AS (SELECT vec_id AS c, qv AS cv FROM q0
           ORDER BY vec_id LIMIT {_PQ_K16}),
    sub AS (SELECT vec_id, qv, unnest(range(0, {_PQ_SUB8})) AS s FROM q0),
    dists AS (SELECT sub.vec_id, sub.s, cb.c,
                     {_l2q_sql('qv', 'cv', 's', _PQ_DIM8)} AS d
              FROM sub CROSS JOIN cb),
    w AS (SELECT vec_id, s, c, d,
                 MIN(d) OVER (PARTITION BY vec_id, s) AS dmin
          FROM dists),
    codes AS (SELECT vec_id, s, MIN(c) AS code
              FROM w WHERE d = dmin GROUP BY vec_id, s),
    qry AS (SELECT vec_id AS query_id, qv AS qqv FROM q0
            WHERE vec_id % 100 = 0),
    qsub AS (SELECT query_id, qqv, unnest(range(0, {_PQ_SUB8})) AS s
             FROM qry),
    lut AS (SELECT query_id, s, c,
                   {_l2q_sql('qqv', 'cv', 's', _PQ_DIM8)} AS qd
            FROM qsub CROSS JOIN cb),
    approx AS (SELECT l.query_id, cd.vec_id AS neighbor_id,
                      CAST(SUM(l.qd) AS BIGINT) AS approx_l2q
               FROM codes cd
               JOIN lut l ON l.s = cd.s AND l.c = cd.code
               WHERE cd.vec_id <> l.query_id
               GROUP BY l.query_id, cd.vec_id),
    cand AS (SELECT query_id, neighbor_id, approx_l2q,
                    ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY approx_l2q, neighbor_id) AS arank
             FROM approx),
    rr AS (SELECT c.query_id, c.neighbor_id, c.approx_l2q,
                  CAST(list_sum(list_transform(
                      range(1, {_PQ_SUB8 * _PQ_DIM8} + 1),
                      j -> (a.qqv[j] - b.qv[j]) * (a.qqv[j] - b.qv[j])))
                    AS BIGINT) AS exact_l2q
           FROM cand c
           JOIN qry a ON a.query_id = c.query_id
           JOIN q0 b ON b.vec_id = c.neighbor_id
           WHERE c.arank <= {_RERANK_R})
    SELECT query_id, neighbor_id, approx_l2q, exact_l2q,
           CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY exact_l2q, neighbor_id) AS rank
          FROM rr)
    WHERE rank <= 5
    """,
    doc="Two-stage ANN serving (the production IVF-PQ pattern, Jegou et "
        "al. TPAMI'11): stage 1 scans 8-byte PQ codes with an "
        "asymmetric-distance LUT — per query, 16 codeword distances per "
        "subspace are precomputed against the EXACT query subvectors "
        "(queries x 8 x 16 rows, broadcast) so scoring a corpus vector "
        "is 8 table lookups + adds instead of 64 multiplies on raw "
        "floats (the memory-bandwidth win PQ exists for); stage 2 "
        "re-ranks only the top-50 approximate candidates per query with "
        "exact integer squared-L2 and emits the top-5. All arithmetic is "
        "integer-quantized with (distance, id) tie-breaks at BOTH stage "
        "boundaries, so candidate sets and final ranks are bit-identical "
        "across engines. Shape: the ADC scan is a skinny equi-join "
        "(codes x broadcast LUT) + one map-side-combinable agg; the "
        "re-rank joins a bounded candidate list (queries x 50) back to "
        "full vectors by key — raw embeddings are never scored "
        "corpus-wide.",
)
def sim_topk_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = T(spark, sf_dir, "embeddings")
    quant = e.select(
        "vec_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    cb = (
        quant.orderBy("vec_id")
        .limit(_PQ_K16)
        .select(F.col("vec_id").alias("c"), F.col("qv").alias("cv"))
    )
    sub_d = F.expr(
        f"aggregate(zip_with(slice(qv, s * {_PQ_DIM8} + 1, {_PQ_DIM8}), "
        f"slice(cv, s * {_PQ_DIM8} + 1, {_PQ_DIM8}), "
        "(x, y) -> (x - y) * (x - y)), 0L, (a, z) -> a + z)"
    )
    sub = quant.select(
        "vec_id", "qv",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_SUB8 - 1))).alias("s"),
    )
    dists = sub.crossJoin(F.broadcast(cb)).select(
        "vec_id", "s", "c", sub_d.alias("d")
    )
    codes = (
        dists.withColumn(
            "dmin", F.min("d").over(W.partitionBy("vec_id", "s"))
        )
        .where(F.col("d") == F.col("dmin"))
        .groupBy("vec_id", "s")
        .agg(F.min("c").alias("code"))
    )
    qry = quant.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    lut_d = F.expr(
        f"aggregate(zip_with(slice(qqv, s * {_PQ_DIM8} + 1, {_PQ_DIM8}), "
        f"slice(cv, s * {_PQ_DIM8} + 1, {_PQ_DIM8}), "
        "(x, y) -> (x - y) * (x - y)), 0L, (a, z) -> a + z)"
    )
    qsub = qry.select(
        "query_id", "qqv",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_SUB8 - 1))).alias("s"),
    )
    lut = qsub.crossJoin(F.broadcast(cb)).select(
        "query_id", "s", "c", lut_d.alias("qd")
    )
    approx = (
        codes.join(
            F.broadcast(lut),
            (codes.s == lut.s) & (codes.code == lut.c),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd").cast("bigint").alias("approx_l2q"))
    )
    cand = (
        approx.withColumn(
            "arank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("approx_l2q", "vec_id")
            ),
        )
        .where(F.col("arank") <= _RERANK_R)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                "approx_l2q")
    )
    exact_d = F.expr(
        "aggregate(zip_with(qqv, qv, (x, y) -> (x - y) * (x - y)), "
        "0L, (a, z) -> a + z)"
    )
    rr = (
        cand.join(qry, "query_id")
        .join(quant, cand.neighbor_id == quant.vec_id)
        .select(
            "query_id", "neighbor_id", "approx_l2q",
            exact_d.cast("bigint").alias("exact_l2q"),
        )
    )
    return (
        rr.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("exact_l2q", "neighbor_id")
            ),
        )
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "approx_l2q", "exact_l2q",
                F.col("rank").cast("int").alias("rank"))
    )


# --- ABC (Pareto 80/15/5) revenue classification -----------------------------

@register(
    "orders_abc_classification",
    """
    WITH pr AS (SELECT l_partkey,
                       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                                     * 100 AS BIGINT)) AS BIGINT) AS rev_c
                FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS t FROM pr),
    cum AS (SELECT l_partkey, rev_c,
                   CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_c
            FROM pr)
    SELECT CASE WHEN cum_c * 100 <= t * 80 THEN 'A'
                WHEN cum_c * 100 <= t * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS BIGINT) AS class_rev_cents
    FROM cum CROSS JOIN tot
    GROUP BY 1
    """,
    doc="ABC (Pareto 80/15/5) inventory classification: parts ranked by "
        "revenue, class A = parts whose inclusive cumulative revenue "
        "share stays within 80%, B to 95%, C the tail — the classic "
        "inventory-control rollup. The cumulative is a GLOBAL prefix sum "
        "over the ranked part rollup, which a naive window funnels "
        "through one partition; the Spark side runs the TWO-PHASE "
        "distributed scan (same structure as events_lateness_profile's "
        "prefix-max): per-revenue-band totals (tiny) -> exclusive "
        "cumulative across bands -> broadcast carry-in + in-band "
        "inclusive running sum, all heavy stages partitioned by band — "
        "bands are descending-revenue ranges so band order IS rank "
        "order. Thresholds compare cum*100 <= total*k in integer cents "
        "(no division, no floats). The oracle states the naive single "
        "window.",
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = T(spark, sf_dir, "lineitem")
    pr = (
        li.select(
            "l_partkey",
            (DEC("l_extendedprice", 12, 2) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").cast("bigint").alias("rev_c"))
        # band = descending-revenue range, so ascending band order is
        # exactly descending revenue order; in-band ties fall to l_partkey
        .withColumn("band", -F.expr("rev_c div 1000000"))
        .persist()
    )
    tot = pr.agg(F.sum("rev_c").cast("bigint").alias("t"))
    # phase 1: per-band totals (|bands| rows), exclusive running sum
    bsum = pr.groupBy("band").agg(F.sum("rev_c").alias("bsum"))
    w_excl = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    carry = bsum.select(
        "band",
        F.coalesce(F.sum("bsum").over(w_excl), F.lit(0)).alias("carry_in"),
    )
    # phase 2: in-band inclusive running sum + carry-in
    w_band = (
        W.partitionBy("band")
        .orderBy(F.desc("rev_c"), F.asc("l_partkey"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = (
        pr.join(F.broadcast(carry), "band")
        .select(
            "l_partkey", "rev_c",
            (F.col("carry_in") + F.sum("rev_c").over(w_band))
            .cast("bigint")
            .alias("cum_c"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("cum_c") * 100 <= F.col("t") * 80, "A")
            .when(F.col("cum_c") * 100 <= F.col("t") * 95, "B")
            .otherwise("C")
            .alias("abc_class"),
            "rev_c",
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_c").cast("bigint").alias("class_rev_cents"),
        )
    )


# --- cross-document boilerplate removal (C4-style) ---------------------------

_SEG_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


@register(
    "corpus_boilerplate_removal",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' the ') AS arr
               FROM documents),
    seg0 AS (SELECT doc_id,
                    unnest(list_transform(range(1, len(arr) + 1),
                           i -> trim(arr[i]))) AS s
             FROM t),
    seg AS (SELECT doc_id, {_SEG_H60.format(x='s')} AS sh,
                   length(s) AS n_chars
            FROM seg0 WHERE s <> ''),
    df AS (SELECT sh, COUNT(DISTINCT doc_id) AS n_docs
           FROM seg GROUP BY sh),
    f AS (SELECT seg.doc_id, seg.n_chars, df.n_docs >= 4 AS is_boiler
          FROM seg JOIN df USING (sh))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler_segs,
           CAST(SUM(CASE WHEN is_boiler THEN 0 ELSE n_chars END) AS BIGINT)
             AS kept_chars
    FROM f GROUP BY doc_id
    """,
    doc="Cross-document boilerplate removal (the C4/CCNet cleaning step): "
        "segment every document at sentence boundaries (the corpus "
        "convention from udtf_sentence_segments: split on literal ' the "
        "'), hash each segment, and mark segments whose hash appears in "
        ">= 4 DISTINCT documents as boilerplate — navigation chrome, "
        "cookie banners, licence footers — then report per-document "
        "segment/boilerplate counts and surviving character mass. This "
        "is corpus-global dedup at SEGMENT granularity, which doc-level "
        "dedup (minhash etc.) cannot see. Shape: one explode scan, one "
        "hash-agg on segment hash (map-side combinable distinct), one "
        "co-partitioned join back on the same key (exchange reused under "
        "AQE), one doc-keyed agg. No pair joins anywhere — boilerplate "
        "detection is df-counting, not similarity.",
)
def corpus_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    d = T(spark, sf_dir, "documents")
    seg = (
        d.select(
            "doc_id",
            F.explode(F.split("text", " the ")).alias("s0"),
        )
        .select("doc_id", F.trim(F.col("s0")).alias("s"))
        .where(F.col("s") != "")
        .select(
            "doc_id", h60(F.col("s")).alias("sh"),
            F.length("s").alias("n_chars"),
        )
    )
    df_counts = seg.groupBy("sh").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    f = seg.join(df_counts, "sh").select(
        "doc_id", "n_chars", (F.col("n_docs") >= 4).alias("is_boiler")
    )
    return f.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_boiler_segs"),
        F.sum(F.when(F.col("is_boiler"), 0).otherwise(F.col("n_chars")))
        .cast("bigint")
        .alias("kept_chars"),
    )


# --- session Markov transition matrix ----------------------------------------

@register(
    "events_markov_transitions",
    f"""
    WITH {SESSIONIZED_EVENTS_CTE},
    typed AS (SELECT s.user_id, s.session_id, s.ts_ms, s.event_id,
                     e.event_type
              FROM sessions s JOIN events e ON s.event_id = e.event_id),
    nxt AS (SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id, session_id
                        ORDER BY ts_ms, event_id) AS to_type
            FROM typed),
    cnt AS (SELECT from_type, to_type, COUNT(*) AS n_trans
            FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS ft
            FROM cnt GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.n_trans AS BIGINT) AS n_trans,
           CAST((c.n_trans * 1000000) // t.ft AS BIGINT) AS p_ppm
    FROM cnt c JOIN tot t ON c.from_type = t.from_type
    """,
    doc="Session Markov transition matrix: within each canonical 30-min "
        "session (the shared sessionizer every session query builds on), "
        "count consecutive event-type transitions and report integer-ppm "
        "conditional probabilities — the behavioral model behind "
        "next-action prediction and anomalous-flow detection, and the "
        "aggregate twin of events_user_journeys (which keeps paths; this "
        "keeps the first-order chain). Shape: the sessionizer's "
        "user-keyed window, one lead() over the same partitioning (no "
        "second shuffle), then two tiny hash-aggs on the |types|^2 "
        "grid; the per-from totals join is broadcast-size. Probabilities "
        "are floor-ppm integers: bit-identical cross-engine, no float "
        "division.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.plans.common import sessionized_events
    from pyspark.sql.window import Window as W

    s = sessionized_events(spark, sf_dir)
    e = EV(spark, sf_dir).select("event_id", "event_type")
    typed = s.join(e, "event_id")
    # Partition the lead() by user_id ONLY — session_id is a function of
    # position within the user, so user-level partitioning is sufficient
    # and lets this window REUSE the sessionizer's (user_id) exchange
    # instead of re-shuffling on (user_id, session_id); the cross-session
    # boundary is enforced by comparing the led session_id instead.
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    nxt = typed.select(
        F.col("session_id"),
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        F.lead("session_id").over(w).alias("__to_sid"),
    )
    cnt = (
        nxt.where(
            F.col("to_type").isNotNull()
            & (F.col("__to_sid") == F.col("session_id"))
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
        .persist()
    )
    tot = cnt.groupBy("from_type").agg(
        F.sum("n_trans").cast("bigint").alias("ft")
    )
    return (
        cnt.join(F.broadcast(tot), "from_type")
        .select(
            "from_type", "to_type",
            F.col("n_trans").cast("bigint").alias("n_trans"),
            F.expr("(n_trans * 1000000) div ft").cast("bigint")
            .alias("p_ppm"),
        )
    )


# --- Kneser-Ney bigram count tables ------------------------------------------

_TOKS8 = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "t -> t <> '')"
)


@register(
    "text_ngram_lm_counts",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS8} AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(range(2, len(toks) + 1),
                         i -> struct_pack(w1 := toks[i - 1], w2 := toks[i])))
                  AS b
           FROM t WHERE len(toks) >= 2),
    c AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_left_types
             FROM c GROUP BY w2),
    fan AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_right_types
            FROM c GROUP BY w1),
    ranked AS (SELECT c.w1, c.w2, CAST(c.n AS BIGINT) AS n_bigram,
                      f.n_right_types, ct.n_left_types,
                      ROW_NUMBER() OVER (ORDER BY c.n DESC, c.w1, c.w2)
                        AS rnk
               FROM c JOIN fan f ON c.w1 = f.w1
                      JOIN cont ct ON c.w2 = ct.w2)
    SELECT w1, w2, n_bigram, n_right_types, n_left_types,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 50
    """,
    doc="Kneser-Ney bigram count tables (the KenLM/SRILM data layer): raw "
        "bigram counts c(w1,w2) plus the two continuation-type counts the "
        "KN discount needs — N1+(w1,*) distinct right continuations and "
        "N1+(*,w2) distinct left contexts (the quantity that makes KN "
        "beat plain MLE: 'francisco' is frequent but only ever follows "
        "'san'). The perplexity-filter infrastructure for training-data "
        "quality scoring. Bigrams come from an in-row array transform "
        "(zero shuffle until the count agg); both type counts are aggs "
        "OVER the already-reduced bigram table, not the corpus; top-50 "
        "by (count, bigram) is the deterministic report cut. At 100 TB: "
        "one map-side-combinable shuffle on bigram, two on its "
        "|vocab|-bounded margins.",
)
def text_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents")
    t = d.select(tokens(F.col("text")).alias("toks")).where(
        F.size("toks") >= 2
    )
    bg = t.select(
        F.explode(
            F.expr(
                "transform(sequence(2, size(toks)), "
                "i -> struct(toks[i - 2] AS w1, toks[i - 1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n")).persist()
    cont = c.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left_types")
    )
    fan = c.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right_types")
    )
    ranked = (
        c.join(fan, "w1")
        .join(cont, "w2")
        .withColumn(
            "rnk",
            F.row_number().over(W.orderBy(F.desc("n"), "w1", "w2")),
        )
        .where(F.col("rnk") <= 50)
    )
    return ranked.select(
        "w1", "w2", F.col("n").cast("bigint").alias("n_bigram"),
        "n_right_types", "n_left_types", F.col("rnk").cast("int").alias("rnk"),
    )


# --- GDPR erasure cascade audit ----------------------------------------------

@register(
    "privacy_erasure_cascade",
    """
    WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    del_o AS (SELECT o_orderkey FROM orders
              SEMI JOIN del_c ON o_custkey = c_custkey),
    cnt_c AS (SELECT COUNT(*) AS n FROM del_c),
    tot_c AS (SELECT COUNT(*) AS n FROM customer),
    cnt_o AS (SELECT COUNT(*) AS n FROM del_o),
    tot_o AS (SELECT COUNT(*) AS n FROM orders),
    cnt_l AS (SELECT COUNT(*) AS n FROM lineitem
              SEMI JOIN del_o ON l_orderkey = o_orderkey),
    tot_l AS (SELECT COUNT(*) AS n FROM lineitem)
    SELECT 'customer' AS table_name,
           CAST((SELECT n FROM cnt_c) AS BIGINT) AS n_purged,
           CAST((SELECT n FROM tot_c) - (SELECT n FROM cnt_c) AS BIGINT)
             AS n_retained
    UNION ALL
    SELECT 'orders',
           CAST((SELECT n FROM cnt_o) AS BIGINT),
           CAST((SELECT n FROM tot_o) - (SELECT n FROM cnt_o) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT n FROM cnt_l) AS BIGINT),
           CAST((SELECT n FROM tot_l) - (SELECT n FROM cnt_l) AS BIGINT)
    """,
    doc="GDPR/CCPA erasure-cascade audit: given a deletion list (every "
        "97th customer stands in for the erasure-request queue), follow "
        "the foreign-key cascade customer -> orders -> lineitem and "
        "report purged vs retained row counts per table — the compliance "
        "report every right-to-be-forgotten pipeline must produce before "
        "and after the actual delete, and the natural consumer-side twin "
        "of the reference's DELETE decode path (PgWalMessageDecoder "
        "delete messages carry only the key tuple; this is what a "
        "downstream does with those keys at warehouse scale). Shape: the "
        "deletion list broadcasts (requests are always tiny vs facts); "
        "each cascade level is a broadcast LEFT SEMI join counted with a "
        "map-side-combinable agg — the fact tables are scanned once "
        "each, never shuffled.",
)
def privacy_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey")

    del_c = c.where(F.col("c_custkey") % 97 == 0)
    del_o = o.join(
        F.broadcast(del_c), o.o_custkey == del_c.c_custkey, "left_semi"
    ).select("o_orderkey")
    purged_l = li.join(
        F.broadcast(del_o), li.l_orderkey == del_o.o_orderkey, "left_semi"
    )

    def row(name, purged_df, total_df):
        p = purged_df.agg(F.count(F.lit(1)).alias("n_purged"))
        t = total_df.agg(F.count(F.lit(1)).alias("n_total"))
        return p.crossJoin(F.broadcast(t)).select(
            F.lit(name).alias("table_name"),
            F.col("n_purged").cast("bigint").alias("n_purged"),
            (F.col("n_total") - F.col("n_purged"))
            .cast("bigint")
            .alias("n_retained"),
        )

    return (
        row("customer", del_c, c)
        .unionByName(row("orders", del_o, o))
        .unionByName(row("lineitem", purged_l, li))
    )


# --- seasonal forecast backtest ----------------------------------------------

@register(
    "events_forecast_backtest",
    """
    WITH s AS (SELECT event_type,
                      epoch_ms(ts) // 3600000 AS hour_num,
                      CAST(floor(value * 1000000) AS BIGINT) AS vmic
               FROM events),
    hourly AS (SELECT event_type, hour_num,
                      CAST(SUM(vmic) AS BIGINT) AS actual
               FROM s GROUP BY event_type, hour_num),
    j AS (SELECT a.event_type,
                 abs(a.actual - f.actual) AS abs_err
          FROM hourly a
          JOIN hourly f ON a.event_type = f.event_type
                       AND f.hour_num = a.hour_num - 168)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
           CAST(SUM(abs_err) // COUNT(*) AS BIGINT) AS mae_micros
    FROM j GROUP BY event_type
    """,
    doc="Seasonal-naive forecast backtest: predict each hour's total as "
        "the same hour LAST WEEK and score MAE per event type — the "
        "baseline every forecasting deployment must beat, and the "
        "backtest harness pattern (join actuals to lagged actuals, "
        "score, aggregate) that applies unchanged to real models. The "
        "hour-168 join is a self-equi-join on the ALREADY-REDUCED "
        "(type, hour) rollup — |types| x |hours| rows, not raw events — "
        "co-partitioned on event_type. Integer micros throughout; MAE "
        "reported as floor division (exact cross-engine).",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    s = ev.select(
        "event_type",
        F.expr("unix_millis(ts) div 3600000").alias("hour_num"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("vmic"),
    )
    hourly = (
        s.groupBy("event_type", "hour_num")
        .agg(F.sum("vmic").cast("bigint").alias("actual"))
        .persist()
    )
    a, f_ = hourly.alias("a"), hourly.alias("f")
    j = a.join(
        f_,
        (F.col("a.event_type") == F.col("f.event_type"))
        & (F.col("f.hour_num") == F.col("a.hour_num") - 168),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.abs(F.col("a.actual") - F.col("f.actual")).alias("abs_err"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("abs_err").cast("bigint").alias("sum_abs_err"),
        F.expr("sum(abs_err) div count(*)").cast("bigint")
        .alias("mae_micros"),
    )


# --- video scene-cut detection -----------------------------------------------

_FRAME_SUM = (
    "list_sum(list_transform(range(w * 64, w * 64 + 64), "
    "i -> CAST('0x' || substr(hex(bl), i * 2 + 1, 2) AS BIGINT)))"
)


@register(
    "mm_video_scene_cuts",
    f"""
    WITH b AS (SELECT doc_id, encode(text) AS bl,
                      octet_length(encode(text)) // 64 AS k
               FROM documents),
    fr AS (SELECT doc_id, k, unnest(range(0, k)) AS w, bl
           FROM b WHERE k >= 1),
    s AS (SELECT doc_id, w, {_FRAME_SUM} AS fsum FROM fr),
    d AS (SELECT doc_id, w,
                 abs(fsum - lag(fsum) OVER (PARTITION BY doc_id
                                            ORDER BY w)) AS dv
          FROM s),
    cuts AS (SELECT doc_id, w FROM d WHERE dv > 1600),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cuts,
                   string_agg(CAST(w AS VARCHAR), ',' ORDER BY w)
                     AS cut_frames
            FROM cuts GROUP BY doc_id)
    SELECT b.doc_id, CAST(b.k AS BIGINT) AS n_full_frames,
           coalesce(a.n_cuts, 0) AS n_cuts,
           coalesce(a.cut_frames, '') AS cut_frames
    FROM b LEFT JOIN agg a ON b.doc_id = a.doc_id
    """,
    doc="Video scene-cut detection over the binary column: payload as "
        "64-byte frames, each full frame scored by its byte sum, a cut "
        "wherever the adjacent-frame difference exceeds the threshold — "
        "the shot-segmentation baseline every video pipeline starts from "
        "(histogram/SSIM distance swaps into the same kernel), extending "
        "the multimodal family past sampling (mm_frame_sample) into "
        "content analysis. numpy reshape + one diff per payload inside "
        "Arrow-batched mapInPandas (operators/multimodal.scene_cut_"
        "detect); bytes never shuffle — only per-doc summaries leave the "
        "scan stage, so at 100 TB this runs at decode bandwidth with "
        "zero exchange. Byte-level oracle replays the identical frame "
        "sums from hex pairs.",
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import multimodal as mm

    d = T(spark, sf_dir, "documents")
    return mm.scene_cut_detect(mm.attach_binary(d))


# --- near-dup cluster size histogram -----------------------------------------

from postgresql_cdc_spark.plans.extensions import (  # noqa: E402
    _CORPUS,
    _NGRAM_ORACLE,
)

_CLUSTER_SIZE_HIST_ORACLE = f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_NGRAM_ORACLE}),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT DISTINCT a, a FROM sym
        UNION
        SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b),
    lab AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    c AS ({_CORPUS}),
    allc AS (SELECT c.doc_id, coalesce(l.comp, c.doc_id) AS comp
             FROM c LEFT JOIN lab l ON c.doc_id = l.id),
    sizes AS (SELECT comp, COUNT(*) AS csize FROM allc GROUP BY comp)
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY csize
    """


@register(
    "dedup_cluster_size_hist",
    _CLUSTER_SIZE_HIST_ORACLE,
    doc="Near-dup cluster-size histogram: how many clusters of each size "
        "the exact-Jaccard pair graph produces (singletons included via "
        "the corpus left join — a doc in no pair is its own cluster). "
        "THE summary a dedup rollout decision reads first: n_docs per "
        "size row shows exactly how much mass each cluster size removes "
        "(keep-one-per-cluster drops n_docs - n_clusters rows). Built "
        "on the same connected-components labels dedup_cluster_labels "
        "gates; the histogram is two tiny hash aggs over the label "
        "table.",
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.dedup import ngram_jaccard_pairs
    from postgresql_cdc_spark.operators.graph import connected_components
    from postgresql_cdc_spark.plans.extensions import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(corpus, "text", "doc_id", threshold=0.5)
    lab = connected_components(pairs, src="id_a", dst="id_b")
    allc = corpus.join(lab, corpus.doc_id == lab.id, "left").select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("comp")
    )
    sizes = allc.groupBy("comp").agg(F.count(F.lit(1)).alias("csize"))
    return sizes.groupBy("csize").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("csize") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    ).select(
        F.col("csize").cast("bigint").alias("cluster_size"),
        "n_clusters", "n_docs",
    )


# --- fixed-k per-stratum reservoir sample ------------------------------------

@register(
    "sample_reservoir_per_group",
    f"""
    WITH r AS (SELECT doc_id, lang, source,
                      ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY {_SEG_H60.format(
                              x="'rsv:' || CAST(doc_id AS VARCHAR)")},
                              doc_id) AS rn
               FROM documents)
    SELECT lang, doc_id, source, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 20
    """,
    doc="Fixed-size per-stratum sample (the distributed, deterministic "
        "stand-in for reservoir sampling): EXACTLY min(k, |stratum|) docs "
        "per language, chosen by ranking on a salted content hash — "
        "uniform over the stratum, reproducible across runs/engines with "
        "no sampling state, and stable under corpus growth in "
        "distribution (each doc keeps its own rank key). Complements "
        "sample_stratified (Bernoulli fraction: size varies, this "
        "guarantees the quota). Shape: one hash shuffle on the stratum "
        "key + per-stratum top-k; at 100 TB the top-k pushes into "
        "per-partition heaps before the exchange (rank <= k prunes "
        "map-side under TakeOrdered-style evaluation), so the shuffle "
        "carries candidates, not the corpus.",
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from postgresql_cdc_spark.operators.text import h60

    d = T(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        h60(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("lang", "doc_id", "source", F.col("rn").cast("int"))
    )


# --- reorder survival life table ---------------------------------------------

@register(
    "orders_reorder_survival_table",
    """
    WITH g AS (SELECT o_custkey,
                      epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000
                        AS day_num
               FROM orders),
    gaps AS (SELECT day_num - lag(day_num) OVER (PARTITION BY o_custkey
                        ORDER BY day_num) AS gap_days
             FROM g),
    ev AS (SELECT (gap_days // 30) * 30 AS bucket_start_days,
                  COUNT(*) AS n_events
           FROM gaps WHERE gap_days IS NOT NULL
           GROUP BY 1),
    risk AS (SELECT bucket_start_days, n_events,
                    CAST(SUM(n_events) OVER (ORDER BY bucket_start_days DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS n_at_risk
             FROM ev)
    SELECT CAST(bucket_start_days AS BIGINT) AS bucket_start_days,
           CAST(n_events AS BIGINT) AS n_events, n_at_risk,
           CAST((1000000 * n_events) // n_at_risk AS BIGINT) AS hazard_ppm
    FROM risk
    """,
    doc="Reorder survival life table (the Kaplan-Meier data layer for "
        "churn analysis): inter-order gaps per customer, bucketed into "
        "30-day intervals, with the at-risk count (gaps surviving to the "
        "bucket, a reverse-cumulative sum over the bucket rollup) and "
        "the integer-ppm discrete hazard n_events / n_at_risk — the "
        "exact integers a KM curve multiplies, emitted as the table "
        "instead of the float product so both engines agree bit-for-bit "
        "(the uncensored life table: every observed gap is an event). "
        "Shape: one customer-keyed window for gaps (dates never leave "
        "their partition), one hash agg to the <=|max gap / 30| bucket "
        "rollup, one window over that tiny rollup. At 100 TB the only "
        "full-data pass is the lag window on the orders table's natural "
        "key.",
)
def orders_reorder_survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000"
        ).alias("day_num"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_num")
    gaps = o.select(
        (F.col("day_num") - F.lag("day_num").over(w)).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    ev = gaps.groupBy(
        F.expr("(gap_days div 30) * 30").alias("bucket_start_days")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_risk = Window.orderBy(F.desc("bucket_start_days")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = ev.withColumn(
        "n_at_risk", F.sum("n_events").over(w_risk).cast("bigint")
    )
    return risk.select(
        F.col("bucket_start_days").cast("bigint").alias("bucket_start_days"),
        F.col("n_events").cast("bigint").alias("n_events"),
        "n_at_risk",
        F.expr("(1000000 * n_events) div n_at_risk").cast("bigint")
        .alias("hazard_ppm"),
    )


# --- referential-integrity orphan audit --------------------------------------

@register(
    "dq_referential_orphans",
    """
    WITH live_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 113 <> 0),
    live_o AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 211 <> 0),
    o_orphans AS (SELECT COUNT(*) AS n FROM orders
                  ANTI JOIN live_c ON o_custkey = c_custkey),
    o_total AS (SELECT COUNT(*) AS n FROM orders),
    l_orphans AS (SELECT COUNT(*) AS n FROM lineitem
                  ANTI JOIN live_o ON l_orderkey = o_orderkey),
    l_total AS (SELECT COUNT(*) AS n FROM lineitem)
    SELECT 'orders->customer' AS fk_relation,
           CAST((SELECT n FROM o_orphans) AS BIGINT) AS n_orphans,
           CAST((SELECT n FROM o_total) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT n FROM l_orphans) AS BIGINT),
           CAST((SELECT n FROM l_total) AS BIGINT)
    """,
    doc="Referential-integrity orphan audit: count child rows whose "
        "foreign key has no live parent — THE invariant a CDC replica "
        "must re-verify after every backfill, schema migration, or "
        "out-of-order apply (deletes arriving before their children's "
        "updates leave exactly these orphans). Parents are planted as "
        "'hard-deleted' (every 113th customer, every 211th order) so the "
        "gate has known true orphan counts on both engines. Shape: two "
        "LEFT ANTI joins, each co-partitioned on the FK — the same "
        "shuffle the downstream join workload already pays — reduced "
        "map-side to per-table counts; nothing wide survives the scan.",
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey")

    live_c = c.where(F.col("c_custkey") % 113 != 0)
    live_o = o.where(F.col("o_orderkey") % 211 != 0).select("o_orderkey")

    def row(name, orphans_df, total_df):
        p = orphans_df.agg(F.count(F.lit(1)).alias("n_orphans"))
        t = total_df.agg(F.count(F.lit(1)).alias("n_checked"))
        return p.crossJoin(F.broadcast(t)).select(
            F.lit(name).alias("fk_relation"),
            F.col("n_orphans").cast("bigint").alias("n_orphans"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
        )

    o_orph = o.join(live_c, o.o_custkey == live_c.c_custkey, "left_anti")
    l_orph = li.join(live_o, li.l_orderkey == live_o.o_orderkey, "left_anti")
    return row("orders->customer", o_orph, o).unionByName(
        row("lineitem->orders", l_orph, li)
    )


# --- bot / automation detection ----------------------------------------------

@register(
    "events_bot_detection",
    """
    WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
               FROM events),
    g AS (SELECT user_id,
                 (ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
                      ORDER BY ts_ms, event_id)) // 1000 AS gap_s
          FROM e),
    s AS (SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(gap_s) AS BIGINT) AS sum_g,
                 CAST(SUM(gap_s * gap_s) AS BIGINT) AS sum_g2
          FROM g WHERE gap_s IS NOT NULL
          GROUP BY user_id),
    f AS (SELECT user_id, n_gaps,
                 n_gaps * sum_g2 = sum_g * sum_g AS is_metronomic,
                 CASE WHEN sum_g > 0
                      THEN (n_gaps * 3600 * 1000) // sum_g
                      ELSE 1000000000 END AS rate_milli_per_hour
          FROM s WHERE n_gaps >= 5)
    SELECT user_id, n_gaps, is_metronomic, rate_milli_per_hour,
           is_metronomic OR rate_milli_per_hour > 3600000 AS is_flagged
    FROM f
    """,
    doc="Bot/automation detection — the crawl-hygiene screen a "
        "training-data pipeline runs before user-generated content is "
        "trusted: per user with >= 5 inter-event gaps, (a) METRONOMIC "
        "regularity — zero variance of second-quantized gaps, tested as "
        "the EXACT integer identity n*sum(g^2) == (sum g)^2 (no float "
        "variance, no epsilon; humans never fire on a perfect clock), "
        "and (b) super-human sustained rate (> 1000 events/hour in "
        "milli-events-per-hour integers). Gaps quantize to seconds "
        "before squaring so sum_g2 stays far inside int64 at any "
        "realistic activity span. Shape: one user-keyed window for gaps "
        "+ one user-keyed hash agg — the same single shuffle every "
        "per-user profile query pays; both flags are projections over "
        "the aggregate.",
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    e = ev.select(
        "user_id", F.expr("unix_millis(ts)").alias("ts_ms"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    g = (
        e.select(
            "user_id",
            (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
        )
        .select("user_id", F.expr("gap_ms div 1000").alias("gap_s"))
        .where(F.col("gap_s").isNotNull())
    )
    s = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap_s").cast("bigint").alias("sum_g"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("sum_g2"),
    )
    f = s.where(F.col("n_gaps") >= 5).select(
        "user_id", "n_gaps",
        (F.col("n_gaps") * F.col("sum_g2")
         == F.col("sum_g") * F.col("sum_g")).alias("is_metronomic"),
        F.when(
            F.col("sum_g") > 0,
            F.expr("(n_gaps * 3600 * 1000) div sum_g"),
        ).otherwise(F.lit(1000000000)).cast("bigint")
        .alias("rate_milli_per_hour"),
    )
    return f.select(
        "user_id", "n_gaps", "is_metronomic", "rate_milli_per_hour",
        (F.col("is_metronomic") | (F.col("rate_milli_per_hour") > 3600000))
        .alias("is_flagged"),
    )


# --- quality-filter funnel report --------------------------------------------

_QF_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "t -> t <> '')"
)


@register(
    "corpus_quality_funnel",
    f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n_chars,
                      {_QF_TOKS} AS toks
               FROM documents),
    f AS (SELECT doc_id,
                 n_chars < 200 AS r_too_short,
                 n_chars > 20000 AS r_too_long,
                 10 * length(regexp_replace(text, '[^a-z ]', '', 'g'))
                   < 7 * n_chars AS r_low_alpha,
                 5 * list_max(list_transform(list_distinct(toks),
                       t -> len(list_filter(toks, x -> x = t))))
                   > len(toks) AS r_repetitive
          FROM d WHERE len(toks) > 0),
    agg AS (SELECT
        CAST(SUM(CASE WHEN r_too_short THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN r_too_long THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN r_low_alpha THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN r_repetitive THEN 1 ELSE 0 END) AS BIGINT) AS r,
        CAST(SUM(CASE WHEN NOT (r_too_short OR r_too_long OR r_low_alpha
                                OR r_repetitive) THEN 1 ELSE 0 END)
             AS BIGINT) AS s,
        CAST(COUNT(*) AS BIGINT) AS t
        FROM f)
    SELECT 'too_short' AS stage, a AS n_docs, t AS n_total FROM agg
    UNION ALL SELECT 'too_long', b, t FROM agg
    UNION ALL SELECT 'low_alpha', c, t FROM agg
    UNION ALL SELECT 'repetitive', r, t FROM agg
    UNION ALL SELECT 'survivors', s, t FROM agg
    """,
    doc="Quality-filter funnel report (the Gopher/C4 rule battery as an "
        "attribution table): per heuristic rule — too short, too long, "
        "low alphabetic ratio (10*alpha < 7*chars, integer cross-"
        "multiplication instead of a float ratio), repetitive (most "
        "frequent token > 20% of tokens, an in-row array computation "
        "with NO shuffle since documents are bounded) — the count of "
        "documents it would reject, plus the survivor count. This "
        "per-rule attribution is what a pipeline owner tunes thresholds "
        "against; a single pass, one hash agg to one row, stacked to "
        "the report shape. Rules are evaluated independently (a doc "
        "can fail several), survivors fail none.",
)
def corpus_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.length("text").alias("n_chars"),
        tokens(F.col("text")).alias("toks"),
    ).where(F.size("toks") > 0)
    f = d.select(
        (F.col("n_chars") < 200).alias("r_too_short"),
        (F.col("n_chars") > 20000).alias("r_too_long"),
        (
            10 * F.length(F.regexp_replace("text", "[^a-z ]", ""))
            < 7 * F.col("n_chars")
        ).alias("r_low_alpha"),
        F.expr(
            "5 * array_max(transform(array_distinct(toks), "
            "t -> size(filter(toks, x -> x = t)))) > size(toks)"
        ).alias("r_repetitive"),
    )
    agg = f.agg(
        F.sum(F.when(F.col("r_too_short"), 1).otherwise(0))
        .cast("bigint").alias("a"),
        F.sum(F.when(F.col("r_too_long"), 1).otherwise(0))
        .cast("bigint").alias("b"),
        F.sum(F.when(F.col("r_low_alpha"), 1).otherwise(0))
        .cast("bigint").alias("c"),
        F.sum(
            F.when(
                ~(F.col("r_too_short") | F.col("r_too_long")
                  | F.col("r_low_alpha") | F.col("r_repetitive")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("s"),
        F.sum(F.when(F.col("r_repetitive"), 1).otherwise(0))
        .cast("bigint").alias("r"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    return agg.selectExpr(
        "stack(5, 'too_short', a, 'too_long', b, 'low_alpha', c, "
        "'repetitive', r, 'survivors', s) AS (stage, n_docs)",
        "t AS n_total",
    )


# --- rolling window median ---------------------------------------------------

@register(
    "orders_rolling_median_revenue",
    """
    WITH d AS (SELECT o_orderpriority,
                      epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000
                        AS day_num,
                      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                                    AS BIGINT)) AS BIGINT) AS rev_c
               FROM orders GROUP BY o_orderpriority, day_num)
    SELECT o_orderpriority, CAST(day_num AS BIGINT) AS day_num, rev_c,
           CAST(quantile_disc(rev_c, 0.5) OVER (PARTITION BY o_orderpriority
                ORDER BY day_num ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rolling_med_7d
    FROM d
    """,
    doc="Rolling windowed median: per order priority, the discrete median "
        "of daily revenue over the trailing 7 observed days — the robust "
        "moving-baseline every monitoring dashboard wants where a moving "
        "AVERAGE is wrecked by one spike day. Spark has no percentile "
        "window aggregate, so the engine composes it: collect_list over "
        "the bounded ROWS frame, array_sort, pick element (n+1) div 2 — "
        "exactly DuckDB's quantile_disc(0.5) discrete-lower-median "
        "semantics, integer cents end to end. The frame is 7 rows, so "
        "the in-row sort is O(7 log 7) per output row and the only "
        "shuffle is the (priority, day) rollup; the window never sees "
        "raw orders.",
)
def orders_rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000"
        ).alias("day_num"),
        (DEC("o_totalprice", 14, 2) * 100).cast("bigint").alias("cents"),
    )
    d = o.groupBy("o_orderpriority", "day_num").agg(
        F.sum("cents").cast("bigint").alias("rev_c")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_num")
        .rowsBetween(-6, 0)
    )
    return (
        d.withColumn("__lst", F.collect_list("rev_c").over(w))
        .select(
            "o_orderpriority",
            F.col("day_num").cast("bigint").alias("day_num"),
            "rev_c",
            F.expr(
                "CAST(element_at(array_sort(__lst), "
                "CAST((size(__lst) + 1) div 2 AS INT)) AS BIGINT)"
            ).alias("rolling_med_7d"),
        )
    )


# --- DAU/MAU stickiness ------------------------------------------------------

@register(
    "events_dau_mau_stickiness",
    """
    WITH d AS (SELECT user_id,
                      epoch_ms(ts) // 86400000 AS day_num,
                      epoch_ms(ts) // 86400000 // 30 AS month_num
               FROM events),
    dau AS (SELECT day_num, month_num,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM d GROUP BY day_num, month_num),
    mau AS (SELECT month_num,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
            FROM d GROUP BY month_num)
    SELECT CAST(dau.day_num AS BIGINT) AS day_num, dau.dau, mau.mau,
           CAST((1000 * dau.dau) // mau.mau AS BIGINT) AS stickiness_milli
    FROM dau JOIN mau ON dau.month_num = mau.month_num
    """,
    doc="DAU/MAU stickiness: daily active users over the active-user "
        "count of the surrounding 30-epoch-day period, in integer "
        "per-mille — the engagement-health ratio product dashboards "
        "track (a day where most of the period's users show up reads "
        "near 1000). Periods are epoch-arithmetic 30-day blocks, not "
        "calendar months, so both engines bucket identically with zero "
        "calendar/timezone surface. Shape: two count-distinct hash aggs "
        "on (day, period) and (period) — the second's input is the "
        "already-deduplicated first in spirit, both map-side partial — "
        "and a broadcast-size join on the period key.",
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = EV(spark, sf_dir)
    d = ev.select(
        "user_id",
        F.expr("unix_millis(ts) div 86400000").alias("day_num"),
        F.expr("unix_millis(ts) div 86400000 div 30").alias("month_num"),
    )
    dau = d.groupBy("day_num", "month_num").agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    mau = d.groupBy("month_num").agg(
        F.count_distinct("user_id").cast("bigint").alias("mau")
    )
    return (
        dau.join(F.broadcast(mau), "month_num")
        .select(
            F.col("day_num").cast("bigint").alias("day_num"),
            "dau", "mau",
            F.expr("(1000 * dau) div mau").cast("bigint")
            .alias("stickiness_milli"),
        )
    )


# --- inverted index build ----------------------------------------------------

@register(
    "text_inverted_index",
    f"""
    WITH t AS (SELECT doc_id, {_QF_TOKS} AS toks FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS f
           FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
           GROUP BY doc_id, tok),
    post AS (SELECT tok,
                    CAST(COUNT(*) AS BIGINT) AS df,
                    CAST(SUM(f) AS BIGINT) AS total_tf
             FROM tf GROUP BY tok),
    top3 AS (SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ','
                        ORDER BY rnk) AS top_docs
             FROM (SELECT tok, doc_id,
                          ROW_NUMBER() OVER (PARTITION BY tok
                              ORDER BY f DESC, doc_id ASC) AS rnk
                   FROM tf) WHERE rnk <= 3
             GROUP BY tok)
    SELECT post.tok AS term, post.df, post.total_tf, top3.top_docs
    FROM post JOIN top3 ON post.tok = top3.tok
    """,
    doc="Inverted-index build: per term, document frequency, total term "
        "frequency, and the top-3 posting heads (highest in-doc "
        "frequency, id tie-break, comma-joined) — the materialization "
        "job behind every search/BM25/contamination-lookup system, "
        "distinct from the ranking queries (tfidf_topterms) in that it "
        "EMITS the index rows themselves. Shape: explode once, one "
        "(doc, term) hash agg, then a term-keyed agg and a term-keyed "
        "window over the already-reduced tf table — posting heads cost "
        "a bounded top-k per term, never a global sort. At 100 TB this "
        "is the standard build: everything partitions by term after one "
        "map-side-combinable reduction.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist()
    )
    post = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("f").cast("bigint").alias("total_tf"),
    )
    w = W.partitionBy("tok").orderBy(F.desc("f"), F.asc("doc_id"))
    top3 = (
        tf.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .groupBy("tok")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "doc_id"))
                    ),
                    lambda s: s.doc_id.cast("string"),
                ),
            ).alias("top_docs")
        )
    )
    return post.join(top3, "tok").select(
        F.col("tok").alias("term"), "df", "total_tf", "top_docs"
    )


# --- distribution shift between sources (exact total variation) --------------

@register(
    "text_source_divergence",
    f"""
    WITH t AS (SELECT source, unnest({_QF_TOKS}) AS tok FROM documents
               WHERE source IN ('src0', 'src1')),
    c AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY source, tok),
    w AS (SELECT tok,
                 CAST(SUM(CASE WHEN source = 'src0' THEN n ELSE 0 END)
                      AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN source = 'src1' THEN n ELSE 0 END)
                      AS BIGINT) AS c1
          FROM c GROUP BY tok),
    tot AS (SELECT CAST(SUM(c0) AS BIGINT) AS t0,
                   CAST(SUM(c1) AS BIGINT) AS t1 FROM w)
    SELECT CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_terms,
           t0 AS tokens_src0, t1 AS tokens_src1,
           CAST((1000000 * (SELECT SUM(abs(c0 * t1 - c1 * t0)) FROM w))
                // (2 * t0 * t1) AS BIGINT) AS tv_distance_ppm
    FROM tot
    """,
    doc="Distribution shift between corpus sources: EXACT total-variation "
        "distance between src0's and src1's unigram distributions, in "
        "integer ppm — the drift metric a corpus-mix owner tracks when a "
        "source's crawl changes character (the integer-exact stand-in "
        "for KL/JS divergence, whose logs are engine-float-dependent). "
        "Cross-multiplied form: TV = sum |c0*T1 - c1*T0| / (2*T0*T1) — "
        "no per-term division, one exact integer sum (bounded ~1e16 at "
        "any realistic corpus: count x total fits int64 with 1e2 "
        "headroom). Shape: one token explode, one term hash agg pivoted "
        "by source, one scalar rollup.",
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1")
    ).select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    c = d.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = c.groupBy("tok").agg(
        F.sum(F.when(F.col("source") == "src0", F.col("n")).otherwise(0))
        .cast("bigint").alias("c0"),
        F.sum(F.when(F.col("source") == "src1", F.col("n")).otherwise(0))
        .cast("bigint").alias("c1"),
    )
    tot = w.agg(
        F.sum("c0").cast("bigint").alias("t0"),
        F.sum("c1").cast("bigint").alias("t1"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    joined = w.crossJoin(F.broadcast(tot))
    return (
        joined.agg(
            F.first("n_terms").alias("n_terms"),
            F.first("t0").alias("tokens_src0"),
            F.first("t1").alias("tokens_src1"),
            F.expr(
                "CAST((1000000 * SUM(abs(c0 * t1 - c1 * t0))) "
                "div (2 * first(t0) * first(t1)) AS BIGINT)"
            ).alias("tv_distance_ppm"),
        )
    )


# --- supplier diversity / single-source risk ---------------------------------

@register(
    "part_supplier_diversity",
    """
    WITH s AS (SELECT l_partkey,
                      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
               FROM lineitem GROUP BY l_partkey)
    SELECT n_supp AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM s GROUP BY n_supp
    """,
    doc="Supplier-diversity histogram (single-source risk): per part, the "
        "distinct suppliers observed shipping it, as a full histogram — "
        "the low end is the supply-chain fragility list every resilience "
        "review starts from, the shape of the rest is the redundancy "
        "profile. Shape: one count-distinct hash agg on the part key "
        "(map-side partial dedup of (part, supplier) pairs first), then "
        "a histogram over the bounded distinct-count domain — the fact "
        "table shuffles its two key columns once, nothing else.",
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    s = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").cast("bigint").alias("n_suppliers")
    )
    return s.groupBy("n_suppliers").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )


# --- payload byte-diversity profile ------------------------------------------

@register(
    "mm_byte_diversity",
    """
    WITH b AS (SELECT doc_id, encode(text) AS bl,
                      octet_length(encode(text)) AS n
               FROM documents),
    e AS (SELECT doc_id, n,
                 CAST('0x' || substr(hex(bl), i * 2 + 1, 2) AS INT) AS byt
          FROM b, LATERAL (SELECT unnest(range(0, n)) AS i) r
          WHERE n > 0),
    c AS (SELECT doc_id, n, byt, COUNT(*) AS f
          FROM e GROUP BY doc_id, n, byt),
    p AS (SELECT doc_id,
                 CAST(MAX(n) AS BIGINT) AS n_bytes,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
                 CAST((1000 * MAX(f)) // MAX(n) AS BIGINT)
                   AS top_byte_permille
          FROM c GROUP BY doc_id)
    SELECT b.doc_id,
           coalesce(p.n_bytes, 0) AS n_bytes,
           coalesce(p.n_distinct_bytes, 0) AS n_distinct_bytes,
           coalesce(p.top_byte_permille, 0) AS top_byte_permille,
           CASE WHEN coalesce(p.n_distinct_bytes, 0) <= 16 THEN 'low'
                WHEN p.n_distinct_bytes <= 64 THEN 'mid'
                ELSE 'high' END AS diversity_class
    FROM b LEFT JOIN p ON b.doc_id = p.doc_id
    """,
    doc="Payload byte-diversity profile: distinct-byte count and top-byte "
        "per-mille share per binary payload, classed low/mid/high — the "
        "integer-exact entropy stand-in storage pipelines use to route "
        "payloads (low diversity -> compress hard; high -> already "
        "compressed/encrypted, store raw), completing the multimodal "
        "family's storage-side toolkit next to content-defined chunking. "
        "One np.bincount per payload in Arrow-batched mapInPandas "
        "(operators/multimodal.byte_diversity_profile); bytes never "
        "shuffle, one skinny summary row per doc leaves the scan. "
        "Byte-level oracle replays the counts from hex pairs.",
)
def mm_byte_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators import multimodal as mm

    d = T(spark, sf_dir, "documents")
    return mm.byte_diversity_profile(mm.attach_binary(d))


# --- embedding pairwise-distance histogram (collapse diagnostic) -------------

_EPH_H60 = "CAST('0x' || substr(md5('eph:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"


@register(
    "emb_pairwise_distance_hist",
    f"""
    WITH s AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000)
                                    AS BIGINT)) AS qv
               FROM embeddings
               WHERE {_EPH_H60} % 10 = 0 AND len(embedding) > 0),
    p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 list_sum(list_transform(range(1, 65),
                     j -> (a.qv[j] - b.qv[j]) * (a.qv[j] - b.qv[j]))) AS d
          FROM s a JOIN s b ON a.vec_id < b.vec_id)
    SELECT CAST(d // 1000000 AS BIGINT) AS dist_bucket_m,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1
    """,
    doc="Embedding-geometry health check: histogram of pairwise quantized "
        "squared-L2 distances over a deterministic ~10% hash sample — "
        "the collapse/anisotropy diagnostic (a healthy embedding space "
        "shows a broad unimodal spread; representation collapse shows "
        "mass piling near zero) run before trusting embeddings for "
        "dedup or retrieval. The all-pairs join is BOUNDED BY "
        "CONSTRUCTION to the hash sample (~(N/10)^2 / 2 pairs, the "
        "documented estimation trade: the histogram is a statistic, not "
        "a per-vector result, so sampling is the correct scale answer — "
        "the same pattern as the brute recall baselines); distances are "
        "integer-exact, buckets are millions-wide integer divisions.",
)
def emb_pairwise_distance_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    e = T(spark, sf_dir, "embeddings")
    s = e.where(
        (h60(F.concat(F.lit("eph:"), F.col("vec_id").cast("string"))) % 10
         == 0)
        & (F.size("embedding") > 0)
    ).select(
        "vec_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    a = s.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    b = s.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    d = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, z) -> acc + z)"
    )
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(d.alias("d"))
    return pairs.groupBy(
        F.expr("d div 1000000").cast("bigint").alias("dist_bucket_m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))


# --- multiset set operations (ALL variants) ----------------------------------

@register(
    "setop_except_all",
    """
    SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="EXCEPT ALL — multiset difference: each quantity row of the "
        "'A'-flag lineitems survives as many times as its multiplicity "
        "exceeds the 'R'-flag multiplicity (the bag semantics SQL's "
        "plain EXCEPT discards; reconciliation and inventory-delta "
        "workloads need the multiplicities). Spark plans exceptAll as a "
        "sum-of-signed-counts aggregate + generate — one shuffle on the "
        "row value, map-side combinable, never a join.",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(F.col("l_quantity").cast("bigint").alias("qty"))
    b = li.where(F.col("l_returnflag") == "R").select(F.col("l_quantity").cast("bigint").alias("qty"))
    return a.exceptAll(b)


@register(
    "setop_intersect_all",
    """
    SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="INTERSECT ALL — multiset intersection: each quantity appears "
        "min(multiplicity in 'A', multiplicity in 'R') times, completing "
        "the set-operation matrix's bag column next to setop_except_all. "
        "Same aggregate-of-counts plan shape: one value-keyed shuffle, "
        "no join.",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(F.col("l_quantity").cast("bigint").alias("qty"))
    b = li.where(F.col("l_returnflag") == "R").select(F.col("l_quantity").cast("bigint").alias("qty"))
    return a.intersectAll(b)


# --- grouping_id in rollups --------------------------------------------------

@register(
    "agg_rollup_grouping_id",
    """
    SELECT coalesce(r_name, '(all)') AS region,
           coalesce(n_name, '(all)') AS nation,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP with the explicit GROUPING bit vector: gid disambiguates "
        "a real NULL group key from a rollup subtotal row — the thing "
        "coalesce-based rollup reports silently get wrong when the data "
        "itself contains the sentinel. Spark's grouping_id() and "
        "PostgreSQL/DuckDB's GROUPING(a, b) emit the identical bit "
        "encoding (left argument = high bit), pinned here cross-engine. "
        "One expand + hash agg, map-side combinable like any rollup.",
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = T(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
            "gid", "n_customers",
        )
    )


# --- bitwise aggregates ------------------------------------------------------

@register(
    "agg_bitwise_flags",
    """
    SELECT l_returnflag,
           CAST(bit_or(1 << (l_linenumber % 16)) AS BIGINT)
             AS linenumber_mask,
           CAST(bit_and(CAST(l_quantity AS BIGINT) | 4096 | 8192) AS BIGINT)
             AS qty_and,
           CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_xor
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Bitwise aggregates (bit_or / bit_and / bit_xor): the compact "
        "flag-set rollup — linenumber_mask is a 16-bit presence bitmap "
        "per return flag (the set-of-small-ints encoding bitmap indexes "
        "and permission systems use), bit_and over OR-seeded values "
        "verifies common-bits extraction, bit_xor is the order-"
        "independent parity fingerprint (a cheap commutative checksum "
        "for replica comparison). All three are commutative-associative "
        "single-pass aggregates: map-side combinable, one shuffle of "
        "|flags| x 3 longs.",
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("shiftleft(1, l_linenumber % 16)").alias("lmask"),
        F.expr(
            "CAST(l_quantity AS BIGINT) | 4096 | 8192"
        ).alias("qseed"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_or(lmask)").cast("bigint").alias("linenumber_mask"),
        F.expr("bit_and(qseed)").cast("bigint").alias("qty_and"),
        F.expr("bit_xor(q)").cast("bigint").alias("qty_xor"),
    )


# --- outer lateral explode ---------------------------------------------------

@register(
    "lateral_explode_outer",
    f"""
    WITH t AS (SELECT doc_id,
                      list_filter({_QF_TOKS}, x -> length(x) >= 8) AS lt
               FROM documents),
    e AS (SELECT doc_id, unnest(lt) AS long_tok FROM t WHERE len(lt) > 0)
    SELECT t.doc_id, e.long_tok
    FROM t LEFT JOIN e ON t.doc_id = e.doc_id
    """,
    doc="OUTER lateral explode: every document fans out to one row per "
        "long token (length >= 8), and a document with NO long tokens "
        "keeps exactly one row with a NULL — the left-join-preserving "
        "explode semantics (explode_outer) that plain explode silently "
        "violates by dropping the parent row, which corrupts any "
        "downstream per-document aggregate that assumes full coverage. "
        "The oracle states the equivalent left join against the "
        "non-empty fan-out. Pure scan-side projection + generate; no "
        "shuffle at all.",
)
def lateral_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            tokens(F.col("text")), lambda x: F.length(x) >= 8
        ).alias("lt"),
    )
    return d.select(
        "doc_id", F.explode_outer("lt").alias("long_tok")
    )


# --- regexp scalar functions -------------------------------------------------

@register(
    "scalar_regexp_funcs",
    """
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g'))
                AS BIGINT) AS n_after_vowel_strip,
           CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT)
             AS n_long_words,
           coalesce(regexp_extract(text, '(qu[a-z]+)', 1), '')
             AS first_qu_word,
           CAST(regexp_matches(text, 'window') AS BOOLEAN) AS has_window
    FROM documents
    """,
    doc="Regexp scalar surface: global replace (Spark replaces all by "
        "default, DuckDB needs the 'g' flag — the cross-engine trap this "
        "query pins), extract-all count, group extraction with a NULL-"
        "vs-empty-string coalesce (Spark returns '' on no match, DuckDB "
        "NULL — normalized explicitly), and boolean containment. All "
        "scan-side projections on a shared POSIX-safe pattern subset; "
        "no shuffle.",
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.regexp_replace("text", "[aeiou]", ""))
        .cast("bigint")
        .alias("n_after_vowel_strip"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{6,}', 0)"))
        .cast("bigint")
        .alias("n_long_words"),
        F.regexp_extract("text", "(qu[a-z]+)", 1).alias("first_qu_word"),
        F.col("text").rlike("window").alias("has_window"),
    )


# --- explicit NULL-ordering pin ----------------------------------------------

@register(
    "sort_null_ordering",
    """
    WITH o AS (SELECT o_orderkey,
                      nullif(o_orderpriority, '3-MEDIUM') AS pri
               FROM orders),
    r AS (SELECT o_orderkey, coalesce(pri, '(null)') AS pri,
                 ROW_NUMBER() OVER (ORDER BY pri ASC NULLS FIRST,
                                    o_orderkey ASC) AS rn_nf,
                 ROW_NUMBER() OVER (ORDER BY pri ASC NULLS LAST,
                                    o_orderkey ASC) AS rn_nl
          FROM o)
    SELECT o_orderkey, pri, CAST(rn_nf AS BIGINT) AS rn_nf,
           CAST(rn_nl AS BIGINT) AS rn_nl
    FROM r WHERE rn_nf <= 25 OR rn_nl <= 25
    """,
    doc="Explicit NULL-ordering pin: the same ranking computed under "
        "NULLS FIRST and NULLS LAST over a planted-NULL priority column "
        "— load-bearing because the ENGINE DEFAULTS DIVERGE (Spark "
        "ascending sorts default nulls first, PostgreSQL/DuckDB default "
        "NULLS LAST), so any query that omits the modifier silently "
        "reorders when ported; this query forces both spellings and the "
        "gate proves they agree bit-for-bit. The oracle states the two "
        "global ROW_NUMBER windows; the Spark plan deliberately runs "
        "neither: each top-25 is a distributed TakeOrderedAndProject "
        "over a lexicographic struct key that encodes the NULL rule as "
        "a leading boolean (struct comparison is total once NULLs are "
        "flagged out), and the candidates' EXACT global ranks come from "
        "one broadcast count-strictly-smaller pass (<=50 candidates "
        "crossed against one scan — rank = smaller-count + 1, exact "
        "because o_orderkey makes the order total). No task ever holds "
        "more than the top-k.",
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("nullif(o_orderpriority, '3-MEDIUM')").alias("pri"),
    )
    k_nf = F.struct(
        F.col("pri").isNotNull().alias("f"),  # false sorts first => nulls
        F.coalesce("pri", F.lit("")).alias("p"),
        F.col("o_orderkey").alias("k"),
    )
    k_nl = F.struct(
        F.col("pri").isNull().alias("f"),  # true sorts last => nulls
        F.coalesce("pri", F.lit("")).alias("p"),
        F.col("o_orderkey").alias("k"),
    )
    keyed = o.select(
        "o_orderkey", "pri", k_nf.alias("k_nf"), k_nl.alias("k_nl")
    )
    top_nf = keyed.orderBy("k_nf").limit(25)
    top_nl = keyed.orderBy("k_nl").limit(25)
    cand = top_nf.unionByName(top_nl).dropDuplicates(["o_orderkey"])
    counts = (
        keyed.crossJoin(
            F.broadcast(
                cand.select(
                    F.col("o_orderkey").alias("c_key"),
                    F.col("k_nf").alias("c_nf"),
                    F.col("k_nl").alias("c_nl"),
                )
            )
        )
        .groupBy("c_key")
        .agg(
            (F.sum((F.col("k_nf") < F.col("c_nf")).cast("long")) + 1)
            .cast("bigint")
            .alias("rn_nf"),
            (F.sum((F.col("k_nl") < F.col("c_nl")).cast("long")) + 1)
            .cast("bigint")
            .alias("rn_nl"),
        )
    )
    return (
        cand.select(
            "o_orderkey",
            F.coalesce(F.col("pri"), F.lit("(null)")).alias("prio"),
        )
        .join(counts, F.col("o_orderkey") == F.col("c_key"))
        .where((F.col("rn_nf") <= 25) | (F.col("rn_nl") <= 25))
        .select(
            "o_orderkey", F.col("prio").alias("pri"), "rn_nf", "rn_nl"
        )
    )


# --- array set operations ----------------------------------------------------

@register(
    "scalar_array_setops",
    f"""
    WITH t AS (SELECT doc_id, {_QF_TOKS} AS toks FROM documents),
    h AS (SELECT doc_id,
                 list_distinct(toks[1 : len(toks) // 2]) AS a,
                 list_distinct(toks[len(toks) // 2 + 1 : len(toks)]) AS b
          FROM t WHERE len(toks) >= 2)
    SELECT doc_id,
           CAST(len(a) AS BIGINT) AS n_a,
           CAST(len(b) AS BIGINT) AS n_b,
           CAST(len(list_distinct(list_concat(a, b))) AS BIGINT) AS n_union,
           CAST(len(list_filter(a, x -> list_contains(b, x))) AS BIGINT)
             AS n_intersect,
           CAST(len(list_filter(a, x -> NOT list_contains(b, x))) AS BIGINT)
             AS n_except
    FROM h
    """,
    doc="Array set operations as in-row computations: each document's "
        "token stream splits into halves; union/intersect/except "
        "cardinalities of the two distinct-token sets measure "
        "within-document vocabulary drift (a self-repetition signal "
        "complementary to text_repetition's shingle view). Spark's "
        "array_union/array_intersect/array_except deduplicate by "
        "definition; the oracle states the same set semantics via "
        "list_distinct/list_filter. Entirely scan-side array kernels — "
        "zero shuffle, the plan is one projection.",
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import tokens

    t = T(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 2)
    h = t.select(
        "doc_id",
        F.expr(
            "array_distinct(slice(toks, 1, size(toks) div 2))"
        ).alias("a"),
        F.expr(
            "array_distinct(slice(toks, size(toks) div 2 + 1, "
            "size(toks) - size(toks) div 2))"
        ).alias("b"),
    )
    return h.select(
        "doc_id",
        F.size("a").cast("bigint").alias("n_a"),
        F.size("b").cast("bigint").alias("n_b"),
        F.size(F.array_union("a", "b")).cast("bigint").alias("n_union"),
        F.size(F.array_intersect("a", "b")).cast("bigint")
        .alias("n_intersect"),
        F.size(F.array_except("a", "b")).cast("bigint").alias("n_except"),
    )


# --- first/last_value frame pin ----------------------------------------------

@register(
    "window_first_last_frame_pin",
    """
    WITH r AS (SELECT o_custkey, o_orderkey,
                      first_value(o_orderpriority) OVER w AS first_pri,
                      last_value(o_orderpriority) OVER
                          (PARTITION BY o_custkey
                           ORDER BY epoch_ms(CAST(o_orderdate AS TIMESTAMP)),
                                    o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING) AS last_pri,
                      ROW_NUMBER() OVER w AS rn
               FROM orders
               WINDOW w AS (PARTITION BY o_custkey
                            ORDER BY epoch_ms(CAST(o_orderdate AS TIMESTAMP)),
                                     o_orderkey))
    SELECT o_custkey, first_pri, last_pri
    FROM r WHERE rn = 1
    """,
    doc="FIRST_VALUE / LAST_VALUE with the frame trap pinned: under the "
        "SQL-default frame (UNBOUNDED PRECEDING..CURRENT ROW) "
        "last_value() returns the CURRENT row — the classic silent wrong "
        "answer — so the query states the full-partition frame "
        "explicitly and the gate proves first/last order priorities per "
        "customer agree bit-for-bit across engines (deterministic "
        "(date, key) ordering; date compared through epoch millis to "
        "stay calendar-free). One customer-keyed window pass shared by "
        "all three window functions.",
)
def window_first_last_frame_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority",
        F.expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))").alias("dms"),
    )
    base = W.partitionBy("o_custkey").orderBy("dms", "o_orderkey")
    w_cur = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_full = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = o.select(
        "o_custkey",
        F.first("o_orderpriority").over(w_cur).alias("first_pri"),
        F.last("o_orderpriority").over(w_full).alias("last_pri"),
        F.row_number().over(base).alias("rn"),
    )
    return r.where(F.col("rn") == 1).select(
        "o_custkey", "first_pri", "last_pri"
    )


# --- FILTER'd aggregates -----------------------------------------------------

@register(
    "agg_filter_clause",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT)
             AS n_finished,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                FILTER (WHERE l_quantity >= 25) AS BIGINT) AS qty_heavy,
           CAST(COUNT(DISTINCT l_suppkey)
                FILTER (WHERE l_discount = 0) AS BIGINT)
             AS n_supp_undiscounted
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="FILTER (WHERE ...) aggregate modifier: per-aggregate predicates "
        "in ONE pass over the fact table — the standard-SQL form of "
        "conditional aggregation (count/sum/count-distinct each with "
        "their own filter), which otherwise multiplies into CASE "
        "expressions or separate scans. Both engines support the clause "
        "natively; one hash agg, map-side combinable except the "
        "filtered distinct (which expands to its own keyed dedup, the "
        "same cost a standalone distinct would pay).",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.expr("COUNT(*) FILTER (WHERE l_linestatus = 'F')")
        .cast("bigint")
        .alias("n_finished"),
        F.expr(
            "SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_quantity >= 25)"
        ).cast("bigint").alias("qty_heavy"),
        F.expr(
            "COUNT(DISTINCT l_suppkey) FILTER (WHERE l_discount = 0)"
        ).cast("bigint").alias("n_supp_undiscounted"),
    )


# --- TRY_CAST error-safe casting ---------------------------------------------

@register(
    "scalar_try_cast",
    """
    WITH t AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 3 = 0
                           THEN 'x' || CAST(o_orderkey AS VARCHAR)
                           ELSE CAST(o_orderkey AS VARCHAR) END AS raw
               FROM orders),
    c AS (SELECT o_orderkey, raw, TRY_CAST(raw AS BIGINT) AS parsed
          FROM t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
           CAST(COUNT(*) - COUNT(parsed) AS BIGINT) AS n_failed,
           CAST(SUM(parsed) AS BIGINT) AS sum_parsed
    FROM c
    """,
    doc="TRY_CAST error-safe ingestion: a planted dirty column (every "
        "third key prefixed with a letter) parses with NULL-on-failure "
        "semantics instead of the ANSI runtime error — the standard "
        "quarantine-counting pattern for semi-trusted feeds (n_failed "
        "IS the dead-letter count; a CAST would kill the job on row "
        "one under ANSI mode). Both engines' TRY_CAST agree exactly; "
        "one projection + one scalar agg.",
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_orderkey")
    t = o.select(
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(F.lit("x"), F.col("o_orderkey").cast("string")),
        )
        .otherwise(F.col("o_orderkey").cast("string"))
        .alias("raw")
    )
    c = t.select(F.expr("TRY_CAST(raw AS BIGINT)").alias("parsed"))
    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("parsed").cast("bigint").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("parsed"))
        .cast("bigint")
        .alias("n_failed"),
        F.sum("parsed").cast("bigint").alias("sum_parsed"),
    )


# --- LATERAL correlated top-n join -------------------------------------------

_LATERAL_TOPN_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.cents
    FROM customer c,
    LATERAL (SELECT o_orderkey,
                    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                         AS BIGINT) AS cents
             FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT) DESC, o_orderkey
             LIMIT 2) o
"""


@register(
    "join_lateral_topn",
    _LATERAL_TOPN_SQL,
    doc="LATERAL correlated top-n join: each customer's two most "
        "expensive orders via a correlated ORDER BY ... LIMIT subquery — "
        "the SQL-standard spelling of per-group top-k that both engines "
        "accept verbatim (the same Spark SQL text IS the oracle text). "
        "Catalyst DECORRELATES the lateral limit into a window/rank over "
        "a single equi-join on the correlation key rather than executing "
        "the subquery per outer row — gating that the rewrite preserves "
        "tie semantics ((cents, key) deterministic ordering). Customers "
        "with no orders drop (inner lateral), matching the oracle.",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    run = abs(hash(("lat", spark.sparkContext.applicationId))) % 10**8
    cv, ov = f"pgcdc_lat_c_{run}", f"pgcdc_lat_o_{run}"
    c.createOrReplaceTempView(cv)
    o.createOrReplaceTempView(ov)
    return spark.sql(
        _LATERAL_TOPN_SQL.replace("FROM customer", f"FROM {cv}")
        .replace("FROM orders", f"FROM {ov}")
        .replace(" customer c", f" {cv} c")
    )


# --- correlated EXISTS / NOT EXISTS ------------------------------------------

_CORR_EXISTS_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_totalprice AS DECIMAL(14,2)) > 150000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
"""


@register(
    "join_correlated_exists",
    _CORR_EXISTS_SQL,
    doc="Correlated EXISTS + NOT EXISTS in one predicate: customers with "
        "at least one high-value order and no pending order — the "
        "SQL-standard spelling whose DECORRELATION both engines must "
        "agree on (Catalyst rewrites EXISTS to a left-semi and NOT "
        "EXISTS to a left-anti join on the correlation key; the same "
        "SQL text IS the oracle). Complements the DataFrame-API "
        "semi/anti queries by gating the SQL front door: a decorrelation "
        "bug that duplicated or dropped rows under the conjunction of "
        "both quantifiers would hash-mismatch here. Two co-partitioned "
        "hash joins on the customer key.",
)
def join_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    run = abs(hash(("cex", spark.sparkContext.applicationId))) % 10**8
    cv, ov = f"pgcdc_cex_c_{run}", f"pgcdc_cex_o_{run}"
    c.createOrReplaceTempView(cv)
    o.createOrReplaceTempView(ov)
    return spark.sql(
        _CORR_EXISTS_SQL.replace("FROM customer c", f"FROM {cv} c")
        .replace("FROM orders o", f"FROM {ov} o")
    )


# --- correlated scalar subquery ----------------------------------------------

_CORR_SCALAR_SQL = """
    SELECT c_custkey,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
           CAST(coalesce((SELECT SUM(CAST(CAST(o.o_totalprice
                              AS DECIMAL(14,2)) * 100 AS BIGINT))
                          FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'), 0) AS BIGINT)
             AS finished_cents
    FROM customer c
"""


@register(
    "join_correlated_scalar_subq",
    _CORR_SCALAR_SQL,
    doc="Correlated SCALAR subqueries in the projection: per customer, a "
        "correlated COUNT (must yield 0, not NULL, for order-less "
        "customers — the count-bug corner every decorrelation rewrite "
        "must get right) and a correlated filtered SUM coalesced to "
        "zero. Catalyst rewrites each into a left outer join against a "
        "pre-aggregated subquery keyed on the correlation column; the "
        "identical SQL text runs as the oracle, so a count-bug "
        "regression (NULL instead of 0 rows) or a duplicate-row rewrite "
        "hash-mismatches immediately. Two co-partitioned aggregate "
        "joins; every customer row survives exactly once.",
)
def join_correlated_scalar_subq(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    run = abs(hash(("csq", spark.sparkContext.applicationId))) % 10**8
    cv, ov = f"pgcdc_csq_c_{run}", f"pgcdc_csq_o_{run}"
    c.createOrReplaceTempView(cv)
    o.createOrReplaceTempView(ov)
    return spark.sql(
        _CORR_SCALAR_SQL.replace("FROM customer c", f"FROM {cv} c")
        .replace("FROM orders o", f"FROM {ov} o")
    )


# --- IN / NOT IN null semantics ----------------------------------------------

_NOT_IN_SQL = """
    WITH sub AS (SELECT nullif(o_custkey, 1) AS k FROM orders),
    a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_in FROM customer
          WHERE c_custkey IN (SELECT k FROM sub)),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_not_in_with_null
          FROM customer WHERE c_custkey NOT IN (SELECT k FROM sub)),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_not_in_null_stripped
          FROM customer
          WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL))
    SELECT a.n_in, b.n_not_in_with_null, c.n_not_in_null_stripped
    FROM a CROSS JOIN b CROSS JOIN c
"""


@register(
    "join_not_in_null_semantics",
    _NOT_IN_SQL,
    doc="NOT IN three-valued-logic pin — the most-ported-wrong predicate "
        "in SQL: the subquery plants one NULL (nullif on a real key), so "
        "NOT IN must return ZERO rows (x <> NULL is unknown for every "
        "x), while the NULL-stripped variant returns the real "
        "complement and IN is unaffected. Both engines must agree on "
        "all three counts; an engine or rewrite that treats NOT IN as "
        "a plain anti join without the null guard (Catalyst plans it "
        "as null-aware anti join) inflates the middle count and fails "
        "the hash. Three aggregate scalars crossed into one row.",
)
def join_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    run = abs(hash(("nin", spark.sparkContext.applicationId))) % 10**8
    cv, ov = f"pgcdc_nin_c_{run}", f"pgcdc_nin_o_{run}"
    c.createOrReplaceTempView(cv)
    o.createOrReplaceTempView(ov)
    return spark.sql(
        _NOT_IN_SQL.replace("FROM orders", f"FROM {ov}")
        .replace("FROM customer", f"FROM {cv}")
    )


# --- date/interval arithmetic ------------------------------------------------

@register(
    "scalar_date_arithmetic",
    """
    WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
               FROM orders WHERE o_orderkey % 37 = 0)
    SELECT o_orderkey,
           CAST(epoch_ms(CAST(d AS TIMESTAMP)) // 86400000 AS BIGINT)
             AS order_day_num,
           CAST(epoch_ms(CAST(d + INTERVAL 90 DAY AS TIMESTAMP)) // 86400000
                AS BIGINT) AS due_day_num,
           CAST(epoch_ms(CAST(date_trunc('month', d) AS TIMESTAMP))
                // 86400000 AS BIGINT) AS month_start_day_num,
           CAST(epoch_ms(CAST(last_day(d) AS TIMESTAMP)) // 86400000
                AS BIGINT) AS month_end_day_num,
           CAST(EXTRACT(day FROM d) AS INT) AS dom
    FROM o
    """,
    doc="Date/interval arithmetic surface: +INTERVAL addition, "
        "date_trunc-to-month, last_day, and day-of-month — the calendar "
        "operations SLA-due-date and month-boundary logic depend on, "
        "pinned where the calendars genuinely agree (month boundaries "
        "are convention-free, unlike week starts and day-of-week "
        "numbering, which stay off this surface deliberately — the "
        "engine's other temporal queries use pure epoch arithmetic for "
        "exactly that reason). Everything lands as an epoch day number, "
        "so the comparison is integer-exact. Scan-side projection on a "
        "key-sampled subset; no shuffle.",
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 37 == 0
    ).select("o_orderkey", F.col("o_orderdate").cast("date").alias("d"))

    def day_num(col):
        return F.expr(
            f"unix_millis(CAST({col} AS TIMESTAMP)) div 86400000"
        ).cast("bigint")

    return o.select(
        "o_orderkey",
        day_num("d").alias("order_day_num"),
        day_num("d + INTERVAL 90 DAY").alias("due_day_num"),
        day_num("date_trunc('month', d)").alias("month_start_day_num"),
        day_num("last_day(d)").alias("month_end_day_num"),
        F.dayofmonth("d").cast("int").alias("dom"),
    )


# --- ordered string aggregation ----------------------------------------------

@register(
    "agg_listagg_ordered",
    """
    WITH r AS (SELECT c_mktsegment, c_name,
                      CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                        AS bal_c,
                      ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                          ORDER BY CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                                        AS BIGINT) DESC, c_name) AS rn
               FROM customer)
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY bal_c DESC, c_name) AS top_names,
           CAST(SUM(bal_c) AS BIGINT) AS top_bal_cents
    FROM r WHERE rn <= 3
    GROUP BY c_mktsegment
    """,
    doc="Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP, "
        "new in Spark 4): the 3 highest-balance customer names per "
        "market segment concatenated in explicit (balance DESC, name) "
        "order — string aggregation is only deterministic WITH the "
        "order clause, which is precisely what this pins cross-engine "
        "(DuckDB's string_agg ORDER BY states the same contract). Top-3 "
        "pre-cut by a window over decimal cents so the aggregate's "
        "input set is identical on both sides; one segment-keyed "
        "window + one hash agg.",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    c = T(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_name",
        (DEC("c_acctbal", 12, 2) * 100).cast("bigint").alias("bal_c"),
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("bal_c"), F.asc("c_name")
    )
    r = c.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    return r.groupBy("c_mktsegment").agg(
        F.expr(
            "listagg(c_name, ',') WITHIN GROUP (ORDER BY bal_c DESC, c_name)"
        ).alias("top_names"),
        F.sum("bal_c").cast("bigint").alias("top_bal_cents"),
    )


# --- interpolated percentiles ------------------------------------------------

@register(
    "agg_percentile_cont",
    """
    WITH c AS (SELECT c_mktsegment,
                      CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                        AS bal_c
               FROM customer)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(quantile_cont(bal_c, 0.25) AS DOUBLE) AS p25_cents,
           CAST(quantile_cont(bal_c, 0.5) AS DOUBLE) AS p50_cents,
           CAST(quantile_cont(bal_c, 0.75) AS DOUBLE) AS p75_cents
    FROM c GROUP BY c_mktsegment
    """,
    doc="Interpolated percentiles (PERCENTILE_CONT semantics, the "
        "continuous twin of the gated percentile_disc family): quartiles "
        "of integer account-balance cents per segment. Linear "
        "interpolation between two int64 cents yields either a whole or "
        "a .5 value — both exactly representable in a double — so the "
        "cross-engine comparison stays bit-exact WITHOUT the usual "
        "float-aggregation hazard (the doc for why: interpolation at "
        "quartile ranks is (a+b)/2 or a pure element pick, never an "
        "accumulated sum). One segment-keyed sorted agg.",
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (DEC("c_acctbal", 12, 2) * 100).cast("bigint").alias("bal_c"),
    )
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY bal_c)")
        .cast("double").alias("p25_cents"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY bal_c)")
        .cast("double").alias("p50_cents"),
        F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY bal_c)")
        .cast("double").alias("p75_cents"),
    )


# --- inline VALUES dimension join --------------------------------------------

_PRIORITY_DIM = (
    "(VALUES ('1-URGENT', 1, 4), ('2-HIGH', 2, 24), ('3-MEDIUM', 3, 72), "
    "('4-NOT SPECIFIED', 4, 168), ('5-LOW', 5, 336)) "
    "AS dim(pri, sev, sla_hours)"
)


@register(
    "join_inline_values_dim",
    f"""
    SELECT dim.sev, dim.sla_hours,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders JOIN {_PRIORITY_DIM} ON o_orderpriority = dim.pri
    GROUP BY dim.sev, dim.sla_hours
    """,
    doc="Inline VALUES dimension join: a literal five-row lookup table "
        "(priority -> severity rank + SLA hours) joined to the fact "
        "table — the recode-without-a-table pattern that replaces CASE "
        "ladders with a joinable, reusable dimension, and the smallest "
        "possible demonstration of the broadcast-dim star shape (the "
        "literal relation broadcasts by construction; the fact table "
        "never shuffles before the map-side-combinable rollup). "
        "Identical VALUES syntax on both engines.",
)
def join_inline_values_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 1, 4),
            ("2-HIGH", 2, 24),
            ("3-MEDIUM", 3, 72),
            ("4-NOT SPECIFIED", 4, 168),
            ("5-LOW", 5, 336),
        ],
        "pri string, sev int, sla_hours int",
    )
    return (
        o.join(F.broadcast(dim), o.o_orderpriority == dim.pri)
        .groupBy("sev", "sla_hours")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((DEC("o_totalprice", 14, 2) * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )


# --- 3-D Pareto skyline ------------------------------------------------------

@register(
    "skyline_pareto_3d",
    """
    WITH shipped AS (SELECT l_partkey,
                            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                              AS shipped_qty
                     FROM lineitem GROUP BY l_partkey),
    base AS (SELECT p.p_partkey,
                    CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) AS price_c,
                    CAST(p.p_size AS BIGINT) AS p_size,
                    s.shipped_qty
             FROM part p JOIN shipped s ON p.p_partkey = s.l_partkey)
    SELECT a.p_partkey, a.price_c, a.p_size, a.shipped_qty
    FROM base a
    WHERE NOT EXISTS (
        SELECT 1 FROM base b
        WHERE b.price_c <= a.price_c
          AND b.p_size >= a.p_size
          AND b.shipped_qty >= a.shipped_qty
          AND (b.price_c < a.price_c OR b.p_size > a.p_size
               OR b.shipped_qty > a.shipped_qty))
    """,
    doc="3-D Pareto skyline: parts minimizing price while maximizing BOTH "
        "size and historical shipped volume — beyond 2-D the windowed "
        "staircase no longer exists (dominance is a product of "
        "halfspaces), so this runs operators/frontier.pareto_skyline_nd: "
        "a numpy dominance kernel as a per-partition mapInPandas LOCAL "
        "prune (sound under any partitioning: a local dominator is a "
        "global one) followed by the exact global pass over the "
        "vanishing survivor set in one applyInPandas group — the "
        "canonical shape for operators whose per-element test needs the "
        "whole candidate set. The oracle states dominance directly as "
        "NOT EXISTS. Restricted to shipped parts (the volume axis must "
        "exist); identical triples all survive.",
)
def skyline_pareto_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.frontier import pareto_skyline_nd

    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("bigint").alias("q")
    )
    shipped = li.groupBy("l_partkey").agg(
        F.sum("q").cast("bigint").alias("shipped_qty")
    )
    p = T(spark, sf_dir, "part").select(
        "p_partkey",
        (DEC("p_retailprice", 12, 2) * 100).cast("bigint").alias("price_c"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    base = p.join(shipped, p.p_partkey == shipped.l_partkey).select(
        "p_partkey", "price_c", "p_size", "shipped_qty"
    )
    return pareto_skyline_nd(
        base, cost="price_c", gains=["p_size", "shipped_qty"]
    )


# --- heavy-hitter concentration curve ----------------------------------------

@register(
    "events_heavy_hitters",
    """
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS n_users FROM u),
    r AS (SELECT user_id, n_events,
                 ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS rnk,
                 CAST(SUM(n_events) OVER (ORDER BY n_events DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_events
          FROM u)
    SELECT CAST(r.rnk AS BIGINT) AS rnk, r.user_id, r.n_events,
           r.cum_events,
           CAST((1000000 * r.cum_events) // tot.t AS BIGINT)
             AS cum_share_ppm
    FROM r CROSS JOIN tot
    WHERE r.rnk <= 20
    """,
    doc="Heavy-hitter concentration curve: the top-20 users by event "
        "count with running cumulative coverage in integer ppm — answers "
        "'what fraction of traffic do the K loudest sources produce', "
        "the skew-awareness report that sizes per-key salting, rate "
        "limits, and abuse review queues (reading the curve at K IS the "
        "salting decision the engine's salted-agg queries then apply). "
        "Shape: one user hash agg, then ranking windows over the "
        "ALREADY-REDUCED |users| rollup — at 100 TB the window input is "
        "users, not events, and top-20 prunes via per-partition heaps; "
        "the totals frame is a one-row broadcast.",
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = EV(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    tot = u.agg(F.sum("n_events").cast("bigint").alias("t"))
    base = W.orderBy(F.desc("n_events"), F.asc("user_id"))
    r = u.select(
        "user_id", "n_events",
        F.row_number().over(base).cast("bigint").alias("rnk"),
        F.sum("n_events")
        .over(base.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_events"),
    ).where(F.col("rnk") <= 20)
    return r.crossJoin(F.broadcast(tot)).select(
        "rnk", "user_id", "n_events", "cum_events",
        F.expr("(1000000 * cum_events) div t").cast("bigint")
        .alias("cum_share_ppm"),
    )


# --- cumulative distinct via first-seen rewrite ------------------------------

@register(
    "orders_cumulative_customers",
    """
    WITH first_seen AS (
        SELECT o_custkey,
               MIN(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000)
                 AS first_day
        FROM orders GROUP BY o_custkey),
    daily AS (SELECT first_day AS day_num,
                     CAST(COUNT(*) AS BIGINT) AS n_new
              FROM first_seen GROUP BY first_day)
    SELECT CAST(day_num AS BIGINT) AS day_num, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day_num ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_customers
    FROM daily
    """,
    doc="Cumulative distinct customers by day — growth accounting. A "
        "running COUNT(DISTINCT) is not expressible as a window "
        "aggregate on either engine; the standard rewrite is: each "
        "customer contributes exactly once at their FIRST-SEEN day, so "
        "cumulative-distinct = running sum of per-day first-appearance "
        "counts. Two hash aggs (customer-keyed min, then day rollup) "
        "and a window over the tiny |days| frame — at 100 TB the only "
        "full-data pass is the first agg, which is the natural "
        "per-customer reduction any customer-360 job already runs.",
)
def orders_cumulative_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000"
        ).alias("day_num"),
    )
    first_seen = o.groupBy("o_custkey").agg(
        F.min("day_num").alias("first_day")
    )
    daily = first_seen.groupBy(
        F.col("first_day").alias("day_num")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    w = W.orderBy("day_num").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.col("day_num").cast("bigint").alias("day_num"),
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_customers"),
    )


# --- schema-drift-tolerant union ---------------------------------------------

@register(
    "union_schema_drift",
    """
    SELECT c_custkey, c_name, NULL AS bal_cents, 'v1' AS src
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL BY NAME
    SELECT c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS bal_cents,
           'v2' AS src
    FROM customer WHERE c_custkey % 2 = 1
    """,
    doc="Schema-drift-tolerant union: two feed versions of the same "
        "entity — v1 ships names, v2 ships balances — unioned BY NAME "
        "with absent columns null-padded (Spark: "
        "unionByName(allowMissingColumns=True); DuckDB: UNION ALL BY "
        "NAME) — the batch twin of the engine's mid-stream RELATION "
        "schema evolution: a consumer reading a table across a column "
        "add/drop must align by NAME, never by position (positional "
        "UNION silently scrambles columns on drift). Pure scan-side "
        "concatenation; no shuffle.",
)
def union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    v1 = c.where(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", F.lit("v1").alias("src")
    )
    v2 = c.where(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        (DEC("c_acctbal", 12, 2) * 100).cast("bigint").alias("bal_cents"),
        F.lit("v2").alias("src"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)


# --- nested array-of-structs round-trip --------------------------------------

@register(
    "nested_struct_roundtrip",
    """
    WITH o AS (SELECT o_custkey,
                      CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT) AS cents
               FROM orders)
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM o GROUP BY o_custkey
    """,
    doc="Nested array-of-structs round-trip: per customer, orders COLLECT "
        "into a sorted array of (cents, key) structs, and the aggregates "
        "are then computed THROUGH the nested value — count via size(), "
        "min via element [0] of the struct-ordered sort, total via an "
        "aggregate() fold over the struct field — while the oracle "
        "computes them directly from the rows. Equality proves the "
        "nested path (collect_list -> struct-lexicographic sort_array -> "
        "field access/HOF fold) is a faithful multiset round-trip — the "
        "invariant every nest/unnest ETL silently depends on. One "
        "customer-keyed agg; the array lives only inside the row.",
)
def nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        (DEC("o_totalprice", 14, 2) * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    g = o.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(F.struct("cents", "o_orderkey"))
        ).alias("arr")
    )
    return g.select(
        "o_custkey",
        F.size("arr").cast("bigint").alias("n_orders"),
        F.expr("arr[0].cents").cast("bigint").alias("min_cents"),
        F.expr("aggregate(arr, 0L, (a, x) -> a + x.cents)")
        .cast("bigint")
        .alias("total_cents"),
    )


# --- funnel time-to-convert distribution -------------------------------------

@register(
    "events_funnel_time_to_convert",
    """
    WITH s1 AS (SELECT user_id, MIN(epoch_ms(ts)) AS t1
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    s3 AS (SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t3
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.t1
           GROUP BY e.user_id),
    d AS (SELECT (s3.t3 - s1.t1) // 60000 // 30 * 30 AS bucket_minutes
          FROM s1 JOIN s3 ON s1.user_id = s3.user_id)
    SELECT CAST(bucket_minutes AS BIGINT) AS bucket_minutes,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d GROUP BY bucket_minutes
    """,
    doc="Funnel latency distribution: time from first view to first "
        "subsequent purchase per converting user, as a 30-minute-bucket "
        "histogram — the latency complement of events_funnel_steps "
        "(which reports WHO converts; this reports HOW LONG conversion "
        "takes, the number a checkout-flow owner actually tunes "
        "against). Same chained filtered-min shape as the funnel "
        "(stage-2 scans only users who reached stage 1), then a "
        "map-side-combinable histogram over the bounded bucket domain; "
        "integer epoch-ms throughout.",
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = EV(spark, sf_dir).select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ms").alias("t1"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .where(F.col("ms") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("t3"))
    )
    d = s1.join(s3, "user_id").select(
        F.expr("(t3 - t1) div 60000 div 30 * 30").alias("bucket_minutes")
    )
    return d.groupBy("bucket_minutes").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    ).select(
        F.col("bucket_minutes").cast("bigint").alias("bucket_minutes"),
        "n_users",
    )


# --- session bounce rate -----------------------------------------------------

@register(
    "events_bounce_rate",
    f"""
    WITH {SESSIONIZED_EVENTS_CTE},
    per_sess AS (SELECT user_id, session_id,
                        MIN(ts_ms) AS start_ms,
                        COUNT(*) AS n_events
                 FROM sessions GROUP BY user_id, session_id)
    SELECT CAST(start_ms // 86400000 AS BIGINT) AS day_num,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM per_sess GROUP BY day_num
    """,
    doc="Daily bounce rate: share of single-event sessions per "
        "session-start day, in integer ppm — the engagement-quality "
        "staple, built on THE canonical 30-minute sessionizer every "
        "session query shares (a boundary-rule change propagates here "
        "by construction). Shape: the sessionizer's one user-keyed "
        "window, a (user, session) rollup that stays in the same "
        "partitioning, then a |days|-sized histogram agg — nothing "
        "beyond the shuffle sessionization already pays.",
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.plans.common import sessionized_events

    s = sessionized_events(spark, sf_dir)
    per_sess = s.groupBy("user_id", "session_id").agg(
        F.min("ts_ms").alias("start_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = per_sess.groupBy(
        F.expr("start_ms div 86400000").alias("day_num")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
    )
    return g.select(
        F.col("day_num").cast("bigint").alias("day_num"),
        "n_sessions", "n_bounces",
        F.expr("(1000000 * n_bounces) div n_sessions").cast("bigint")
        .alias("bounce_ppm"),
    )
