"""Trained-quantizer similarity queries: integer-exact k-means IVF.

The untrained IVF path (plans/extensions.py `sim_topk_ivf`) seeds its coarse
quantizer with the lowest-id vectors — reproducible anywhere, but the cells it
carves are arbitrary. This module adds the *trained* variant a production ANN
deployment runs: Lloyd's k-means refines the seed centroids, then assignment /
probing use the trained cells. Training is exact integer arithmetic end to end
(``operators/similarity.train_centroids_kmeans``): vectors quantize via
floor(x * 2^20) — exact in any IEEE-754 engine because multiplying by a power
of two never rounds — distances and sums are int64, and recentering is exact
floor division. That is what lets a DuckDB oracle replay BOTH Lloyd
iterations bit-for-bit: the CTE chain below is the same loop, unrolled.

Scale shape (100 TB story): per training iteration ONE corpus scan + a
``dim``-column hash agg whose map-side partials shuffle just
``n_centroids × dim`` longs; the driver holds O(n_centroids × dim) ints (the
same collect MLlib's KMeans does). Assignment and probing are literal-centroid
projections — zero shuffle, no centroid join anywhere.

Reference parity: the reference implements no vector search (SURVEY.md §2.2);
these are north-star extension operators over the `embeddings` fixture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.operators import similarity as sim
from postgresql_cdc_spark.plans.extensions import _cos_sql
from postgresql_cdc_spark.plans.registry import register

_K = sim.IVF_CENTROIDS
_ITERS = sim.KMEANS_ITERS
_SCALE = sim.KMEANS_SCALE
_N_PROBE = sim.IVF_PROBES


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- oracle SQL: the k-means loop, unrolled into CTEs -----------------------

def _quant_cte(src: str = "embeddings") -> str:
    return f"""q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE}.0) AS BIGINT)) AS qv
  FROM {src} WHERE len(embedding) > 0
)"""


def _seed_cte() -> str:
    return f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         qv AS cv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {_K})
)"""


_IDIST = """list_reduce(list_concat([CAST(0 AS BIGINT)],
               list_transform(range(1, len({v}) + 1),
                 i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i]))),
               (acc, x) -> acc + x)"""


def _assign_cte(t: int, prev: str) -> str:
    d = _IDIST.format(v="q.qv", c="c.cv")
    return f"""a{t} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT q.vec_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {d} ASC, c.cell ASC) AS rn
    FROM q CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""


def _recenter_cte(t: int, prev: str) -> str:
    # Exact floored division regardless of the engine's integer-division
    # rounding: (s - nonneg_residue) is exactly divisible by n.
    # CAST back to BIGINT: DuckDB's SUM over BIGINT promotes to HUGEINT, and
    # a HUGEINT list column in the final output renders as float through the
    # driver's arrow/pandas fetch (44482.0 vs Spark's 44482) — the recentered
    # value always fits BIGINT (mean of BIGINT inputs), so the cast is exact.
    return f"""s{t} AS (
  SELECT cell, pos, SUM(x) AS s, COUNT(*) AS n
  FROM (SELECT cell, unnest(list_transform(range(1, len(qv) + 1),
                  i -> {{'pos': i, 'x': qv[i]}}), recursive := true)
        FROM a{t})
  GROUP BY cell, pos
),
c{t} AS (
  SELECT p.cell, coalesce(nc.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN (
    SELECT cell, list(CAST((s - ((s % n + n) % n)) // n AS BIGINT)
                      ORDER BY pos) AS cv
    FROM s{t} GROUP BY cell
  ) nc USING (cell)
)"""


def _kmeans_ctes(iters: int = _ITERS, src: str = "embeddings") -> tuple[str, str, int]:
    """(CTE chain, name of the trained-centroid CTE, final assign index)."""
    parts = [_quant_cte(src), _seed_cte()]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(_assign_cte(t, prev))
        parts.append(_recenter_cte(t, prev))
        prev = f"c{t}"
    final_t = iters + 1
    parts.append(_assign_cte(final_t, prev))
    return ",\n".join(parts), prev, final_t


_CTES, _CFINAL, _AFINAL = _kmeans_ctes()

_KMEANS_CELL_STATS_ORACLE = f"""
WITH {_CTES}
SELECT a{_AFINAL}.cell,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       MIN(a{_AFINAL}.vec_id) AS min_vec_id,
       CAST(MIN(cs.centroid_sum) AS BIGINT) AS centroid_sum
FROM a{_AFINAL} JOIN (SELECT cell, list_reduce(cv, (a, b) -> a + b)
                          AS centroid_sum
                      FROM {_CFINAL}) cs USING (cell)
GROUP BY a{_AFINAL}.cell
"""


@register(
    "ivf_kmeans_cell_stats",
    _KMEANS_CELL_STATS_ORACLE,
    doc="IVF quantizer training health check: 2 Lloyd iterations of integer-"
        "exact k-means (floor(x*2^20) quantization), then per trained cell "
        "the member count, min member id, and the exact integer centroid "
        "checksum. Training = one scan + one tiny hash agg per iteration; "
        "assignment = literal-centroid projection, zero shuffle.",
)
def ivf_kmeans_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_kmeans(e, n_centroids=_K, iters=_ITERS)
    assigned = sim.assign_cells_trained(e, cents)
    sums = [sum(c) for c in cents]
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .withColumn(
            "centroid_sum",
            F.element_at(
                F.array(*[F.lit(s) for s in sums]),
                F.col("cell").cast("int") + 1,
            ),
        )
    )


_TOPK_IVF_TRAINED_ORACLE = f"""
WITH {_CTES},
qr AS (SELECT vec_id AS query_id, embedding AS qe,
              list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE}.0)
                       AS BIGINT)) AS qqv
       FROM embeddings WHERE vec_id % 100 = 0 AND len(embedding) > 0),
probes AS (
  SELECT query_id, qe, cell FROM (
    SELECT qr.query_id, qr.qe, c.cell,
           row_number() OVER (PARTITION BY qr.query_id
                              ORDER BY {_IDIST.format(v="qr.qqv", c="c.cv")}
                                       ASC, c.cell ASC) AS rn
    FROM qr CROSS JOIN {_CFINAL} c
  ) WHERE rn <= {_N_PROBE}
),
ne AS (SELECT a.vec_id AS neighbor_id, e.embedding AS nv, a.cell
       FROM a{_AFINAL} a JOIN embeddings e ON a.vec_id = e.vec_id),
scored AS (
  SELECT p.query_id, ne.neighbor_id, {_cos_sql('ne.nv', 'p.qe')} AS cos_sim
  FROM ne JOIN probes p USING (cell)
  WHERE ne.neighbor_id <> p.query_id
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
    "sim_topk_ivf_trained",
    _TOPK_IVF_TRAINED_ORACLE,
    doc="ANN top-5 over the TRAINED IVF index: k-means cells, integer-exact "
        "probe ranking (4 of 16 cells), exact cosine re-rank. Assignment and "
        "probing are literal-centroid projections (no centroid join, no "
        "window over a centroid cross product) — strictly less shuffle than "
        "the untrained path at any scale.",
)
def sim_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_kmeans(e, n_centroids=_K, iters=_ITERS)
    return _trained_topk(e, cents)


def _trained_topk(e: DataFrame, cents: list[list[int]], k: int = 5,
                  n_probe: int = _N_PROBE) -> DataFrame:
    """Top-k over the trained IVF index for the standard query set
    (vec_id % 100 == 0): literal-centroid assignment + probe, cosine
    re-rank."""
    assigned = sim.assign_cells_trained(
        e.withColumnRenamed("vec_id", "neighbor_id"), cents, "neighbor_id"
    ).withColumnRenamed("embedding", "__nvec")

    q = e.where((F.col("vec_id") % 100 == 0) & (F.size("embedding") > 0)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qvec")
    )
    probes = q.select(
        "query_id", "__qvec",
        F.explode(
            F.expr(sim.topn_cells_sql(sim.quantize_sql("__qvec"), cents, n_probe))
        ).alias("cell"),
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            sim.cosine_expr("__nvec", "__qvec").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


# --- SemDeDup: semantic dedup via the trained quantizer ---------------------

# Corpus with planted duplicates (same construction as dedup_embedding_cosine:
# every 50th vector re-enters under id+100000), so the prune provably fires.
_SEM_SRC = """src AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 50 = 0
)"""

_SEM_CTES, _SEM_CFINAL, _SEM_AFINAL = _kmeans_ctes(src="src")

_SEMDEDUP_ORACLE = f"""
WITH {_SEM_SRC},
{_SEM_CTES},
av AS (SELECT a.vec_id, a.cell, s.embedding
       FROM a{_SEM_AFINAL} a JOIN src s ON a.vec_id = s.vec_id),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.999
)
SELECT av.vec_id, av.cell FROM av ANTI JOIN dropped USING (vec_id)
"""


@register(
    "semdedup_survivors",
    _SEMDEDUP_ORACLE,
    doc="SemDeDup (Abbas et al. 2023) semantic dedup: k-means-cluster the "
        "embeddings (trained quantizer), then within each cell drop every "
        "vector with a lower-id member at cosine >= 0.999. The self-join is "
        "equi on cell, so candidates are cell-bounded — O(N^1.5) with "
        "k = O(sqrt N) cells, never all-pairs. Planted duplicates "
        "(id+100000 copies of every 50th vector) verify the prune fires.",
)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    dup = e.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    src = e.select("vec_id", "embedding").unionByName(dup)
    cents = sim.train_centroids_kmeans(src, n_centroids=_K, iters=_ITERS)
    return sim.semdedup_prune(src, cents, threshold=0.999)


# --- ANN quality evaluation: trained-IVF recall vs brute-force truth --------

_RECALL_ORACLE = f"""
WITH {_CTES},
qr AS (SELECT vec_id AS query_id, embedding AS qe,
              list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE}.0)
                       AS BIGINT)) AS qqv
       FROM embeddings WHERE vec_id % 100 = 0 AND len(embedding) > 0),
probes AS (
  SELECT query_id, qe, cell FROM (
    SELECT qr.query_id, qr.qe, c.cell,
           row_number() OVER (PARTITION BY qr.query_id
                              ORDER BY {_IDIST.format(v="qr.qqv", c="c.cv")}
                                       ASC, c.cell ASC) AS rn
    FROM qr CROSS JOIN {_CFINAL} c
  ) WHERE rn <= {_N_PROBE}
),
ne AS (SELECT a.vec_id AS neighbor_id, e.embedding AS nv, a.cell
       FROM a{_AFINAL} a JOIN embeddings e ON a.vec_id = e.vec_id),
ivf_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM (SELECT p.query_id, ne.neighbor_id,
               {_cos_sql('ne.nv', 'p.qe')} AS cos_sim
        FROM ne JOIN probes p USING (cell)
        WHERE ne.neighbor_id <> p.query_id)
),
brute_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM (SELECT q.query_id, e.vec_id AS neighbor_id,
               {_cos_sql('e.embedding', 'q.qe')} AS cos_sim
        FROM embeddings e JOIN qr q ON e.vec_id <> q.query_id)
),
overlap AS (
  SELECT i.query_id, COUNT(*) AS n_overlap
  FROM ivf_ranked i JOIN brute_ranked b
    ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
  WHERE i.rank <= 5 AND b.rank <= 5
  GROUP BY i.query_id
)
SELECT qr.query_id, CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap
FROM qr LEFT JOIN overlap o USING (query_id)
"""


@register(
    "ivf_recall_eval",
    _RECALL_ORACLE,
    doc="ANN index quality evaluation: per query, how many of the trained-"
        "IVF top-5 appear in the exact brute-force top-5 (recall@5 "
        "numerator). The measure-don't-guess gate every ANN deployment "
        "runs before trusting an index; brute truth is the documented "
        "quadratic baseline over the 1% query sample.",
)
def ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_kmeans(e, n_centroids=_K, iters=_ITERS)
    ivf = _trained_topk(e, cents)

    q = e.where((F.col("vec_id") % 100 == 0) & (F.size("embedding") > 0)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = sim.topk_brute(e, q, k=5)
    ov = (
        ivf.select("query_id", "neighbor_id")
        .join(brute.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return q.select("query_id").join(ov, "query_id", "left").select(
        "query_id", F.coalesce(F.col("__n"), F.lit(0)).alias("n_overlap")
    )


# --- ANN tuning: recall@5 vs nprobe sweep ------------------------------------

_SWEEP_PROBES = (1, 2, 4, 8)


def _nprobe_sweep_oracle() -> str:
    """One CTE chain per swept nprobe (same trained index, same query set,
    same brute truth) unioned into a 4-row recall curve."""
    per_np = []
    rows = []
    for np_ in _SWEEP_PROBES:
        per_np.append(f"""
probes{np_} AS (
  SELECT query_id, qe, cell FROM (
    SELECT qr.query_id, qr.qe, c.cell,
           row_number() OVER (PARTITION BY qr.query_id
                              ORDER BY {_IDIST.format(v="qr.qqv", c="c.cv")}
                                       ASC, c.cell ASC) AS rn
    FROM qr CROSS JOIN {_CFINAL} c
  ) WHERE rn <= {np_}
),
ivf{np_} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, ne.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
               ORDER BY {_cos_sql('ne.nv', 'p.qe')} DESC,
                        ne.neighbor_id ASC) AS rank
    FROM ne JOIN probes{np_} p USING (cell)
    WHERE ne.neighbor_id <> p.query_id
  ) WHERE rank <= 5
),
ov{np_} AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
            FROM ivf{np_} JOIN brute USING (query_id, neighbor_id))""")
        rows.append(
            f"SELECT CAST({np_} AS INT) AS nprobe, h AS n_hits, n AS n_queries,"
            f" CAST((1000 * h) // (5 * n) AS BIGINT) AS recall_milli"
            f" FROM ov{np_} CROSS JOIN nq"
        )
    return f"""
WITH {_CTES},
qr AS (SELECT vec_id AS query_id, embedding AS qe,
              list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE}.0)
                       AS BIGINT)) AS qqv
       FROM embeddings WHERE vec_id % 100 = 0 AND len(embedding) > 0),
ne AS (SELECT a.vec_id AS neighbor_id, e.embedding AS nv, a.cell
       FROM a{_AFINAL} a JOIN embeddings e ON a.vec_id = e.vec_id),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY {_cos_sql('e.embedding', 'q.qe')} DESC,
                        e.vec_id ASC) AS rank
    FROM embeddings e JOIN qr q ON e.vec_id <> q.query_id
  ) WHERE rank <= 5
),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qr),
{','.join(per_np)}
{' UNION ALL '.join(rows)}
"""


@register(
    "ivf_nprobe_sweep",
    _nprobe_sweep_oracle(),
    doc="ANN tuning curve: recall@5 of the trained IVF index at nprobe in "
        "{1, 2, 4, 8} against the exact brute-force truth — the "
        "recall-vs-cost sweep every vector-search deployment runs to pick "
        "its operating point (nprobe/16 of the corpus scanned per query "
        "vs fraction of true neighbors found), extending ivf_recall_eval "
        "(one fixed config, per-query) to the full tuning report "
        "(aggregate, per config). One trained index, one brute truth, "
        "four probe depths; the only per-config cost is re-ranking the "
        "probed cells — the index and truth are computed once and "
        "reused, so the sweep is 4x the probe stage, not 4x the "
        "pipeline. Integer per-mille recall; each summary is a "
        "one-row scalar broadcast.",
)
def ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_kmeans(e, n_centroids=_K, iters=_ITERS)

    q = e.where(
        (F.col("vec_id") % 100 == 0) & (F.size("embedding") > 0)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    brute = (
        sim.topk_brute(e, q, k=5)
        .select("query_id", "neighbor_id")
        .persist()
    )
    nq = q.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    out = None
    for np_ in _SWEEP_PROBES:
        ivf = _trained_topk(e, cents, n_probe=np_).select(
            "query_id", "neighbor_id"
        )
        row = (
            ivf.join(brute, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
            .select(F.lit(np_).cast("int").alias("nprobe"), "n_hits")
        )
        out = row if out is None else out.unionByName(row)
    return (
        out.crossJoin(F.broadcast(nq))
        .select(
            "nprobe", "n_hits", F.col("n").alias("n_queries"),
            F.expr("(1000 * n_hits) div (5 * n)").cast("bigint")
            .alias("recall_milli"),
        )
    )


# --- embedding outliers: distance-to-assigned-centroid ------------------------

_OUTLIER_ORACLE = f"""
WITH {_CTES},
d AS (
  SELECT vec_id, cell, dmin FROM (
    SELECT q.vec_id, c.cell,
           {_IDIST.format(v="q.qv", c="c.cv")} AS dmin,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_IDIST.format(v="q.qv", c="c.cv")}
                                       ASC, c.cell ASC) AS rn
    FROM q CROSS JOIN {_CFINAL} c
  ) WHERE rn = 1
)
SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       CAST(dmin AS BIGINT) AS dist_q,
       CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id ASC) AS rnk
      FROM d)
WHERE rnk <= 20
"""


@register(
    "emb_centroid_outliers",
    _OUTLIER_ORACLE,
    doc="Embedding outlier detection: the 20 vectors farthest from their "
        "assigned (trained) centroid by integer-quantized squared L2 — "
        "the data-quality screen that surfaces mislabeled, corrupted, or "
        "out-of-distribution embeddings before they poison retrieval or "
        "training (SemDeDup's complement: near-dups are too close, these "
        "are too far from everything). Assignment AND distance come from "
        "the same literal-centroid array_min projection (zero shuffle, "
        "no centroid join); the global top-20 is a TakeOrdered over "
        "per-partition heaps, never a full sort. Deterministic "
        "(distance, id) tie-break; bit-identical to the oracle's "
        "unrolled k-means chain.",
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_kmeans(e, n_centroids=_K, iters=_ITERS)
    structs = ", ".join(
        f"struct({sim._qdist_sql(sim.quantize_sql('embedding'), c)} AS d, "
        f"{j}L AS cell)"
        for j, c in enumerate(cents)
    )
    best = F.expr(f"array_min(array({structs}))")
    d = e.where(F.size("embedding") > 0).select(
        "vec_id",
        best.getField("cell").alias("cell"),
        best.getField("d").alias("dist_q"),
    )
    w = Window.orderBy(F.desc("dist_q"), F.asc("vec_id"))
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select(
            "vec_id", F.col("cell").cast("bigint").alias("cell"),
            F.col("dist_q").cast("bigint").alias("dist_q"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
