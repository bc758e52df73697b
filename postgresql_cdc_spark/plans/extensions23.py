"""Round-13 registry depth: recall-drift monitoring for the streaming-
maintained IVF index.

The maintained vector index (``cdc_stream_vector_index``) freezes its coarse
quantizer OFFLINE before the stream starts — correct for serving, but at a
100-TB store the corpus drifts away from the training distribution and
recall decays silently. The production answer is the recall curve a store
alarms on: after every ingest epoch, recall@5 of the maintained index
against brute-force truth over exactly the corpus ingested so far (the
fixed query sample every recall eval in this repo uses). This module gates
that curve end-to-end: a real StreamingQuery maintains the epoch-
partitioned postings, then each epoch's index PREFIX (the strictly-earlier-
epoch read — the replay contract doubling as time travel) is served and
scored against the replayed brute truth.

Determinism conventions: squared-L2 assignment and rounded-cosine re-rank
are the repo-wide similarity kernels (``operators/similarity``, mirrored by
``plans/extensions``' DuckDB twins); recall is integer per-mille
(``ivf_nprobe_sweep``'s convention). The oracle reconstructs each epoch's
corpus closed-form from the wave definition (wave k = ``vec_id % 3 = k``,
so the epoch-e corpus is ``vec_id % 3 <= e`` — the deterministic
mtime-ordered AvailableNow recipe shared with the r12 maintenance gates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.plans.extensions import _cos_sql, _l2_sql
from postgresql_cdc_spark.plans.registry import register

_N_EPOCHS = 3
_N_PROBE = 4


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _drift_oracle() -> str:
    per_epoch = []
    rows = []
    for e in range(_N_EPOCHS):
        per_epoch.append(f"""
corpus{e} AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 <= {e}),
assign{e} AS (
  SELECT vec_id AS neighbor_id, embedding AS ne, cell FROM (
    SELECT c.vec_id, c.embedding, cent.cell,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
               ORDER BY {_l2_sql('c.embedding', 'cent.cv')} ASC,
                        cent.cell ASC) AS rn
    FROM corpus{e} c CROSS JOIN cent
  ) WHERE rn = 1),
ivf{e} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
               ORDER BY {_cos_sql('a.ne', 'p.qe')} DESC,
                        a.neighbor_id ASC) AS rank
    FROM assign{e} a JOIN probes p USING (cell)
    WHERE a.neighbor_id <> p.query_id
  ) WHERE rank <= 5),
brute{e} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY {_cos_sql('c.embedding', 'q.qe')} DESC,
                        c.vec_id ASC) AS rank
    FROM corpus{e} c JOIN qr q ON c.vec_id <> q.query_id
  ) WHERE rank <= 5),
ov{e} AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
          FROM ivf{e} JOIN brute{e} USING (query_id, neighbor_id))""")
        rows.append(
            f"SELECT CAST({e} AS INT) AS epoch, h AS n_hits, n AS n_queries,"
            f" CAST((1000 * h) // (5 * n) AS BIGINT) AS recall_milli"
            f" FROM ov{e} CROSS JOIN nq"
        )
    return f"""
WITH cent AS (SELECT vec_id AS cell, embedding AS cv
              FROM embeddings ORDER BY vec_id LIMIT 16),
qr AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       WHERE vec_id % 100 = 0 AND len(embedding) > 0),
probes AS (
  SELECT query_id, qe, cell FROM (
    SELECT qr.query_id, qr.qe, cent.cell,
           ROW_NUMBER() OVER (PARTITION BY qr.query_id
               ORDER BY {_l2_sql('qr.qe', 'cent.cv')} ASC,
                        cent.cell ASC) AS rn
    FROM qr CROSS JOIN cent
  ) WHERE rn <= {_N_PROBE}),
nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qr),
{','.join(per_epoch)}
{' UNION ALL '.join(rows)}
"""


@register(
    "cdc_stream_ivf_recall_drift",
    _drift_oracle(),
    doc="Recall-drift curve for the STREAMING-maintained IVF index — the "
        "alarm a 100-TB vector store runs on its frozen offline quantizer: "
        "after each ingest epoch (3 foreachBatch waves, mtime-ordered under "
        "AvailableNow), recall@5 of the maintained index vs brute-force "
        "truth over exactly the corpus ingested so far, on the fixed 1% "
        "query sample. The per-epoch index state is read back through "
        "epoch_io's strictly-earlier-epoch probe — the replay-idempotence "
        "partitioning doubling as time travel, so ONE maintained store "
        "yields the whole curve without re-running the stream per point. "
        "The oracle replays each epoch's corpus closed-form (wave k = "
        "vec_id % 3 = k) against the same frozen 16-centroid quantizer "
        "and the same integer per-mille recall (ivf_nprobe_sweep's "
        "convention). Scale shape: per epoch, serving is the standard "
        "broadcast-probe IVF plan (no corpus self-join) and truth is the "
        "documented quadratic baseline over the 1% sample only; the curve "
        "a deployment computes per epoch is O(sample x corpus), never "
        "O(corpus^2).",
)
def cdc_stream_ivf_recall_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile
    import uuid

    from postgresql_cdc_spark.operators import similarity as sim
    from postgresql_cdc_spark.streaming.epoch_io import (
        epoch_overwrite,
        epochs_before,
    )

    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    base = tempfile.mkdtemp(prefix=f"pgcdc_drift_{uuid.uuid4().hex[:12]}_")
    indir = os.path.join(base, "in")
    os.makedirs(indir)
    t0 = 1_600_000_000
    for k in range(_N_EPOCHS):
        tmp = os.path.join(base, f"w{k}")
        e.where(F.col("vec_id") % 3 == k).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(indir, f"wave{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (t0 + 60 * k, t0 + 60 * k))

    # frozen offline quantizer + maintained postings: the exact
    # cdc_stream_vector_index maintenance pipe
    cents_path = os.path.join(base, "cents")
    sim.default_centroids(e, 16).write.parquet(cents_path)
    postings = os.path.join(base, "postings")

    def ingest(batch: DataFrame, epoch: int) -> None:
        sp = batch.sparkSession
        cents = sp.read.parquet(cents_path)
        assigned = sim.ivf_assign(
            batch.withColumnRenamed("vec_id", "neighbor_id"),
            cents, "neighbor_id", "embedding",
        ).select("cell", "neighbor_id", F.col("embedding").alias("nvec"))
        epoch_overwrite(assigned, postings, int(epoch))

    q = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("recall-drift ingest did not finish")
    finally:
        q.stop()

    cents = spark.read.parquet(cents_path)
    queries = e.where(
        (F.col("vec_id") % 100 == 0) & (F.size("embedding") > 0)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    nq = queries.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    # probes depend only on the frozen quantizer + fixed queries: once
    wp = Window.partitionBy("query_id").orderBy(F.asc("__d"), F.asc("cell"))
    probes = (
        queries.select("query_id", F.col("embedding").alias("qvec"))
        .join(F.broadcast(cents))
        .withColumn("__d", sim.l2sq(F.col("qvec"), F.col("__cvec")))
        .withColumn("__rn", F.row_number().over(wp))
        .where(F.col("__rn") <= _N_PROBE)
        .select("query_id", "qvec", "cell")
    )

    out = None
    for ep in range(_N_EPOCHS):
        # the maintained index as of epoch ep: the strictly-earlier probe
        # of epoch ep+1 — per-epoch time travel off one store
        posts = epochs_before(spark, postings, ep + 1)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        ivf = (
            posts.join(F.broadcast(probes), "cell")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id", "neighbor_id",
                sim.cosine_expr("nvec", "qvec").alias("cos_sim"),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("query_id", "neighbor_id")
        )
        brute = sim.topk_brute(
            e.where(F.col("vec_id") % 3 <= ep), queries, k=5
        ).select("query_id", "neighbor_id")
        row = (
            ivf.join(brute, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
            .select(F.lit(ep).cast("int").alias("epoch"), "n_hits")
        )
        out = row if out is None else out.unionByName(row)
    return out.crossJoin(F.broadcast(nq)).select(
        "epoch", "n_hits", F.col("n").alias("n_queries"),
        F.expr("CAST((1000 * n_hits) DIV (5 * n) AS BIGINT)")
        .alias("recall_milli"),
    )
