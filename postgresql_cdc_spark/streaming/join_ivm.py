"""Replay-idempotent JOIN-view incremental maintenance for foreachBatch.

Maintains ``SUM(fact.amount), COUNT(*) per dim.grp over fact JOIN dim``
from signed row deltas — the counting-IVM delta rule (Koch's incremental
algebra; DBSP/Materialize lineage):

    delta(F JOIN D) = dF JOIN D_old  UNION ALL  F_new JOIN dD

which expands to dF·D_old + F_old·dD + dF·dD, so same-batch changes on
both sides apply exactly once. The running aggregate is only ever
ADJUSTED (|groups| + |delta| rows per batch); history is never
recomputed.

State layout and the replay contract: each batch writes parquet dirs
``<base>/{dim,fact,sums}_v<batch_id>``, and every read resolves the
LATEST VERSION STRICTLY BELOW the current batch id from a directory
listing — never from in-process memory. That makes the step idempotent
under Structured Streaming's at-least-once foreachBatch in BOTH crash
windows the in-memory-list pattern gets wrong:

- a batch retried in-run (crash after some of its writes): the retry
  resolves the previous batch's versions, not its own partial ones, and
  ``mode("overwrite")`` replaces the crashed attempt wholesale;
- a checkpoint RESTART (new process, empty memory): versions come back
  from disk, so the replayed batch sees exactly the committed prefix
  instead of treating itself as the first batch.

This is ``epoch_io``'s strictly-earlier-epoch contract applied to a
versioned-state pipeline. Gated end-to-end by
``plans/streaming_gate.cdc_stream_ivm_join_sums``; the crash windows are
pinned by ``tests/test_join_ivm.py``.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

DIM_DDL = "id long, grp int, op string, lsn long"
FACT_DDL = "fid long, did long, amount int, op string, lsn long"
SUMS_DDL = "grp int, dn long, dq long"


def version_dir(base: str, prefix: str, bid: int) -> str:
    return os.path.join(base, f"{prefix}_v{int(bid)}")


def prev_version(base: str, prefix: str, below: Optional[int]) -> Optional[int]:
    """Largest committed version strictly below ``below`` (all versions when
    ``below`` is None), from the directory listing — a crashed attempt at
    ``below`` itself is deliberately invisible."""
    best = None
    tag = f"{prefix}_v"
    try:
        names = os.listdir(base)
    except OSError:
        return None
    for n in names:
        if not n.startswith(tag):
            continue
        try:
            k = int(n[len(tag):])
        except ValueError:
            continue
        if (below is None or k < below) and (best is None or k > best):
            best = k
    return best


def _read_version(
    spark: SparkSession, base: str, prefix: str, ddl: str, below: Optional[int]
) -> Optional[DataFrame]:
    v = prev_version(base, prefix, below)
    if v is None:
        return None
    return spark.read.schema(ddl).parquet(version_dir(base, prefix, v))


def merge_latest_wins(prev: Optional[DataFrame], batch: DataFrame, key: str) -> DataFrame:
    """Latest-wins key-state merge (per-key window, bounded by versions of
    one key), deletes dropped from the surviving state."""
    combined = prev.unionByName(batch) if prev is not None else batch
    w = Window.partitionBy(key).orderBy(F.desc("lsn"))
    return (
        combined.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") != "D"))
        .drop("__rn")
    )


def signed_diff(
    old: DataFrame, new: DataFrame, key: str, payload: list[str]
) -> DataFrame:
    """Signed row deltas old -> new: (-1, old payload) for vanished or
    changed keys, (+1, new payload) for appeared or changed keys —
    null-safe on every payload column (the cdc_snapshot_diff convention)."""
    o = old.select(
        F.col(key).alias("__ok"),
        *[F.col(c).alias(f"__o_{c}") for c in payload],
    )
    n = new.select(key, *payload)
    j = o.join(n, o.__ok == F.col(key), "full_outer")
    changed = F.col(key).isNotNull() & F.col("__ok").isNotNull() & (
        ~F.struct(*payload).eqNullSafe(
            F.struct(*[F.col(f"__o_{c}").alias(c) for c in payload])
        )
    )
    minus = F.when(
        F.col("__ok").isNotNull() & (F.col(key).isNull() | changed),
        F.struct(
            F.lit(-1).alias("sign"),
            F.col("__ok").alias(key),
            *[F.col(f"__o_{c}").alias(c) for c in payload],
        ),
    )
    plus = F.when(
        F.col(key).isNotNull() & (F.col("__ok").isNull() | changed),
        F.struct(
            F.lit(1).alias("sign"),
            F.col(key).alias(key),
            *[F.col(c).alias(c) for c in payload],
        ),
    )
    return j.select(
        F.explode(F.array_compact(F.array(minus, plus))).alias("d")
    ).select("d.*")


def apply_batch(
    spark: SparkSession,
    base: str,
    batch_id: int,
    d_batch: DataFrame,
    f_batch: DataFrame,
) -> None:
    """One foreachBatch step: merge both key states, signed-diff each,
    apply the join delta rule, fold into the sums table. Every prior-state
    read resolves strictly below ``batch_id`` (see module docstring)."""
    bid = int(batch_id)
    d_prev_full = _read_version(spark, base, "dim", DIM_DDL, bid)
    f_prev_full = _read_version(spark, base, "fact", FACT_DDL, bid)
    d_old = (
        d_prev_full.select("id", "grp")
        if d_prev_full is not None
        else spark.createDataFrame([], DIM_DDL).select("id", "grp")
    )
    f_old = (
        f_prev_full.select("fid", "did", "amount")
        if f_prev_full is not None
        else spark.createDataFrame([], FACT_DDL).select("fid", "did", "amount")
    )

    d_new_full = merge_latest_wins(d_prev_full, d_batch, "id")
    f_new_full = merge_latest_wins(f_prev_full, f_batch, "fid")
    d_new_full.write.mode("overwrite").parquet(version_dir(base, "dim", bid))
    f_new_full.write.mode("overwrite").parquet(version_dir(base, "fact", bid))
    d_new = spark.read.schema(DIM_DDL).parquet(
        version_dir(base, "dim", bid)
    ).select("id", "grp")
    f_new = spark.read.schema(FACT_DDL).parquet(
        version_dir(base, "fact", bid)
    ).select("fid", "did", "amount")

    d_delta = signed_diff(d_old, d_new, "id", ["grp"])
    f_delta = signed_diff(f_old, f_new, "fid", ["did", "amount"])

    # delta(F JOIN D) = dF JOIN D_old  UNION ALL  F_new JOIN dD
    c1 = f_delta.join(d_old, f_delta.did == d_old.id).select(
        F.col("grp"),
        F.col("sign").cast("long").alias("dn"),
        (F.col("sign") * F.col("amount")).cast("long").alias("dq"),
    )
    c2 = f_new.join(d_delta, f_new.did == d_delta.id).select(
        F.col("grp"),
        F.col("sign").cast("long").alias("dn"),
        (F.col("sign") * F.col("amount")).cast("long").alias("dq"),
    )
    deltas = c1.unionByName(c2)
    prev_sums = _read_version(spark, base, "sums", SUMS_DDL, bid)
    if prev_sums is not None:
        deltas = prev_sums.unionByName(deltas)
    new_sums = (
        deltas.groupBy("grp")
        .agg(F.sum("dn").alias("dn"), F.sum("dq").alias("dq"))
        .where(F.col("dn") != 0)
    )
    new_sums.write.mode("overwrite").parquet(version_dir(base, "sums", bid))


def latest_sums(spark: SparkSession, base: str) -> DataFrame:
    """The maintained view after the stream: the newest committed sums
    version, as (grp, n_rows, total)."""
    sums = _read_version(spark, base, "sums", SUMS_DDL, None)
    if sums is None:
        raise RuntimeError(f"no batch reached the join-IVM sink at {base!r}")
    return sums.select(
        "grp", F.col("dn").alias("n_rows"), F.col("dq").alias("total")
    )
