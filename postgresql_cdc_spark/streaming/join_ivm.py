"""Replay-idempotent JOIN-view incremental maintenance for foreachBatch,
with a CLOSED state lifecycle: per-batch work and per-batch state I/O are
O(|batch|), disk is bounded regardless of stream age.

Maintains ``SUM(fact.amount), COUNT(*) per dim.grp over fact JOIN dim``
from signed row deltas — the counting-IVM delta rule (Koch's incremental
algebra; DBSP/Materialize lineage):

    delta(F JOIN D) = dF JOIN D_old  UNION ALL  F_new JOIN dD

which expands to dF·D_old + F_old·dD + dF·dD, so same-batch changes on
both sides apply exactly once. The running aggregate is only ever
ADJUSTED (|groups| + |delta| rows per batch); history is never
recomputed.

State layout (all under one base directory):

- ``dim_kv`` / ``fact_kv`` — latest-wins key-value stores backed by the
  epoch store (``streaming/epoch_io.py``): each batch writes ONLY its own
  collapsed rows (delete tombstones included) under
  ``ingest_epoch=<batch_id>`` via dynamic partition overwrite, and the
  current state of a key is resolved by a per-key latest-LSN window over
  the base fold plus the live partials. ``maybe_compact``
  (``streaming/epoch_maintenance.py``) folds old epochs into the
  manifest-committed base, so live partials stay bounded by the cap and
  the per-batch write is O(|batch|), never a full-state rewrite.
- ``fact_by_did`` — the by-FOREIGN-KEY arrangement (Materialize's
  "arrangement" / DBSP's indexed Z-set): the batch's SIGNED fact deltas,
  epoch-partitioned and consolidated on compaction
  (``sum(sign) per (fid, did, amount)``, zero rows dropped). Integrating
  it yields the live fact multiset KEYED BY ``did`` — which is what the
  ``F_new JOIN dD`` leg probes; resolving latest-wins-by-fid there would
  be wrong once a fact re-points its FK (the old row is invisible to a
  did-filtered latest-wins), while signed rows stay correct under
  addition for any key restriction.
- ``sums_v<batch_id>`` — the maintained aggregate, tiny (|groups| rows),
  versioned per batch with the previous generation retained and everything
  older SWEPT (:func:`sweep_versions`): Structured Streaming replays at
  most the last uncommitted batch, and a replay resolves strictly below
  its own id, so latest-committed + in-flight is the whole replay window.

Per-batch dataflow (all O(|batch|) shuffle/compute):

1. ``maybe_compact`` each store at the CALLER's batch id (the horizon
   convention of ``epoch_maintenance``: a crashed attempt's own partition
   must stay live so the replay's overwrite replaces it wholesale).
2. Collapse the batch latest-wins per key, write it as the stores' epoch.
3. Diff ONLY the batch's keys: probe prior state with a broadcast
   left-semi join on the batch's distinct keys, then extract each key's
   old and new image in ONE ``max_by`` aggregation and derive the
   retract/assert pair from the image pair — one store scan, one key
   shuffle, no window sorts, no join; never a full-outer of full old
   state against full new state.
4. ``dF JOIN D_old``: probe ``dim_kv`` with the fact delta's distinct FK
   values (broadcast, batch-bounded) and join the fact delta against the
   resolved O(|batch|) dim rows — broadcast, so a hot dimension key never
   becomes a skewed shuffle (the fact delta is not exchanged at all).
5. ``F_new JOIN dD``: restrict the integrated ``fact_by_did`` arrangement
   to the dim delta's keys (broadcast semi-join; consolidation commutes
   with any did restriction because signed rows group by the full triple)
   and join against the broadcast dim delta.
6. Fold the signed (grp, dn, dq) deltas into the previous sums version,
   write ``sums_v<bid>``, sweep versions behind the previous generation.

Replay contract: every prior-state read resolves STRICTLY BELOW the
current batch id (``epoch_io``'s strictly-earlier-epoch contract for the
kv/arrangement stores; :func:`prev_version` for the sums), so a crashed
attempt's partial writes are invisible to its replay — which then
recomputes byte-identical deltas from the same committed prefix and
replaces the crashed partitions via dynamic overwrite. Crash windows are
pinned by ``tests/test_join_ivm.py``; the delta algebra by
``tests/test_join_ivm_fuzz.py``; the bounded lifecycle by the retention
test and ``tools/join_ivm_lifecycle_soak.py``.

Ordering note: epochs partition the change stream in commit order, so a
later epoch never carries an LSN below an earlier epoch's (the WAL
source's guarantee). Ties on (key, lsn) — impossible in a real WAL, where
every change owns a distinct LSN — resolve deterministically by ``op``
descending, so replayed and restarted runs materialize identical state by
construction.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

from postgresql_cdc_spark.streaming.epoch_io import EPOCH_COL, epoch_overwrite
from postgresql_cdc_spark.streaming.epoch_maintenance import (
    epochs_before_compacted,
    maybe_compact,
    read_epoch_store,
)

DIM_DDL = "id long, grp int, op string, lsn long"
FACT_DDL = "fid long, did long, amount int, op string, lsn long"
ARR_DDL = "fid long, did long, amount int, sign int"
DIM_DELTA_DDL = "sign int, id long, grp int"
SUMS_DDL = "grp int, dn long, dq long"


# --- versioned small-table helpers (sums / supports) --------------------------

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


def sweep_versions(base: str, prefix: str, keep_from: int) -> int:
    """Delete version dirs strictly below ``keep_from`` — the retention pass
    the versioned layout needs to stay bounded. Retaining the latest
    committed generation plus the in-flight one covers the whole replay
    window: Structured Streaming replays at most the last uncommitted batch,
    whose reads resolve strictly below itself, i.e. the retained previous
    generation. Crash-safe to interrupt: the next batch's sweep finishes it."""
    deleted = 0
    tag = f"{prefix}_v"
    try:
        names = os.listdir(base)
    except OSError:
        return 0
    for n in names:
        if not n.startswith(tag):
            continue
        try:
            k = int(n[len(tag):])
        except ValueError:
            continue
        if k < int(keep_from):
            shutil.rmtree(os.path.join(base, n), ignore_errors=True)
            deleted += 1
    return deleted


def fold_versioned(
    spark: SparkSession,
    base: str,
    prefix: str,
    ddl: str,
    group_cols: list[str],
    epoch: int,
    deltas: DataFrame,
    drop_when_zero: str,
) -> None:
    """Fold signed deltas into the previous committed version of a small
    grouped table (sums, support counts): union, re-group, drop groups whose
    ``drop_when_zero`` sum reaches zero, write ``<prefix>_v<epoch>``, then
    sweep versions behind the previous generation. Per-batch cost is
    |groups| + |delta| rows — the table is bounded by the group domain, so
    full-version rewrite is the cheap, simple choice here (the KEY state is
    where O(|state|) rewrites hurt; that lives in the epoch stores).

    Raises when the retention floor was swept PAST the replayed batch —
    ``prev_version`` finds nothing below ``epoch`` while committed versions
    at or above it exist (a version AT ``epoch`` alone is the normal crashed
    attempt a replay overwrites; STRICTLY NEWER versions mean later batches
    committed and swept, so the replay's prior state is gone). Restarting
    the aggregate from empty there would be silent corruption; the kv path
    already raises loudly on the analogous misuse
    (``epochs_before_compacted``'s below-base ValueError — r15 advice)."""
    epoch = int(epoch)
    pv = prev_version(base, prefix, epoch)
    if pv is None:
        newest = prev_version(base, prefix, None)
        if newest is not None and newest > epoch:
            raise ValueError(
                f"versioned table {prefix!r} at {base!r}: batch {epoch} "
                f"replayed after the retention sweep passed it (newest "
                f"committed version {newest}); its previous generation no "
                "longer exists — a committed micro-batch must never re-run"
            )
    if pv is not None:
        prev = spark.read.schema(ddl).parquet(version_dir(base, prefix, pv))
        deltas = prev.unionByName(deltas)
    st = StructType.fromDDL(ddl)
    aggs = [
        F.sum(f.name).cast(f.dataType).alias(f.name)
        for f in st.fields
        if f.name not in group_cols
    ]
    out = (
        deltas.groupBy(*group_cols)
        .agg(*aggs)
        .where(F.col(drop_when_zero) != 0)
    )
    out.write.mode("overwrite").parquet(version_dir(base, prefix, epoch))
    sweep_versions(base, prefix, pv if pv is not None else epoch)


# --- latest-wins kv state over the epoch store --------------------------------

def _resolve(rows: DataFrame, key: str) -> DataFrame:
    """Latest-wins per key, tombstones dropped from the survivors. The
    window is bounded by versions of ONE key. Tie-break: ``op`` descending
    after ``lsn`` descending — arbitrary but DETERMINISTIC, so replays and
    restarts materialize identical state even on (impossible-in-WAL)
    duplicate LSNs."""
    w = Window.partitionBy(key).orderBy(F.desc("lsn"), F.desc("op"))
    return (
        rows.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") != "D"))
        .drop("__rn")
    )


def collapse_batch(batch: DataFrame, key: str) -> DataFrame:
    """One row per key: the batch's latest change, KEEPING delete
    tombstones (unlike :func:`_resolve` — the store needs the tombstone to
    mask earlier epochs' live rows). Same deterministic ordering."""
    w = Window.partitionBy(key).orderBy(F.desc("lsn"), F.desc("op"))
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_wins_merge(key: str):
    """Schema-preserving ``maybe_compact`` merge for a latest-wins kv store:
    the fold keeps only each key's newest image and drops keys whose newest
    change is a delete — safe because surviving partials' LSNs are never
    below the fold's (stream order; see module docstring)."""
    return lambda df: _resolve(df, key)


def _consolidate(df: DataFrame) -> DataFrame:
    """Z-set consolidation for the by-FK arrangement: net sign per full row
    triple, zeros dropped. Doubles as the store's compaction merge."""
    return (
        df.groupBy("fid", "did", "amount")
        .agg(F.sum("sign").cast("int").alias("sign"))
        .where(F.col("sign") != 0)
    )


def _history(
    spark: SparkSession, store: str, ddl: str, before: Optional[int]
) -> DataFrame:
    """Rows of the store's live epochs strictly before ``before`` (all live
    epochs when None), read with an explicit schema: delegates to the
    manifest-aware ``epoch_maintenance`` readers so the horizon filter —
    including the subtle negative-zero base-alias guard the lifecycle fuzz
    found — lives in exactly one place. Only the missing-store guard is
    local (a table whose first batches were empty has no directory yet)."""
    if not os.path.isdir(store):
        return spark.createDataFrame([], ddl)
    if before is None:
        return read_epoch_store(spark, store, schema=ddl)
    return epochs_before_compacted(spark, store, int(before), schema=ddl)


def _read_epoch(
    spark: SparkSession, store: str, ddl: str, epoch: int
) -> DataFrame:
    """This epoch's own committed partition (what the batch just wrote)."""
    if not os.path.isdir(store):
        return spark.createDataFrame([], ddl)
    full = f"{ddl}, {EPOCH_COL} int"
    return (
        spark.read.schema(full).parquet(store)
        .where(F.col(EPOCH_COL) == int(epoch))
        .drop(EPOCH_COL)
    )


def ingest_kv_batch(
    spark: SparkSession,
    store: str,
    key: str,
    epoch: int,
    batch: DataFrame,
    max_live_partials: int = 8,
) -> None:
    """Compact-then-write one batch into a latest-wins kv epoch store:
    maintenance first (horizon = the CALLER's batch id, keeping a crashed
    attempt's own partition live for its overwrite), then the collapsed
    batch rows — tombstones included — as partition ``ingest_epoch=epoch``.
    O(|batch|) written bytes; live partials bounded by the cap."""
    epoch = int(epoch)
    maybe_compact(
        spark, store, epoch, max_live_partials, merge=latest_wins_merge(key)
    )
    epoch_overwrite(collapse_batch(batch, key), store, epoch)


def key_state(
    spark: SparkSession,
    store: str,
    ddl: str,
    key: str,
    before: Optional[int] = None,
) -> DataFrame:
    """The kv store's live latest-wins rows (strictly before ``before``;
    the full materialized state when None)."""
    return _resolve(_history(spark, store, ddl, before), key)


def ingest_and_delta(
    spark: SparkSession,
    store: str,
    ddl: str,
    key: str,
    payload: list[str],
    epoch: int,
    batch: DataFrame,
    max_live_partials: int = 8,
) -> DataFrame:
    """Write the batch into the kv store and return its SIGNED row deltas
    ``(sign, key, *payload)`` vs prior state — O(|batch|): prior state is
    probed with a broadcast left-semi join on the batch's distinct keys
    (batch-bounded, never a full-state scan shuffle), and the old-vs-new
    diff is ONE aggregation over the O(|batch|) surviving rows — per key,
    ``max_by`` extracts the overall latest image (the new state) and the
    latest HISTORY-only image (the old state; ``max_by`` ignores rows
    whose ordering expression is NULL, so batch rows drop out), then the
    retract/assert pair derives from the two images directly. One store
    scan, one key shuffle, no window sorts, no full-outer join (the r14
    review's shape fix). Deterministic given the committed prefix, so a
    replay regenerates identical deltas; same (lsn desc, op desc) winner
    as the store's resolve — ``max`` of the ascending (lsn, op) struct."""
    epoch = int(epoch)
    ingest_kv_batch(spark, store, key, epoch, batch, max_live_partials)
    written = _read_epoch(spark, store, ddl, epoch)
    keys = written.select(key).distinct()
    hist = _history(spark, store, ddl, epoch).join(
        F.broadcast(keys), key, "left_semi"
    )
    img = F.struct(*[F.col(c) for c in payload], F.col("op"))
    ordk = F.struct(F.col("lsn"), F.col("op"))
    hist_only = F.col("__b") == 0
    per_key = (
        hist.withColumn("__b", F.lit(0))
        .unionByName(written.withColumn("__b", F.lit(1)))
        .groupBy(key)
        .agg(
            F.max_by(img, ordk).alias("__new"),
            F.max_by(F.when(hist_only, img), F.when(hist_only, ordk))
            .alias("__old"),
        )
    )
    old_live = F.col("__old").isNotNull() & (F.col("__old.op") != "D")
    new_live = F.col("__new.op") != "D"
    # null-safe payload comparison (the cdc_snapshot_diff convention): a
    # value -> NULL transition must fire retract + assert, not evaluate to
    # NULL and silently drop both deltas
    changed = old_live & new_live & ~(
        F.struct(*[F.col(f"__old.{c}").alias(c) for c in payload]).eqNullSafe(
            F.struct(*[F.col(f"__new.{c}").alias(c) for c in payload])
        )
    )
    minus = F.when(
        old_live & (~new_live | changed),
        F.struct(
            F.lit(-1).alias("sign"),
            F.col(key).alias(key),
            *[F.col(f"__old.{c}").alias(c) for c in payload],
        ),
    )
    plus = F.when(
        new_live & (~old_live | changed),
        F.struct(
            F.lit(1).alias("sign"),
            F.col(key).alias(key),
            *[F.col(f"__new.{c}").alias(c) for c in payload],
        ),
    )
    return per_key.select(
        F.explode(F.array_compact(F.array(minus, plus))).alias("d")
    ).select("d.*")


# --- the join-view step -------------------------------------------------------

def apply_batch(
    spark: SparkSession,
    base: str,
    batch_id: int,
    d_batch: DataFrame,
    f_batch: DataFrame,
    max_live_partials: int = 8,
) -> None:
    """One foreachBatch step of the join-view maintenance (see the module
    docstring's dataflow). Every prior-state read resolves strictly below
    ``batch_id``; every store is size-tiered-compacted at the top of the
    epoch; sums versions behind the previous generation are swept — so
    per-batch cost is O(|batch|) and disk objects stay bounded at any
    stream age."""
    bid = int(batch_id)
    dim_store = os.path.join(base, "dim_kv")
    fact_store = os.path.join(base, "fact_kv")
    arr_store = os.path.join(base, "fact_by_did")

    d_delta = ingest_and_delta(
        spark, dim_store, DIM_DDL, "id", ["grp"], bid, d_batch,
        max_live_partials,
    )
    f_delta = ingest_and_delta(
        spark, fact_store, FACT_DDL, "fid", ["did", "amount"], bid, f_batch,
        max_live_partials,
    )

    # persist the fact delta as the by-FK arrangement's epoch (signed rows;
    # compaction consolidates), then read the committed partition back so
    # both join legs reuse one materialization instead of recomputing
    maybe_compact(
        spark, arr_store, bid, max_live_partials, merge=_consolidate
    )
    epoch_overwrite(
        f_delta.select(
            "fid", "did", "amount", F.col("sign").cast("int").alias("sign")
        ),
        arr_store,
        bid,
    )
    f_delta_w = _read_epoch(spark, arr_store, ARR_DDL, bid)

    # materialize the dim delta the same way: join_deltas consumes it
    # twice (dkeys + the broadcast join side), and without this the whole
    # dim-diff subtree would execute twice per batch (r14 review). The
    # write is deterministic per batch id, so a replay overwrites it; only
    # the current batch ever reads it, so everything older sweeps now.
    d_delta.write.mode("overwrite").parquet(
        version_dir(base, "dim_delta", bid)
    )
    d_delta_w = spark.read.schema(DIM_DELTA_DDL).parquet(
        version_dir(base, "dim_delta", bid)
    )
    sweep_versions(base, "dim_delta", keep_from=bid)

    fold_versioned(
        spark, base, "sums", SUMS_DDL, ["grp"], bid,
        join_deltas(spark, base, bid, d_delta_w, f_delta_w),
        drop_when_zero="dn",
    )


def join_deltas(
    spark: SparkSession,
    base: str,
    batch_id: int,
    d_delta: DataFrame,
    f_delta_w: DataFrame,
) -> DataFrame:
    """The batch's signed (grp, dn, dq) view deltas from the two delta-rule
    legs; ``f_delta_w`` must already be the committed arrangement epoch.
    Split from :func:`apply_batch` so plan-shape tests can assert the join
    strategies directly."""
    bid = int(batch_id)
    dim_store = os.path.join(base, "dim_kv")
    arr_store = os.path.join(base, "fact_by_did")

    # c1 = dF JOIN D_old: probe the dim state with the fact delta's FK
    # values. Both broadcast sides are batch-bounded (<= 2|batch| rows), and
    # broadcasting the DIM side means a hot dimension key never induces a
    # skewed shuffle — the fact delta is not exchanged at all.
    dids = f_delta_w.select(F.col("did").alias("id")).distinct()
    dsub = _resolve(
        _history(spark, dim_store, DIM_DDL, bid).join(
            F.broadcast(dids), "id", "left_semi"
        ),
        "id",
    ).select("id", "grp")
    c1 = f_delta_w.join(F.broadcast(dsub), f_delta_w.did == dsub.id).select(
        F.col("grp"),
        F.col("sign").cast("long").alias("dn"),
        (F.col("sign") * F.col("amount")).cast("long").alias("dq"),
    )

    # c2 = F_new JOIN dD: integrate the arrangement (strictly-before epochs
    # + this batch's delta) restricted to the dim delta's keys — the did
    # restriction commutes with consolidation because signed rows group by
    # the full (fid, did, amount) triple. The consolidated sign is the row's
    # multiplicity (1 for live facts), carried through the arithmetic.
    dkeys = d_delta.select(F.col("id").alias("did")).distinct()
    arr = _history(spark, arr_store, ARR_DDL, bid).unionByName(f_delta_w)
    f_new_sub = _consolidate(
        arr.join(F.broadcast(dkeys), "did", "left_semi")
    ).where(F.col("sign") > 0)
    # rename the dim-delta columns before the join: f_new_sub already
    # carries d_delta in its lineage (via dkeys), so attribute references
    # would be ambiguous self-join columns
    dd = d_delta.select(
        F.col("id").alias("__d_id"),
        F.col("grp").alias("__d_grp"),
        F.col("sign").alias("__d_sign"),
    )
    c2 = f_new_sub.join(
        F.broadcast(dd), f_new_sub.did == F.col("__d_id")
    ).select(
        F.col("__d_grp").alias("grp"),
        (F.col("__d_sign") * F.col("sign")).cast("long").alias("dn"),
        (F.col("__d_sign") * F.col("sign") * F.col("amount"))
        .cast("long").alias("dq"),
    )

    return c1.unionByName(c2)


def latest_sums(spark: SparkSession, base: str) -> DataFrame:
    """The maintained view after the stream: the newest committed sums
    version, as (grp, n_rows, total)."""
    sums = prev_version(base, "sums", None)
    if sums is None:
        raise RuntimeError(f"no batch reached the join-IVM sink at {base!r}")
    return (
        spark.read.schema(SUMS_DDL)
        .parquet(version_dir(base, "sums", sums))
        .select("grp", F.col("dn").alias("n_rows"), F.col("dq").alias("total"))
    )
