"""Compaction for epoch-partitioned maintained stores — the small-file
lifecycle pass for ``streaming/epoch_io.py`` sinks, the WAL archive's
index -> prune -> compact lifecycle one level up.

A foreachBatch-maintained store (the streaming BM25 corpus statistics, the
streaming IVF postings) accretes ONE partition — and for stats stores one
partial row — per epoch, forever: at a one-minute trigger that is ~525k
partition directories a year, so listing cost, tiny-file count, and the
serve path's fold width all grow linearly with stream age even though the
folded state is constant-size. ``compact_epochs`` folds every partition
with ``ingest_epoch < upto`` into ONE base partition while preserving the
two contracts the streaming gates rely on:

- **replay idempotence** (``epoch_io`` contract): a re-run of any epoch
  ``e >= upto`` must still see exactly the pre-``e`` state through
  :func:`epochs_before_compacted`, and its own dynamic-overwrite replay
  still replaces only its own partition (the base lives in the reserved
  NEGATIVE epoch space no live batch id can collide with).
- **crash invisibility** (the ``compact_wal_archive`` protocol): a crash at
  any point during compaction leaves readers seeing EITHER the exact
  pre-compaction state or the exact post-compaction state, never a double
  count and never a partial fold.

Protocol (single maintenance writer, the same assumption the WAL archive
compactor makes — ``streaming/archive_maintenance.py``):

1. The rows of the current base (if any) plus every live partition in
   ``[current_base_upto, upto)`` are folded — optionally through a caller
   ``merge`` aggregate (SUM-mergeable stats partials collapse to one row;
   the default concatenates, which is what postings stores need) — and
   written under the reserved base partition ``ingest_epoch = -upto`` via
   the same dynamic partition overwrite the live sink uses, so a crashed
   earlier attempt at the SAME ``upto`` is replaced wholesale; the base's
   files are then fsynced — the fold is the only surviving copy once step
   3 runs, so it must be durable before the commit references it.
2. The manifest ``_epoch_base.json`` (``{"upto": U}``) is replaced
   atomically (tmp + fsync + rename + directory fsync). This is the commit
   point: readers resolve the base partition as ``-U`` and live partials as
   ``>= U``, so before the rename they see the old base + old partials
   (the orphan new base is outside both ranges), and after it the new base
   + surviving partials — never both generations of the same row.
3. Only then are the folded partition directories (old base and partials
   ``< upto``) deleted; a crash between 2 and 3 leaves stale directories
   that every manifest-aware read filters out, and a re-run of
   ``compact_epochs`` at the same ``upto`` completes the sweep.

``upto`` must not exceed the oldest epoch that may still replay: a
committed micro-batch never re-runs (Structured Streaming replays only the
batch whose checkpoint commit did not land), so compacting up to — but not
beyond — the latest committed epoch is always safe; the streaming gates
compact ``upto = <last epoch>`` after the query terminates, keeping the
newest epoch live (the WAL compactor's newest-chunk convention).

Filesystem note: manifest and directory maintenance use local ``os``/
``shutil`` calls like the WAL archive transport does; on a cluster store
the same three-step protocol runs against the Hadoop FileSystem API — the
commit point stays a single atomic rename.

Reader-vs-compactor race: a read that resolves the manifest and then scans
while a compaction COMMITS in between can see a torn view. The horizon-U
filter can never double-count (the new base lives at a different reserved
epoch, invisible to a stale-U filter), but it CAN silently lose the fold:
a reader that captured U before the commit and lists files after the sweep
sees neither the old base (swept) nor the new one (filtered out). The
maintenance passes here therefore run QUIESCENT with respect to serving —
the streaming gates compact inside foreachBatch (no concurrent serve) or
after the query terminates — mirroring the WAL compactor's single-
maintenance-writer assumption. A store that must serve DURING maintenance
wraps its action in :func:`consistent_epoch_read`, which re-resolves the
manifest after the action and retries on a horizon move (the WAL reader's
unexplained-loss retry, one level up).
"""

from __future__ import annotations

import errno
import json
import os
import re
import shutil
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.streaming.epoch_io import EPOCH_COL, epoch_overwrite

BASE_MANIFEST = "_epoch_base.json"

_PART_RE = re.compile(rf"^{EPOCH_COL}=(-?\d+)$")


def base_upto(path: str) -> int:
    """The store's committed base horizon U: every epoch ``< U`` has been
    folded into the base partition ``ingest_epoch = -U``. 0 (no base) when
    the manifest is absent; an unreadable manifest raises — guessing a
    horizon could double-count a fold."""
    fp = os.path.join(path, BASE_MANIFEST)
    if not os.path.exists(fp):
        return 0
    with open(fp) as f:
        return int(json.load(f)["upto"])


def _store_filter(upto: int):
    """Live-rows partition predicate for a base horizon: the base partition
    plus every partial at or above the horizon. Stale partials (< upto) and
    orphan bases from crashed attempts fall outside both arms. With
    ``upto = 0`` this degrades to ``>= 0`` — exactly the uncompacted store.
    Both arms are simple comparisons on the partition column, so the filter
    prunes at the file level."""
    return (F.col(EPOCH_COL) == F.lit(-upto)) | (F.col(EPOCH_COL) >= F.lit(upto))


def _store_reader(spark: SparkSession, schema: Optional[str]):
    """Parquet reader for an epoch store, optionally with an EXPLICIT row
    schema (plus the partition column): a store whose table saw only empty
    batches has no files to infer from and must read as empty, not raise."""
    if schema is None:
        return spark.read
    return spark.read.schema(f"{schema}, {EPOCH_COL} int")


def read_epoch_store(
    spark: SparkSession, path: str, schema: Optional[str] = None
) -> DataFrame:
    """Every live row of a (possibly compacted) epoch store — the base fold
    plus all surviving partials — without the epoch column. The serve-path
    twin of ``epoch_io.epochs_before``; crash leftovers are invisible."""
    return (
        _store_reader(spark, schema).parquet(path)
        .where(_store_filter(base_upto(path)))
        .drop(EPOCH_COL)
    )


def epochs_before_compacted(
    spark: SparkSession, path: str, epoch: int, schema: Optional[str] = None
) -> DataFrame:
    """The strictly-earlier-epoch probe over a compacted store: base fold +
    partials in ``[base_upto, epoch)``. Raises when ``epoch < base_upto`` —
    the pre-``epoch`` state was folded away and the contract is
    unsatisfiable (the epoch-store analog of the WAL retention
    ``ProtocolError`` for a cursor below the pruned head)."""
    upto = base_upto(path)
    if int(epoch) < upto:
        raise ValueError(
            f"epoch {epoch} predates the compacted base horizon {upto}: "
            "the strictly-earlier state no longer exists; compact only up "
            "to the oldest epoch that may still replay"
        )
    cond = (F.col(EPOCH_COL) >= F.lit(upto)) & (F.col(EPOCH_COL) < int(epoch))
    # the base arm only exists once a base has been committed: at horizon 0
    # the literal ``== -0`` would alias LIVE epoch 0, making the probe for
    # epoch 0 return epoch 0's own rows (found by the lifecycle fuzz)
    if upto > 0:
        cond = (F.col(EPOCH_COL) == F.lit(-upto)) | cond
    return _store_reader(spark, schema).parquet(path).where(cond).drop(EPOCH_COL)


def consistent_epoch_read(
    spark: SparkSession,
    path: str,
    action: Callable[[DataFrame], object],
    max_retries: int = 3,
):
    """Run ``action(df)`` over the store's live rows, safely against a
    CONCURRENT compaction — the serving-path variant of
    :func:`read_epoch_store` for stores that cannot quiesce maintenance.

    Why a wrapper instead of a smarter filter: the horizon-``U`` predicate
    can never double-count across a commit (the new base's reserved epoch
    fails both arms of a stale-``U`` filter), so the only torn outcomes are
    LOUD — the old base's files swept mid-scan (task read error) — or
    SILENT — the file listing ran after the sweep while the filter still
    pinned the old horizon, dropping the fold entirely. Both are detected
    the same way: the manifest moved between the pre-read resolve and the
    action's completion. ``action`` must therefore be re-runnable (it may
    execute more than once; return a collected value, don't mutate state).

    Retries ``max_retries`` times, then raises — a store whose compactor
    outruns every read attempt needs its maintenance cadence fixed, not a
    longer spin.
    """
    last_exc: Exception | None = None
    for _ in range(int(max_retries) + 1):
        before = base_upto(path)
        try:
            df = (
                spark.read.parquet(path)
                .where(_store_filter(before))
                .drop(EPOCH_COL)
            )
            out = action(df)
        except Exception as exc:  # swept files: Py4J/AnalysisException
            if base_upto(path) != before:
                last_exc = exc
                continue  # loud tear — rebuild against the new horizon
            raise
        if base_upto(path) == before:
            return out
        last_exc = None  # silent tear — result may have lost the base
    raise RuntimeError(
        f"epoch store {path!r} was compacted during every read attempt "
        f"({int(max_retries) + 1}); quiesce maintenance or raise "
        "max_retries"
    ) from last_exc


def _partition_epochs(path: str) -> list[int]:
    out = []
    try:
        names = os.listdir(path)
    except OSError:
        return out
    for n in names:
        m = _PART_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return out


# fsync refusals a maintenance pass may tolerate: CAPABILITY errors only
# (some network mounts reject fsync on a directory fd, or lack the syscall —
# the WAL transport's convention; durability then narrows to what the mount
# gives). A genuine WRITE failure — EIO means the kernel LOST dirty pages —
# must abort the compaction BEFORE the manifest commit references the fold
# as the only surviving copy of the store's history; swallowing it was
# exactly the data-loss window the fold fsync exists to close (r13 advice).
_FSYNC_CAPABILITY_ERRNOS = frozenset(
    e for e in (
        getattr(errno, "EINVAL", None),
        getattr(errno, "ENOTSUP", None),
        getattr(errno, "EOPNOTSUPP", None),
        getattr(errno, "ENOSYS", None),
    )
    if e is not None
)

# open() refusals the fsync walk may tolerate: PERMISSION conditions, not
# lost writeback. On ACL-restricted or FUSE mounts the driver may be unable
# to re-open executor-written parquet files read-only; aborting there would
# crash-loop every compaction with no data actually at risk — durability
# then narrows to what the mount grants, the same contract as a capability
# fsync refusal. EIO at open stays fatal: it is the kernel reporting lost
# dirty pages for data the sweep is about to orphan (r15 advice).
_OPEN_PERMISSION_ERRNOS = frozenset(
    e for e in (
        getattr(errno, "EACCES", None),
        getattr(errno, "EPERM", None),
    )
    if e is not None
)

# (directory, errno) pairs the permission-tolerance branch already warned
# for: tolerating EACCES/EPERM at the fsync walk's open narrows durability
# to what the mount grants, and doing so SILENTLY would make 'compaction
# proceeded without fsyncing the fold' indistinguishable from a healthy
# walk (r16 advice). Deduplication is per DIRECTORY, not per file — every
# compaction rewrites the folded base under fresh part-file names, so
# per-file dedup would both flood the log each compaction AND grow the set
# without bound over a stream's life (r16 review); store directories are
# bounded by the pipeline's store count.
_PERM_TOLERATED_WARNED: set[tuple[str, int]] = set()


def _warn_perm_tolerated(path: str, exc: OSError) -> None:
    key = (os.path.dirname(path) or path, exc.errno or 0)
    if key in _PERM_TOLERATED_WARNED:
        return
    _PERM_TOLERATED_WARNED.add(key)
    import warnings

    warnings.warn(
        f"fsync walk could not re-open {path!r} "
        f"(errno {exc.errno}: {exc.strerror}); durability under "
        f"{key[0]!r} narrows to what the mount grants — compaction "
        "proceeds, but folded bases may not be fsynced here (warned once "
        "per directory)",
        RuntimeWarning,
        stacklevel=3,
    )


def _fsync_fd(fd: int) -> None:
    """fsync with the capability/write-failure discrimination above."""
    try:
        os.fsync(fd)
    except OSError as exc:
        if exc.errno not in _FSYNC_CAPABILITY_ERRNOS:
            raise


def _fsync_dir(path: str) -> None:
    """fsync a DIRECTORY so a rename/unlink inside it survives power loss.
    Capability refusal tolerated; real write failures re-raise (see
    ``_FSYNC_CAPABILITY_ERRNOS``). The open itself gets the same
    discrimination: a GONE directory (ENOENT/ENOTDIR — nothing of ours
    left to make durable) and a permission refusal (EACCES/EPERM — a
    capability condition, not lost writeback) are tolerable; an EIO at
    open is the same lost-writeback signal as an EIO at fsync."""
    try:
        fd = os.open(path, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
    except OSError as exc:
        if exc.errno in (errno.ENOENT, errno.ENOTDIR):
            return
        if exc.errno in _OPEN_PERMISSION_ERRNOS:
            _warn_perm_tolerated(path, exc)
            return
        raise
    try:
        _fsync_fd(fd)
    finally:
        os.close(fd)


def _fsync_tree(path: str) -> None:
    """fsync every regular file under ``path`` plus the directories: Spark's
    local parquet writes land in the page cache only, so the folded base
    must be durable BEFORE the manifest commit points readers at it — the
    folded partials are deleted right after, and unlike the WAL archive
    (replayable from upstream) a stats store has nothing to rebuild from.
    Capability refusals are tolerated; a genuine fsync failure (EIO)
    propagates so the compaction aborts before its commit point."""
    for root, _dirs, files in os.walk(path):
        for name in files:
            try:
                fd = os.open(os.path.join(root, name), os.O_RDONLY)
            except OSError as exc:
                if exc.errno == errno.ENOENT:
                    continue  # vanished mid-walk: not part of the fold
                if exc.errno in _OPEN_PERMISSION_ERRNOS:
                    # can't re-open, nothing lost (r15 advice) — but say
                    # so once, loudly (r16 advice)
                    _warn_perm_tolerated(os.path.join(root, name), exc)
                    continue
                # EIO on a file that EXISTS is a durability failure for
                # fold data the sweep is about to orphan — abort before
                # the commit point, same as an fsync failure (r14 review)
                raise
            try:
                _fsync_fd(fd)
            finally:
                os.close(fd)
        _fsync_dir(root)


def _commit_manifest(path: str, upto: int) -> None:
    # shared-partials mode (r18) can commit a horizon for a base store that
    # never wrote a partition of its own (sparse fold): create the dir
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, BASE_MANIFEST)
    tmp = fp + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"upto": int(upto)}, f)
        f.flush()
        _fsync_fd(f.fileno())
    os.replace(tmp, fp)
    _fsync_dir(path)


def _sweep_stale(path: str, upto: int) -> int:
    """Delete every partition the committed horizon no longer references:
    partials below it and any base other than ``-upto`` (old generations
    and orphans of crashed attempts — a future attempt's orphan is
    recreated wholesale by its re-run's dynamic overwrite, so deleting it
    is always safe)."""
    deleted = 0
    for e in _partition_epochs(path):
        if (0 <= e < upto) or (e < 0 and e != -upto):
            shutil.rmtree(
                os.path.join(path, f"{EPOCH_COL}={e}"), ignore_errors=True
            )
            deleted += 1
    if deleted:
        _fsync_dir(path)
    return deleted


def sweep_shared_partials(path: str, below: int) -> int:
    """Retention pass for a SHARED partial store (one consumed by several
    ``compact_epochs(..., partials_from=path)`` base stores and holding no
    base of its own): delete partials strictly below ``below``, which the
    caller must compute as the MINIMUM committed ``base_upto`` across every
    consumer — a partial below that horizon is folded into all of them.
    Crash-safe to interrupt (the next pass finishes it); a partial some
    consumer has not folded yet stays by construction of the minimum."""
    deleted = 0
    for e in _partition_epochs(path):
        if 0 <= e < int(below):
            shutil.rmtree(
                os.path.join(path, f"{EPOCH_COL}={e}"), ignore_errors=True
            )
            deleted += 1
    if deleted:
        _fsync_dir(path)
    return deleted


def compact_epochs(
    spark: SparkSession,
    path: str,
    upto: int,
    merge: Optional[Callable[[DataFrame], DataFrame]] = None,
    cluster_by: Optional[list[str]] = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    partials_from: Optional[str] = None,
) -> dict:
    """Fold every epoch ``< upto`` (including the current base) into ONE
    base partition ``ingest_epoch = -upto``; returns ``{base_upto_before,
    base_upto_after, folded_partitions, deleted_partitions}``.

    ``partials_from`` (r18) reads the live PARTIALS from a separate shared
    store while the base, manifest and sweep stay in ``path`` — the layout
    where N consumer stores (the per-dimension FK-clustered arrangements)
    fold ONE shared epoch stream instead of each persisting its own copy
    of every epoch. Only partials in ``[base_upto, upto)`` are folded
    (older shared partials may still be pending for a sibling store); the
    shared partials are NEVER deleted here — the caller sweeps them below
    the MINIMUM committed horizon across all consumers
    (:func:`sweep_shared_partials`).

    ``merge`` reshapes the folded rows (schema-preserving) before the write
    — pass the store's partial-merge aggregate for SUM-mergeable stats
    stores; the default keeps the rows verbatim (postings stores). A re-run
    after any crash converges: same-``upto`` re-runs overwrite the same
    base partition and finish the delete sweep; ``upto == base_upto`` is a
    pure garbage-collection pass.

    ``cluster_by`` KEY-CLUSTERS the fold: the merged rows are range-
    partitioned and sorted on the given columns before the base write
    (``operators/layout.compact``'s re-clustering move applied to the base
    fold), so every base file — and every row group inside it — carries a
    tight min/max envelope on the store key and a per-batch key probe
    (``join_ivm.ingest_and_delta``'s pushed key ranges) prunes its scan to
    the files actually containing the batch's keys. Without it the fold
    inherits the shuffle layout of ``merge``, where key min/max spans the
    whole domain in every file and a probe must read the entire base.
    File count is sized from the folded partitions' INPUT bytes against
    ``target_file_bytes`` (the ``operators/layout`` sizing rule — no extra
    count job; latest-wins folds shrink, so this slightly over-partitions,
    which only tightens the envelopes)."""
    upto = int(upto)
    prev = base_upto(path)
    if upto < prev:
        raise ValueError(
            f"compaction horizon cannot regress: upto={upto} < committed "
            f"base {prev}"
        )
    if upto == prev:
        return {
            "base_upto_before": prev,
            "base_upto_after": prev,
            "folded_partitions": 0,
            "deleted_partitions": _sweep_stale(path, prev),
        }
    # Horizon cannot pass the store head: Spark batch ids are contiguous, so
    # an epoch in [head, upto) WILL arrive later — its partition would land
    # below the committed horizon and every manifest-aware read would filter
    # it out silently. Raising here turns that data loss into a loud misuse
    # error. (Checked after the GC branch: a re-run at upto == prev stays a
    # valid cleanup pass even when the fold consumed every live epoch.)
    src = partials_from or path
    live_now = [e for e in _partition_epochs(src) if e >= 0]
    head = (max(live_now) + 1) if live_now else prev
    if upto > head:
        raise ValueError(
            f"compaction horizon {upto} is beyond the store head {head}: "
            f"epochs {head}..{upto - 1} have not arrived yet and would be "
            "folded over invisibly when they do"
        )

    # In shared mode partials strictly below the committed base are NOT
    # stale leftovers (a sibling store may still need them) and must not be
    # counted or folded twice; the single-store range keeps its historical
    # [0, upto) form, where anything below prev is a crash leftover the
    # reads already filter.
    part_lo = prev if partials_from else 0
    live = sorted(
        {
            e for e in _partition_epochs(src)
            if part_lo <= e < upto
        }
        | ({-prev} if prev > 0 and -prev in _partition_epochs(path) else set())
    )
    part_cond = (
        (F.col(EPOCH_COL) >= F.lit(prev)) & (F.col(EPOCH_COL) < F.lit(upto))
    )
    if partials_from is None:
        # one predicate covers both generations: with prev = 0 the base arm
        # (== -0) collapses into the partial range, so no special case
        folded = (
            spark.read.parquet(path)
            .where((F.col(EPOCH_COL) == F.lit(-prev)) | part_cond)
            .drop(EPOCH_COL)
        )
    else:
        parts = []
        if prev > 0:
            parts.append(
                spark.read.parquet(path)
                .where(F.col(EPOCH_COL) == F.lit(-prev))
                .drop(EPOCH_COL)
            )
        if os.path.isdir(src):
            parts.append(
                spark.read.parquet(src).where(part_cond).drop(EPOCH_COL)
            )
        # parts is empty iff ``live`` is empty (no base committed and no
        # shared partial in range), and the sparse-store branch below
        # returns before ``folded`` is ever touched
        folded = parts[0] if parts else None
        for p in parts[1:]:
            folded = folded.unionByName(p)
    if not live:
        # nothing to fold (sparse store: no base yet and no partials below
        # the horizon). Writing anyway would be WRONG under a global-
        # aggregate merge — df.agg over zero rows yields one all-null row,
        # a phantom the store would serve forever. Skip the base entirely
        # (readers' base arm then matches nothing) and clear any orphan a
        # pre-guard crashed attempt left at this horizon, since the commit
        # below would otherwise resurrect it.
        shutil.rmtree(
            os.path.join(path, f"{EPOCH_COL}=-{upto}"), ignore_errors=True
        )
        _commit_manifest(path, upto)
        return {
            "base_upto_before": prev,
            "base_upto_after": upto,
            "folded_partitions": 0,
            "deleted_partitions": _sweep_stale(path, upto),
        }
    if merge is not None:
        folded = merge(folded)
    cached = None
    if cluster_by:
        from pyspark import StorageLevel

        from postgresql_cdc_spark.operators.layout import list_data_files

        part_dirs = {f"{EPOCH_COL}={e}" for e in live}

        def _bytes_of(store: str) -> int:
            # shared mode: the base store may not exist yet (first fold)
            if not os.path.isdir(store):
                return 0
            return sum(
                b for f, b in list_data_files(spark, store)
                if any(f"/{d}/" in f or f.endswith(f"/{d}") for d in part_dirs)
            )

        bytes_in = _bytes_of(path)
        if partials_from is not None:
            bytes_in += _bytes_of(partials_from)
        n_files = max(1, min(4096, -(-bytes_in // int(target_file_bytes))))
        # repartitionByRange runs a separate SAMPLING job over its child
        # to compute range boundaries — without a persist the whole fold
        # subtree (full store scan + merge aggregate) would execute twice
        # per compaction (r15 review). Spill-safe level: the fold is
        # |state|-sized.
        cached = folded.persist(StorageLevel.MEMORY_AND_DISK)
        folded = cached.repartitionByRange(
            n_files, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    # step 1: the fold lands in the reserved negative epoch (dynamic
    # overwrite replaces a crashed attempt at the same horizon wholesale),
    # then is made DURABLE before the commit points readers at it — the
    # folded partials are deleted in step 3, so page-cache-only base data
    # plus a power cut would otherwise lose the store's entire history
    try:
        epoch_overwrite(folded, path, -upto)
    finally:
        if cached is not None:
            cached.unpersist()
    _fsync_tree(os.path.join(path, f"{EPOCH_COL}=-{upto}"))
    # step 2: the commit point
    _commit_manifest(path, upto)
    # step 3: the sweep (crash-safe to skip; the next pass finishes it)
    deleted = _sweep_stale(path, upto)
    return {
        "base_upto_before": prev,
        "base_upto_after": upto,
        "folded_partitions": len(live),
        "deleted_partitions": deleted,
    }


def maybe_compact(
    spark: SparkSession,
    path: str,
    current_epoch: int,
    max_live_partials: int = 8,
    merge: Optional[Callable[[DataFrame], DataFrame]] = None,
    cluster_by: Optional[list[str]] = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    partials_from: Optional[str] = None,
) -> Optional[dict]:
    """Size-tiered compaction trigger: the policy a production foreachBatch
    sink calls at the TOP of every epoch (before the epoch's own writes),
    instead of hand-picking horizons. Compacts everything strictly below
    ``current_epoch`` once the store's live partial count exceeds
    ``max_live_partials``; below the cap it's a no-op returning ``None``,
    so steady-state cost is one directory listing per epoch and the live
    partial count stays bounded by the cap regardless of stream age.

    The horizon is the CALLER's ``current_epoch`` — never inferred from the
    partition listing — because a crashed earlier attempt at this very
    epoch may have left its own half-written partition behind: a listing-
    derived horizon would fold those partial rows into the base an instant
    before the replay's dynamic overwrite replaces the live partition,
    double-counting the epoch. Capping at the replaying epoch keeps that
    partition live so the overwrite replaces it wholesale (the ``epoch_io``
    contract), which also makes the trigger replay-idempotent: a re-run
    either re-commits the same horizon (compact_epochs converges) or finds
    the count back under the cap and no-ops. ``current_epoch`` is safe as a
    horizon by the micro-batch commit argument in the module docstring:
    every strictly-earlier epoch has committed and can never re-run.
    """
    current_epoch = int(current_epoch)
    base = base_upto(path)
    live = [
        e for e in _partition_epochs(partials_from or path) if e >= base
    ]
    if len(live) <= int(max_live_partials):
        return None
    # A store an epoch wrote no rows to has no partition for it, so the
    # head can trail current_epoch; cap the horizon at the head to keep
    # compact_epochs' not-yet-arrived guard meaningful for direct callers.
    upto = min(current_epoch, max(live) + 1)
    if upto <= base:
        return None
    return compact_epochs(
        spark, path, upto, merge=merge, cluster_by=cluster_by,
        target_file_bytes=target_file_bytes, partials_from=partials_from,
    )
