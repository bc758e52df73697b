"""Epoch-store lifecycle soak: a MEASURED stream-AGE curve for the
maintained-store compaction pass (streaming/epoch_maintenance.py).

The sf1 soak answers "what happens on 10x DATA"; this one answers the
round-12 verdict's other axis — "what happens on 10x STREAM AGE". A
foreachBatch-maintained stats store accretes one partition + one partial
row-group per epoch forever (~525k/year at a one-minute trigger), so with
no maintenance the serve path's file count, listing cost, and fold width
all grow linearly with stream age even though the folded state is
constant-size. ``maybe_compact`` (size-tiered, cap on live partials) is
the fix; this soak drives the SAME ingest twice — maintenance off vs the
trigger at its default cap — and reports, at checkpoints along the
stream's life:

- live partition-directory count and parquet file count on disk,
- timed serve latency (manifest-aware fold + SUM-merge + collect),
- and verifies the folded answers stay IDENTICAL in both modes at every
  checkpoint (maintenance must be invisible — the registry convention).

The per-epoch partial is the streaming BM25 corpus-stats shape
(``cdc_stream_bm25_stats``): term -> (df, tf) partials over a fixed vocab,
SUM-mergeable by design. Partials are deterministic (epoch-seeded hash),
so both modes ingest byte-identical streams.

Usage: python tools/epoch_lifecycle_soak.py  (JSON to stdout; paste the
table into BASELINE.md's lifecycle section)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from postgresql_cdc_spark.streaming.epoch_io import epoch_overwrite  # noqa: E402
from postgresql_cdc_spark.streaming.epoch_maintenance import (  # noqa: E402
    maybe_compact,
    read_epoch_store,
)

N_EPOCHS = 120
CHECKPOINTS = (10, 30, 60, 120)
VOCAB = 1000          # fixed vocabulary: folded state is constant-size
TERMS_PER_EPOCH = 200  # partial rows written per epoch
CAP = 8                # maybe_compact default max_live_partials


def _partial(spark, epoch: int) -> DataFrame:
    """Deterministic per-epoch (term, df, tf) partial: TERMS_PER_EPOCH terms
    of the fixed vocab, selected and weighted by an epoch-seeded hash."""
    return (
        spark.range(TERMS_PER_EPOCH)
        .select(
            F.concat(
                F.lit("t"),
                (F.xxhash64(F.col("id"), F.lit(epoch)) % VOCAB + VOCAB)
                % VOCAB,
            ).alias("term"),
            F.lit(1).cast("long").alias("df_partial"),
            (
                (F.xxhash64(F.lit(epoch), F.col("id")) % 7 + 7) % 7 + 1
            ).cast("long").alias("tf_partial"),
        )
        # a real stats partial is pre-aggregated per batch
        .groupBy("term")
        .agg(
            F.sum("df_partial").alias("df_partial"),
            F.sum("tf_partial").alias("tf_partial"),
        )
    )


def _merge(df: DataFrame) -> DataFrame:
    return df.groupBy("term").agg(
        F.sum("df_partial").alias("df_partial"),
        F.sum("tf_partial").alias("tf_partial"),
    )


def _serve(spark, path: str):
    """Timed serve: manifest-aware fold + SUM-merge + collect."""
    t0 = time.monotonic()
    rows = sorted(
        (r.term, r.df_partial, r.tf_partial)
        for r in _merge(read_epoch_store(spark, path)).collect()
    )
    return time.monotonic() - t0, rows


def _disk(path: str) -> dict:
    parts = files = 0
    for name in os.listdir(path):
        if name.startswith("ingest_epoch="):
            parts += 1
            for f in os.listdir(os.path.join(path, name)):
                if f.endswith(".parquet"):
                    files += 1
    return {"partitions": parts, "parquet_files": files}


def _run_mode(spark, compact: bool) -> dict:
    base = tempfile.mkdtemp(prefix=f"els_{uuid.uuid4().hex[:8]}_")
    store = os.path.join(base, "stats")
    out: dict = {}
    try:
        for ep in range(N_EPOCHS):
            if compact:
                # no-op until live partials exceed the cap (missing store
                # dir reads as zero partials)
                maybe_compact(
                    spark, store, current_epoch=ep,
                    max_live_partials=CAP, merge=_merge,
                )
            epoch_overwrite(_partial(spark, ep), store, ep)
            if ep + 1 in CHECKPOINTS:
                serve_s, rows = _serve(spark, store)
                # second timed pass: steady-state serve, first may pay JIT
                serve2_s, _ = _serve(spark, store)
                out[ep + 1] = {
                    **_disk(store),
                    "serve_s": round(min(serve_s, serve2_s), 3),
                    "_rows": rows,
                }
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    from postgresql_cdc_spark.session import get_spark

    spark = get_spark("epoch-lifecycle-soak")
    results = {}
    for mode, compact in (("no_maintenance", False), ("maybe_compact", True)):
        print(f"  ingesting {N_EPOCHS} epochs, mode={mode} ...",
              file=sys.stderr, flush=True)
        t0 = time.monotonic()
        results[mode] = _run_mode(spark, compact)
        results[mode]["ingest_wall_s"] = round(time.monotonic() - t0, 1)
    # maintenance must be invisible: identical folded answers, every checkpoint
    for cp in CHECKPOINTS:
        a = results["no_maintenance"][cp].pop("_rows")
        b = results["maybe_compact"][cp].pop("_rows")
        assert a == b, f"fold diverged at epoch {cp}"
    results["answers_identical_at_every_checkpoint"] = True
    results["config"] = {
        "n_epochs": N_EPOCHS, "vocab": VOCAB,
        "terms_per_epoch": TERMS_PER_EPOCH, "max_live_partials": CAP,
    }
    print(json.dumps({"epoch_lifecycle_soak": results}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
