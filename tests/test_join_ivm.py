"""Replay idempotence of the JOIN-view IVM step (streaming/join_ivm.py):
prior-state reads resolve STRICTLY BELOW the current batch id from disk,
so a crashed batch's partial writes are invisible to its replay and a
checkpoint restart (fresh process memory) reconstructs state from disk.
The delta rule itself — delta(F JOIN D) = dF JOIN D_old UNION F_new JOIN
dD — is gated end-to-end by cdc_stream_ivm_join_sums; these tests pin the
at-least-once crash windows that gate cannot exercise."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from postgresql_cdc_spark.streaming.join_ivm import (
    apply_batch,
    latest_sums,
)

ROW_DDL = "tab string, k long, a long, b long, op string, lsn long"


def _waves():
    """Three deterministic waves of two-table changes; returns (waves,
    expected final (grp, n_rows, total)). Wave 2 mixes a dim regroup, a
    dim delete, fact amount updates, and a fact delete."""
    w0 = [("d", i, i % 2, None, "I", 10 + i) for i in range(4)]
    w1 = [("f", i, i % 4, i, "I", 20 + i) for i in range(10)]
    w2 = (
        [("d", 0, 1, None, "U", 40)]
        + [("d", 3, None, None, "D", 41)]
        + [("f", i, i % 4, i + 100, "U", 42 + i) for i in (0, 3, 6)]
        + [("f", 9, None, None, "D", 50)]
    )
    dims = {0: 1, 1: 1, 2: 0}  # id -> grp after wave 2 (3 deleted)
    facts = {  # fid -> (did, amount) after wave 2 (9 deleted)
        0: (0, 100), 1: (1, 1), 2: (2, 2), 3: (3, 103), 4: (0, 4),
        5: (1, 5), 6: (2, 106), 7: (3, 7), 8: (0, 8),
    }
    agg: dict[int, list[int]] = {}
    for did, amount in facts.values():
        if did in dims:
            g = dims[did]
            agg.setdefault(g, [0, 0])
            agg[g][0] += 1
            agg[g][1] += amount
    want = sorted((g, n, t) for g, (n, t) in agg.items())
    return [w0, w1, w2], want


def _route_and_apply(batch, epoch, state):
    d_batch = batch.where(F.col("tab") == "d").select(
        F.col("k").alias("id"),
        F.col("a").cast("int").alias("grp"),
        "op", "lsn",
    )
    f_batch = batch.where(F.col("tab") == "f").select(
        F.col("k").alias("fid"),
        F.col("a").alias("did"),
        F.col("b").cast("int").alias("amount"),
        "op", "lsn",
    )
    apply_batch(batch.sparkSession, state, epoch, d_batch, f_batch)


class TestJoinIvmReplay:
    def test_engine_crash_after_sink_write_replays_idempotently(
        self, spark, tmp_path
    ):
        """Injected crash AFTER wave 2's sink writes but before the
        checkpoint commit: the restarted query replays wave 2; its
        prior-state reads must resolve wave 1's versions (not the crashed
        attempt's own partial v2 files) and converge on the crash-free
        answer."""
        waves, want = _waves()
        indir = str(tmp_path / "in")
        os.makedirs(indir)
        for kk, w in enumerate(waves):
            df = spark.createDataFrame(w, ROW_DDL)
            tmp = str(tmp_path / f"w{kk}")
            df.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(indir, f"wave{kk}.parquet")
            os.rename(part, dst)
            os.utime(dst, (1_600_000_000 + 60 * kk,) * 2)

        state = str(tmp_path / "state")
        os.makedirs(state)
        crash_flag = str(tmp_path / "crash_once")
        with open(crash_flag, "w") as f:
            f.write("1")

        def ingest(batch, epoch):
            _route_and_apply(batch, int(epoch), state)
            if int(epoch) == 2 and os.path.exists(crash_flag):
                os.unlink(crash_flag)
                raise RuntimeError("injected crash after sink write")

        def run():
            q = (
                spark.readStream.schema(ROW_DDL)
                .option("maxFilesPerTrigger", "1")
                .parquet(indir)
                .writeStream.foreachBatch(ingest)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(120)
            finally:
                q.stop()

        try:
            run()  # dies on wave 2's injected crash, after all its writes
        except Exception:  # noqa: BLE001 — the injected crash surfaces here
            pass
        assert not os.path.exists(crash_flag), "crash never fired"
        run()  # restart: fresh memory, wave 2 replays purely from disk

        got = sorted(
            (r.grp, r.n_rows, r.total)
            for r in latest_sums(spark, state).collect()
        )
        assert got == want, got

    def test_replay_ignores_crashed_attempts_partial_versions(
        self, spark, tmp_path
    ):
        """Direct pin of the strictly-below contract: a half-written
        attempt at batch 2 (garbage dim_v2/sums_v2 on disk) must be
        invisible to the replay of batch 2, which overwrites it."""
        waves, want = _waves()
        state = str(tmp_path / "state")
        os.makedirs(state)
        for ep, w in enumerate(waves[:2]):
            _route_and_apply(spark.createDataFrame(w, ROW_DDL), ep, state)
        # crashed attempt at batch 2: plausible-schema garbage, all three
        garbage_dim = spark.createDataFrame(
            [(999, 2, "I", 999)], "id long, grp int, op string, lsn long"
        )
        garbage_dim.write.mode("overwrite").parquet(
            os.path.join(state, "dim_v2")
        )
        spark.createDataFrame(
            [(2, 99, 99999)], "grp int, dn long, dq long"
        ).write.mode("overwrite").parquet(os.path.join(state, "sums_v2"))

        _route_and_apply(spark.createDataFrame(waves[2], ROW_DDL), 2, state)
        got = sorted(
            (r.grp, r.n_rows, r.total)
            for r in latest_sums(spark, state).collect()
        )
        assert got == want, got

    def test_double_application_converges(self, spark, tmp_path):
        """Applying the same batch twice (at-least-once) yields the same
        sums as applying it once."""
        waves, want = _waves()
        state = str(tmp_path / "state")
        os.makedirs(state)
        for ep, w in enumerate(waves):
            _route_and_apply(spark.createDataFrame(w, ROW_DDL), ep, state)
        once = sorted(
            (r.grp, r.n_rows, r.total)
            for r in latest_sums(spark, state).collect()
        )
        _route_and_apply(spark.createDataFrame(waves[2], ROW_DDL), 2, state)
        twice = sorted(
            (r.grp, r.n_rows, r.total)
            for r in latest_sums(spark, state).collect()
        )
        assert once == want and twice == want, (once, twice)
