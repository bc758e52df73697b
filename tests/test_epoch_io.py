"""Replay idempotence of the epoch-partitioned foreachBatch sink
(streaming/epoch_io.py) — the contract the streaming LSH ingest gates rely
on under at-least-once delivery (round-10 advice: the old append-mode sink
double-appended a replayed micro-batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_cdc_spark.streaming.epoch_io import (
    epoch_overwrite,
    epochs_before,
)


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )


class TestEpochOverwrite:
    def test_replayed_epoch_does_not_double_append(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        e0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        e1 = spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string")
        epoch_overwrite(e0, p, 0)
        epoch_overwrite(e1, p, 1)
        before = _rows(spark, p)
        epoch_overwrite(e1, p, 1)  # at-least-once replay of epoch 1
        assert _rows(spark, p) == before

    def test_replay_replaces_half_written_attempt(self, spark, tmp_path):
        """A crash mid-epoch can leave a PARTIAL partition; the replay must
        replace it wholesale, not merge with it."""
        p = str(tmp_path / "idx")
        epoch_overwrite(
            spark.createDataFrame([(1, "a")], "id long, v string"), p, 0
        )
        half = spark.createDataFrame([(3, "HALF")], "id long, v string")
        full = spark.createDataFrame(
            [(3, "c"), (4, "d")], "id long, v string"
        )
        epoch_overwrite(half, p, 1)   # the crashed first attempt
        epoch_overwrite(full, p, 1)   # the replay
        got = _rows(spark, p)
        assert (3, "HALF", 1) not in got
        assert {(3, "c", 1), (4, "d", 1), (1, "a", 0)} == set(got)

    def test_other_epochs_untouched(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        epoch_overwrite(
            spark.createDataFrame([(1, "a")], "id long, v string"), p, 0
        )
        epoch_overwrite(
            spark.createDataFrame([(2, "b")], "id long, v string"), p, 2
        )
        epoch_overwrite(
            spark.createDataFrame([(9, "z")], "id long, v string"), p, 0
        )  # replay epoch 0 with different content: only epoch 0 changes
        assert set(_rows(spark, p)) == {(9, "z", 0), (2, "b", 2)}

    def test_epochs_before_excludes_own_and_later(self, spark, tmp_path):
        p = str(tmp_path / "idx")
        for ep in range(3):
            epoch_overwrite(
                spark.createDataFrame([(ep, f"v{ep}")], "id long, v string"),
                p, ep,
            )
        got = sorted(
            tuple(r) for r in epochs_before(spark, p, 2).collect()
        )
        assert got == [(0, "v0"), (1, "v1")]
        # the probe frame carries no epoch column
        assert epochs_before(spark, p, 2).columns == ["id", "v"]

    def test_partition_pruning_reaches_scan(self, spark, tmp_path):
        """epochs_before must prune at the FILE level (PartitionFilters),
        not post-filter a full scan — at a month of micro-batches the
        difference is reading one day vs the whole index history."""
        p = str(tmp_path / "idx")
        for ep in range(4):
            epoch_overwrite(
                spark.createDataFrame([(ep, "x")], "id long, v string"),
                p, ep,
            )
        plan = (
            epochs_before(spark, p, 2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan and "ingest_epoch" in plan, plan
