"""Epoch-partitioned idempotent parquet I/O for foreachBatch pipelines.

Structured Streaming's foreachBatch is at-least-once: after a crash between
the sink write and the checkpoint commit, the SAME epoch re-runs. A plain
``mode("append")`` sink then double-appends the replayed batch — the classic
way a streaming dedup index silently corrupts itself. The contract here
(Spark's documented idempotent-foreachBatch recipe, keyed on the batch id):

- ``epoch_overwrite`` writes a batch's rows under an ``ingest_epoch``
  partition with DYNAMIC partition overwrite (per-write option, no session
  conf juggling): a replayed epoch replaces exactly its own partition —
  including a half-written previous attempt — and never touches other
  epochs' files.
- ``epochs_before`` reads back only STRICTLY EARLIER epochs, so a replayed
  probe never sees the replaying batch's own (possibly partial) rows; the
  partition filter prunes at the file level.

Used by the streaming LSH ingest gates (``cdc_stream_incremental_dedup``,
``cdc_stream_dedup_admission``) and the streaming scale soak; the replay
semantics are pinned by ``tests/test_epoch_io.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EPOCH_COL = "ingest_epoch"


def epoch_overwrite(df: DataFrame, path: str, epoch: int) -> None:
    """Write ``df`` as partition ``ingest_epoch=epoch`` of ``path``,
    replacing (only) that partition if it already exists."""
    (
        df.withColumn(EPOCH_COL, F.lit(int(epoch)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(EPOCH_COL)
        .parquet(path)
    )


def epochs_before(spark: SparkSession, path: str, epoch: int) -> DataFrame:
    """All rows of epochs STRICTLY before ``epoch`` (partition-pruned),
    without the epoch column."""
    return (
        spark.read.parquet(path)
        .where(F.col(EPOCH_COL) < int(epoch))
        .drop(EPOCH_COL)
    )
