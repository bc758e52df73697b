"""Consumer surface: the ``CdcConsumer`` semantics on Spark sinks.

The reference delivers ``List<TableRecord>`` batches to a callback, never
mixing transactions in a batch and splitting oversize transactions
(`CdcConsumer.java:5-11`, `CdcEngine.java:110-129`). Here the contract maps to
``foreachBatch``: every micro-batch carries ``txn_id``/``lsn`` envelope
columns, so txn grouping is a ``groupBy`` away and per-table fan-out is a
filter — both distributed, not driver loops.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

from pyspark.sql import DataFrame, functions as F

from postgresql_cdc_spark.functions.pg_types import typed_view


def demux(envelope: DataFrame, table: str,
          columns: Mapping[str, str] | None = None,
          schema: str = "public") -> DataFrame:
    """Per-table stream: filter the multiplexed envelope down to one table
    (`filter(col("table") == ...)` per SURVEY.md §1.4) and, when a column
    registry is given, project the typed view."""
    out = envelope.where(
        (F.col("table") == table) & (F.col("schema") == schema)
    )
    return typed_view(out, columns) if columns else out


def txn_stats(envelope: DataFrame) -> DataFrame:
    """Per-transaction summary of a (micro-)batch: op counts + LSN span —
    the distributed analog of inspecting a handleBatch list."""
    return envelope.groupBy("txn_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("op") == "I").cast("int")).alias("n_inserts"),
        F.sum((F.col("op") == "U").cast("int")).alias("n_updates"),
        F.sum((F.col("op") == "D").cast("int")).alias("n_deletes"),
        F.min("lsn").alias("first_lsn"),
        F.max("lsn").alias("last_lsn"),
    )


def foreach_txn_batch(handler: Callable[[int, DataFrame], None]):
    """foreachBatch adapter that calls ``handler(txn_id, txn_df)`` once per
    transaction in LSN order — the reference's handleBatch contract
    (batches never mix transactions, `CdcEngine.java:110-129`).

    The txn id list is collected (it is small — one entry per txn in the
    micro-batch); each transaction's rows stay a DataFrame. The batch is
    persisted for the duration of the fan-out: each per-txn ``where`` then
    reads cached blocks instead of re-running the batch's upstream plan once
    per transaction — with many small transactions in a batch the rescans
    were O(txns) source reads.
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if not batch_df.take(1):
                return
            txns = [
                r.txn_id
                for r in batch_df.groupBy("txn_id")
                .agg(F.min("lsn").alias("l"))
                .orderBy("l").collect()
            ]
            for txn in txns:
                handler(txn, batch_df.where(F.col("txn_id") == txn))
        finally:
            batch_df.unpersist()

    return fn


def collecting_consumer(store: Dict[int, list]):
    """Test double mirroring the reference's DbChangeConsumer
    (`DbChangeConsumer.java:29-32`): accumulates rows per transaction."""

    def handler(txn_id: int, txn_df: DataFrame) -> None:
        store.setdefault(txn_id, []).extend(txn_df.collect())

    return foreach_txn_batch(handler)
