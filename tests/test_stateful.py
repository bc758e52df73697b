"""Streaming stateful exact-dedup (applyInPandasWithState) over the pgcdc
source: first occurrence of each key is emitted exactly once across
micro-batches; later duplicates are dropped via checkpointed per-key state."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_cdc_spark.sources.pgoutput import (
    encode_begin,
    encode_commit,
    encode_insert,
    encode_relation,
)
from tests.test_streaming_cdc import REL


def _dup_archive(path: str) -> None:
    from postgresql_cdc_spark.streaming.source import write_wal_archive

    def txn(lsn, xid, rows):
        frames = [(lsn, encode_begin(lsn + 9, 0, xid))]
        frames += [
            (lsn + i + 1, encode_insert(16384, r)) for i, r in enumerate(rows)
        ]
        frames.append((lsn + 9, encode_commit(lsn + 9, lsn + 10, 0)))
        return frames

    frames = [(1, encode_relation(REL))]
    # id=1 appears in txns 1 and 2, id=2 in txns 2 and 3: duplicates cross
    # micro-batch boundaries under maxRecordsPerBatch=2
    frames += txn(10, 1, [["1", "first", "1", "{}"]])
    frames += txn(30, 2, [["1", "dup", "2", "{}"], ["2", "first", "3", "{}"]])
    frames += txn(50, 3, [["2", "dup", "4", "{}"], ["3", "first", "5", "{}"]])
    write_wal_archive(path, frames)


class TestStatefulDedup:
    def test_first_occurrence_survives_across_batches(self, spark, tmp_path):
        from postgresql_cdc_spark.streaming.source import PgCdcDataSource
        from postgresql_cdc_spark.streaming.stateful import dedup_stream

        arch = str(tmp_path / "wal_dup")
        _dup_archive(arch)
        spark.dataSource.register(PgCdcDataSource)

        stream = (
            spark.readStream.format("pgcdc")
            .option("path", arch)
            .option("maxRecordsPerBatch", "2")
            .load()
            .withColumn("key", F.element_at("columns", "id"))
        )
        q = (
            dedup_stream(stream, ["key"], order_col="lsn")
            .writeStream.format("memory")
            .queryName("dedup_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        rows = spark.sql(
            "select key, lsn, element_at(columns, 'v_text') as v from dedup_sink"
        ).collect()
        got = {r.key: (r.lsn, r.v) for r in rows}
        assert len(rows) == len(got) == 3  # exactly one row per key
        # and it is the FIRST occurrence (min lsn / 'first' payload)
        assert got["1"] == (11, "first")
        assert got["2"] == (32, "first")
        assert got["3"] == (52, "first")

    def test_batch_analog_matches(self, spark, tmp_path):
        """The streaming result equals batch replay + min-lsn-per-key."""
        from postgresql_cdc_spark.streaming.source import PgCdcDataSource

        arch = str(tmp_path / "wal_dup2")
        _dup_archive(arch)
        spark.dataSource.register(PgCdcDataSource)
        batch = (
            spark.read.format("pgcdc").option("path", arch).load()
            .withColumn("key", F.element_at("columns", "id"))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy("lsn")
        first = (
            batch.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select("key", "lsn")
        )
        got = {(r.key, r.lsn) for r in first.collect()}
        assert got == {("1", 11), ("2", 32), ("3", 52)}
