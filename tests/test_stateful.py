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

    def test_ttl_dedup_stream_still_dedups(self, spark, tmp_path):
        """With a TTL far longer than the run, results equal no-timeout dedup
        (exercises the ProcessingTimeTimeout wiring through the real API).

        Runs under Trigger.AvailableNow + readall: with processing-time
        timeouts armed, processAllAvailable never returns (Spark keeps
        scheduling batches to evaluate timeouts), so the query must have a
        terminating trigger. Cross-batch suppression is covered by the
        NoTimeout streaming test; the TTL state transitions by the
        deterministic unit test below.
        """
        from postgresql_cdc_spark.streaming.source import PgCdcDataSource
        from postgresql_cdc_spark.streaming.stateful import dedup_stream

        arch = str(tmp_path / "wal_dup_ttl")
        _dup_archive(arch)
        spark.dataSource.register(PgCdcDataSource)

        stream = (
            spark.readStream.format("pgcdc")
            .option("path", arch)
            .option("readall", "true")
            .load()
            .withColumn("key", F.element_at("columns", "id"))
        )
        q = (
            dedup_stream(stream, ["key"], order_col="lsn", ttl_ms=3_600_000)
            .writeStream.format("memory")
            .queryName("dedup_ttl_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_dedup_ttl"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()

        rows = spark.sql("select key, lsn from dedup_ttl_sink").collect()
        assert {(r.key, r.lsn) for r in rows} == {("1", 11), ("2", 32), ("3", 52)}

    def test_ttl_state_machine_evicts_and_readmits(self):
        """Deterministic TTL semantics without wall-clock: timeout fires ->
        state removed -> the key's next arrival re-emits. Processing-time
        expiry itself is Spark's contract; this pins OUR transitions."""
        import pandas as pd

        from postgresql_cdc_spark.streaming.stateful import make_dedup_fn

        class FakeState:
            def __init__(self):
                self.exists = False
                self.hasTimedOut = False
                self.timeout_set = None
                self.removed = False

            def update(self, v):
                self.exists = True

            def remove(self):
                self.exists = False
                self.removed = True

            def setTimeoutDuration(self, ms):
                self.timeout_set = ms

        fn = make_dedup_fn("lsn", ttl_ms=1000)
        batch = [pd.DataFrame({"key": ["a"], "lsn": [5]})]

        # 1: first sighting emits and arms the timeout
        st = FakeState()
        assert len(list(fn(("a",), iter(batch), st))) == 1
        assert st.exists and st.timeout_set == 1000

        # 2: duplicate while armed -> suppressed, timeout refreshed
        st.timeout_set = None
        assert list(fn(("a",), iter(batch), st)) == []
        assert st.timeout_set == 1000

        # 3: TTL fires (Spark calls with hasTimedOut, no data) -> state gone
        st.hasTimedOut = True
        assert list(fn(("a",), iter([]), st)) == []
        assert st.removed and not st.exists

        # 4: the key arrives again after eviction -> re-emitted
        st2 = FakeState()
        assert len(list(fn(("a",), iter(batch), st2))) == 1

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
