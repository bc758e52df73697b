"""Consumer-surface tests (SURVEY.md §2.1 S17): the ``CdcConsumer`` contract
on Spark sinks — per-transaction delivery in LSN order, no transaction mixing,
per-table demux, and the foreachBatch wiring end-to-end through the pgcdc
streaming source (mirrors DbChangeConsumer, `DbChangeConsumer.java:29-32`).
"""

from __future__ import annotations

from postgresql_cdc_spark.streaming.consumer import (
    collecting_consumer,
    demux,
    foreach_txn_batch,
    txn_stats,
)

from tests.test_streaming_cdc import _make_archive


def _envelope_df(spark):
    rows = [
        ("I", "public", "t", 1, 11, 101, {"id": "1", "v": "a"}),
        ("I", "public", "t", 1, 12, 101, {"id": "2", "v": "b"}),
        ("U", "public", "t", 1, 41, 102, {"id": "1", "v": "c"}),
        ("D", "public", "t", 1, 42, 102, {"id": "2"}),
        ("I", "public", "other", 2, 50, 103, {"id": "9"}),
    ]
    return spark.createDataFrame(
        rows,
        "op string, schema string, table string, relation_id int, "
        "lsn bigint, txn_id bigint, columns map<string,string>",
    )


class TestConsumerSurface:
    def test_foreach_txn_batch_orders_and_never_mixes(self, spark):
        df = _envelope_df(spark)
        seen: list[tuple[int, list]] = []
        fn = foreach_txn_batch(
            lambda txn, tdf: seen.append((txn, sorted(r.lsn for r in tdf.collect())))
        )
        fn(df, epoch_id=0)
        # one handler call per txn, in first-LSN order, rows never mixed
        assert [t for t, _ in seen] == [101, 102, 103]
        assert dict(seen) == {101: [11, 12], 102: [41, 42], 103: [50]}

    def test_foreach_txn_batch_empty_batch_is_noop(self, spark):
        df = _envelope_df(spark).limit(0)
        calls = []
        foreach_txn_batch(lambda txn, tdf: calls.append(txn))(df, epoch_id=0)
        assert calls == []

    def test_demux_filters_table_and_types(self, spark):
        df = _envelope_df(spark)
        t = demux(df, "t", columns={"id": "long", "v": "string"})
        rows = {r.id: r.v for r in t.collect()}
        assert rows == {1: "c", 2: None}  # id cast to long; D row has no 'v'
        assert demux(df, "other").count() == 1

    def test_txn_stats(self, spark):
        stats = {r.txn_id: r for r in txn_stats(_envelope_df(spark)).collect()}
        s = stats[102]
        assert (s.n_events, s.n_inserts, s.n_updates, s.n_deletes) == (2, 0, 1, 1)
        assert (s.first_lsn, s.last_lsn) == (41, 42)

    def test_collecting_consumer_end_to_end(self, spark, tmp_path):
        """DbChangeConsumer mirror through the real streaming source: every
        transaction arrives whole and in order, across micro-batches."""
        from postgresql_cdc_spark.streaming.source import PgCdcDataSource

        arch = str(tmp_path / "wal_consumer")
        _make_archive(arch)
        spark.dataSource.register(PgCdcDataSource)
        store: dict[int, list] = {}
        q = (
            spark.readStream.format("pgcdc")
            .option("path", arch)
            .option("maxRecordsPerBatch", "3")
            .load()
            .writeStream.foreachBatch(collecting_consumer(store))
            .option("checkpointLocation", str(tmp_path / "ckpt_consumer"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            txn: sorted((r.op, r.lsn) for r in rows) for txn, rows in store.items()
        }
        assert got == {
            101: [("I", 11), ("I", 12)],
            102: [("D", 42), ("U", 41)],
            103: [("I", 81)],
            -1: [("I", 70)],  # DML outside any txn: singleton batch
        }
