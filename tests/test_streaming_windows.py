"""Streaming event-time semantics through the pgcdc source: watermarks,
tumbling windows, session windows (SURVEY.md §2.2 streaming row).

The CDC envelope's only order is the LSN (the reference has no event-time
notion), so event time is derived deterministically: lsn → seconds since
epoch. Each streaming aggregation is checked against a replay-equivalent
batch oracle computed from the SAME archive via the batch reader — the
streaming answer must match full-replay batch semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming_cdc import _make_archive

GAP = "15 seconds"


def _event_time(df):
    return df.withColumn(
        "event_time", F.timestamp_micros(F.col("lsn") * 1_000_000)
    )


class TestStreamingWindows:
    def test_tumbling_window_with_watermark_matches_batch_replay(
        self, spark, tmp_path
    ):
        from postgresql_cdc_spark.streaming.source import PgCdcDataSource

        arch = str(tmp_path / "wal_win")
        _make_archive(arch)
        spark.dataSource.register(PgCdcDataSource)

        stream = (
            spark.readStream.format("pgcdc")
            .option("path", arch)
            .option("maxRecordsPerBatch", "3")
            .load()
        )
        agg = (
            _event_time(stream)
            .withWatermark("event_time", "10 seconds")
            .groupBy(F.window("event_time", "30 seconds").alias("w"), "op")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("cdc_win")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_win"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.w.start, r.op): r.n
            for r in spark.sql("select w, op, n from cdc_win").collect()
        }

        # replay-equivalent oracle: identical aggregation over batch replay
        batch = spark.read.format("pgcdc").option("path", arch).load()
        want = {
            (r.w.start, r.op): r.n
            for r in _event_time(batch)
            .groupBy(F.window("event_time", "30 seconds").alias("w"), "op")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
        assert sum(got.values()) == 6  # every DML event landed in a window

    def test_session_window_closes_on_watermark(self, spark, tmp_path):
        """Append mode emits a session only once the watermark passes its
        end: the two early sessions close; the tail session (events at lsn
        70/81, within one 15 s gap) stays open and is correctly withheld."""
        from postgresql_cdc_spark.streaming.source import PgCdcDataSource

        arch = str(tmp_path / "wal_sess")
        _make_archive(arch)
        spark.dataSource.register(PgCdcDataSource)

        stream = (
            spark.readStream.format("pgcdc")
            .option("path", arch)
            .option("maxRecordsPerBatch", "3")
            .load()
        )
        # session windows require a non-global grouping key in streaming;
        # keying by table matches the per-table session semantics a real
        # pipeline wants anyway
        agg = (
            _event_time(stream)
            .withWatermark("event_time", GAP)
            .groupBy(F.session_window("event_time", GAP).alias("s"), "table")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("cdc_sess")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select s, n from cdc_sess").collect()
        got = sorted((r.s.start.second + r.s.start.minute * 60, r.n) for r in rows)
        # DML at lsn-seconds 11,12 | 41,42 | 70,81: gap > 15 s between groups.
        # Sessions [11,27) and [41,57) closed by the final watermark (81-15=66);
        # session starting at 70 is still open → not emitted in append mode.
        assert got == [(11, 2), (41, 2)]
