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


class TestLateDataDrop:
    def test_append_mode_watermark_invariants_with_late_data(
        self, spark, tmp_path
    ):
        """Late-data semantics through the CDC source: event time derives
        from the PAYLOAD (``v_int`` seconds), not the LSN, so a later
        transaction can carry an OLDER event — what a watermark exists to
        bound. Spark's watermark contract is one-directional: on-time rows
        are never dropped; rows older than the watermark MAY be dropped or
        may still be processed (observed on this version: the 50 s late row
        is admitted and its already-expired window finalizes in the same
        batch). The test pins the invariants that hold either way:

        - every on-time row is aggregated exactly once ([90,120)->1,
          [120,150)->2 after txn C pushes the watermark to 160 s);
        - append mode emits each window at most once;
        - a window the watermark has not passed ([150,180), end 180 s >
          watermark 160 s) is withheld;
        - the late row either vanishes or surfaces as its own exact window
          ([30,60)->1) — it can never corrupt an on-time window's count.
        """
        from postgresql_cdc_spark.sources.pgoutput import (
            encode_begin,
            encode_commit,
            encode_insert,
            encode_relation,
        )
        from postgresql_cdc_spark.streaming.source import (
            PgCdcDataSource,
            write_wal_archive,
        )
        from tests.test_streaming_cdc import REL

        def ins(rid, secs):
            return encode_insert(16384, [str(rid), "x", str(secs), "{}"])

        frames = [
            (1, encode_relation(REL)),
            (10, encode_begin(13, 0, 201)),
            (11, ins(1, 100)),
            (12, ins(2, 130)),
            (13, encode_commit(13, 14, 0)),
            (20, encode_begin(23, 0, 202)),
            (21, ins(3, 50)),    # LATE: watermark is already at 120 s
            (22, ins(4, 140)),
            (23, encode_commit(23, 24, 0)),
            (30, encode_begin(32, 0, 203)),
            (31, ins(5, 170)),
            (32, encode_commit(32, 33, 0)),
        ]
        arch = str(tmp_path / "wal_late")
        write_wal_archive(arch, frames)
        spark.dataSource.register(PgCdcDataSource)

        stream = (
            spark.readStream.format("pgcdc")
            .option("path", arch)
            # one txn per micro-batch so the watermark advances between txns
            .option("maxRecordsPerBatch", "2")
            .load()
        )
        agg = (
            stream.withColumn(
                "event_time",
                F.timestamp_micros(
                    F.element_at("columns", "v_int").cast("long") * 1_000_000
                ),
            )
            .withWatermark("event_time", "10 seconds")
            .groupBy(F.window("event_time", "30 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("cdc_late")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_late"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM cdc_late").collect()
        got = {int(r.w.start.timestamp()): r.n for r in rows}
        assert len(rows) == len(got), "append emitted a window twice"
        # on-time rows all present, counted once, in the right windows
        assert got[90] == 1 and got[120] == 2
        # the open window is withheld
        assert 150 not in got
        # the late row is either dropped or isolated in its own window
        assert set(got) - {90, 120, 30} == set()
        if 30 in got:
            assert got[30] == 1
