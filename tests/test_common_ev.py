"""Fixture-encoding regression tests for ``plans.common.EV``.

The driver has shipped ``events.parquet`` with two different physical
encodings of ``ts`` across fixture regenerations: INT64 TIMESTAMP(NANOS)
(read as bigint under ``spark.sql.legacy.parquet.nanosAsLong``) and plain
TIMESTAMP(MICROS). Round 5 lost 8 queries to an EV that assumed the first;
these tests pin the contract: both encodings normalize to identical
TimestampType values, and an unsupported type fails loudly instead of
feeding garbage into every event-time query.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from postgresql_cdc_spark.plans.common import EV

# Timestamps with microsecond tails — the nanos path must floor to micros,
# not round or lose precision.
_TS_US = [
    1_700_000_000_000_000,
    1_700_000_000_123_456,
    1_700_086_400_999_999,
]


def _write(tmp_path, name: str, arr: pa.Array) -> str:
    d = tmp_path / name
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array(range(len(_TS_US)), pa.int64()),
            "ts": arr,
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _micros(df):
    """Collected epoch-micros — tz-independent (collect() would render
    TimestampType through the DRIVER's local zone; only
    spark.sql.session.timeZone is pinned to UTC, so naive-datetime compares
    fail on a non-UTC machine). Integer comparison, like the rest of the
    suite."""
    return [
        r.us
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("us")
        ).orderBy("event_id").collect()
    ]


class TestEvEncodings:
    def test_nanos_int64_fixture(self, spark, tmp_path):
        # TIMESTAMP(NANOS) physical — Spark reads bigint under nanosAsLong;
        # EV must integer-floor to micros (div, not /: ns overflows double)
        arr = pa.array([us * 1000 for us in _TS_US], pa.timestamp("ns"))
        e = EV(spark, _write(tmp_path, "nanos", arr))
        assert dict(e.dtypes)["ts"] == "timestamp"
        assert _micros(e) == _TS_US

    def test_micros_fixture(self, spark, tmp_path):
        arr = pa.array(_TS_US, pa.timestamp("us"))
        e = EV(spark, _write(tmp_path, "micros", arr))
        assert dict(e.dtypes)["ts"] == "timestamp"
        assert _micros(e) == _TS_US

    def test_both_encodings_agree(self, spark, tmp_path):
        nanos = EV(
            spark,
            _write(tmp_path, "n2", pa.array([us * 1000 for us in _TS_US], pa.timestamp("ns"))),
        )
        micros = EV(
            spark, _write(tmp_path, "u2", pa.array(_TS_US, pa.timestamp("us")))
        )
        assert nanos.orderBy("event_id").collect() == micros.orderBy("event_id").collect()

    def test_unsupported_type_raises(self, spark, tmp_path):
        arr = pa.array([str(us) for us in _TS_US], pa.string())
        with pytest.raises(TypeError, match="unsupported"):
            EV(spark, _write(tmp_path, "bad", arr))
