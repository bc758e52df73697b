"""gapfill_locf: spine bounds, LOCF carry, deterministic in-bucket pick.

The oracle-paired query (`events_gapfill_locf`) pins values against DuckDB
at sf0.01; these tests pin the operator contract on hand-built frames.
"""

from __future__ import annotations

import datetime as dt

import pytest

from postgresql_cdc_spark.operators.timeseries import gapfill_locf


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, day, hour, 0, 0)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = gapfill_locf(df, "ts", "user_id", "value", "event_id").collect()
    return sorted(
        (r.user_id, r.bucket_start.day, r.value, r.n_events, r.is_filled)
        for r in out
    )


def test_gap_days_are_filled_with_locf(spark):
    rows = [
        (1, _ts(1), 7, 10.0),
        (2, _ts(4), 7, 40.0),  # days 2 and 3 are gaps
    ]
    assert _run(spark, rows) == [
        (7, 1, 10.0, 1, False),
        (7, 2, 10.0, 0, True),
        (7, 3, 10.0, 0, True),
        (7, 4, 40.0, 1, False),
    ]


def test_last_observation_in_bucket_wins_deterministically(spark):
    # same day, later ts wins; equal ts resolved by event_id
    rows = [
        (1, _ts(1, 9), 7, 1.0),
        (2, _ts(1, 18), 7, 2.0),
        (3, _ts(2, 5), 7, 5.0),
        (4, _ts(2, 5), 7, 6.0),  # same ts as event 3: higher id wins
    ]
    assert _run(spark, rows) == [
        (7, 1, 2.0, 2, False),
        (7, 2, 6.0, 2, False),
    ]


def test_keys_have_independent_spines(spark):
    rows = [
        (1, _ts(1), 7, 1.0),
        (2, _ts(3), 7, 3.0),
        (3, _ts(10), 8, 9.0),  # user 8 active only on day 10: no fills
    ]
    got = _run(spark, rows)
    assert got == [
        (7, 1, 1.0, 1, False),
        (7, 2, 1.0, 0, True),
        (7, 3, 3.0, 1, False),
        (8, 10, 9.0, 1, False),
    ]


def test_unknown_unit_rejected(spark):
    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    with pytest.raises(ValueError):
        gapfill_locf(df, "ts", "user_id", "value", "event_id", unit="fortnight")
