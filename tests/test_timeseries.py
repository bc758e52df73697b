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


class TestAsofDirections:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "p1"), (1, 100, "p2"), (2, 50, "p3")],
            "k long, t long, lbl string",
        )
        right = spark.createDataFrame(
            [(1, 8, "r8"), (1, 13, "r13"), (1, 100, "r100"), (2, 400, "r400")],
            "k long, t long, rlbl string",
        )
        return left, right

    def _run(self, spark, direction, how="left", tolerance=None):
        from postgresql_cdc_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = asof_join(
            left, right, on="k", left_time="t", right_time="t",
            how=how, tolerance=tolerance, direction=direction,
        )
        return {r.lbl: r.rlbl for r in out.collect()}

    def test_forward_picks_smallest_following_inclusive(self, spark):
        # p1(t=10) -> r13; p2(t=100) -> r100 (equal time IS a forward
        # match, pandas semantics); p3(t=50) -> r400
        assert self._run(spark, "forward") == {
            "p1": "r13", "p2": "r100", "p3": "r400"
        }

    def test_nearest_prefers_closer_side_and_prior_on_tie(self, spark):
        # p1: |10-8|=2 back vs |13-10|=3 fwd -> r8; p2: exact hit r100;
        # p3: only forward exists -> r400
        assert self._run(spark, "nearest") == {
            "p1": "r8", "p2": "r100", "p3": "r400"
        }

    def test_nearest_tie_goes_backward(self, spark):
        from postgresql_cdc_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10, "p")], "k long, t long, lbl string")
        right = spark.createDataFrame(
            [(1, 7, "back"), (1, 13, "fwd")], "k long, t long, rlbl string"
        )
        out = asof_join(left, right, on="k", left_time="t", right_time="t",
                        direction="nearest")
        assert [r.rlbl for r in out.collect()] == ["back"]

    def test_nearest_tolerance_drops_far_matches(self, spark):
        # p3's only candidate is 350 away; tolerance 100 nulls it (how=left)
        got = self._run(spark, "nearest", tolerance=100)
        assert got == {"p1": "r8", "p2": "r100", "p3": None}

    def test_backward_unchanged(self, spark):
        assert self._run(spark, "backward") == {
            "p1": "r8", "p2": "r100", "p3": None
        }


class TestAsofNullTimes:
    def test_null_left_time_matches_nothing_in_all_directions(self, spark):
        from postgresql_cdc_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, None, "pnull"), (1, 50, "p50")], "k long, t long, lbl string"
        )
        right = spark.createDataFrame(
            [(1, 40, "r40"), (1, 60, "r60")], "k long, t long, rlbl string"
        )
        for d, want50 in (("backward", "r40"), ("forward", "r60"),
                          ("nearest", "r40")):
            out = asof_join(left, right, on="k", left_time="t",
                            right_time="t", how="left", direction=d)
            got = {r.lbl: r.rlbl for r in out.collect()}
            assert got == {"pnull": None, "p50": want50}, (d, got)

    def test_null_right_time_is_never_a_match_source(self, spark):
        from postgresql_cdc_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 50, "p")], "k long, t long, lbl string")
        right = spark.createDataFrame(
            [(1, None, "rnull"), (1, 40, "r40")], "k long, t long, rlbl string"
        )
        for d in ("backward", "forward", "nearest"):
            out = asof_join(left, right, on="k", left_time="t",
                            right_time="t", how="left", direction=d)
            got = {r.lbl: r.rlbl for r in out.collect()}
            assert got == {"p": ("r40" if d != "forward" else None)}, (d, got)


class TestAsofDuplicateRightTies:
    @pytest.mark.slow  # r18 tier split: lifecycle/parity soak; slow tier
    def test_duplicate_right_times_resolve_deterministically(self, spark):
        """Duplicate (key, time) right rows with distinct payloads must pick
        the same winner regardless of partition-internal row order (the
        window carries an xxhash64 tiebreak over the right payload)."""
        from pyspark.sql import functions as F

        from postgresql_cdc_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 50, "pb"), (1, 30, "pf")], "k long, t long, lbl string"
        )
        dup_rows = [(1, 40, f"r{i}") for i in range(8)]  # 8 ties at t=40
        # the documented rule: backward/nearest -> greatest payload hash,
        # forward -> least payload hash
        hashes = {
            r.rlbl: r.h
            for r in spark.createDataFrame(dup_rows, "k long, t long, rlbl string")
            .select("rlbl", F.xxhash64(F.struct("t", "rlbl")).alias("h"))
            .collect()
        }
        want_back = max(hashes, key=hashes.get)
        want_fwd = min(hashes, key=hashes.get)

        for perm in (dup_rows, dup_rows[::-1], dup_rows[3:] + dup_rows[:3]):
            for nparts in (1, 5):
                right = spark.createDataFrame(
                    perm, "k long, t long, rlbl string"
                ).repartition(nparts)
                # pb(t=50) sees the dups as prior rows (backward frame ->
                # greatest hash); pf(t=30) sees them as following rows
                # (forward frame -> least hash); nearest routes each left
                # row to its only populated side.
                expects = {
                    "backward": {"pb": want_back, "pf": None},
                    "forward": {"pb": None, "pf": want_fwd},
                    "nearest": {"pb": want_back, "pf": want_fwd},
                }
                for d, expect in expects.items():
                    out = asof_join(left, right, on="k", left_time="t",
                                    right_time="t", how="left", direction=d)
                    got = {r.lbl: r.rlbl for r in out.collect()}
                    assert got == expect, (d, perm[0], nparts, got)

    @pytest.mark.slow  # r18 tier split: lifecycle/parity soak; slow tier
    def test_equal_time_forward_ties_resolve_like_backward(self, spark):
        """A forward match at EXACTLY the left time routes through the
        shared backward frame, so among duplicate equal-time rights the
        GREATEST payload hash wins (documented), and stays stable across
        partition layouts."""
        from pyspark.sql import functions as F

        from postgresql_cdc_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 40, "p")], "k long, t long, lbl string")
        dup_rows = [(1, 40, f"e{i}") for i in range(6)]
        hashes = {
            r.rlbl: r.h
            for r in spark.createDataFrame(dup_rows, "k long, t long, rlbl string")
            .select("rlbl", F.xxhash64(F.struct("t", "rlbl")).alias("h"))
            .collect()
        }
        want = max(hashes, key=hashes.get)
        for perm in (dup_rows, dup_rows[::-1]):
            for nparts in (1, 4):
                right = spark.createDataFrame(
                    perm, "k long, t long, rlbl string"
                ).repartition(nparts)
                for d in ("forward", "backward", "nearest"):
                    out = asof_join(left, right, on="k", left_time="t",
                                    right_time="t", how="left", direction=d)
                    got = {r.lbl: r.rlbl for r in out.collect()}
                    assert got == {"p": want}, (d, perm[0], nparts, got)
