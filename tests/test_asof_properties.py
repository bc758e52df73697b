"""Property-based equivalence of asof_join vs pandas ``merge_asof``.

``operators/asof.py`` encodes subtle inclusive/exclusive frame geometry
(equal-time rights are backward- and forward-inclusive; nearest ties go to
the prior match; tolerance bounds the gap symmetrically per direction).
Until now only the oracle queries pinned it on fixture data; these tests pin
all three directions (+tolerance, both ``how`` modes) against pandas — the
semantics the docstring claims — on randomized frames.

Right (key, time) pairs are generated UNIQUE: with duplicates pandas keeps
positional order while asof_join resolves by payload hash (documented, unit-
tested in test_timeseries.py), so equivalence is only defined on pre-deduped
input — exactly the operator's documented contract.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# r18 tier split: hypothesis fuzz/property soaks run in the slow tier
# (fast coverage of the same operators lives in the sibling test files
# and the oracle-parity sweep); run with -m "" or -m slow.
pytestmark = pytest.mark.slow

from postgresql_cdc_spark.operators.asof import asof_join

_TIMES = st.integers(min_value=0, max_value=60)
_KEYS = st.integers(min_value=1, max_value=3)


@st.composite
def frames(draw):
    lefts = draw(
        st.lists(st.tuples(_KEYS, _TIMES), min_size=1, max_size=12)
    )
    rights = draw(
        st.lists(
            st.tuples(_KEYS, _TIMES), min_size=0, max_size=12, unique=True
        )
    )
    return lefts, rights


def _pandas_truth(lefts, rights, direction, tolerance):
    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        columns=["k", "t", "lid"],
    ).sort_values(["t", "lid"], kind="stable")
    rp = (
        pd.DataFrame(
            [(k, t, f"r{k}_{t}") for k, t in rights],
            columns=["k", "t", "rlbl"],
        )
        .astype({"k": "int64", "t": "int64"})  # empty frame: object -> int
        .sort_values("t", kind="stable")
    )
    merged = pd.merge_asof(
        lp,
        rp,
        on="t",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=True,
    )
    return {
        int(r.lid): (None if pd.isna(r.rlbl) else r.rlbl)
        for r in merged.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 7])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=frames())
def test_matches_pandas_merge_asof(spark, direction, tolerance, data):
    lefts, rights = data
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, f"r{k}_{t}") for k, t in rights] or [(0, 0, "sentinel")],
        "k long, t long, rlbl string",
    )
    if not rights:
        right = right.where("k < 0")  # empty frame, schema kept

    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        how="left",
        tolerance=tolerance,
        direction=direction,
    )
    got = {int(r.lid): r.rlbl for r in out.collect()}
    want = _pandas_truth(lefts, rights, direction, tolerance)
    assert got == want, (direction, tolerance, lefts, rights)

    # how='inner' is exactly the matched subset of how='left'
    inner = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        how="inner", tolerance=tolerance, direction=direction,
    )
    got_inner = {int(r.lid): r.rlbl for r in inner.collect()}
    assert got_inner == {k: v for k, v in want.items() if v is not None}
