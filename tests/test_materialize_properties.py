"""Property test: ``materialize`` vs a reference Python fold.

The window-fill merge (``operators/materialize.py``) is the subtlest kernel
in the repo — per-column LOCF over an LSN-sorted window with struct-tagged
presence, NULL-vs-absent distinction, TOAST inheritance, and re-INSERT
freshness via the running last-INSERT-LSN marker. The fixture-shaped tests
and the DuckDB oracle pin it on one synthetic distribution; this pins it on
hypothesis-generated protocol-valid changelogs against the obviously-correct
sequential fold the reference consumer effectively implements
(`CdcEngine.java:132-137` replay order; `PgWalMessageDecoder.java:206-207`
TOAST-absent sparsity).

Protocol-valid per key: events replay in LSN order; the first event may be
I, U, or D (capture may start mid-stream); after that I only follows D, and
U/D require a live (or implicitly live, mid-stream) row. U-after-D never
occurs on a real stream, so the generator never emits it.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from postgresql_cdc_spark.operators.materialize import materialize

COLS = ["a", "b", "c"]
SCHEMA = "op string, lsn long, columns map<string,string>"


@st.composite
def changelog(draw):
    """A multi-key, protocol-valid changelog with adversarial shapes:
    sparse updates, explicit NULLs, re-insert-after-delete chains,
    mid-stream capture starts, delete-terminal keys, single-event keys."""
    n_keys = draw(st.integers(min_value=1, max_value=6))
    rows = []
    lsn = 0
    for k in range(n_keys):
        n_events = draw(st.integers(min_value=1, max_value=10))
        alive = False
        started = False

        def img(key, full):
            m = {"id": str(key)}
            cols = COLS if full else draw(
                st.lists(st.sampled_from(COLS), min_size=1, max_size=3,
                         unique=True)
            )
            for c in cols:
                v = draw(st.one_of(
                    st.none(),
                    st.text(alphabet="xyz0", min_size=0, max_size=3),
                ))
                m[c] = v
            return m

        for _ in range(n_events):
            lsn += 1
            if not alive:
                op = "I" if started else draw(
                    st.sampled_from(["I", "I", "U", "D"])
                )
            else:
                op = draw(st.sampled_from(["U", "U", "U", "D"]))
            started = True
            if op == "I":
                rows.append(("I", lsn, img(k, full=True)))
                alive = True
            elif op == "U":
                rows.append(("U", lsn, img(k, full=False)))
                alive = True  # mid-stream U implies the row exists upstream
            else:
                rows.append(("D", lsn, {"id": str(k)}))
                alive = False
    return rows


def _fold(rows):
    """Sequential replay: the reference consumer's semantics."""
    state: dict[str, dict] = {}
    meta: dict[str, tuple] = {}
    for op, lsn, m in sorted(rows, key=lambda r: r[1]):
        key = m["id"]
        if op == "I":
            state[key] = dict(m)
        elif op == "U":
            merged = dict(state.get(key, {"id": key}))  # implicit insert
            merged.update(m)  # sparse: absent columns inherit
            state[key] = merged
        else:
            state.pop(key, None)
        meta[key] = (op, lsn)
    return {
        key: (meta[key][0], meta[key][1], img)
        for key, img in state.items()
    }


def _collect(df):
    return {
        r["__k_id"] if "__k_id" in r.__fields__ else r["columns"]["id"]: (
            r["op"], r["lsn"], dict(r["columns"]),
        )
        for r in df.collect()
    }


class TestMaterializeProperties:
    @settings(max_examples=30, deadline=None)
    @given(changelog())
    @pytest.mark.slow  # r18 tier split: lifecycle/parity soak; slow tier
    def test_window_fill_matches_sequential_fold(self, spark, rows):
        df = spark.createDataFrame(rows, SCHEMA).repartition(4)
        got = _collect(
            materialize(df, keys=["id"], merge_sparse=True,
                        columns=["id", *COLS])
        )
        assert got == _fold(rows)

    @settings(max_examples=10, deadline=None)
    @given(changelog())
    @pytest.mark.slow  # r18 tier split: lifecycle/parity soak; slow tier
    def test_generic_fallback_matches_sequential_fold(self, spark, rows):
        df = spark.createDataFrame(rows, SCHEMA).repartition(4)
        got = _collect(
            materialize(df, keys=["id"], merge_sparse=True)
        )
        assert got == _fold(rows)
