"""The two materialize code paths must agree on every protocol-valid changelog.

``materialize(..., columns=[...])`` takes the window-fill fast path (one
shuffle + one sort, generation-prefixed gap fill); without ``columns`` it
falls back to the generic per-(key, column) argmax fold. Both claim the same
semantics — latest value per column within the current generation, TOAST
inheritance, NULL-vs-absent distinction, DELETE-terminal drop, implicit
insert for capture-started-mid-stream keys. This test feeds both a seeded
random protocol-valid changelog (plus hand-picked adversarial keys) and
requires identical states.

Protocol-valid means what pgoutput can actually emit per key: optional
mid-stream start (first event may be U or D), I only at start or after D,
U/D only while a row exists. U-after-D never occurs on a real stream and the
paths are allowed to differ on it, so the generator never emits it.
"""

from __future__ import annotations

import random

import pytest

from postgresql_cdc_spark.operators.materialize import materialize

COLS = ["a", "b", "c"]
SCHEMA = "op string, lsn long, txn_id long, columns map<string,string>"


def _gen_events(seed: int, n_keys: int, first_key: int):
    rng = random.Random(seed)
    rows = []
    lsn = 1000 * (seed + 1)

    def image(key, full, explicit_null_ok=True):
        m = {"id": str(key)}
        cols = COLS if full else rng.sample(COLS, rng.randint(1, len(COLS)))
        for c in cols:
            if explicit_null_ok and rng.random() < 0.2:
                m[c] = None  # present-but-NULL: distinct from absent
            else:
                m[c] = f"{c}{rng.randint(0, 9)}"
        return m

    for k in range(first_key, first_key + n_keys):
        alive = False
        started = False
        for _ in range(rng.randint(1, 8)):
            lsn += 1
            if not alive:
                # dead (or not-yet-seen) row: insert, or — only before any
                # event — a mid-stream U/D capture start
                op = "I" if started else rng.choice(["I", "I", "U", "D"])
            else:
                op = rng.choice(["U", "U", "U", "D"])
            started = True
            if op == "I":
                rows.append(("I", lsn, k, image(k, full=True)))
                alive = True
            elif op == "U":
                rows.append(("U", lsn, k, image(k, full=False)))
                alive = True  # mid-stream U implies the row exists upstream
            else:
                rows.append(("D", lsn, k, {"id": str(k)}))
                alive = False
    return rows


def _adversarial(first_key: int):
    k = first_key
    return [
        # only-UPDATEs key (capture started mid-stream): must be KEPT
        ("U", 1, k, {"id": str(k), "a": "u1"}),
        ("U", 2, k, {"id": str(k), "b": None}),
        # D-first key: must be dropped
        ("D", 3, k + 1, {"id": str(k + 1)}),
        # I -> D -> I re-insert: generation reset, no inheritance across D
        ("I", 4, k + 2, {"id": str(k + 2), "a": "x", "b": "y", "c": "z"}),
        ("D", 5, k + 2, {"id": str(k + 2)}),
        ("I", 6, k + 2, {"id": str(k + 2), "a": "x2", "b": None, "c": "z2"}),
        ("U", 7, k + 2, {"id": str(k + 2), "a": None}),
        # TOAST inheritance: U omits b entirely, must inherit the I's b
        ("I", 8, k + 3, {"id": str(k + 3), "a": "1", "b": "toast", "c": "2"}),
        ("U", 9, k + 3, {"id": str(k + 3), "a": "3", "c": None}),
        # at-least-once replay: the terminal event arrives TWICE with the
        # same LSN — must still produce exactly one final row
        ("I", 10, k + 4, {"id": str(k + 4), "a": "p", "b": "q", "c": "r"}),
        ("U", 11, k + 4, {"id": str(k + 4), "a": "p2"}),
        ("U", 11, k + 4, {"id": str(k + 4), "a": "p2"}),
    ]


def _state(df):
    out = {}
    for r in df.collect():
        m = dict(r["columns"])
        assert m["id"] not in out, f"duplicate final row for key {m['id']}"
        out[m["id"]] = (r["op"], r["lsn"], m)
    return out


@pytest.mark.parametrize("seed", [7, 42])
def test_window_fill_matches_generic_fold(spark, seed):
    rows = (
        _gen_events(seed, n_keys=120, first_key=10_000)
        + _adversarial(first_key=90_000)
    )
    log = spark.createDataFrame(
        [(op, lsn, k, m) for op, lsn, k, m in rows], SCHEMA
    )
    generic = _state(materialize(log, keys=["id"], merge_sparse=True))
    fast = _state(
        materialize(
            log, keys=["id"], merge_sparse=True, columns=["id", *COLS]
        )
    )
    assert set(generic) == set(fast)
    for key in generic:
        assert generic[key] == fast[key], (
            f"key {key}: generic={generic[key]} fast={fast[key]}"
        )


def test_adversarial_semantics_pinned(spark):
    """The hand-picked keys also assert the SEMANTICS, not just agreement."""
    log = spark.createDataFrame(
        [(op, lsn, k, m) for op, lsn, k, m in _adversarial(0)], SCHEMA
    )
    st = _state(
        materialize(log, keys=["id"], merge_sparse=True, columns=["id", *COLS])
    )
    # only-UPDATEs key kept, b is present-but-NULL
    assert st["0"][2] == {"id": "0", "a": "u1", "b": None}
    # D-first key dropped
    assert "1" not in st
    # re-insert resets: nothing inherited from before the delete; the U's
    # explicit NULL overwrites within the new generation
    assert st["2"] == ("U", 7, {"id": "2", "a": None, "b": None, "c": "z2"})
    # TOAST: omitted b inherited from the insert; explicit-NULL c is NULL
    assert st["3"] == ("U", 9, {"id": "3", "a": "3", "b": "toast", "c": None})
    # duplicate-LSN replay collapses to ONE final row, TOAST still merged
    assert st["4"] == ("U", 11, {"id": "4", "a": "p2", "b": "q", "c": "r"})
