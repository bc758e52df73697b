"""Query inventory: every entry pairs a Spark DataFrame builder with an
ANSI-SQL oracle that DuckDB runs on the same parquet tables.

The driver's correctness gate sorts columns by name and hashes values, so
builders and oracles alias every computed column identically, and all floating
aggregations route through *exact decimal arithmetic* (data has <=4 decimal
places) with a final cast to double — bit-identical on both engines regardless
of partitioning/order.
"""

from __future__ import annotations

from postgresql_cdc_spark.plans.registry import QUERIES, Query, register

# Importing the modules populates QUERIES in source order; the staleness
# reorder below then decides the order a budget-capped correctness harness
# visits queries, so nothing about priority is hard-coded here.
from postgresql_cdc_spark.plans import extensions  # noqa: E402,F401
from postgresql_cdc_spark.plans import extensions2  # noqa: E402,F401
from postgresql_cdc_spark.plans import cdc  # noqa: E402,F401
from postgresql_cdc_spark.plans import streaming_gate  # noqa: E402,F401
from postgresql_cdc_spark.plans import sources_io  # noqa: E402,F401
from postgresql_cdc_spark.plans import events_ext  # noqa: E402,F401
from postgresql_cdc_spark.plans import relational4  # noqa: E402,F401
from postgresql_cdc_spark.plans import scale_patterns  # noqa: E402,F401
from postgresql_cdc_spark.plans import relational  # noqa: E402,F401
from postgresql_cdc_spark.plans import relational2  # noqa: E402,F401
from postgresql_cdc_spark.plans import relational3  # noqa: E402,F401


def source_hash(q: Query) -> str:
    """Short fingerprint of a query's builder source + oracle SQL.

    Recorded in QUERIES.md by ``tools/gen_inventory.py``; a live registry
    whose hash differs from the recorded one is treated as *changed since
    last stamped* by ``_staleness_order`` and re-verifies first.
    """
    import hashlib
    import inspect

    fn = q.spark
    while hasattr(fn, "__wrapped__"):
        fn = fn.__wrapped__
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = getattr(fn, "__name__", "?")
    blob = src + "\n--oracle--\n" + (q.oracle or "")
    return hashlib.md5(blob.encode()).hexdigest()[:10]


def _recorded_hashes(root: str) -> dict[str, str]:
    """name -> src hash parsed from the committed QUERIES.md inventory."""
    import re

    path = __import__("os").path.join(root, "QUERIES.md")
    out: dict[str, str] = {}
    try:
        with open(path) as f:
            for line in f:
                m = re.match(r"\|\s*\d+\s*\|\s*`([^`]+)`\s*\|\s*\S+\s*\|\s*([0-9a-f]{10})\s*\|", line)
                if m:
                    out[m.group(1)] = m.group(2)
    except OSError:
        pass
    return out


FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

# Helpers whose *call site* in a builder implies a table the source never
# names literally (table resolution happens inside the helper).
_HELPER_TABLES = {
    "EV(": ("events",),
    "_near_dup_corpus": ("documents",),
}


def fixture_schema_fingerprints(
    sf_dir: str = "/root/testdata/sf0.01",
) -> dict[str, str]:
    """table -> short fingerprint of its parquet *physical* schema.

    The driver regenerates fixtures between rounds and has already changed a
    physical type in place once (events.ts INT64-nanos -> TIMESTAMP(MICROS)),
    silently invalidating every green stamp that read the column. Recording
    the arrow schema string (field names + physical/logical types) in
    QUERIES.md lets ``_staleness_order`` treat a drift exactly like a source
    change: affected queries re-verify first next round, no hand-editing.
    """
    import hashlib
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover — pyarrow is baked into the env
        return {}
    out: dict[str, str] = {}
    for t in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        try:
            schema = pq.read_schema(path)
        except (OSError, Exception):  # noqa: BLE001 — absent fixture: skip
            continue
        blob = "; ".join(f"{f.name}:{f.type}" for f in schema)
        out[t] = hashlib.md5(blob.encode()).hexdigest()[:10]
    return out


def _recorded_fixture_hashes(root: str) -> dict[str, str]:
    """table -> fingerprint parsed from QUERIES.md's fixture-schema section."""
    import re

    path = __import__("os").path.join(root, "QUERIES.md")
    out: dict[str, str] = {}
    try:
        with open(path) as f:
            for line in f:
                m = re.match(r"- fixture `([a-z]+)`: `([0-9a-f]{10})`", line)
                if m:
                    out[m.group(1)] = m.group(2)
    except OSError:
        pass
    return out


def tables_of(q: Query) -> set[str]:
    """Fixture tables a query reads, inferred from builder source + oracle.

    Literal table names appear either as ``T(spark, sf_dir, "events")``-style
    string arguments or as FROM/JOIN targets in the oracle SQL; helper calls
    that hide the name are mapped explicitly. Over-approximation is harmless
    (one extra early re-verify); under-approximation only delays a stamp by a
    round.
    """
    import inspect
    import re

    fn = q.spark
    while hasattr(fn, "__wrapped__"):
        fn = fn.__wrapped__
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    blob = src + "\n" + (q.oracle or "")
    found = {t for t in FIXTURE_TABLES if re.search(rf"\b{t}\b", blob)}
    for marker, tabs in _HELPER_TABLES.items():
        if marker in src:
            found.update(tabs)
    return found


# Queries whose implementation or oracle changed AFTER the round whose driver
# stamp they carry (so neither a red stamp nor an inventory-hash mismatch can
# promote them): force them to the absolute front of the verification window
# until a driver stamp from a LATER round lands, at which point the pin goes
# inert on its own — no hand-removal needed. name -> round of the now-stale
# stamp.
_PIN_UNTIL_STAMPED_AFTER = {
    "dedup_minhash_lsh": 5,   # oracle rewritten for the affine minhash family
    "dedup_ngram_jaccard": 5,  # base pre-hashes shingles (same semantics)
}


def _staleness_order() -> None:
    """Reorder QUERIES so a budget-capped harness stamps what needs it most.

    The harness visits registration order and checks only a prefix (50 of 90+
    last rounds), so registration order IS the verification budget policy.
    Derive it from the recorded driver stamps (``CORRECTNESS_r*.json`` at the
    repo root) instead of hand-rotating:

    1. never-stamped, red-at-latest-stamp, or changed-since-inventory
       queries first (new code and known failures always get a driver row
       next round),
    2. then everything else least-recently-stamped first (no query goes
       rounds without a fresh stamp while its family mates re-verify),
    3. ties keep source registration order (stable sort).

    Missing/unreadable stamp files degrade gracefully to source order.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last_stamp: dict[str, int] = {}
    last_green: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                stamps = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in stamps.items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("rows_match")) and bool(row.get("schema_match")) and (
                row.get("hash_match") is not False  # None => rows-only check
            ) and row.get("err") in (None, "")
            if rnd >= last_stamp.get(name, -1):
                last_stamp[name] = rnd
                last_green[name] = green

    recorded = _recorded_hashes(root)
    rec_fix = _recorded_fixture_hashes(root)
    live_fix = fixture_schema_fingerprints() if rec_fix else {}
    drifted_tables = {
        t for t, h in rec_fix.items() if live_fix.get(t, h) != h
    }

    def changed(n: str) -> bool:
        rec = recorded.get(n)
        if rec is not None and rec != source_hash(QUERIES[n]):
            return True
        # fixture drift counts as a change for every query reading the table
        return bool(drifted_tables and drifted_tables & tables_of(QUERIES[n]))

    names = list(QUERIES)
    order = {n: i for i, n in enumerate(names)}

    def pin_active(n: str) -> bool:
        until = _PIN_UNTIL_STAMPED_AFTER.get(n)
        return until is not None and last_stamp.get(n, -1) <= until

    names.sort(
        key=lambda n: (
            0 if pin_active(n) else 1,
            0 if (not last_green.get(n, False) or changed(n)) else 1,
            last_stamp.get(n, -1),  # then stalest stamp
            order[n],
        )
    )
    reordered = {n: QUERIES[n] for n in names}
    QUERIES.clear()
    QUERIES.update(reordered)


_staleness_order()

__all__ = ["QUERIES", "Query", "register"]
