"""Generate QUERIES.md — the registry inventory (one row per oracle-paired
query) so SURVEY §2 coverage can be checked line by line. Run:

    python tools/gen_inventory.py > QUERIES.md

The ``src`` column is a short hash of the builder's source + oracle SQL.
``plans._staleness_order`` compares it against the live registry: a mismatch
means the query changed since the inventory was generated, so it re-registers
at the front of the correctness budget (same priority as a red stamp).
Regenerate this file whenever a registered query changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresql_cdc_spark.plans import (  # noqa: E402
    QUERIES,
    _recorded_since,
    fixture_schema_fingerprints,
    latest_stamp_round,
    source_hash,
)


def module_of(q) -> str:
    fn = q.spark
    while hasattr(fn, "__wrapped__"):
        fn = fn.__wrapped__
    mod = getattr(fn, "__module__", "?")
    return mod.rsplit(".", 1)[-1]


def main() -> int:
    print("# Query inventory")
    print()
    print(f"{len(QUERIES)} oracle-paired queries, in registration order (the "
          "order a budget-capped correctness harness visits them — "
          "staleness-driven: red/changed/never-stamped first, then "
          "least-recently-stamped; see plans.__init__._staleness_order). "
          "Every entry pairs a Spark DataFrame builder with an ANSI-SQL "
          "DuckDB twin; the gate hash-compares values.")
    print()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    since = _recorded_since(root)
    new_since = latest_stamp_round(root) + 1
    print("| # | query | module | src | since | what it verifies |")
    print("|---|---|---|---|---|---|")
    for i, (name, q) in enumerate(QUERIES.items(), 1):
        doc = " ".join((q.doc or "").split())
        # `since` = the round the query first entered the committed inventory;
        # preserved across regenerations (parsed back from the current file),
        # new queries dated one past the latest driver stamp. The staleness
        # rotation uses it to keep the never-stamped backlog FIFO.
        s = since.get(name, new_since)
        print(
            f"| {i} | `{name}` | {module_of(q)} | {source_hash(q)} "
            f"| r{s} | {doc} |"
        )
    print()
    print("## Fixture schemas")
    print()
    print("Physical parquet schema fingerprints at generation time. A driver "
          "fixture regeneration that changes a type shows up as a mismatch "
          "here, and `plans._staleness_order` re-verifies every query "
          "reading the drifted table first (same priority as a source "
          "change).")
    print()
    for t, h in fixture_schema_fingerprints().items():
        print(f"- fixture `{t}`: `{h}`")
    return 0


if __name__ == "__main__":
    sys.exit(main())
