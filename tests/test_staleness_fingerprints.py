"""Staleness-machinery tests: the re-verification window in
``plans._staleness_order`` is driven by per-query source hashes and fixture
schema fingerprints; these pin the two properties VERDICT r6 flagged:

1. a query's ``source_hash`` must cover its TRANSITIVE helper modules
   (``operators/*``, ``functions/*``): editing ``operators/text.py`` must
   flip ``text_token_stats``'s hash even though the builder's own text is
   unchanged, so its green stamp is invalidated;
2. a fixture with a recorded fingerprint but no readable live schema must be
   treated as drifted, not silently skipped.
"""

from __future__ import annotations

import postgresql_cdc_spark.plans as plans
from postgresql_cdc_spark.plans import QUERIES, source_hash


def _seeded_hash(name: str, module: str, fake: str) -> str:
    """source_hash with the given helper module's source fingerprint replaced
    (simulating an edit without touching the file)."""
    saved_mod = dict(plans._MOD_HASH_CACHE)
    try:
        plans._MOD_HASH_CACHE[module] = fake
        return source_hash(QUERIES[name])
    finally:
        plans._MOD_HASH_CACHE.clear()
        plans._MOD_HASH_CACHE.update(saved_mod)


class TestHelperFingerprints:
    def test_text_helper_edit_flips_dependent_query_hashes(self):
        # token/shingle kernels live in operators/text.py; every query built
        # on them must re-verify when that module changes.
        mod = "postgresql_cdc_spark.operators.text"
        for name in ("text_token_stats", "dedup_exact", "dedup_ngram_jaccard"):
            assert mod in plans.helper_modules(QUERIES[name]), name
            assert _seeded_hash(name, mod, "deadbeef00") != source_hash(
                QUERIES[name]
            ), f"{name}: helper edit did not flip source_hash"

    def test_similarity_helper_edit_flips_ann_queries(self):
        mod = "postgresql_cdc_spark.operators.similarity"
        assert _seeded_hash("sim_topk_lsh", mod, "deadbeef00") != source_hash(
            QUERIES["sim_topk_lsh"]
        )

    def test_unrelated_query_module_excluded_from_closure(self):
        # Modules that define registered queries are tracked per-builder;
        # including them wholesale would flip every sibling on any edit.
        for name, q in QUERIES.items():
            mods = plans.helper_modules(q)
            assert not any(
                m in plans._query_defining_modules() for m in mods
            ), f"{name} closure contains a query-defining module"

    def test_pg_types_helper_covers_cdc_queries(self):
        mod = "postgresql_cdc_spark.functions.pg_types"
        assert mod in plans.helper_modules(QUERIES["cdc_materialize_state"])

    def test_function_local_imports_are_fingerprinted(self):
        # Builders routinely import their operator INSIDE the function body
        # (never surfacing in the module namespace); the closure must still
        # see them — VERDICT r7 review caught asof/streaming escaping it.
        cases = {
            "asof_purchase_to_signup": "postgresql_cdc_spark.operators.asof",
            "cdc_stream_end_to_end": "postgresql_cdc_spark.streaming.source",
            "mm_binary_features": "postgresql_cdc_spark.operators.multimodal",
            "dedup_cluster_labels": "postgresql_cdc_spark.operators.graph",
        }
        for name, mod in cases.items():
            mods = plans.helper_modules(QUERIES[name])
            assert mod in mods, f"{name}: {mod} missing from closure {mods}"
            assert _seeded_hash(name, mod, "deadbeef00") != source_hash(
                QUERIES[name]
            ), f"{name}: edit to {mod} did not flip source_hash"

    def test_closure_immune_to_package_load_state(self):
        # Regression (r9): importing pkg.sub sets ``sub`` as an attribute on
        # ``pkg``, so a package namespace accretes loaded submodules. The
        # closure walk must not count those load-state attributes as dep
        # edges — it made source_hash depend on which submodules earlier
        # closure computations happened to import, so gen_inventory recorded
        # hashes that no fresh process reproduced (116 phantom "changed"
        # queries, hijacking the driver's 50-query verification budget).
        import importlib

        name = "part_supplier_diversity"
        q = QUERIES[name]
        before_mods = plans.helper_modules(q)
        before_hash = source_hash(q)
        # load every operators submodule, then recompute from cold caches
        import pkgutil

        import postgresql_cdc_spark.operators as ops

        for info in pkgutil.iter_modules(ops.__path__):
            importlib.import_module(f"{ops.__name__}.{info.name}")
        saved_closure = dict(plans._CLOSURE_CACHE)
        saved_mod = dict(plans._MOD_HASH_CACHE)
        try:
            plans._CLOSURE_CACHE.clear()
            plans._MOD_HASH_CACHE.clear()
            assert plans.helper_modules(q) == before_mods
            assert source_hash(q) == before_hash
        finally:
            plans._CLOSURE_CACHE.clear()
            plans._CLOSURE_CACHE.update(saved_closure)
            plans._MOD_HASH_CACHE.clear()
            plans._MOD_HASH_CACHE.update(saved_mod)


class TestSinceColumn:
    def test_recorded_since_parses_inventory(self, tmp_path):
        (tmp_path / "QUERIES.md").write_text(
            "| # | query | module | src | since | what it verifies |\n"
            "|---|---|---|---|---|---|\n"
            "| 1 | `q_old` | extensions | 0123456789 | r4 | stuff |\n"
            "| 2 | `q_new` | extensions9 | abcdef0123 | r9 | stuff |\n"
        )
        assert plans._recorded_since(str(tmp_path)) == {"q_old": 4, "q_new": 9}

    def test_pre_since_inventory_parses_empty(self, tmp_path):
        # older inventories without the column degrade to source order
        (tmp_path / "QUERIES.md").write_text(
            "| # | query | module | src | what it verifies |\n"
            "|---|---|---|---|---|\n"
            "| 1 | `q_old` | extensions | 0123456789 | stuff |\n"
        )
        assert plans._recorded_since(str(tmp_path)) == {}

    def test_live_inventory_covers_registry(self):
        # every registered query carries a since round in the committed
        # inventory, and regeneration preserves it (FIFO input for the
        # staleness rotation's never-stamped bucket)
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        since = plans._recorded_since(root)
        missing = set(QUERIES) - set(since)
        assert not missing, f"queries without a since round: {missing}"


class TestFixtureDrift:
    def test_unreadable_fixture_counts_as_drift(self, tmp_path):
        # present-but-corrupt parquet must fingerprint (as 'unreadable'),
        # not vanish from the map.
        bad = tmp_path / "region.parquet"
        bad.write_bytes(b"not a parquet file")
        fp = plans.fixture_schema_fingerprints([str(tmp_path)])
        assert fp[f"region@{tmp_path.name}"] == "unreadable"

    def test_absent_table_fingerprints_as_absent(self, tmp_path):
        # a table missing from a present dir fingerprints as 'absent': if it
        # was recorded with a schema hash, its disappearance IS drift.
        fp = plans.fixture_schema_fingerprints([str(tmp_path)])
        assert fp[f"region@{tmp_path.name}"] == "absent"
        assert set(fp) == {
            f"{t}@{tmp_path.name}" for t in plans.FIXTURE_TABLES
        }

    def test_live_fingerprints_cover_all_tables_per_dir(self):
        fp = plans.fixture_schema_fingerprints()
        assert {k.split("@", 1)[0] for k in fp} == set(plans.FIXTURE_TABLES)
        # per-dir keys: removing one sf dir must not disturb other dirs'
        # fingerprints (the layout-churn-is-not-drift property)
        assert all("@" in k for k in fp)


class TestStampWindowBudget:
    def test_never_stamped_and_pins_fit_the_driver_prefix(self):
        """The driver stamps ~50 queries per round in registration order, so
        the staleness reorder IS the verification-budget policy. This guard
        fails the moment registrations outgrow it: every never-driver-stamped
        query and every ACTIVE re-verification pin must sit inside the first
        50 — if this trips, either cut new registrations or consciously
        rebalance (a query pushed past the prefix silently waits a round)."""
        import glob
        import json
        import os

        from postgresql_cdc_spark import plans
        from postgresql_cdc_spark.plans import (
            _PIN_UNTIL_STAMPED_AFTER,
            QUERIES,
        )

        root = os.path.dirname(os.path.dirname(os.path.abspath(plans.__file__)))
        root = os.path.dirname(root)  # repo root
        last_stamp: dict[str, int] = {}
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            try:
                with open(path) as f:
                    stamps = json.load(f)
            except (OSError, ValueError):
                continue
            import re

            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            rnd = int(m.group(1)) if m else 0
            for name in stamps:
                last_stamp[name] = max(last_stamp.get(name, -1), rnd)

        names = list(QUERIES)
        prefix = set(names[:50])
        never = [n for n in names if n not in last_stamp]
        missing_never = [n for n in never if n not in prefix]
        assert not missing_never, (
            f"{len(never)} never-stamped queries but these fell outside the "
            f"driver's 50-stamp prefix: {missing_never}"
        )
        active_pins = [
            n for n, until in _PIN_UNTIL_STAMPED_AFTER.items()
            if n in QUERIES and last_stamp.get(n, -1) <= until
        ]
        missing_pins = [n for n in active_pins if n not in prefix]
        assert not missing_pins, (
            f"active re-verification pins outside the 50-stamp prefix: "
            f"{missing_pins}"
        )
