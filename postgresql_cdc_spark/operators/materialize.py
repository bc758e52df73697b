"""Materialize a change log into current table state.

The load-bearing CDC operator: given envelope rows (op, lsn, columns map),
reduce each primary key to its latest state, honoring:

- replay order = LSN (the reference's only ordering, `CdcEngine.java:132-137`);
- DELETE removes the row;
- UPDATE images may be *sparse* — TOAST-unchanged columns are absent from the
  map (`PgWalMessageDecoder.java:206-207`) and must inherit the prior image;
- re-INSERT after DELETE starts a fresh image.

Two strategies, both one shuffle on the key:

- ``merge_sparse=True`` (default, correct under TOAST): groupBy key →
  ``sort_array(collect_list(struct(lsn, …)))`` → fold with a map-merge. The
  fold is a Catalyst higher-order function — no Python, no UDF. Per-key event
  counts are bounded by update frequency, and AQE skew-split handles hot keys.
- ``merge_sparse=False`` (latest-image-wins, reference "absent means absent"
  semantics): ``row_number() over (partition by key order by lsn desc) = 1``
  — cheaper when upstream guarantees complete images.

At 100 TB the input is typically date/LSN-partitioned parquet; both strategies
shuffle each key exactly once and aggregate partially map-side where possible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def materialize(
    changelog: DataFrame,
    keys: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    map_col: str = "columns",
    merge_sparse: bool = True,
) -> DataFrame:
    """Reduce envelope rows to current state (one row per live key).

    Returns ``(table, <key extraction cols>, op, lsn, txn_id?, columns)`` with
    ``columns`` holding the merged final image; DELETE-terminal keys dropped.
    """
    key_cols = [
        F.element_at(F.col(map_col), k).alias(f"__k_{k}") for k in keys
    ]
    part_cols = ["table"] if "table" in changelog.columns else []

    if not merge_sparse:
        w = Window.partitionBy(
            *part_cols, *[f"__k_{k}" for k in keys]
        ).orderBy(F.desc(lsn_col))
        return (
            changelog.select("*", *key_cols)
            .withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) & (F.col(op_col) != "D"))
            .drop("__rn", *[f"__k_{k}" for k in keys])
        )

    carry = [f for f in ("txn_id", "relation_id", "schema") if f in changelog.columns]
    # sort_array can't order structs containing maps; array_sort with an
    # explicit LSN comparator handles any element type.
    events = F.array_sort(
        F.collect_list(F.struct(F.col(lsn_col).alias("lsn"), F.col(op_col).alias("op"),
                                F.col(map_col).alias("columns"),
                                *[F.col(c).alias(c) for c in carry])),
        lambda l, r: F.when(l["lsn"] < r["lsn"], -1)
        .when(l["lsn"] > r["lsn"], 1)
        .otherwise(0),
    )
    empty_map = F.expr("map()").cast("map<string,string>")

    def step(acc, x):
        fresh = x["columns"]
        merged = F.map_concat(
            F.map_filter(acc, lambda k, _v: ~F.map_contains_key(fresh, k)), fresh
        )
        return (
            F.when(x["op"] == "D", empty_map)
            .when(x["op"] == "I", fresh)
            .otherwise(merged)
        )

    grouped = (
        changelog.select("*", *key_cols)
        .groupBy(*part_cols, *[f"__k_{k}" for k in keys])
        .agg(events.alias("__events"))
    )
    last = F.element_at("__events", -1)
    out = grouped.select(
        *part_cols,
        last.getField("op").alias(op_col),
        last.getField("lsn").alias(lsn_col),
        *[last.getField(c).alias(c) for c in carry],
        F.aggregate("__events", empty_map, step).alias(map_col),
    )
    return out.where(F.col(op_col) != "D")
