"""Skew-mitigation patterns: salted two-phase aggregation and bucketed
co-located joins.

AQE's skew-join splitting handles most runtime skew automatically (enabled in
``session.get_spark``), but two patterns still need explicit structure:

- **Salted aggregation** — when a groupBy key has a handful of giant groups
  (the classic: 3 return-flag values over 600B lineitems), one reducer per
  hot key becomes the straggler. Salting splits each key into ``n_salts``
  sub-groups for the partial aggregate, then combines sub-aggregates in a
  second (tiny) aggregate. Works for any algebraic aggregate (sum/count/min/
  max); the combine step must re-aggregate, not average.

- **Bucketed tables** — pre-hash-partitioning both join sides into the same
  bucket layout makes the join exchange-free: each task reads matching
  buckets. The write pays one shuffle ONCE; every later join of the bucketed
  tables skips its shuffle — the standard trade for fact-to-fact joins read
  many times (e.g. orders x lineitem at 100 TB).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name -> (combine_fn_name, partial_agg_column) where
    ``combine_fn_name`` is how partials merge ("sum", "min", "max").
    The salt derives deterministically from a high-cardinality column
    (``salt_on``, default: the whole row via spark_partition_id is NOT used —
    monotonically varying data would unbalance; hash of all non-key columns
    keeps it uniform).

    Phase 1 shuffles on (keys..., salt) — ``n_salts`` reducers share each hot
    key; phase 2 shuffles only one row per (key, salt), which is tiny.
    """
    salt_src = F.col(salt_on) if salt_on else F.concat_ws(
        "\x00", *[c for c in df.columns if c not in keys]
    )
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[col.alias(f"__p_{name}") for name, (_fn, col) in aggs.items()]
    )
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(*keys).agg(
        *[
            combiners[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
    return final


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
) -> None:
    """Materialize ``df`` as a bucketed+sorted table (idempotent overwrite).

    Bucketing metadata lives in the session catalog; the files live at
    ``path``. Joins between tables bucketed identically on the join key run
    with NO shuffle exchange on either side.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
