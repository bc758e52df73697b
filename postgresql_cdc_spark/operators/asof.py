"""As-of (point-in-time) join.

Spark has no built-in ASOF JOIN (DuckDB/Pandas do). The naive formulation —
range theta-join then max-per-key — is a cross-join blowup at scale. This
implements the shuffle-once pattern instead:

1. Tag left rows (side=1) and right rows (side=0), union them with the right
   payload packed into a struct (null on left rows).
2. One window over ``partitionBy(keys).orderBy(time, side)`` carries the most
   recent right payload forward (``last(..., ignorenulls=True)``).
3. Keep left rows; unpack the struct.

Cost: a single hash shuffle of |L|+|R| rows on the join keys plus a per-
partition sort — the same cost profile as a sort-merge join, with no
intermediate blowup. Skewed keys are handled by AQE skew-split since this is
a plain window shuffle.

Semantics: for each left row, the right row with the greatest ``right_time``
<= ``left_time`` (ties on time: the union orders right rows before left rows,
and among equal-time right rows the last one wins — pre-dedupe if that
matters). ``how='inner'`` drops unmatched left rows, ``'left'`` keeps them.
``tolerance`` (optional) bounds the lookback: a nearest-prior match farther
than ``left_time - right_time <= tolerance`` counts as NO match (pandas
``merge_asof(tolerance=...)`` semantics) — pass an interval Column for
timestamp axes (``F.expr("INTERVAL 7 DAYS")``) or a number for numeric axes.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: str,
    how: str = "inner",
    tolerance=None,
) -> DataFrame:
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {}
    for c in payload_cols:
        if c == right_time or c in left.columns:
            out_names[c] = f"{c}_right" if c != right_time else f"{c}_asof"
        else:
            out_names[c] = c
    # drop the matched right timestamp from output unless caller kept a unique name
    emit_cols = [c for c in payload_cols if c != right_time]

    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None)
        .cast(right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType)
        .alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType)
        .alias("__l"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance is not None:
        # out-of-tolerance nearest-prior == no match (merge_asof semantics)
        in_tol = (
            F.col("__t") - F.col(f"__match.{right_time}")
        ) <= tolerance
        filled = filled.withColumn(
            "__match",
            F.when(F.col("__match").isNotNull() & in_tol, F.col("__match")),
        )
    if how == "inner":
        filled = filled.where(F.col("__match").isNotNull())

    out = filled.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in emit_cols],
    )
    return out
