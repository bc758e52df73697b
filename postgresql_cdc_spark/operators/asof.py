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
<= ``left_time`` (ties on time: the union orders right rows before left rows;
among DUPLICATE (key, time) right rows the winner is chosen deterministically
by xxhash64 of the right payload — greatest hash for backward/nearest-prior
AND for a forward match at EXACTLY the left time (equal-time forward matches
resolve through the shared backward frame), least hash for a strictly-future
forward match — so output is run-to-run stable on any partitioning; rows with
identical payloads are interchangeable anyway). ``how='inner'`` drops
unmatched left rows, ``'left'`` keeps them.
``tolerance`` (optional) bounds the lookback: a nearest-prior match farther
than ``left_time - right_time <= tolerance`` counts as NO match (pandas
``merge_asof(tolerance=...)`` semantics) — pass an interval Column for
timestamp axes (``F.expr("INTERVAL 7 DAYS")``) or a number for numeric axes.

``direction`` selects the pandas ``merge_asof`` mode: ``backward`` (default,
greatest right_time <= left_time), ``forward`` (smallest right_time >=
left_time), or ``nearest`` (smaller absolute gap; exact tie -> the prior
match). All three ride the SAME single shuffle + sort — forward/nearest add
window functions over the other frame direction, not another exchange.
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
    direction: str = "backward",
) -> DataFrame:
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward/forward/nearest, got {direction!r}"
        )
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
        F.lit(0).cast("long").alias("__tb"),
    )
    # Null-time rows never participate in matching (pandas merge_asof
    # raises on null keys; our rule: a null right_time is never a match
    # source, a null left_time row matches nothing — NULLS FIRST ordering
    # would otherwise park every null-t left before all rights, handing
    # forward/nearest the partition's EARLIEST right as a bogus match).
    r_tagged_src = right.where(F.col(right_time).isNotNull())
    r_tagged = r_tagged_src.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType)
        .alias("__l"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__r"),
        F.xxhash64(F.struct(*[F.col(c) for c in payload_cols])).alias("__tb"),
    )

    # Frame geometry shares ONE sort for every direction. Ordering puts
    # right rows before left rows at equal time, so an equal-time right is
    # inclusive for backward (and therefore for nearest, at distance zero)
    # while the strictly-after forward frame skips it. __tb totalizes the
    # order among duplicate (key, time) right rows (left rows carry a
    # constant 0 — tied lefts only ever see null __r between each other),
    # making last()/first() deterministic under any partition layout.
    order = Window.partitionBy(*keys).orderBy(
        F.col("__t"), F.col("__side"), F.col("__tb")
    )
    w_back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = order.rowsBetween(1, Window.unboundedFollowing)
    union = l_tagged.unionByName(r_tagged)

    def _in_tol(match_col):
        if tolerance is None:
            return F.lit(True)
        # distance is nonnegative by construction on each side
        dist = F.when(
            F.col("__t") >= match_col[right_time],
            F.col("__t") - match_col[right_time],
        ).otherwise(match_col[right_time] - F.col("__t"))
        return dist <= tolerance

    if direction == "backward":
        filled = union.withColumn(
            "__match", F.last("__r", ignorenulls=True).over(w_back)
        ).where(F.col("__side") == 1)
    elif direction == "forward":
        # inclusive forward: an equal-time right sits in the backward frame
        # under this ordering, so OR it in from there (it is the LATEST
        # prior row at equal __t, i.e. exactly the equal-time candidate).
        filled = (
            union.withColumn("__prior", F.last("__r", ignorenulls=True).over(w_back))
            .withColumn("__next", F.first("__r", ignorenulls=True).over(w_fwd))
            .withColumn(
                "__match",
                F.when(
                    F.col("__prior").isNotNull()
                    & (F.col(f"__prior.{right_time}") == F.col("__t")),
                    F.col("__prior"),
                ).otherwise(F.col("__next")),
            )
            .where(F.col("__side") == 1)
            .drop("__prior", "__next")
        )
    else:  # nearest
        back = F.last("__r", ignorenulls=True).over(w_back)
        fwd = F.first("__r", ignorenulls=True).over(w_fwd)
        filled = (
            union.withColumn("__b", back)
            .withColumn("__f", fwd)
            .where(F.col("__side") == 1)
        )
        bd = F.col("__t") - F.col(f"__b.{right_time}")
        fd = F.col(f"__f.{right_time}") - F.col("__t")
        # prefer the closer side; exact tie -> the prior match (documented;
        # pre-dedupe equal-time right rows if that matters, as backward)
        filled = filled.withColumn(
            "__match",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(bd <= fd, F.col("__b"))
            .otherwise(F.col("__f")),
        ).drop("__b", "__f")
    if tolerance is not None:
        filled = filled.withColumn(
            "__match",
            F.when(
                F.col("__match").isNotNull() & _in_tol(F.col("__match")),
                F.col("__match"),
            ),
        )
    filled = filled.withColumn(
        "__match", F.when(F.col("__t").isNotNull(), F.col("__match"))
    )
    if how == "inner":
        filled = filled.where(F.col("__match").isNotNull())

    out = filled.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in emit_cols],
    )
    return out
