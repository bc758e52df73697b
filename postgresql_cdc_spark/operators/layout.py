"""Data-layout operators: Z-order (Morton) clustering for multi-dimension
file pruning.

At 100 TB the dominant read cost is scanning files a predicate could have
skipped. Min/max file statistics prune perfectly on the sort column and not
at all on anything else; interleaving the bits of two bucketed dimensions
into one Z-value and range-partitioning on it gives every file a tight
bounding box in BOTH dimensions — the layout behind Delta/Iceberg's
``OPTIMIZE ZORDER BY``. The write path is
``df.repartitionByRange(n, zvalue).sortWithinPartitions(zvalue)`` before the
parquet write; everything here is exact integer bit math, so a DuckDB oracle
reproduces it verbatim.

Reference parity: the reference has no storage layer at all (SURVEY.md §6 —
no files, no layout); this is a Spark-native scale operator.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def z_sql(a_sql: str, b_sql: str, bits: int = 8, dialect: str = "spark") -> str:
    """SQL text of the Morton interleave of two ``bits``-wide non-negative
    bucket columns: bit k of ``a`` lands at position 2k+1, bit k of ``b`` at
    2k. The pieces occupy disjoint bit positions, so ``+`` equals ``|`` and
    keeps the expression a plain associative sum in either engine."""
    parts = []
    for k in range(bits):
        if dialect == "spark":
            parts.append(f"shiftleft(shiftright({a_sql}, {k}) & 1, {2 * k + 1})")
            parts.append(f"shiftleft(shiftright({b_sql}, {k}) & 1, {2 * k})")
        else:
            parts.append(f"((({a_sql} >> {k}) & 1) << {2 * k + 1})")
            parts.append(f"((({b_sql} >> {k}) & 1) << {2 * k})")
    return "(" + " + ".join(parts) + ")"


def zvalue(a: Column | str, b: Column | str, bits: int = 8) -> Column:
    """Morton Z-value of two bucketed dimension columns (by name)."""
    a_sql = a if isinstance(a, str) else a._jc.toString()
    b_sql = b if isinstance(b, str) else b._jc.toString()
    return F.expr(z_sql(a_sql, b_sql, bits))
