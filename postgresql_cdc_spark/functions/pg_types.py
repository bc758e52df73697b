"""PostgreSQL text-format → typed Spark columns.

The reference transports every value as a UTF-8 string and converts lazily via
``TableColumn.asX()`` accessors (`wal/TableColumn.java:15-53`). Here each
accessor is a Catalyst cast expression, so unused conversions are pruned for
free (the reference's laziness, supplied by column pruning) and everything
stays JVM-side in codegen.

``typed_view`` is the bridge from the CDC envelope's ``map<string,string>``
payload to a per-table typed DataFrame — the Spark analog of consumers calling
``record.getColumn(name).map(TableColumn::asInt32)``.
"""

from __future__ import annotations

from typing import Mapping, Union

from pyspark.sql import Column, DataFrame, functions as F

from postgresql_cdc_spark.functions.pg_arrays import (
    pg_double_array,
    pg_int_array,
    pg_long_array,
    pg_string_array,
)


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pg_int32(col) -> Column:
    """reference ``asInt32`` (`TableColumn.java:19-21`)."""
    return _c(col).cast("int")


def pg_int64(col) -> Column:
    """reference ``asInt64`` (`TableColumn.java:15-17`)."""
    return _c(col).cast("long")


def pg_string(col) -> Column:
    """reference ``asString`` (identity, `TableColumn.java:23-25`)."""
    return _c(col)


def pg_numeric(col, precision: int = 38, scale: int = 18) -> Column:
    """reference ``asBigDecimal`` (`TableColumn.java:35-37`). Arbitrary
    precision in Java; Spark needs a declared DecimalType."""
    return _c(col).cast(f"decimal({precision},{scale})")


def pg_double(col) -> Column:
    return _c(col).cast("double")


def pg_timestamp(col) -> Column:
    """PG text timestamps; the reference reads them with asString — we
    additionally offer the proper cast."""
    return _c(col).cast("timestamp")


def pg_bool(col) -> Column:
    """PG text boolean: WAL ships 't'/'f'; a plain cast('boolean') would
    reject 't'. NULL propagates as NULL."""
    c = _c(col)
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(F.lower(c) == "t")


def pg_bool_reference(col) -> Column:
    """Bug-compatible variant: the reference maps NULL → false
    (`TableColumn.java:31-33` uses equalsIgnoreCase, null-unsafe)."""
    return F.coalesce(pg_bool(col), F.lit(False))


# type name → cast builder; array types take the text literal column
_CASTS = {
    "int": pg_int32,
    "long": pg_int64,
    "bigint": pg_int64,
    "string": pg_string,
    "double": pg_double,
    "boolean": pg_bool,
    "timestamp": pg_timestamp,
    "array<int>": pg_int_array,
    "array<long>": pg_long_array,
    "array<double>": pg_double_array,
    "array<string>": pg_string_array,
}


def pg_cast(col, type_name: str) -> Column:
    """Dispatch a PG text value to its typed accessor (reference S19-S21)."""
    tn = type_name.strip().lower()
    if tn in _CASTS:
        return _CASTS[tn](_c(col))
    if tn.startswith("decimal"):
        return _c(col).cast(tn)
    return _c(col).cast(tn)


def typed_view(
    envelope: DataFrame,
    columns: Mapping[str, str],
    map_col: str = "columns",
    keep: Union[list, tuple] = ("op", "lsn", "txn_id"),
) -> DataFrame:
    """Project the envelope's ``map<string,string>`` payload to typed columns.

    ``columns`` maps column name → Spark type name (per-table schema from the
    registry, SURVEY.md §1.3). Map access is NULL-safe (``element_at``), so a
    TOAST-dropped column (absent key, `PgWalMessageDecoder.java:206-207`)
    surfaces as NULL — callers that need reference "absent" semantics check
    ``map_contains_key`` first.
    """
    cols = [F.col(k) for k in keep if k in envelope.columns]
    for name, tn in columns.items():
        cols.append(pg_cast(F.element_at(F.col(map_col), name), tn).alias(name))
    return envelope.select(*cols)
