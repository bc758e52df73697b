"""The local harness's dtype gate (tools/check_correctness.py) must catch
oracle/Spark dtype drift that a name-only schema compare misses — the r7
HUGEINT episode's failure class: identical column names, identical textual
values after canonicalization, but e.g. an int on one side and a string (or
float) on the other.

The canonical vocabulary is deliberately width-insensitive (int32 == int64)
because the driver's pandas-level value hash is width-blind too; the gate
exists for FAMILY drift (int vs float vs decimal vs str), not width.
"""

import os
import sys

import duckdb
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import (  # noqa: E402
    canon_arrow_type,
    canon_spark_type,
    dtype_mismatches,
)


class _FakeField:
    def __init__(self, name, dataType):
        self.name = name
        self.dataType = dataType


class _FakeSchema:
    def __init__(self, fields):
        self.fields = fields


class _FakeDF:
    def __init__(self, fields):
        self.schema = _FakeSchema(fields)


def _spark_df(**name_to_type):
    from pyspark.sql import types as T  # noqa: F401

    return _FakeDF([_FakeField(n, t) for n, t in name_to_type.items()])


def _arrow_fields(sql):
    """DuckDB DESCRIBE-style arrow schema for a probe query."""
    return list(duckdb.sql(sql).arrow().schema)


class TestCanonVocabulary:
    def test_int_widths_collapse(self):
        from pyspark.sql import types as T

        assert canon_spark_type(T.ByteType()) == "int"
        assert canon_spark_type(T.LongType()) == "int"
        assert canon_arrow_type(pa.int8()) == "int"
        assert canon_arrow_type(pa.int64()) == "int"
        # DuckDB HUGEINT arrives as decimal(38,0) via arrow — the r7 episode
        hugeint = _arrow_fields("SELECT 1::HUGEINT AS x")[0].type
        assert canon_arrow_type(hugeint) in ("decimal", "int")

    def test_families_are_distinct(self):
        from pyspark.sql import types as T

        fams = {
            canon_spark_type(t)
            for t in (
                T.LongType(),
                T.DoubleType(),
                T.DecimalType(12, 2),
                T.StringType(),
                T.BooleanType(),
                T.DateType(),
                T.TimestampType(),
                T.BinaryType(),
            )
        }
        assert len(fams) == 8

    def test_nested_types_canonicalize_both_sides(self):
        from pyspark.sql import types as T

        s = canon_spark_type(T.ArrayType(T.IntegerType()))
        a = canon_arrow_type(pa.list_(pa.int64()))
        assert s == a == "list<int>"
        s = canon_spark_type(
            T.StructType([T.StructField("a", T.StringType())])
        )
        a = canon_arrow_type(pa.struct([pa.field("a", pa.large_string())]))
        assert s == a == "struct<a:str>"


class TestDriftDetection:
    def test_mistyped_oracle_fails(self):
        """An oracle that returns a string where Spark returns an int must
        produce a mismatch — the headline done-criterion."""
        from pyspark.sql import types as T

        sdf = _spark_df(k=T.StringType(), cnt=T.LongType())
        ofields = _arrow_fields("SELECT 'a' AS k, '3' AS cnt")
        bad = dtype_mismatches(sdf, ofields)
        assert bad == ["cnt: spark=int oracle=str"]

    def test_int_float_drift_fails(self):
        from pyspark.sql import types as T

        sdf = _spark_df(avg_qty=T.DoubleType())
        ofields = _arrow_fields("SELECT 3 AS avg_qty")
        assert dtype_mismatches(sdf, ofields) == [
            "avg_qty: spark=float oracle=int"
        ]

    def test_width_drift_passes(self):
        from pyspark.sql import types as T

        sdf = _spark_df(n=T.IntegerType())
        ofields = _arrow_fields("SELECT 1::BIGINT AS n")
        assert dtype_mismatches(sdf, ofields) == []

    def test_null_literal_matches_anything(self):
        from pyspark.sql import types as T

        sdf = _spark_df(x=T.NullType())
        ofields = _arrow_fields("SELECT 'abc' AS x")
        assert dtype_mismatches(sdf, ofields) == []


@pytest.mark.parametrize(
    "sql,expect",
    [
        ("SELECT 1.5::DECIMAL(12,2) AS x", "decimal"),
        ("SELECT DATE '2024-01-01' AS x", "date"),
        ("SELECT TIMESTAMP '2024-01-01 00:00:00' AS x", "timestamp"),
        ("SELECT [1,2] AS x", "list<int>"),
        ("SELECT true AS x", "bool"),
    ],
)
def test_duckdb_arrow_families(sql, expect):
    assert canon_arrow_type(_arrow_fields(sql)[0].type) == expect
