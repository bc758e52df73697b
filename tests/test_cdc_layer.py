"""Unit tests for the CDC layer: PG array-literal grammar (pure Python),
typed accessors, and changelog materialization semantics.

Mirrors the reference's correctness property (IntegrationTest.java:174-181):
text value -> parse -> typed access is an identity, plus NULL fidelity —
extended with the replay/materialization semantics the reference delegates to
its consumer.
"""

from __future__ import annotations

import pytest

from postgresql_cdc_spark.functions.pg_array_parser import (
    parse_double_array,
    parse_int_array,
    parse_long_array,
    parse_string_array,
)


class TestNumericArrayParser:
    def test_basic(self):
        assert parse_long_array("{1,2,3}") == [1, 2, 3]
        assert parse_int_array("{-5,0,7}") == [-5, 0, 7]
        assert parse_double_array("{1.5,-2.25,3}") == [1.5, -2.25, 3.0]

    def test_empty_and_null(self):
        assert parse_long_array("{}") == []
        assert parse_double_array("{}") == []
        assert parse_long_array(None) is None
        assert parse_double_array(None) is None

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            parse_long_array("{1,x}")
        with pytest.raises(ValueError):
            parse_double_array("{1.5,abc}")


class TestStringArrayParser:
    def test_unquoted(self):
        assert parse_string_array("{a,b,c}") == ["a", "b", "c"]
        assert parse_string_array("{hello world,x}") == ["hello world", "x"]

    def test_quoted_with_escapes(self):
        assert parse_string_array('{"a,b","c"}') == ["a,b", "c"]
        assert parse_string_array('{"x\\"y"}') == ['x"y']
        assert parse_string_array('{"a\\\\b"}') == ["a\\b"]
        assert parse_string_array('{"\\n\\t\\r\\b\\f"}') == ["\n\t\r\b\f"]
        assert parse_string_array('{"\\u0041\\u00e9"}') == ["Aé"]

    def test_mixed_and_empty(self):
        assert parse_string_array("{}") == []
        assert parse_string_array(None) is None
        assert parse_string_array('{plain,"quoted, with comma",tail}') == [
            "plain", "quoted, with comma", "tail",
        ]
        assert parse_string_array('{""}') == [""]

    def test_unquoted_stops_at_brace(self):
        # 1-D only: nested '{' terminates an unquoted element, then the parse
        # fails on the unconsumed brace (PgArrayUtil.java:152-161 semantics).
        with pytest.raises(ValueError):
            parse_string_array("{a{b}}")

    def test_errors(self):
        with pytest.raises(ValueError):
            parse_string_array("{a")  # eof before }
        with pytest.raises(ValueError):
            parse_string_array('{"a')  # eof inside quotes
        with pytest.raises(ValueError):
            parse_string_array('{"a\\q"}')  # unknown escape
        with pytest.raises(ValueError):
            parse_string_array("{a}b")  # trailing garbage
        with pytest.raises(ValueError):
            parse_string_array('{"\\uzz11"}')  # bad hex


@pytest.fixture(scope="module")
def mini_changelog(spark):
    """Hand-built envelope stream covering merge, TOAST, delete, re-insert."""
    rows = [
        # key=1: insert, sparse update (b absent = TOAST), final state merges
        ("I", 10, 100, {"id": "1", "a": "1", "b": "x"}),
        ("U", 20, 101, {"id": "1", "a": "2"}),
        # key=2: insert then delete -> gone
        ("I", 11, 100, {"id": "2", "a": "9", "b": "y"}),
        ("D", 30, 102, {"id": "2"}),
        # key=3: insert, delete, re-insert -> fresh image only
        ("I", 12, 100, {"id": "3", "a": "5", "b": "z"}),
        ("D", 21, 101, {"id": "3"}),
        ("I", 40, 103, {"id": "3", "a": "7"}),
    ]
    return spark.createDataFrame(
        [(op, "public", "t", 1, lsn, txn, cols) for op, lsn, txn, cols in rows],
        "op string, schema string, table string, relation_id int, "
        "lsn long, txn_id long, columns map<string,string>",
    )


def _state(df):
    return {
        r["columns"]["id"]: dict(r["columns"]) for r in df.collect()
    }


class TestMaterialize:
    def test_merge_sparse(self, mini_changelog):
        from postgresql_cdc_spark.operators.materialize import materialize

        st = _state(materialize(mini_changelog, keys=["id"], merge_sparse=True))
        # key 1: update merged over insert, TOAST 'b' inherited
        assert st["1"] == {"id": "1", "a": "2", "b": "x"}
        # key 2: deleted
        assert "2" not in st
        # key 3: re-insert resets the image — no 'b' carried from before delete
        assert st["3"] == {"id": "3", "a": "7"}

    def test_latest_image(self, mini_changelog):
        from postgresql_cdc_spark.operators.materialize import materialize

        st = _state(materialize(mini_changelog, keys=["id"], merge_sparse=False))
        # reference 'absent means absent': b is NOT inherited
        assert st["1"] == {"id": "1", "a": "2"}
        assert "2" not in st
        assert st["3"] == {"id": "3", "a": "7"}


class TestTypedAccessors:
    def test_pg_bool_null_semantics(self, spark):
        from pyspark.sql import functions as F

        from postgresql_cdc_spark.functions.pg_types import (
            pg_bool,
            pg_bool_reference,
        )

        df = spark.createDataFrame([("t",), ("f",), ("T",), (None,)], "v string")
        got = df.select(
            pg_bool("v").alias("b"), pg_bool_reference("v").alias("bref")
        ).collect()
        assert [(r.b, r.bref) for r in got] == [
            (True, True), (False, False), (True, True), (None, False),
        ]

    def test_typed_view_projects_and_casts(self, spark):
        from postgresql_cdc_spark.functions.pg_types import typed_view

        env = spark.createDataFrame(
            [("I", 1, {"k": "7", "q": "1.5", "names": "{a,\"b c\"}"})],
            "op string, lsn long, columns map<string,string>",
        )
        out = typed_view(
            env, {"k": "long", "q": "double", "names": "array<string>"}
        ).collect()[0]
        assert (out.op, out.lsn, out.k, out.q) == ("I", 1, 7, 1.5)
        assert out.names == ["a", "b c"]
