"""Property-based tests for the PG array-literal parsers (hypothesis).

The reference's integration test uses random values with fixed properties
(`IntegrationTest.java:38-59`); these tests push the same idea through the
full grammar: for ANY list of values, serialize exactly the way PostgreSQL
prints an array literal, parse it back, and require the identity. Plus
adversarial non-literals must raise, never return garbage.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from postgresql_cdc_spark.functions.pg_array_parser import (
    parse_double_array,
    parse_long_array,
    parse_string_array,
)


def pg_quote(s: str) -> str:
    """Serialize one element the way PostgreSQL array_out does: always
    quoted (PG only skips quotes for 'safe' strings; always-quoting is a
    valid serialization the parser must accept)."""
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def pg_string_literal(items: list[str]) -> str:
    return "{" + ",".join(pg_quote(s) for s in items) + "}"


# Printable-ish text incl. the grammar's special characters; excludes the
# control chars whose PG escapes (\b \f \n \r \t) the serializer above does
# not emit — those are covered by the dedicated escape test.
TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),
    ),
    max_size=30,
)


class TestStringArrayRoundtrip:
    @settings(max_examples=300, deadline=None)
    @given(st.lists(TEXT, max_size=8))
    def test_serialize_parse_identity(self, items):
        assert parse_string_array(pg_string_literal(items)) == items

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.sampled_from(["\b", "\f", "\n", "\r", "\t"]), min_size=1, max_size=5))
    def test_control_escapes(self, chars):
        esc = {"\b": "\\b", "\f": "\\f", "\n": "\\n", "\r": "\\r", "\t": "\\t"}
        lit = "{" + ",".join('"' + esc[c] + '"' for c in chars) + "}"
        assert parse_string_array(lit) == chars

    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=1, max_value=0xFFFF))
    def test_unicode_escapes(self, cp):
        lit = '{"\\u%04x"}' % cp
        assert parse_string_array(lit) == [chr(cp)]

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=20))
    def test_never_garbage_on_arbitrary_input(self, junk):
        """For arbitrary text the parser either raises ValueError or returns
        a list — it must never crash with another exception type."""
        lit = "{" + junk  # usually malformed
        try:
            out = parse_string_array(lit)
        except ValueError:
            return
        assert isinstance(out, list)


class TestNumericArrayRoundtrip:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=10))
    def test_long_roundtrip(self, xs):
        lit = "{" + ",".join(str(x) for x in xs) + "}" if xs else "{}"
        assert parse_long_array(lit) == xs

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False), max_size=10))
    def test_double_roundtrip(self, xs):
        lit = "{" + ",".join(repr(x) for x in xs) + "}" if xs else "{}"
        assert parse_double_array(lit) == xs

    @pytest.mark.parametrize("bad", ["{1,x}", "{1.5}", "{--3}", "{}}"])
    def test_long_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_long_array(bad)
