"""Property-based decoder tests (hypothesis): for ANY relation shape and ANY
row of text values (unicode, NULLs, TOAST-unchanged columns), encode→decode
is an identity on the visible record — the same property the reference's
integration test samples with ad-hoc randomness (`IntegrationTest.java:38-59`),
driven here through the full value space.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from postgresql_cdc_spark.sources.pgoutput import (
    ChangeRecord,
    ColumnMeta,
    PgOutputDecoder,
    Relation,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
)

# Column names: printable, no NULs (C-string framing); values: arbitrary
# text without surrogates (UTF-8 encodable), or None.
NAME = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF,
                           blacklist_categories=("Cs",)),
    min_size=1, max_size=12,
)
VALUE = st.one_of(
    st.none(),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
)


@st.composite
def relation_and_rows(draw):
    n_cols = draw(st.integers(min_value=1, max_value=8))
    names = draw(st.lists(NAME, min_size=n_cols, max_size=n_cols, unique=True))
    rel = Relation(
        relation_id=draw(st.integers(min_value=1, max_value=2**31 - 1)),
        schema="public",
        name=draw(NAME),
        replica_identity="d",
        columns=tuple(ColumnMeta(nm, 25) for nm in names),
    )
    values = draw(st.lists(VALUE, min_size=n_cols, max_size=n_cols))
    toast = draw(st.sets(st.integers(min_value=0, max_value=n_cols - 1),
                         max_size=n_cols))
    return rel, values, toast


class TestDecodeRoundtrip:
    @settings(max_examples=200, deadline=None)
    @given(relation_and_rows())
    def test_insert_roundtrip(self, rv):
        rel, values, toast = rv
        dec = PgOutputDecoder()
        assert dec.decode(encode_relation(rel)) is None
        rec = dec.decode(encode_insert(rel.relation_id, values, toast))
        assert isinstance(rec, ChangeRecord) and rec.op == "I"
        expected = {
            c.name: v
            for i, (c, v) in enumerate(zip(rel.columns, values))
            if i not in toast  # TOAST-unchanged: ABSENT, not null
        }
        assert rec.columns == expected

    @settings(max_examples=100, deadline=None)
    @given(relation_and_rows())
    def test_update_skips_old_tuple(self, rv):
        rel, values, toast = rv
        dec = PgOutputDecoder()
        dec.decode(encode_relation(rel))
        old = ["OLD"] * len(values)
        rec = dec.decode(
            encode_update(rel.relation_id, values, old_values=old, toast=toast)
        )
        assert rec.op == "U"
        # the old image must not leak into the new-image record
        assert all(v != "OLD" or values[i] == "OLD"
                   for i, v in enumerate(rec.columns.values()))
        expected = {
            c.name: v
            for i, (c, v) in enumerate(zip(rel.columns, values))
            if i not in toast
        }
        assert rec.columns == expected

    @settings(max_examples=100, deadline=None)
    @given(relation_and_rows())
    def test_delete_carries_key_tuple(self, rv):
        rel, values, _toast = rv
        dec = PgOutputDecoder()
        dec.decode(encode_relation(rel))
        rec = dec.decode(encode_delete(rel.relation_id, values))
        assert rec.op == "D"
        assert rec.columns == {
            c.name: v for c, v in zip(rel.columns, values)
        }


class TestMalformedInput:
    """S22 error channel under corruption: ANY truncation or byte flip of a
    valid message either still decodes to a structurally valid result (flips
    in value bytes legitimately change text payloads) or raises
    ProtocolError — never a different exception type, never a record whose
    columns stray outside the relation's schema."""

    @given(relation_and_rows(), st.data())
    @settings(max_examples=150, deadline=None)
    def test_truncation_raises_protocol_error_or_decodes(self, rv, data):
        from postgresql_cdc_spark.sources.pgoutput import ProtocolError

        rel, values, toast = rv
        dec = PgOutputDecoder()
        dec.decode(encode_relation(rel))
        msg = encode_insert(rel.relation_id, values, toast)
        cut = data.draw(st.integers(min_value=0, max_value=len(msg) - 1))
        # EVERY strict prefix of an INSERT is malformed (the column count is
        # fixed by the tuple header, so missing bytes always surface): the
        # decoder must refuse, never return a silently-short record.
        try:
            dec.decode(msg[:cut])
        except ProtocolError:
            return
        raise AssertionError(f"truncation at {cut}/{len(msg)} decoded silently")

    @given(relation_and_rows(), st.data())
    @settings(max_examples=150, deadline=None)
    def test_byte_flip_raises_protocol_error_or_decodes(self, rv, data):
        from postgresql_cdc_spark.sources.pgoutput import ProtocolError

        rel, values, toast = rv
        dec = PgOutputDecoder()
        dec.decode(encode_relation(rel))
        msg = bytearray(encode_insert(rel.relation_id, values, toast))
        pos = data.draw(st.integers(min_value=0, max_value=len(msg) - 1))
        bit = data.draw(st.integers(min_value=0, max_value=7))
        msg[pos] ^= 1 << bit
        try:
            out = dec.decode(bytes(msg))
        except ProtocolError:
            return
        if out is not None and hasattr(out, "columns"):
            assert set(out.columns) <= {c.name for c in rel.columns}


    def test_truncated_value_is_refused_not_shortened(self):
        """Regression (review finding): a 3-byte truncation used to decode
        to {'a': 'hello', 'b': 'wo'} — the relay would ingest the truncated
        value as real data and never reconnect."""
        import pytest

        from postgresql_cdc_spark.sources.pgoutput import ProtocolError

        rel = Relation(
            relation_id=7, schema="public", name="t", replica_identity="d",
            columns=(ColumnMeta("a", 25), ColumnMeta("b", 25)),
        )
        dec = PgOutputDecoder()
        dec.decode(encode_relation(rel))
        msg = encode_insert(rel.relation_id, ["hello", "world"])
        with pytest.raises(ProtocolError):
            dec.decode(msg[:-3])


class TestTruncateInvariance:
    @settings(max_examples=200, deadline=None)
    @given(
        relation_and_rows(),
        st.lists(st.integers(min_value=1, max_value=2**31 - 1),
                 min_size=0, max_size=5),
        st.booleans(),
        st.booleans(),
    )
    def test_truncate_is_pure_noise_for_the_decoder(
        self, rv, rel_ids, cascade, restart
    ):
        """For ANY relation list and option bits, a TRUNCATE message decodes
        to None (recognized-and-dropped, the reference's
        MessageType.java:17-28 behavior) and leaves the decoder's relation
        registry fully intact — an INSERT decoded after the TRUNCATE sees
        exactly the record it would have seen without it."""
        from postgresql_cdc_spark.sources.pgoutput import encode_truncate

        rel, values, toast = rv
        d_plain = PgOutputDecoder()
        d_plain.decode(encode_relation(rel))
        want = d_plain.decode(encode_insert(rel.relation_id, values))

        d_trunc = PgOutputDecoder()
        d_trunc.decode(encode_relation(rel))
        assert d_trunc.decode(
            encode_truncate(rel_ids, cascade=cascade, restart_identity=restart)
        ) is None
        got = d_trunc.decode(encode_insert(rel.relation_id, values))
        assert isinstance(got, ChangeRecord) and isinstance(want, ChangeRecord)
        assert got.columns == want.columns
        assert got.op == want.op == "I"
