"""Cross-engine parity for the text kernels on adversarial input.

The DuckDB oracle gate proves Spark/DuckDB agreement on the fixture corpus,
which is friendly ASCII. The portable-kernel claims (tokens' split regex,
the BPE pre-tokenizer's ordered alternation, h60) are dialect-parity claims
about Java regex vs RE2 — so pin them on inputs chosen to break dialects:
multi-byte UTF-8, apostrophes/contractions, digit/letter boundaries, emoji,
control characters, long runs, and empties.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from postgresql_cdc_spark.operators.text import (
    BPE_SPLIT_PATTERN,
    bpe_tokens,
    h60,
    shingles,
    tokens,
)

ADVERSARIAL = [
    "",
    " ",
    "   leading and   multiple   spaces ",
    "don't can't it's o'clock 'quoted'",
    "naïve café résumé Zürich",
    "日本語テキスト mixed with ascii",
    "emoji 🎉🚀 between words",
    "tabs\tand\nnewlines\r\nmixed",
    "digits123glued456to789words",
    "ALL CAPS AND MiXeD CaSe",
    "punct!!!runs???;;;:::...",
    "a" * 500,
    "word " * 100,
    "null\x00byte and \x01control",
    "hyphen-ated under_scored dot.sep",
    "1 2 3 4 5 6 7 8 9 10",
    "'''", "''s", "'s's's",
    "x",
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "id long, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(ADVERSARIAL))
    )
    return df, con


def _collect(df, col):
    return [r[0] for r in df.select(col).orderBy("id").collect()]


class TestDialectParity:
    def test_tokens(self, frames):
        df, con = frames
        got = _collect(df.select("id", tokens(F.col("text")).alias("c")), "c")
        want = [
            r[0] for r in con.execute(
                "SELECT list_filter(regexp_split_to_array(lower(text), "
                "'[^a-z0-9]+'), t -> t <> '') FROM t ORDER BY id"
            ).fetchall()
        ]
        assert got == want

    def test_shingles(self, frames):
        # compare as SETS: Spark's array_distinct preserves first-occurrence
        # order, DuckDB's list_distinct does not — the engines agree on the
        # distinct shingle set, and no registered query depends on element
        # order (shingles only ever feed order-insensitive hashes/aggs).
        df, con = frames
        got = _collect(
            df.select("id", shingles(tokens(F.col("text")), 3).alias("c")), "c"
        )
        want = [
            r[0] for r in con.execute(
                "SELECT CASE WHEN len(toks) >= 3 THEN "
                "list_distinct(list_transform(range(1, len(toks)-1), "
                "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) "
                "ELSE [] END FROM (SELECT id, "
                "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
                " t -> t <> '') AS toks FROM t) ORDER BY id"
            ).fetchall()
        ]
        assert [sorted(g) for g in got] == [sorted(w) for w in want]
        assert [len(g) for g in got] == [len(w) for w in want]

    def test_bpe_pieces(self, frames):
        df, con = frames
        got = _collect(
            df.select("id", bpe_tokens(F.col("text")).alias("c")), "c"
        )
        pat = BPE_SPLIT_PATTERN.replace("'", "''")
        want = [
            r[0] for r in con.execute(
                f"SELECT regexp_extract_all(lower(text), '{pat}') "
                "FROM t ORDER BY id"
            ).fetchall()
        ]
        assert got == want

    def test_h60(self, frames):
        df, con = frames
        got = _collect(df.select("id", h60(F.col("text")).alias("c")), "c")
        want = [
            r[0] for r in con.execute(
                "SELECT CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) "
                "FROM t ORDER BY id"
            ).fetchall()
        ]
        assert got == want
