"""duplicate_span_pairs: exact substring dedup islands semantics.

The oracle-paired registry query (`dedup_substring_spans`) pins values against
DuckDB at sf0.01; these tests pin the operator-level contract on tiny
hand-built frames — span lengths are maximal-island token counts, disjoint
runs count separately, the min-span floor filters, and the within-doc
repetition guard refuses quadratic fan-out.
"""

from __future__ import annotations

from postgresql_cdc_spark.operators.dedup import duplicate_span_pairs


def _w(a: int, b: int) -> str:
    """Tokens w<a>..w<b> inclusive, space-joined (distinct, ordered)."""
    return " ".join(f"w{i}" for i in range(a, b + 1))


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_span_pairs(df, "text", "doc_id").collect()
    spark.catalog.clearCache()
    return sorted(
        (r.id_a, r.id_b, r.n_spans, r.max_span_tokens, r.dup_tokens)
        for r in out
    )


def test_single_shared_run_reports_exact_token_length(spark):
    # 15 shared leading tokens, then divergence: one maximal island of
    # 15-8+1=8 k-grams => span of exactly 15 tokens.
    rows = [(1, _w(1, 15) + " " + _w(100, 110)),
            (2, _w(1, 15) + " " + _w(200, 210))]
    assert _run(spark, rows) == [(1, 2, 1, 15, 15)]


def test_disjoint_runs_count_as_separate_spans(spark):
    # B = A's tokens 1..15, three junk tokens, A's tokens 30..45: two
    # islands (15 and 16 tokens), never merged across the gap.
    a = _w(1, 50)
    b = _w(1, 15) + " x1 x2 x3 " + _w(30, 45)
    assert _run(spark, [(1, a), (2, b)]) == [(1, 2, 2, 16, 31)]


def test_spans_below_min_span_are_dropped(spark):
    # 11 shared tokens < min_span=12: islands exist but fall below the
    # reporting floor.
    rows = [(1, _w(1, 11) + " " + _w(100, 105)),
            (2, _w(1, 11) + " " + _w(200, 205))]
    assert _run(spark, rows) == []


def test_within_doc_repetition_guard_blocks_quadratic_pairs(spark):
    # "spam"*30 vs its copy: every positional 8-gram is the SAME k-gram
    # repeated 23 times in each doc — without the max_occ guard this single
    # pair costs 23x23 join rows. The guard drops the (doc, k-gram) groups
    # instead; the documented cost is a silent miss on degenerate repetition
    # (the repetition-ratio operator exists to flag exactly these docs).
    rows = [(1, " ".join(["spam"] * 30)), (2, " ".join(["spam"] * 30))]
    assert _run(spark, rows) == []


def test_identical_docs_one_full_span(spark):
    rows = [(1, _w(1, 40)), (2, _w(1, 40))]
    assert _run(spark, rows) == [(1, 2, 1, 40, 40)]
