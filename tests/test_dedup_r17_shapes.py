"""Pins for the r17 operator-internal rewrites (optimization round):

- ``minhash_lsh_pairs``: bucket rows carry n_sh, the size-ratio prune runs
  inside the bucket self-join, and verification is per-pair array_intersect
  — a pair colliding on SEVERAL bands must still report exactly once, a
  can't-qualify size-ratio pair must never surface even when its buckets
  collide, and the jaccard must equal the exact set ratio.
- ``topk_lsh``: candidates are scored BEFORE the pair dedupe (the exchange
  carries one double, not two vectors) — a multi-band collision must yield
  one ranked row with the exact cosine.

The oracle-paired registry rows pin values against DuckDB; these pin the
operator contract on hand-built frames where the collision structure is
known by construction.
"""

from __future__ import annotations

import math

from postgresql_cdc_spark.operators.dedup import minhash_lsh_pairs
from postgresql_cdc_spark.operators.similarity import topk_lsh

TEXT = ("the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong potions beneath the ancient oak tree at midnight")


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_identical_docs_pair_once_with_jaccard_one(spark):
    # identical docs collide on ALL four bands; the candidate dedupe must
    # collapse them to one reported pair
    df = spark.createDataFrame([(1, TEXT), (2, TEXT)], ["doc_id", "text"])
    out = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.5).collect()
    spark.catalog.clearCache()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_jaccard_matches_exact_set_ratio(spark):
    near = TEXT + " coda words"
    df = spark.createDataFrame([(1, TEXT), (2, near)], ["doc_id", "text"])
    out = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.5).collect()
    spark.catalog.clearCache()
    assert len(out) == 1
    want = _jaccard(TEXT, near)
    assert math.isclose(out[0].jaccard, round(want, 6), abs_tol=1e-9)


def test_size_ratio_prune_drops_doc_in_doc_pairs(spark):
    # a short doc fully contained in a long doc shares every short-doc
    # shingle (bucket collisions are likely), but min/max sizes bound its
    # jaccard below threshold — the in-join prune must drop it before
    # verification, and the final filter agrees
    short = TEXT
    long = " ".join([TEXT] + [f"filler{i} pad{i} extra{i}" for i in range(40)])
    df = spark.createDataFrame([(1, short), (2, long)], ["doc_id", "text"])
    out = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.5).collect()
    spark.catalog.clearCache()
    assert out == []
    assert _jaccard(short, long) < 0.5  # the prune dropped a true negative


def test_topk_lsh_multi_band_collision_ranks_once(spark):
    # identical vectors collide on every band; the scored-then-deduped
    # candidate must appear once per direction with cosine 1.0
    v = [1.0, 0.0, 2.0, 0.5]
    u = [0.9, 0.1, 2.1, 0.4]  # near-identical: same hyperplane side likely
    corpus = spark.createDataFrame(
        [(1, v), (2, v), (3, u)], ["vec_id", "embedding"]
    )
    out = topk_lsh(corpus, corpus.withColumnRenamed("vec_id", "query_id"),
                   k=2, max_bucket=10**6).collect()
    spark.catalog.clearCache()
    rows = {(r.query_id, r.neighbor_id): r for r in out}
    # each (query, neighbor) appears at most once even though identical
    # vectors collide on all bands
    assert len(rows) == len(out)
    r12 = rows[(1, 2)]
    assert r12.rank == 1 and math.isclose(r12.cos_sim, 1.0, abs_tol=1e-12)
