"""minhash_lsh_incremental: batch→corpus near-dup matching semantics.

The oracle-paired registry query (`dedup_incremental_batch`) pins the exact
values against DuckDB at sf0.01; these tests pin the operator-level contract
on tiny hand-built frames — matches come only from batch→corpus probes (never
corpus self-pairs), non-dups stay out, and empty/degenerate inputs behave.
"""

from __future__ import annotations

from postgresql_cdc_spark.operators.dedup import minhash_lsh_incremental

LONG = ("the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong potions beneath the ancient oak tree at midnight")
OTHER = ("completely unrelated legal boilerplate concerning maritime "
         "insurance claims filed pursuant to statute twelve subsection four "
         "governing vessel tonnage declarations and harbor duties")


def test_batch_matches_only_its_corpus_near_dup(spark):
    corpus = spark.createDataFrame(
        [(1, LONG), (2, OTHER)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(101, LONG + " qq zz"),          # near-dup of corpus doc 1
         (102, "totally fresh content about gardening tulip bulbs in "
               "early spring frost conditions near the northern fjords")],
        ["doc_id", "text"],
    )
    out = minhash_lsh_incremental(batch, corpus, "text", "doc_id").collect()
    spark.catalog.clearCache()
    assert [(r.batch_id, r.corpus_id) for r in out] == [(101, 1)]
    assert out[0].jaccard >= 0.5


def test_identical_batch_doc_scores_jaccard_one(spark):
    corpus = spark.createDataFrame([(1, LONG)], ["doc_id", "text"])
    batch = spark.createDataFrame([(7, LONG)], ["doc_id", "text"])
    out = minhash_lsh_incremental(batch, corpus, "text", "doc_id").collect()
    spark.catalog.clearCache()
    assert [(r.batch_id, r.corpus_id, r.jaccard) for r in out] == [(7, 1, 1.0)]


def test_no_corpus_self_pairs_and_empty_batch(spark):
    # two near-identical corpus docs must NOT pair with each other — the
    # operator only reports batch→corpus matches (the corpus was deduped
    # when it was admitted; re-pairing it is the self-join job's work).
    corpus = spark.createDataFrame(
        [(1, LONG), (2, LONG + " qq zz")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame([], "doc_id long, text string")
    out = minhash_lsh_incremental(batch, corpus, "text", "doc_id").collect()
    spark.catalog.clearCache()
    assert out == []


def test_incremental_equals_cross_boundary_subset_of_self_join(spark):
    """On any corpus, incremental(batch, corpus) must produce EXACTLY the
    batch↔corpus pairs that the self-join operator finds on the union —
    same pairs, same jaccard — since both share the minhash family, band
    geometry, and exact-Jaccard verification. Caps are lifted so the only
    difference left is the probe topology."""
    import random

    from postgresql_cdc_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(42)
    vocab = [f"w{i:02d}" for i in range(50)]
    corpus_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(15, 30))))
        for i in range(40)
    ]
    batch_rows = [
        (1000 + i, text + " zz" + str(i) + " yy" + str(i))
        for i, text in corpus_rows[:10]
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    union = corpus.unionByName(batch)

    full = minhash_lsh_pairs(
        union, "text", "doc_id", threshold=0.5, max_bucket=10**6
    ).collect()
    spark.catalog.clearCache()
    inc = minhash_lsh_incremental(
        batch, corpus, "text", "doc_id", threshold=0.5, max_bucket=10**6
    ).collect()
    spark.catalog.clearCache()

    cross = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b)): r.jaccard
        for r in full
        if (r.id_a >= 1000) != (r.id_b >= 1000)
    }
    got = {(r.batch_id, r.corpus_id): r.jaccard for r in inc}
    assert got == cross
    assert got  # the seeded perturbations must actually produce matches


def test_probe_from_parquet_written_index(spark, tmp_path):
    """The stored-index contract: write the three LshIndex tables to parquet,
    read them back, and probe with corpus_index= — results must be identical
    to probing the corpus text directly (the corpus is never rescanned)."""
    from postgresql_cdc_spark.operators.dedup import LshIndex, build_lsh_index

    corpus = spark.createDataFrame(
        [(1, LONG), (2, OTHER)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(101, LONG + " qq zz")], ["doc_id", "text"]
    )
    idx = build_lsh_index(corpus, "text", "doc_id")
    for name, df in zip(LshIndex._fields, idx):
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    spark.catalog.clearCache()
    stored = LshIndex(*[
        spark.read.parquet(str(tmp_path / name)) for name in LshIndex._fields
    ])

    direct = minhash_lsh_incremental(batch, corpus, "text", "doc_id").collect()
    spark.catalog.clearCache()
    probed = minhash_lsh_incremental(
        batch, None, "text", "doc_id", corpus_index=stored
    ).collect()
    spark.catalog.clearCache()
    key = lambda r: (r.batch_id, r.corpus_id, r.jaccard)  # noqa: E731
    assert sorted(map(key, probed)) == sorted(map(key, direct))
    assert [(r.batch_id, r.corpus_id) for r in probed] == [(101, 1)]
