"""Text analysis for large-scale training-data pipelines.

All expressions are Catalyst built-ins (whole-stage codegen, no Python in the
hot path) and each has an exact ANSI-SQL twin so the DuckDB oracle can verify
results bit-for-bit:

- ``tokens``          — normalize + whitespace/punct split
- ``h60``             — engine-portable 60-bit content hash (md5 prefix —
                        identical in Spark and DuckDB, unlike xxhash64)
- ``shingles``        — word n-gram shingling for near-dup detection
- ``token_stats``     — counts / uniq ratio / mean length
- ``quality_score``   — heuristic doc quality in [0,1]
- ``lang_scores``     — stopword-overlap language ID (n-gram heuristic)
- ``doc_fingerprint`` — content hash + min-shingle rolling fingerprint

Scale notes: everything is a per-row projection — no shuffle, no UDF; md5 is
the only nontrivial kernel and is vectorized JVM-side. At 100 TB these run at
scan speed and column-prune to just the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Languages for the stopword heuristic. Tiny closed-class word lists — the
# classic cheap language-ID signal (function words dominate any real corpus).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "de", "un", "una", "que", "por"],
}


def h60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5, as a long.

    DuckDB twin: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``. Used
    everywhere a hash must agree across engines (fingerprints, minhash, LSH
    buckets); xxhash64/murmur are Spark-only so they can't be oracle-checked.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """lower, split on non-alphanumeric runs, drop empties.

    DuckDB twin: ``list_filter(regexp_split_to_array(lower(x), '[^a-z0-9]+'),
    t -> t <> '')``.
    """
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def raw_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-grams in positional order WITH multiplicity; [] when fewer
    than n tokens. Repetition/boilerplate analysis needs the duplicates the
    set-oriented ``shingles`` drops.

    ``sequence(1, size-n+1)`` + ``slice`` keeps it all in codegen.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined with spaces; [] when fewer than n
    tokens."""
    return F.array_distinct(raw_shingles(toks, n))


def token_stats(toks: Column) -> dict[str, Column]:
    """Per-doc token statistics as independent column expressions.

    ``mean_token_len`` sums token lengths via ``length(concat_ws('', toks))``
    — separator-free concat length IS the length sum, one codegen'd kernel
    instead of a per-row ``aggregate`` fold (the fold re-traversed the array
    in interpreted HOF eval and was the bench's hottest expression). Callers
    selecting several stats should hoist ``array_distinct(toks)`` into a
    projected column once (see plans/extensions.text_token_stats) — Catalyst
    does not CSE identical HOF subtrees across output columns.
    """
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    len_sum = F.length(F.concat_ws("", toks)).cast("long")
    return {
        "n_tokens": n,
        "n_uniq": n_uniq,
        "uniq_ratio": F.when(n > 0, n_uniq / n).otherwise(0.0),
        "mean_token_len": F.when(n > 0, len_sum / n).otherwise(0.0),
    }


def stopword_ratio(toks: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits / n).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + uniq ratio +
    stopword presence, equally weighted. Deterministic, SQL-expressible."""
    toks = tokens(text)
    n = F.size(toks)
    length_ok = ((n >= 20) & (n <= 1000)).cast("int")
    alpha_ratio = F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")) / \
        F.greatest(F.length(text), F.lit(1))
    uniq = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(0.0)
    sw = stopword_ratio(toks, "en")
    has_sw = (sw > 0.02).cast("int")
    return F.round((length_ok + alpha_ratio + uniq + has_sw) / 4.0, 6)


def lang_best(toks: Column) -> Column:
    """argmax language by stopword hit-count; 'und' (undetermined) when no
    list scores > 0. Ties break by language-code order (deterministic)."""
    best = F.lit("und")
    best_score = F.lit(0)
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        improved = score > best_score
        best = F.when(improved, F.lit(code)).otherwise(best)
        best_score = F.when(improved, score).otherwise(best_score)
    return best


def chunk_starts(toks: Column, size: int = 64, stride: int = 48) -> Column:
    """1-based start offsets of overlapping token windows: 1, 1+stride, ...
    up to the token count (the final window may be shorter than ``size``).

    ``sequence`` is codegen'd; the chunk id derives arithmetically from the
    start ((s-1) div stride), so exploding starts needs no positional index —
    the same trick keeps the DuckDB oracle engine-portable (range + integer
    division, no WITH ORDINALITY).
    """
    return F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))


# Deterministic content-hash sampling: a doc is in the p/m sample iff
# h60("seed:" || id) % m < p. Portable (md5 both engines), reproducible, and
# stratification is just a WHERE on the stratum column — no sampling state.
def in_hash_sample(id_col: Column, m: int, p: int, seed: str = "sample") -> Column:
    return h60(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))) % m < p


# PII scrubbing patterns — simple character classes only, so the Java (Spark)
# and RE2 (DuckDB) regex dialects agree. Real deployments swap in their own.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
LONG_DIGIT_RE = "[0-9]{7,}"


def pii_counts_and_scrub(text: Column) -> dict[str, Column]:
    """Email / long-digit-run detection + redaction, all built-ins."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    n_digit_runs = F.size(
        F.regexp_extract_all(text, F.lit(LONG_DIGIT_RE), F.lit(0))
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        LONG_DIGIT_RE,
        "<NUM>",
    )
    return {
        "n_emails": n_emails,
        "n_digit_runs": n_digit_runs,
        "scrubbed": scrubbed,
    }


def doc_fingerprint(text: Column) -> Column:
    """Stable content hash of the normalized token stream (exact-dup key)."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def min_shingle_hash(text: Column, n: int = 3) -> Column:
    """Single-function minhash: min h60 over word n-gram shingles — a cheap
    rolling-hash-style document fingerprint for near-dup bucketing."""
    sh = shingles(tokens(text), n)
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, h60))
    ).otherwise(F.lit(None).cast("long"))


# GPT-2-style pre-tokenizer pattern, restricted to constructs Java regex
# (Spark) and RE2 (DuckDB) treat identically: ordered alternation, ASCII
# classes, no lookaround (RE2 has none). Alternatives are disjoint at any
# match start except the optional-leading-space forms, which both engines
# resolve leftmost-first the same way. Kept ASCII (the corpus fixtures are)
# so \p{L} dialect differences never enter the oracle compare.
BPE_SPLIT_PATTERN = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+|[ ]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization of lowercased text: contraction tails,
    space-prefixed word/number/punctuation runs, residual spaces — the
    GPT-2 ``pat`` shape. This is the unit a byte-pair tokenizer would merge
    within, so its count is the standard proxy for "how many tokens will
    this document cost" before a real vocab exists."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_SPLIT_PATTERN), F.lit(0))


def unigram_df_scores(df: DataFrame, text_col: str, id_col: str,
                      rare_df: int = 2) -> DataFrame:
    """Corpus-statistics quality scoring: per document, the mean corpus
    document-frequency of its token occurrences and the fraction of
    occurrences that are corpus-rare (df <= ``rare_df``).

    The integer-exact stand-in for unigram language-model scoring (the
    CCNet-style perplexity filter): df is a monotone proxy for unigram
    probability, so a LOW mean_df / HIGH rare_frac document is built from
    words the corpus has never agreed on — gibberish, OCR noise, hash dumps —
    while boilerplate scores the opposite extreme. Using counts instead of
    log-probabilities keeps every aggregate exact (BIGINT sums; one final
    double division rounded to 6 dp), so a cross-engine oracle can gate it
    bit-for-bit — a real log-prob scorer differs only in the final map.

    Two-pass shape, both passes word-count-shaped at 100 TB: (1) the
    vocabulary pass — explode + groupBy(token) with map-side partials;
    (2) the scoring pass — one hash equi-join of occurrences to the df
    table on the token, then a per-doc aggregate. The occurrence frame is
    persisted because both passes read it (same caller-clears-cache
    contract as operators/dedup).
    """
    occ = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).persist()
    dfreq = occ.groupBy("t").agg(F.countDistinct("id").alias("df"))
    n = F.count(F.lit(1))
    return (
        occ.join(dfreq, "t")
        .groupBy("id")
        .agg(
            n.alias("n_tokens"),
            F.round(F.sum("df").cast("double") / n, 6).alias("mean_df"),
            F.round(
                F.sum(
                    F.when(F.col("df") <= rare_df, 1).otherwise(0)
                ).cast("double") / n,
                6,
            ).alias("rare_frac"),
        )
    )
