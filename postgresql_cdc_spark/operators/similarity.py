"""Similarity search over embedding columns (``array<float>``).

Exact kernels with bit-identical DuckDB twins — the dot product is a *left
fold in index order* in both engines, so float summation order matches and the
oracle hash-compares exactly:

    Spark : aggregate(zip_with(cast(a), cast(b), (x,y)->x*y), 0.0, (s,x)->s+x)
    DuckDB: list_reduce(list_transform(list_zip(a,b),
                        s -> CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)),
                        (x,y) -> x+y)

Strategies:

- ``cosine`` / ``dot``     — per-pair kernels (built-ins, codegen).
- ``topk_brute``           — baseline exact top-k: broadcast the (small) query
                             set, score every corpus row, per-query window
                             top-k. One pass over the corpus, no corpus
                             shuffle except the final per-query top-k (k rows
                             per partition pre-aggregated).
- ``hyperplane_lsh_bucket``— sign-bit LSH code for ANN bucketing: b pseudo-
                             random hyperplanes derived from the portable h60
                             hash (no stored model, reproducible anywhere).
- ``topk_lsh``             — ANN: candidates = corpus rows sharing any of the
                             query's multi-probe band codes, then exact cosine
                             on candidates only. The scale path: bucket join
                             instead of full scan.

At 100 TB: ``topk_brute`` is the gold standard / recall oracle; ``topk_lsh``
turns the scan into an equi-join on (band, code) — same shape web-scale ANN
pre-filters use. Embeddings stay as float arrays (no Python round trip).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from postgresql_cdc_spark.operators.text import h60


def dot(a: Column, b: Column) -> Column:
    """Exact float64 dot product, left fold in index order."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    The query side is broadcast (queries ≪ corpus); scoring is one corpus
    scan; ties break on neighbor id for determinism.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
    )
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col)
    ).join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    scored = scored.select(
        query_id_col,
        "neighbor_id",
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_lsh_code(vec: Column, planes: int = 8, seed: str = "hp") -> Column:
    """Sign-bit LSH code: bit p = [Σ_i w_{p,i}·v_i > 0] with pseudo-random
    weights w in {-1,+1} derived from h60(seed:p:i) — reproducible in any
    engine, no stored model. Returns a long in [0, 2^planes).
    """
    dim = F.size(vec)
    v = vec.cast("array<double>")

    def plane_bit(p: int) -> Column:
        s = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), dim - 1),
                lambda x, i: x
                * (
                    h60(F.concat(F.lit(f"{seed}:{p}:"), i.cast("string")))
                    .bitwiseAND(1)
                    .cast("double")
                    * 2.0
                    - 1.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    code = plane_bit(0)
    for p in range(1, planes):
        code = code + plane_bit(p)
    return code


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bands: int = 2,
    planes_per_band: int = 4,
) -> DataFrame:
    """ANN top-k: candidates share at least one band code with the query,
    exact cosine re-rank on candidates. Join is equi on (band, code)."""

    def with_codes(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.col(vec_col).alias(f"__v_{idc}"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        hyperplane_lsh_code(
                            F.col(vec_col), planes_per_band, seed=f"hp{b}"
                        ).alias("code"),
                    )
                    for b in range(bands)
                ])
            ).alias("bc"),
        ).select(idc, f"__v_{idc}", F.col("bc.band").alias("band"),
                 F.col("bc.code").alias("code"))

    c = with_codes(corpus.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    q = with_codes(queries, query_id_col)

    cand = (
        c.join(F.broadcast(q), ["band", "code"])
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col, "neighbor_id",
            F.col(f"__v_{query_id_col}").alias("__qvec"),
            F.col("__v_neighbor_id").alias("__nvec"),
        )
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.select(
        query_id_col, "neighbor_id",
        F.round(cosine(F.col("__nvec"), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 2,
    planes_per_band: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: hyperplane-LSH bucket self-join, then
    exact cosine filter. Same equi-join shape as topk_lsh — scales as a
    bucketed join, not an all-pairs cross product."""
    coded = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    hyperplane_lsh_code(
                        F.col(vec_col), planes_per_band, seed=f"hp{b}"
                    ).alias("code"),
                )
                for b in range(bands)
            ])
        ).alias("bc"),
    ).select("id", "v", F.col("bc.band").alias("band"), F.col("bc.code").alias("code"))

    a, b = coded.alias("a"), coded.alias("b")
    return (
        a.join(b, ["band", "code"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("cos_sim") >= threshold)
    )
