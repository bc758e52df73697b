"""Extension-operator query surface, part 18: duplicate-payment
proximity audit.

Design rules follow plans/extensions.py: all-BIGINT outputs; the pair
generation is an equi-join on (customer, exact amount) — never a
temporal cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.common import DEC, T
from postgresql_cdc_spark.plans.registry import register


@register(
    "dq_duplicate_payment_pairs",
    """
    WITH base AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               epoch_ms(o_orderdate) AS t
        FROM orders),
    replay AS (
        SELECT k + 10000000 AS k, c, cents, t + 3600000 AS t
        FROM base WHERE k % 251 = 0),
    o AS (SELECT * FROM base UNION ALL SELECT * FROM replay)
    SELECT a.c AS custkey, a.cents,
           a.k AS orderkey_a, b.k AS orderkey_b,
           CAST(b.t - a.t AS BIGINT) AS gap_ms
    FROM o a JOIN o b
      ON a.c = b.c AND a.cents = b.cents AND a.k < b.k
    WHERE b.t - a.t BETWEEN -86400000 AND 86400000
    """,
    doc="Duplicate-payment proximity audit (the double-charge screen "
        "every payments/billing reconciliation runs): pairs of charges "
        "from the SAME customer for the SAME exact amount within one day "
        "— retries, double-clicks, and replayed charges all land here, "
        "and in a CDC context a source-side redelivery that slipped past "
        "idempotent upsert does too. The fixture's synthetic totals are "
        "near-continuous (zero natural exact collisions), so the query "
        "PLANTS the failure it audits for: every 251st order is replayed "
        "one hour later under a shifted key — the redelivery scenario "
        "verbatim — and the detector must recover exactly those pairs, "
        "nothing else. Scale shape: candidates come from an EQUI-join on "
        "(customer, exact cents) — a key selective enough that output "
        "is near-linear — with the +/-1-day band as a cheap residual "
        "predicate, never a time-window cross product; a.k < b.k "
        "canonicalizes each unordered pair. Complements "
        "dq_constraint_audit (schema rules), cdc_conflict_detection "
        "(cross-replica writes), and dq_sequence_gaps (missing keys) "
        "with the value-collision axis.",
)
def dq_duplicate_payment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        (DEC("o_totalprice", 12, 2) * 100).cast("bigint").alias("cents"),
        # parquet reads NTZ here; session is UTC so the cast is lossless
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("t"),
    )
    replay = base.where(F.col("k") % 251 == 0).select(
        (F.col("k") + 10000000).alias("k"),
        "c",
        "cents",
        (F.col("t") + 3600000).alias("t"),
    )
    o = base.unionByName(replay)
    a = o.select(
        F.col("k").alias("orderkey_a"),
        F.col("c").alias("custkey"),
        "cents",
        F.col("t").alias("ta"),
    )
    b = o.select(
        F.col("k").alias("orderkey_b"),
        F.col("c").alias("custkey"),
        "cents",
        F.col("t").alias("tb"),
    )
    return (
        a.join(b, ["custkey", "cents"])
        .where(
            (F.col("orderkey_a") < F.col("orderkey_b"))
            & (F.col("tb") - F.col("ta")).between(-86400000, 86400000)
        )
        .select(
            "custkey",
            "cents",
            "orderkey_a",
            "orderkey_b",
            (F.col("tb") - F.col("ta")).cast("bigint").alias("gap_ms"),
        )
    )
