"""Source/sink format coverage beyond parquet: CSV and JSON roundtrips.

The reference's only source is the WAL stream and its only sink the consumer
callback (SURVEY.md §2.2 scans/sinks rows); a Spark engine additionally owns
file formats. Each query WRITES a fixture table to the format under /tmp and
READS it back with an explicit schema before aggregating, so the scan, the
sink, and the format's type round-trip are all on the verified path — the
oracle computes the same aggregate straight from the parquet fixture, which
only matches if the format roundtrip was lossless.

Scale notes: the roundtrip tables are dimension-sized on purpose (the write
happens per query run); the read path is the same code path a 100 TB CSV/JSON
lake scan uses — schema-explicit (no inference scan), column-pruned,
predicate-pushed where the format supports it.

Format matrix status: parquet (everywhere), ORC, CSV, JSON, and
hive-partitioned parquet with partition pruning are covered. Avro is
environment-blocked: spark-avro is an EXTERNAL package (only avro core jars
ship in the pyspark distribution — verified: `spark.read.format("avro")`
raises "Failed to find data source"), and this container has no network to
fetch `org.apache.spark:spark-avro`. On a cluster with the package, the
roundtrip is the same ``_roundtrip_dir`` pattern with ``format("avro")``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgresql_cdc_spark.plans.registry import register
from postgresql_cdc_spark.plans.common import T


def _roundtrip_dir(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    # applicationId in the path: two concurrent harness processes at the same
    # scale factor must not race on overwrite of a shared /tmp dir (same
    # convention as streaming_gate's tmpdirs).
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    app = spark.sparkContext.applicationId
    return os.path.join(
        tempfile.gettempdir(), f"pgcdc_spark_io_{tag}_{fmt}_{app}"
    )


@register(
    "source_csv_roundtrip",
    """
    SELECT n_regionkey, COUNT(*) AS n_nations,
           MIN(n_name) AS first_nation
    FROM nation GROUP BY n_regionkey
    """,
    doc="CSV sink + source roundtrip: nation -> csv (header) -> read with "
        "explicit schema -> aggregate. Matches the oracle's direct scan only "
        "if the CSV write/read preserved every value and type.",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    path = _roundtrip_dir(spark, sf_dir, "csv")
    n.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.option("header", "true")
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(path)
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_nation"),
    )


@register(
    "source_json_roundtrip",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           MIN(o_orderkey) AS min_key,
           MIN(CAST(o_orderdate AS DATE)) AS first_date
    FROM orders GROUP BY o_orderstatus
    """,
    doc="JSON-lines sink + source roundtrip: orders (key/status/date) -> "
        "json -> schema-explicit read -> aggregate. Dates travel as ISO "
        "strings and come back as DATE, exercising the JSON type bridge.",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("o_date"),
    )
    path = _roundtrip_dir(spark, sf_dir, "json")
    o.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_date date"
    ).json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
        F.min("o_date").alias("first_date"),
    )


@register(
    "source_orc_roundtrip",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           MIN(c_custkey) AS min_key,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY c_mktsegment
    """,
    doc="ORC sink + source roundtrip: customer -> ORC -> schema-explicit "
        "read -> aggregate with an exact-decimal balance sum. ORC is the "
        "columnar lake format Spark supports natively besides parquet "
        "(predicate pushdown, column pruning, vectorized read) — the "
        "aggregate matches the oracle's direct parquet scan only if the "
        "ORC write/read preserved doubles bit-for-bit.",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.plans.common import DEC

    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = _roundtrip_dir(spark, sf_dir, "orc")
    c.write.mode("overwrite").orc(path)
    back = spark.read.schema(
        "c_custkey long, c_mktsegment string, c_acctbal double"
    ).orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_custkey").alias("min_key"),
        F.sum(DEC("c_acctbal", 12, 2)).cast("double").alias("sum_bal"),
    )


@register(
    "source_partitioned_pruning",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           MIN(o_orderkey) AS min_key
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    doc="Hive-style partitioned parquet sink + partition-pruned source: "
        "orders written partitionBy(o_orderstatus), read back filtered to "
        "one status. At 100 TB this is THE lake layout pattern — the filter "
        "must resolve at the directory listing (plan shows PartitionFilters,"
        " asserted in tests/test_plan_shapes.py), so the scan never opens "
        "the other partitions' files.",
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    path = _roundtrip_dir(spark, sf_dir, "part")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = (
        spark.read.schema(
            "o_orderkey long, o_orderpriority string, o_orderstatus string"
        )
        .parquet(path)
        .where(F.col("o_orderstatus") == "F")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
    )


@register(
    "layout_compaction_roundtrip",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           MIN(l_orderkey) AS min_key,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Small-file compaction (the lake OPTIMIZE pass): lineitem written "
        "deliberately fragmented (repartition(64) => 64 tiny files), then "
        "operators/layout.compact coalesces it to ceil(bytes/target) files "
        "with NO shuffle and the aggregate over the compacted copy must "
        "equal the oracle's direct scan — content-preservation is the gate; "
        "the file-count arithmetic and shuffle-free plan are pinned in "
        "tests/test_compaction.py. At 100 TB this is how streaming-sink "
        "directories stay scannable.",
)
def layout_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.layout import compact
    from postgresql_cdc_spark.plans.common import DEC

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    frag = _roundtrip_dir(spark, sf_dir, "frag")
    out = _roundtrip_dir(spark, sf_dir, "compact")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    compact(spark, frag, out, target_file_bytes=64 * 1024 * 1024)
    back = spark.read.schema(
        "l_orderkey long, l_returnflag string, l_quantity double"
    ).parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_key"),
        F.sum(DEC("l_quantity", 12, 2)).cast("double").alias("sum_qty"),
    )


@register(
    "source_text_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
             AS corpus_xor
    FROM documents
    """,
    doc="Line-oriented text sink + source roundtrip: documents.text -> "
        "spark.write.text (one line per doc; fixture texts are newline-free) "
        "-> spark.read.text -> corpus checksum. The XOR of per-line portable "
        "hashes is order-independent, so the check is layout-insensitive "
        "but corrupts on ANY lost, duplicated, or altered line. The oracle "
        "computes the same checksum from the parquet table directly — equal "
        "only if the text roundtrip was lossless.",
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from postgresql_cdc_spark.operators.text import h60

    d = T(spark, sf_dir, "documents")
    path = _roundtrip_dir(spark, sf_dir, "text")
    d.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path)  # one column: value
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
        F.bit_xor(h60(F.col("value"))).alias("corpus_xor"),
    )
