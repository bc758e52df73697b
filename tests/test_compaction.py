"""operators/layout.compact: file-count arithmetic, shuffle-free plan,
content preservation.

The oracle-paired query (`layout_compaction_roundtrip`) gates content
equality against DuckDB; these tests pin the layout facts the gate can't
see — output file counts actually shrink to the computed target, the
no-sort path plans without an exchange, and the sorted path re-clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from postgresql_cdc_spark.operators.layout import compact, list_data_files


def _mkdirs(tmp_path, *names):
    return [os.path.join(str(tmp_path), n) for n in names]


def test_compacts_fragmented_dir_to_computed_file_count(spark, tmp_path):
    frag, out = _mkdirs(tmp_path, "frag", "out")
    spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(32).write.parquet(frag)
    n_in = len(list_data_files(spark, frag))
    assert n_in == 32

    stats = compact(spark, frag, out, target_file_bytes=1 << 30)
    n_out = len(list_data_files(spark, out))
    assert stats["n_files_in"] == 32
    assert stats["n_files_out"] == 1  # total bytes far below one target file
    assert n_out == 1

    # content preserved exactly
    a = spark.read.parquet(frag).groupBy().agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("k")
    ).collect()
    b = spark.read.parquet(out).groupBy().agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("k")
    ).collect()
    assert a == b


def test_no_sort_path_plans_without_exchange(spark, tmp_path):
    frag, out = _mkdirs(tmp_path, "frag2", "out2")
    spark.range(0, 1000).repartition(8).write.parquet(frag)
    files = list_data_files(spark, frag)
    total = sum(b for _, b in files)
    # the coalesce write must not shuffle: check on the same plan compact uses
    plan = (
        spark.read.parquet(frag)
        .coalesce(1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    stats = compact(spark, frag, out, target_file_bytes=total)
    assert stats["n_files_out"] == 1


def test_target_sizing_splits_into_multiple_files(spark, tmp_path):
    frag, out = _mkdirs(tmp_path, "frag3", "out3")
    spark.range(0, 50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("pad")
    ).repartition(16).write.parquet(frag)
    total = sum(b for _, b in list_data_files(spark, frag))
    target = total // 3 + 1  # => ceil ratio of 3 (input-bytes estimate)
    stats = compact(spark, frag, out, target_file_bytes=target)
    assert stats["n_files_out"] == 3
    assert len(list_data_files(spark, out)) == 3


def test_sort_by_reclusters_for_minmax_pruning(spark, tmp_path):
    frag, out = _mkdirs(tmp_path, "frag4", "out4")
    # write id in round-robin order so every fragment spans the full range
    spark.range(0, 30_000).repartition(8).write.parquet(frag)
    total = sum(b for _, b in list_data_files(spark, frag))
    compact(spark, frag, out, target_file_bytes=total // 3 + 1,
            sort_by=["id"])
    # after range-repartition + sort, per-file [min,max] ranges are disjoint,
    # so each file's span is ~1/3 of the domain — the min/max pruning property
    per_file = (
        spark.read.parquet(out)
        .select(F.input_file_name().alias("f"), "id")
        .groupBy("f")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    assert len(per_file) == 3
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next
