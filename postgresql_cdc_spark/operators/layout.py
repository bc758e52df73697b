"""Data-layout operators: Z-order (Morton) clustering for multi-dimension
file pruning.

At 100 TB the dominant read cost is scanning files a predicate could have
skipped. Min/max file statistics prune perfectly on the sort column and not
at all on anything else; interleaving the bits of two bucketed dimensions
into one Z-value and range-partitioning on it gives every file a tight
bounding box in BOTH dimensions — the layout behind Delta/Iceberg's
``OPTIMIZE ZORDER BY``. The write path is
``df.repartitionByRange(n, zvalue).sortWithinPartitions(zvalue)`` before the
parquet write; everything here is exact integer bit math, so a DuckDB oracle
reproduces it verbatim.

Reference parity: the reference has no storage layer at all (SURVEY.md §6 —
no files, no layout); this is a Spark-native scale operator.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def z_sql(a_sql: str, b_sql: str, bits: int = 8, dialect: str = "spark") -> str:
    """SQL text of the Morton interleave of two ``bits``-wide non-negative
    bucket columns: bit k of ``a`` lands at position 2k+1, bit k of ``b`` at
    2k. The pieces occupy disjoint bit positions, so ``+`` equals ``|`` and
    keeps the expression a plain associative sum in either engine."""
    parts = []
    for k in range(bits):
        if dialect == "spark":
            parts.append(f"shiftleft(shiftright({a_sql}, {k}) & 1, {2 * k + 1})")
            parts.append(f"shiftleft(shiftright({b_sql}, {k}) & 1, {2 * k})")
        else:
            parts.append(f"((({a_sql} >> {k}) & 1) << {2 * k + 1})")
            parts.append(f"((({b_sql} >> {k}) & 1) << {2 * k})")
    return "(" + " + ".join(parts) + ")"


def zvalue(a: Column | str, b: Column | str, bits: int = 8) -> Column:
    """Morton Z-value of two bucketed dimension columns (by name)."""
    a_sql = a if isinstance(a, str) else a._jc.toString()
    b_sql = b if isinstance(b, str) else b._jc.toString()
    return F.expr(z_sql(a_sql, b_sql, bits))


def scan_output_rows(df) -> int:
    """Rows the file scan(s) of an EXECUTED DataFrame actually produced —
    post parquet row-group/page skipping, pre Filter re-evaluation: the
    honest measure of read I/O a pushed predicate saved (the diagnostic
    the layout operators here exist to improve). Executes the plan via a
    ROW-DISCARDING action — ``executedPlan().execute().count()`` runs the
    exact physical plan instance whose metrics are read below as a JVM
    RDD count, so no row ever crosses to the driver (``collect`` here
    materialized the full result set just to populate metrics, and a
    large diagnostic frame would OOM the driver — r16 advice). Note the
    plan executes once per call even if the caller already ran it (the
    metrics belong to this plan instance, not the caller's action). Only
    meaningful for plans whose leaves are file scans and that carry no
    exchange (an AQE-wrapped plan hides its leaves behind the adaptive
    node); probe/filter shapes qualify."""
    exec_plan = df._jdf.queryExecution().executedPlan()
    # Dataset actions reset plan metrics before running; a raw
    # execute() does not, so without this a caller's earlier action on
    # the same DataFrame would double-count into numOutputRows
    exec_plan.resetMetrics()
    exec_plan.execute().count()
    leaves = exec_plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return int(total)


def list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under ``path``, recursively, via the
    Hadoop FileSystem API — the same listing works on file://, hdfs:// and
    s3a://, so the operator is lake-portable (a table format like
    Delta/Iceberg reads this from its manifest instead of the namenode;
    either way the stats feeding compaction are these). Hidden and metadata
    entries (``_SUCCESS``, ``.crc``) are skipped."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def compact(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the OPTIMIZE pass every 100 TB lake runs.

    Streaming sinks and fine-grained upserts leave directories with
    thousands of KB-sized files; every downstream scan then pays a task, a
    footer read and an open() per file, and the driver pays the listing.
    Compaction rewrites the directory into ``ceil(total_bytes /
    target_file_bytes)`` files:

    - without ``sort_by``: ``coalesce(n)`` — merges read partitions with NO
      shuffle (each output task concatenates input splits; this is the cheap
      path and preserves existing order);
    - with ``sort_by``: ``repartitionByRange(n, *sort_by)`` +
      ``sortWithinPartitions`` — one shuffle that also re-clusters the data
      so min/max file statistics prune on the sort key afterwards (combine
      with ``zvalue`` for two-dimension pruning).

    Sizing uses the INPUT byte total as the estimate for the output (same
    codec family in and out); the target is a soft ceiling, exactly like
    Delta OPTIMIZE's. Returns the decision record a maintenance job logs:
    ``{n_files_in, bytes_in, n_files_out}``.
    """
    files = list_data_files(spark, in_path)
    total = sum(b for _, b in files)
    n_out = max(1, -(-total // int(target_file_bytes)))
    df = spark.read.parquet(in_path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(out_path)
    return {
        "n_files_in": len(files),
        "bytes_in": total,
        "n_files_out": n_out,
    }
