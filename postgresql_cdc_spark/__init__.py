"""postgresql_cdc_spark — a PySpark-native CDC + analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``germanosin/postgresql-cdc`` (a minimal PostgreSQL logical-replication
CDC library), re-expressed Spark-first:

- ``sources``   — pgoutput WAL decoder (pure Python), Spark 4 Python DataSource
                  streaming source, change-log replay, changelog synthesis.
- ``functions`` — PostgreSQL text-format type casts (reference
                  ``TableColumn.asX()``), PG array-literal parsers (reference
                  ``PgArrayUtil``), text analysis, vector math.
- ``operators`` — CDC materialization (change log → current state), dedup
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
                  similarity search, as-of join, multimodal column plumbing.
- ``plans``     — the declared query inventory (Spark DataFrame builders paired
                  with ANSI-SQL oracles for the DuckDB correctness gate).
- ``streaming`` — transaction-aligned consumer adapter (reference
                  ``CdcConsumer``), watermark/window helpers.

Everything is DataFrame/SQL-first so Catalyst supplies pushdown, pruning,
join selection, AQE and whole-stage codegen; Python UDFs appear only where a
built-in genuinely cannot express the semantics (the PG string-array grammar,
multimodal decode) and are always Arrow-batched.
"""

__version__ = "0.1.0"
