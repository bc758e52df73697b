from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}

_TUNED: set[str] = set()


def _tune_session(spark: SparkSession) -> None:
    """Self-provision sane shuffle parallelism under any harness session.

    Our own ``session.get_spark`` sizes ``spark.sql.shuffle.partitions`` to the
    core count, but an external harness may hand builders a vanilla session
    with the 200-partition default — at the correctness gate's sf0.01 scale
    that is ~200 near-empty reduce tasks per exchange, pure scheduling
    overhead. Lower it once per session to the core count, only when it still
    has the oversized default; on a real cluster the conf is deliberately set
    and this never fires.
    """
    try:
        import postgresql_cdc_spark as _pkg

        _pkg.ensure_self_contained_pickling()
        app_id = spark.sparkContext.applicationId
        if app_id in _TUNED:
            return
        _TUNED.add(app_id)
        cur = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        if cur > 64:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(16, spark.sparkContext.defaultParallelism)),
            )
        # The DuckDB oracle's timestamps are naive (wall time == UTC instant);
        # every cross-engine comparison in the registry assumes the same on
        # the Spark side. Pin the session zone so text<->timestamp conversions
        # (e.g. the PG wire-format roundtrips) are engine-neutral even under a
        # harness session inheriting a non-UTC JVM default.
        if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 — tuning is best-effort, never fatal
        pass


def register(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator: register a (spark builder, oracle SQL) pair under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune_session(spark)
            return fn(spark, sf_dir)

        tuned.__name__ = fn.__name__
        tuned.__doc__ = fn.__doc__
        tuned.__module__ = fn.__module__
        tuned.__wrapped__ = fn
        QUERIES[name] = Query(name=name, spark=tuned, oracle=oracle, doc=doc)
        return fn

    return wrap
