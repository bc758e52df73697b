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


def register(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator: register a (spark builder, oracle SQL) pair under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap
