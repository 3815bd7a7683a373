"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`sparksent.registry` — every implemented operator
from SURVEY.md §2 (plus the ext/ LLM-pipeline operators) registers a
(PySpark builder, DuckDB oracle SQL) pair there; this module re-exports
them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: trending share-of-conversation — the
    windowed count/total ratio the reference couldn't express
    (SentimentAnalysis.scala:106-123, dead code)."""
    from sparksent.registry import queries

    return queries()["trending_10s"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparksent.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from sparksent.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
