"""Query registry: every implemented operator as a named
(PySpark builder, DuckDB oracle SQL) pair.

This is the single source of truth consumed by ``__spark_entry__.py``
(the driver contract) and by ``tests/`` (which mirror the driver's
row-count + schema + order-insensitive value-hash comparison).

Oracle-exactness conventions (FIXTURES.md §C):
- window starts are BIGINT epoch seconds: Spark ``unix_timestamp`` floor
  ≡ DuckDB ``floor(epoch(ts))::BIGINT``; both epoch-0 aligned.
- float sums accumulate in DECIMAL(28,6) and cast the final value to
  DOUBLE on both sides — bit-exact regardless of shuffle/scan order.
- no raw TIMESTAMP output columns (timezone-proof); ids/epoch seconds
  instead.
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered fixture views
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    # A broken query module must fail loudly: swallowing ImportError here
    # silently shrinks the driver's checked surface (whole families would
    # vanish from queries()/oracle_sql() with no signal).
    from . import queries_reference  # noqa: F401
    from . import queries_nlp  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_relational  # noqa: F401
    _LOADED = True
