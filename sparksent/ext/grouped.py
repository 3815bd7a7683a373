"""Grouped-Pandas operators: the ``applyInPandas`` escape hatch proven
under the same exact-oracle gate as the relational operators.

The repo's rule (VERDICT r1: "zero row-at-a-time UDFs") allows Python
only where Spark lacks a native operator, and only Arrow-batched. This
module exists to keep that path honest: a per-group computation written
as idiomatic pandas whose result is nonetheless bit-identical to a SQL
window oracle — so when a real custom aggregate (a tokenizer, a
model-feature builder) lands here, the harness pattern is proven.

Scale notes: ``groupBy(key).applyInPandas`` shuffles the RAW grouped
rows (unlike map-side-combined hash aggregates). That is the honest
price of arbitrary per-group Python — bounded per-task memory requires
bounded group size (events-per-user here). Where the computation IS
expressible as SQL (like this mode), production should prefer the
oracle's window form; the pandas path is for when it is not.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

MODE_SCHEMA = "user_id long, mode_event_type string, n_mode long, n_events long"


def _mode_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    counts = pdf["event_type"].value_counts()
    top = counts.max()
    winner = min(counts[counts == top].index)  # deterministic tie-break
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "mode_event_type": [winner],
            "n_mode": [int(top)],
            "n_events": [len(pdf)],
        }
    )


def grouped_mode(df: DataFrame) -> DataFrame:
    """Per-user modal event type (ties -> lexicographically smallest),
    via Arrow-batched ``applyInPandas``. Input is pruned to the two
    needed columns before the shuffle."""
    return (
        df.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(_mode_fn, MODE_SCHEMA)
    )


def grouped_mode_sql(table: str = "events") -> str:
    """The window-form oracle: count per (user, type), rank by
    (count DESC, type ASC), keep rank 1 — the same total order as the
    pandas tie-break."""
    return f"""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM {table} GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn,
             sum(n) OVER (PARTITION BY user_id)::BIGINT AS n_events
      FROM c
    )
    SELECT user_id, event_type AS mode_event_type, n AS n_mode, n_events
    FROM r WHERE rn = 1
    """


__all__ = ["grouped_mode", "grouped_mode_sql", "MODE_SCHEMA"]
