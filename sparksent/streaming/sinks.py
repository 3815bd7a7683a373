"""Streaming sinks.

The reference's only sink is ``.print()`` to the console
(SentimentAnalysis.scala:216-225, with 8 more commented out — its
debugging story). Ours: console for parity, memory for assertions,
parquet for durable output, and ``foreachBatch`` as the escape hatch
(the idiomatic replacement for the reference's aspirational-but-unused
MongoDB/GCS sinks, pom.xml:78-94)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def to_console(df: DataFrame, mode: str = "append") -> StreamingQuery:
    return df.writeStream.outputMode(mode).format("console").start()


def to_memory(df: DataFrame, name: str, mode: str = "append") -> StreamingQuery:
    return (
        df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    )


def to_parquet(df: DataFrame, path: str, checkpoint: str) -> StreamingQuery:
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def to_foreach_batch(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    mode: str = "update",
    available_now: bool = False,
) -> StreamingQuery:
    """``available_now=True`` drains the currently-available input and
    stops (batch-over-stream runs, tests); False runs continuously."""
    w = df.writeStream.outputMode(mode).foreachBatch(fn)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_upsert(
    df: DataFrame,
    store: dict,
    key_cols: list[str],
    mode: str = "update",
    available_now: bool = False,
) -> StreamingQuery:
    """Update-mode upsert sink: each micro-batch delivers only the
    (key, aggregate) rows that changed; merge them into a keyed store.
    This is the sink-side half of queries Structured Streaming cannot
    chain internally (e.g. trending's agg-over-agg ratio): keep the
    per-key aggregate updated in the store, derive the second-level
    result on read. In production the store is a keyed table (Delta /
    JDBC / state backend); here a dict, and the per-batch collect only
    ever sees the updated rows, never the full state."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():
            store[tuple(row[k] for k in key_cols)] = row.asDict()

    return to_foreach_batch(df, fn, mode, available_now=available_now)
