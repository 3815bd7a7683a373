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
    df: DataFrame, fn: Callable[[DataFrame, int], None], mode: str = "update"
) -> StreamingQuery:
    return df.writeStream.outputMode(mode).foreachBatch(fn).start()
