"""Fixture table loaders.

The driver provides deterministic parquet tables at
``/root/testdata/sf{0.001,0.01,0.1}/`` (TESTDATA.md). ``events`` plays the
reference's chat-message stream (SentimentAnalysis.scala:315 ``Message``):
``channel <- event_type``, ``user <- user_id``, ``text <- props``; ``ts``
is the explicit event-time column the reference left implicit
(processing time, SURVEY.md §2.6).

At 100 TB these would be partitioned tables (e.g. events partitioned by
date); the loaders stay the same — ``spark.read.parquet`` on a directory
prunes partitions from pushed-down ``ts`` predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rebalance(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input up to the session's default
    parallelism before CPU-heavy per-row work (hashing, shingling, decode).

    The small local fixtures arrive as a single parquet split, which would
    serialize an expression-heavy map stage onto one core; on a real
    cluster the scan of a large table already yields >= cores splits and
    this returns the input unchanged. The round-robin shuffle moves only
    the narrow projected input once, before the expensive stage.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The events fixture stores ts as parquet TIMESTAMP(NANOS), which
        # Spark 4 refuses to read as a timestamp. Read it as raw int64
        # nanoseconds (legacy conf, runtime-settable) and convert with
        # exact integer division — `ts div 1000` truncates ns -> us the
        # same way DuckDB does, so ordering ties agree with the oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-shaped message stream derived from ``events``.

    Columns: channel, user, text, ts, event_id — the reference's
    ``Message(channel, user, text)`` (SentimentAnalysis.scala:315) plus
    explicit event time and a monotone arrival-order tie-breaker
    (FIXTURES.md §B2).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("channel"),
        F.col("user_id").cast("string").alias("user"),
        F.col("props").alias("text"),
        F.col("ts"),
        F.col("event_id"),
    )
