"""Batch storage layout: partitioned and bucketed parquet tables.

At 100 TB the dominant cost of the recurring join/agg workload is the
fact-table shuffle; the storage layout is where it gets amortized:

- *partitioned* writes (``partitionBy`` on a date/enum column) give
  partition pruning — a query filtering on the partition column reads
  only matching directories (Catalyst prunes at planning; dynamic
  partition pruning handles join-derived filters).
- *bucketed* tables (``bucketBy(n, key)``) pre-shuffle the data once at
  write time: two tables bucketed on the same key with the same bucket
  count join with NO exchange on either side — the shuffle is paid once
  instead of per query (verified by plan assertion in
  tests/test_storage.py).

Bucket-count rule of thumb: total_size / buckets should land near the
target partition size (128-512 MB); at 100 TB of lineitem that is
O(100k) buckets, and the bucket count must be fixed at write time —
changing it is a rewrite, so it is chosen for the table's lifetime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet; queries filtering on
    ``partition_cols`` prune whole directories at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (optionally sorted) managed table. Joins and
    aggregations keyed on ``bucket_cols`` against tables with the same
    bucketing skip their exchange (and with ``sort_cols``, their sort)."""
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (possibly bucketed) table; the bucketing metadata
    rides along and the planner uses it to elide exchanges."""
    return spark.table(table)
