"""Skew-mitigation operators: salted two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles skewed JOIN
partitions, and algebraic aggregates (sum/count/min/max) already
pre-combine map-side, so neither needs salting. The remaining hazard at
100 TB is a *holistic* aggregate on a hot key — exact distinct counts or
order-sensitive collects where one reducer would receive a whole hot
key's rows. Salting splits each key into ``n_salts`` disjoint sub-keys,
aggregates the sub-keys in parallel, then merges the small per-salt
partials in a second, cheap aggregation.

The salt must be a *deterministic function of the value being
aggregated* (not a random number): hashing the value keeps every
occurrence of one value in one salt bucket, which is what makes the
per-bucket partials disjoint and the merge exact (count-distinct sums,
set unions, sorted-array merges all stay correct).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_of(col: Column | str, n_salts: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c), F.lit(n_salts))


def salted_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-proof: rows scatter to
    (key, hash(value) % n_salts); every occurrence of one value lands in
    exactly one bucket, so the per-bucket distinct counts partition the
    key's distinct set and their SUM is the exact answer. The hot key's
    distinct work runs on n_salts reducers instead of one."""
    partial = (
        df.withColumn("__salt", salt_of(value_col, n_salts))
        .groupBy(*keys, "__salt")
        .agg(F.count_distinct(F.col(value_col)).alias("__pd"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pd").alias(out_col))


def salted_sorted_concat(
    df: DataFrame,
    keys: Sequence[str],
    text_col: str,
    order_cols: Sequence[str],
    n_salts: int = 16,
    sep: str = "\n",
    out_col: str = "texts",
) -> DataFrame:
    """Order-sensitive string concat per key (the reference's
    messageReduce, SentimentAnalysis.scala:293-302), skew-proof: each
    salt bucket collects its rows as (order..., text) structs, the merge
    flattens the per-bucket arrays and sorts ONCE on the order columns,
    so the result is byte-identical to the direct single-reducer form.
    Memory per reducer drops from O(hot key) to O(hot key / n_salts) in
    the first phase; the second phase moves only pre-concatenated
    strings."""
    order_struct = F.struct(*[F.col(c) for c in order_cols], F.col(text_col))
    partial = (
        df.withColumn("__salt", salt_of(order_cols[-1], n_salts))
        .groupBy(*keys, "__salt")
        .agg(F.collect_list(order_struct).alias("__chunk"))
    )
    merged = partial.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("__chunk"))).alias("__all")
    )
    return merged.select(
        *keys,
        F.array_join(
            F.transform("__all", lambda s: s[text_col]), sep
        ).alias(out_col),
    )
