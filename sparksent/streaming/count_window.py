"""Streaming count windows — the one operator Structured Streaming lacks
(SURVEY.md §2.6.4, hard-part #1).

``countWindow(N).sum`` (SentimentAnalysis.scala:308-310): per key, every
N observations form a window; emit the window's sum when the N-th
arrives, then reset. Flink gives this via count-trigger window state; in
Spark it is ``applyInPandasWithState`` with per-key state
(bucket_index, running_count, running_sum):

- rows of each micro-batch group are processed in (ts, event_id) order
  (sorted per batch; cross-batch order = arrival order, same contract as
  the batch form's order_cols);
- whenever running_count reaches N the operator emits one output row and
  resets — so emission is per completed window, exactly the reference's
  semantics (not per trigger);
- state is three numbers per key — O(keys) total, store-partitioned by
  key alongside the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("acc", T.DoubleType()),
    ]
)


def _make_fn(n: int, value_col: str, order_cols: Sequence[str]):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bucket, cnt, acc = state.get if state.exists else (0, 0, 0.0)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(list(order_cols))
            for v in pdf[value_col].to_numpy():
                acc += float(v)
                cnt += 1
                if cnt == n:
                    out.append((key[0], bucket, acc, cnt))
                    bucket, cnt, acc = bucket + 1, 0, 0.0
        state.update((bucket, cnt, acc))
        if out:
            yield pd.DataFrame(out, columns=["key", "bucket", "value", "n"])

    return fn


def streaming_count_window(
    df: DataFrame,
    n: int,
    value_col: str = "value",
    key_col: str = "key",
    order_cols: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """Keyed streaming count window: emits (key, bucket, value=sum, n=N)
    once per completed window of n rows. Run with outputMode('append').

    Note: float accumulation here is sequential per key (single writer),
    so it is deterministic for a fixed replay order — the equivalence
    tests compare against the batch bucketing form restricted to
    complete buckets."""
    return df.groupBy(key_col).applyInPandasWithState(
        _make_fn(n, value_col, order_cols),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


CUMSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)

CUMSUM_STATE_SCHEMA = T.StructType([T.StructField("acc", T.DoubleType())])


def _make_cumsum_fn(value_col: str, order_cols: Sequence[str]):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (acc,) = state.get if state.exists else (0.0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(list(order_cols))
            vals = pdf[value_col].to_numpy()
            out = vals.cumsum() + acc
            acc = float(out[-1]) if len(out) else acc
            yield pd.DataFrame(
                {
                    "key": pdf["key"].to_numpy(),
                    "value": out,
                    "ts": pdf[order_cols[0]].to_numpy(),
                    "event_id": pdf[order_cols[1]].to_numpy(),
                }
            )
        state.update((acc,))

    return fn


def streaming_cumulative_per_record(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "key",
    order_cols: Sequence[str] = ("ts", "event_id"),
) -> DataFrame:
    """The reference's running keyed reduce at its EXACT emission
    granularity — one output row per input record carrying the
    cumulative per-key value (SentimentAnalysis.scala:285 emits per
    arriving element; the groupBy/update-mode form only emits per
    trigger). applyInPandasWithState holds one double per key; rows
    within a micro-batch process in (ts, event_id) order, matching the
    batch cumulative window's ordering contract."""
    return df.groupBy(key_col).applyInPandasWithState(
        _make_cumsum_fn(value_col, order_cols),
        CUMSUM_OUTPUT_SCHEMA,
        CUMSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
