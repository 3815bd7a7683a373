"""Temporal join operators the reference lacks entirely (it has zero
joins — SentimentAnalysis.scala has no join call; SURVEY.md §2.3): the
as-of join (latest right-side row at or before each left row, per key).

Scale shape: the naive formulation — join on ``r.ts <= l.ts`` plus a
per-left-row max — is a range join Spark executes as broadcast
nested-loop, quadratic per key. ``asof_join`` instead uses the
single-shuffle union + ordered carry-forward form: both inputs shuffle
ONCE on the key, rows are interleaved in (ts, side, tie) order, and a
running ``last(right_payload, ignorenulls)`` window carries the most
recent right row onto every subsequent left row in the same partition.
No row explosion, no second shuffle, cost O(n log n) per key group —
the standard distributed as-of (the same plan shape engines that ship a
native ASOF JOIN lower to).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_tie: Column | None = None,
    right_tie: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same ``on`` key (backward as-of).

    Tie semantics (pinned so batch, streaming-replay, and the SQL oracle
    agree): at equal timestamps the right row is visible to the left row
    (<=, right sorts first); among equal-ts right rows the greatest
    ``right_tie`` wins. Left rows with no prior right row keep NULLs in
    the attached columns.

    Returns all left columns plus each right non-key column as
    ``{right_prefix}{col}`` (including ``{right_prefix}{right_ts}``).
    """
    lpay = [c for c in left.columns if c != on]
    rpay = [c for c in right.columns if c != on]
    ltie = left_tie if left_tie is not None else F.lit(0)
    rtie = right_tie if right_tie is not None else F.lit(0)

    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        ltie.cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in lpay]).alias("__l"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rtie.cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in rpay]).alias("__r"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    out = [F.col("__k").alias(on)]
    out += [F.col(f"__l.{c}").alias(c) for c in lpay]
    out += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpay]
    return matched.select(*out)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_tie: Column | None = None,
    right_tie: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right.ts >= left.ts`` for the same ``on`` key — the forward
    as-of (time-to-next-event), completing the family.

    Same single-shuffle union form as :func:`asof_join`, with the
    carry running FORWARD: rows order by (ts, side, tie) with left
    side 0 so an equal-ts right row is inside the left row's
    [current, following] frame (>= semantics), and among equal-ts
    right rows the SMALLEST ``right_tie`` wins (first_value). Left
    rows with no later right row keep NULLs."""
    lpay = [c for c in left.columns if c != on]
    rpay = [c for c in right.columns if c != on]
    ltie = left_tie if left_tie is not None else F.lit(0)
    rtie = right_tie if right_tie is not None else F.lit(0)

    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        ltie.cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in lpay]).alias("__l"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        rtie.cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in rpay]).alias("__r"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = u.withColumn(
        "__m", F.first("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 0)
    out = [F.col("__k").alias(on)]
    out += [F.col(f"__l.{c}").alias(c) for c in lpay]
    out += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpay]
    return matched.select(*out)
