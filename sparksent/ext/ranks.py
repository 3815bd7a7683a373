"""Distributed global ranking — total-order analytics without the
single-reducer window.

``Window.orderBy(...)`` with no partition key sorts the whole input on
ONE reducer: fine for post-aggregate frames up to ~1e8 rows, a wall at
corpus scale. This module computes exact 1-based global row numbers the
way distributed sorts do:

1. ``repartitionByRange`` on the order key — Spark's RangePartitioner
   assigns ascending key ranges to ascending partition ids;
2. a per-partition ``row_number`` (each partition sorts locally);
3. per-partition counts — a #partitions-row frame — cumulated into
   start offsets and broadcast back;
4. ``global_rank = partition_offset + local_row_number``.

Every stage is partition-parallel; the only single-threaded work is the
cumulative sum over the tiny per-partition count frame. The order key
must be a TOTAL order (append a unique tiebreaker column) — otherwise
equal keys straddling a partition boundary would make ranks depend on
placement.

``ntile_col`` reproduces SQL NTILE(k) arithmetic from (rank, n): the
first ``n mod k`` buckets take ``ceil(n/k)`` rows, the rest take
``floor(n/k)`` — integer-exact, so results match the window-function
form bit-for-bit (pinned against ``F.ntile`` by the decile query's
oracle and tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_MID_MASK = (1 << 33) - 1  # monotonically_increasing_id: low 33 bits = row index


def with_global_ranks(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Add exact 1-based global row numbers over a total order, with no
    global sort on a single reducer (see module docstring).

    The local row number comes from ``monotonically_increasing_id`` over
    the pinned, per-partition-sorted frame — NOT from a
    ``Window.partitionBy(_pid)``: the window form forces an Exchange
    that re-shuffles the whole frame by its own partition id (a full
    corpus-sized shuffle that moves nothing anywhere useful), while the
    id's documented layout (partition id in the upper bits, row index
    within the partition in the low 33) yields the identical row number
    with zero shuffle.  The 33-bit layout caps partitions at 2^33 rows —
    ~8.6e9, far beyond any sane partition sizing.

    ``count_col``, when set, adds the total row count to every row —
    derived from the per-partition counts frame the offsets already
    need, so callers that want (rank, n) pairs (NTILE, quantile
    normalization) don't re-derive their corpus input just to count it.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # Two subplans consume `ranged` (the offsets agg and the row-number
    # branch); correctness requires both to observe the SAME sampled
    # range boundaries, partition assignment AND in-partition row order.
    # Materialize the partitioned+sorted frame once (same
    # multi-consumer convention as the dedup modules' persist of
    # candidate indexes); both consumers then compute identical ids.
    ranged = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .localCheckpoint(eager=True)
    )
    m = ranged.select("*", F.monotonically_increasing_id().alias("_mid"))
    with_pid = m.withColumn("_pid", F.shiftright(F.col("_mid"), 33))
    # tiny frame: one row per partition; the cumulative window over it is
    # the only non-parallel step
    counts = with_pid.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_cum = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)).alias("_off"),
    ]
    if count_col is not None:
        w_all = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_cnt").over(w_all).cast("long").alias(count_col))
    offsets = counts.select(*off_cols)
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col,
            (
                F.col("_off") + F.col("_mid").bitwiseAND(F.lit(_MID_MASK)) + 1
            ).cast("long"),
        )
        .drop("_pid", "_mid", "_off")
    )


def with_group_ranks(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Exact 1-based PER-GROUP row numbers over a total order within
    each group — ``row_number() OVER (PARTITION BY group ORDER BY ...)``
    without one task per group.

    The window form shuffles on the group key, so a corpus with few
    huge groups (per-LANGUAGE ranking over a web corpus: ~100 groups of
    ~1 TB) serializes each group through one reducer.  This
    generalizes :func:`with_global_ranks` instead: range-partition on
    (group_cols + order_cols) — each group's rows are contiguous in
    ascending partition order and sorted across partitions — then a
    per-(partition, group) local row_number plus broadcast per-group
    prefix offsets.  Every stage is partition-parallel; the offsets
    frame is one row per (partition, group-in-partition), tiny.  The
    combined (group + order) key must be a TOTAL order (append a
    unique tiebreaker), same contract as the global form.

    NULL group keys are ranked as their own group, matching the
    ``PARTITION BY`` window form (where NULL is its own partition) and
    the DuckDB oracles: the offsets rejoin uses null-safe equality
    (``<=>``) on every group column, so NULL-keyed rows are neither
    dropped nor merged with any non-NULL group.

    Like :func:`with_global_ranks`, the local row number is derived
    from ``monotonically_increasing_id`` over the pinned frame (sorted
    within partitions by group + order, so each group's rows are a
    contiguous id run) minus the group's first id in the partition —
    carried on the offsets frame as ``min(_mid)`` — instead of a
    ``Window.partitionBy(_pid, group)`` whose Exchange re-shuffles the
    whole corpus by its own partition id.  ``count_col``, when set,
    adds each group's total row count (full-frame window sum over the
    tiny counts frame — zero extra passes over the data)."""
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    keys = [F.col(c) for c in group_cols + order_cols]
    # same multi-consumer materialization rationale as with_global_ranks
    ranged = (
        df.repartitionByRange(n_part, *keys)
        .sortWithinPartitions(*keys)
        .localCheckpoint(eager=True)
    )
    m = ranged.select("*", F.monotonically_increasing_id().alias("_mid"))
    with_pid = m.withColumn("_pid", F.shiftright(F.col("_mid"), 33))
    counts = with_pid.groupBy("_pid", *group_cols).agg(
        F.count("*").alias("_cnt"), F.min("_mid").alias("_mmin")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        F.col("_pid"),
        *[F.col(c) for c in group_cols],
        F.col("_mmin"),
        F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)).alias("_off"),
    ]
    if count_col is not None:
        off_cols.append(
            F.sum("_cnt")
            .over(Window.partitionBy(*group_cols))
            .cast("long")
            .alias(count_col)
        )
    offsets = counts.select(*off_cols)
    return (
        with_pid.join(F.broadcast(_null_safe_offsets(offsets, group_cols)),
                      _null_safe_cond(group_cols))
        .withColumn(
            rank_col,
            (F.col("_off") + F.col("_mid") - F.col("_mmin") + 1).cast("long"),
        )
        .drop("_pid", "_mid", "_mmin", "_off", "_opid",
              *[f"_og{i}" for i in range(len(group_cols))])
    )


def _null_safe_offsets(offsets: DataFrame, group_cols: list[str]) -> DataFrame:
    """Rename the offsets frame's join columns so the null-safe join
    condition can reference both sides unambiguously; every other
    column (offsets, group minima, optional counts) passes through."""
    rest = [c for c in offsets.columns if c != "_pid" and c not in group_cols]
    return offsets.select(
        F.col("_pid").alias("_opid"),
        *[F.col(c).alias(f"_og{i}") for i, c in enumerate(group_cols)],
        *rest,
    )


def _null_safe_cond(group_cols: list[str]) -> Column:
    """``_pid`` equality plus ``<=>`` on every group column — still an
    equi-join for Catalyst (BroadcastHashJoin applies), but NULL group
    keys match their own offsets row instead of being dropped."""
    cond = F.col("_pid") == F.col("_opid")
    for i, c in enumerate(group_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"_og{i}"))
    return cond


def with_group_prefix_sums(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    sum_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact EXCLUSIVE per-group running sums over a total order within
    each group — ``sum(x) OVER (PARTITION BY group ORDER BY ... ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING)`` without one task per group
    (the :func:`with_group_ranks` trick applied to prefix sums: the
    token-budget admission's shape).

    Range-partition on (group_cols + order_cols); per-(partition,
    group) partial sums cumulate into broadcast per-group offsets;
    each row's exclusive prefix is its group's offset from earlier
    partitions plus the local exclusive running sum.  BIGINT addition
    is associative, so the result is bit-identical to the window form
    in ANY grouping of the work.  Same total-order contract (append a
    unique tiebreaker).  NULL group keys form their own group via the
    null-safe offsets rejoin, matching the window form — see
    :func:`with_group_ranks`."""
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    keys = [F.col(c) for c in group_cols + order_cols]
    ranged = df.repartitionByRange(n_part, *keys).localCheckpoint(eager=True)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = with_pid.groupBy("_pid", *group_cols).agg(
        F.sum(sum_col).cast("long").alias("_psum")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_psum").over(w_cum), F.lit(0)).alias("_off"),
    )
    w_local = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_pid.withColumn(
            "_ps", F.coalesce(F.sum(sum_col).over(w_local), F.lit(0))
        )
        .join(F.broadcast(_null_safe_offsets(offsets, group_cols)),
              _null_safe_cond(group_cols))
        .withColumn(out_col, (F.col("_off") + F.col("_ps")).cast("long"))
        .drop("_pid", "_ps", "_off", "_opid",
              *[f"_og{i}" for i in range(len(group_cols))])
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor-division for non-negative longs: subtracting
    the remainder first makes the double division mathematically exact
    (the quotient is an integer < 2^53), so the cast cannot land an
    epsilon below a boundary the way ``(a / b).cast`` can."""
    return ((a - (a % b)) / b).cast("long")


def ntile_col(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) from a 1-based global rank and the total row count:
    the first ``n % k`` buckets hold ``n div k + 1`` rows, the rest
    ``n div k`` — pure integer arithmetic (no doubles near boundaries)."""
    kl = F.lit(k).cast("long")
    q = _idiv(n, kl)
    rem = (n % kl).cast("long")
    thresh = rem * (q + 1)
    return (
        F.when(rank <= thresh, _idiv(rank - 1, q + 1) + 1)
        .otherwise(rem + _idiv(rank - thresh - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
