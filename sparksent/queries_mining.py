"""Registrations for the pattern-mining / CDC family (ext/mining.py)
plus the GROUPING SETS aggregation surface.

The reference has no transactions, graphs, or multi-granularity
aggregation (SURVEY.md §2.3); this module rounds out the analytics
engine with the shapes a recommendation / curation pipeline runs over
a fact store: association rules, reachability, snapshot diffs,
negative sampling, and arbitrary grouping-set rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import tables
from .ext import mining
from .registry import register


@register(
    "basket_pair_lift",
    oracle=mining.basket_pair_lift_sql(),
    tags=("mining", "association"),
)
def q_basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs with integer-exact lift (ppm):
    the a-priori prune (losslessly dropping items below min-support)
    runs BEFORE the basket-co-partitioned pair self-join, marginals
    and the basket total broadcast back onto the pair aggregate, and
    lift is a positive-integer floordiv so both engines agree
    bit-for-bit."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return mining.basket_pair_lift(li)


@register(
    "bfs_hops_copurchase",
    oracle=mining.copurchase_bfs_hops_sql(),
    tags=("mining", "graph", "iterative"),
)
def q_bfs_hops_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the part co-purchase graph: hop level
    (0..3, or -1 unreached) of every part from the 3 highest-support
    seed parts. O(diameter) frontier-join rounds, each anti-joined
    against the levelled set and localCheckpoint-pinned; the oracle is
    an independent recursive-CTE walk enumeration whose min(hop) is
    the same BFS distance — an iterative graph algorithm under the
    full hash gate."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return mining.copurchase_bfs_hops(li)


@register(
    "snapshot_diff_users",
    oracle=mining.snapshot_diff_sql("2024-01-05", "2024-01-20"),
    tags=("mining", "cdc"),
)
def q_snapshot_diff_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff of per-user activity state between the Jan 5 and
    Jan 20 day-window snapshots: added / removed / changed / unchanged
    per user, with the absent side at the -1 sentinels. Two
    scan-pruned aggregates (the partition-pruning analog of reading
    two table versions) and one co-partitioned full outer join."""
    ev = tables.load_table(spark, sf_dir, "events")
    return mining.snapshot_diff(ev, "2024-01-05", "2024-01-20")


@register(
    "negative_sample_user_items",
    oracle=mining.negative_sample_sql(),
    tags=("mining", "sampling"),
)
def q_negative_sample_user_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive pairs: per user,
    the 3 md5-lottery-smallest ``props.k`` values the user never
    produced. Vocabulary broadcast into the candidate grid, observed
    pairs anti-joined out co-partitioned on user_id, per-user rank over
    at most |vocabulary| rows — reproducible across engines and across
    re-partitioned re-runs, which an RNG sampler is not."""
    ev = tables.load_table(spark, sf_dir, "events")
    return mining.negative_sample(ev)


@register(
    "grouping_sets_event_stats",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(dow, -1)::BIGINT AS dow,
           count(*)::BIGINT AS n,
           sum(value::DECIMAL(28,6))::DOUBLE AS sum_value
    FROM (SELECT event_type,
                 (floor(epoch(ts))::BIGINT // 86400 + 4) % 7 AS dow,
                 value
          FROM events)
    GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow), ())
    """,
    tags=("mining", "aggregation"),
)
def q_grouping_sets_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the multi-granularity shape rollup and
    cube cannot express (here: by (type, weekday), by type, by weekday,
    and grand total in ONE pass). Spark plans this as a single Expand +
    aggregate, so the fact table is scanned once for all four
    granularities; NULL group markers coalesce to the 'ALL' / -1
    sentinels on both engines. Weekday is epoch-day arithmetic
    ((epoch_day + 4) % 7; epoch day 0 was a Thursday, so Thursday=4),
    not a locale-dependent dayofweek."""
    ev = tables.load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST((unix_timestamp(ts) div 86400 + 4) % 7 AS BIGINT)").alias("dow"),
        "value",
    )
    gs = base.groupingSets(
        [["event_type", "dow"], ["event_type"], ["dow"], []],
        "event_type",
        "dow",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    )
    return gs.select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce("dow", F.lit(-1)).cast("long").alias("dow"),
        "n",
        "sum_value",
    )


@register(
    "label_propagation_communities",
    oracle=mining.label_propagation_sql(),
    tags=("mining", "graph", "iterative"),
)
def q_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection: 2 synchronous rounds of deterministic label
    propagation over the weighted co-purchase graph (greatest incoming
    label weight wins, ties to the smallest label, isolated nodes keep
    their own). Node-sized label frame joins the edge list
    co-partitioned per round, vote aggregate partial-combines on
    (dst, label), every round localCheckpoint-pinned — the third
    iterative graph algorithm under the full hash gate (with PageRank
    and BFS)."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return mining.label_propagation(li)


@register(
    "basket_triple_support",
    oracle=mining.basket_triple_support_sql(),
    tags=("mining", "association"),
)
def q_basket_triple_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part triples — a-priori one level deeper
    than basket_pair_lift: the three-way basket-co-partitioned join is
    pre-filtered by broadcast semi-joins against the frequent-pair set
    (every sub-pair of a frequent triple must be frequent — lossless),
    so candidate volume shrinks to pair-supported triples before any
    counting. Oracle = the naive unpruned triple join."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return mining.basket_triple_support(li)


@register(
    "session_path_topk",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ), capped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                     ORDER BY ts, event_id) AS rk
        FROM s)
      WHERE rk <= 5
    ), paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM capped GROUP BY 1, 2
    )
    SELECT path, count(*)::BIGINT AS n_sessions
    FROM paths GROUP BY 1
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    tags=("mining", "sequence", "session"),
)
def q_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session paths (the product-analytics "what do sessions
    look like" query): 30-minute-gap sessions, each session's first 5
    event types joined into a path string, counted, top-20 by
    frequency. The per-session cap is a rank filter BEFORE the
    collect (WindowGroupLimit — an unbounded path never materializes),
    the sessionization/rank windows share the user_id-rooted
    partitioning, and the final top-k is TakeOrdered under the total
    (n DESC, path) order."""
    ev = tables.load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_u)
            >= 30 * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = o.withColumn(
        "sid",
        F.sum("brk").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_s = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    capped = s.withColumn("rk", F.row_number().over(w_s)).filter(F.col("rk") <= 5)
    paths = capped.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros("ts").alias("us"),
                            F.col("event_id").alias("eid"),
                            F.col("event_type").alias("t"),
                        )
                    )
                ),
                lambda x: x["t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )
