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
from .graph import kcore_sql
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
    SELECT CASE WHEN grouping(event_type) = 1 THEN 'ALL'
                ELSE event_type END AS event_type,
           (CASE WHEN grouping(dow) = 1 THEN -1 ELSE dow END)::BIGINT AS dow,
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
    granularities; the 'ALL' / -1 sentinels derive from GROUPING()
    bits on both engines — never from coalescing the group column, so
    a genuine 'ALL' value (or a NULL source value) stays
    distinguishable from the rollup marker. Weekday is epoch-day
    arithmetic ((epoch_day + 4) % 7; epoch day 0 was a Thursday, so
    Thursday=4), not a locale-dependent dayofweek."""
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
        F.grouping("event_type").alias("g_type"),
        F.grouping("dow").alias("g_dow"),
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    )
    return gs.select(
        F.when(F.col("g_type") == 1, F.lit("ALL"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("g_dow") == 1, F.lit(-1))
        .otherwise(F.col("dow"))
        .cast("long")
        .alias("dow"),
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


@register(
    "churn_training_set",
    oracle="""
    WITH feat AS (
      SELECT user_id,
             count(*)::BIGINT AS n_events,
             sum(value::DECIMAL(28,6))::DOUBLE AS sum_value,
             count(DISTINCT (epoch_us(ts) // 86400000000))::BIGINT AS days_active,
             max(epoch_us(ts))::BIGINT AS last_us
      FROM events
      WHERE epoch_us(ts) >= 1704067200000000   -- 2024-01-01
        AND epoch_us(ts) <  1705795200000000   -- 2024-01-21
      GROUP BY 1
    ), lab AS (
      SELECT DISTINCT user_id FROM events
      WHERE epoch_us(ts) >= 1705795200000000
        AND epoch_us(ts) <  1706745600000000   -- 2024-02-01
    )
    SELECT f.user_id, f.n_events, f.sum_value, f.days_active,
           (1705795200000000 - f.last_us)::BIGINT AS recency_us,
           CASE WHEN lab.user_id IS NULL THEN 1 ELSE 0 END::BIGINT AS churned
    FROM feat f LEFT JOIN lab ON lab.user_id = f.user_id
    """,
    tags=("mining", "ml", "labels"),
)
def q_churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised training-set assembly — the label-generation shape
    every churn/retention model pipeline runs: features from the
    observation window (Jan 1-21: event count, exact spend, active
    days, recency at the cutoff) joined to a label from the strictly
    LATER outcome window (churned = no events Jan 21-Feb 1). The
    temporal split is the leakage guard: features can never see
    outcome-window rows because the windows are disjoint epoch ranges
    pushed to two scans, and the label attach is one co-partitioned
    left join on the entity key."""
    ev = tables.load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    t0, t1, t2 = 1704067200000000, 1705795200000000, 1706745600000000
    feat = (
        ev.filter((us >= t0) & (us < t1))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
            F.countDistinct(F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)"))
            .cast("long")
            .alias("days_active"),
            F.max(F.unix_micros("ts")).cast("long").alias("last_us"),
        )
    )
    lab = ev.filter((us >= t1) & (us < t2)).select("user_id").distinct()
    return feat.join(
        lab.withColumn("seen", F.lit(1)), "user_id", "left"
    ).select(
        "user_id",
        "n_events",
        "sum_value",
        "days_active",
        (F.lit(t1) - F.col("last_us")).cast("long").alias("recency_us"),
        F.when(F.col("seen").isNull(), 1).otherwise(0).cast("long").alias("churned"),
    )


MAX_BASKET_WIDTH = 200  # prolific-user cap for the CF pair stage


@register(
    "item_similarity_jaccard",
    oracle=f"""
    WITH {mining.user_item_cte()},
    widths AS (
      SELECT user_id FROM ui GROUP BY 1
      HAVING count(*) <= {MAX_BASKET_WIDTH}
    ),
    capped AS (
      SELECT ui.user_id, ui.item FROM ui JOIN widths USING (user_id)
    ), sizes AS (
      SELECT item, count(*)::BIGINT AS sz FROM capped GROUP BY 1
    ), inter AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS i
      FROM capped a JOIN capped b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, i AS n_common,
           ((i * 1000000) // (sa.sz + sb.sz - i))::BIGINT AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON sa.item = item_a
    JOIN sizes sb ON sb.item = item_b
    WHERE (i * 1000000) // (sa.sz + sb.sz - i) >= 400000
    """,
    tags=("mining", "similarity", "cf"),
)
def q_item_similarity_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item Jaccard similarity over interacting-user sets — the
    "users who took X also took Y" primitive, and the reason
    item-based collaborative filtering is the scalable default: the
    pair stage is co-partitioned on user_id and bounded by
    sum_u |basket_u|^2, with the bound ENFORCED by the
    MAX_BASKET_WIDTH=200 prolific-user cap (the analog of the dedup
    family's shingle-df cap — prolific users, not popular items, are
    the hot keys; the cap is mirrored in the oracle, so it is part of
    the query's defined answer, and a no-op at this fixture's ~55-item
    baskets). Exact |U(a) ∩ U(b)| / |U(a) ∪ U(b)| in integer ppm over
    the capped universe, thresholded at 0.4; item popularity sizes
    broadcast back onto the pair aggregate. (The user-user transpose
    was measured to degenerate on dense item spaces — every item hot —
    which is exactly why this orientation is the registered one.)"""
    ev = tables.load_table(spark, sf_dir, "events")
    raw = mining.user_item_frame(ev)
    widths = (
        raw.groupBy("user_id")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") <= MAX_BASKET_WIDTH)
        .select("user_id")
    )
    # merge hints, not broadcasts, on the USER-sized frames: widths is
    # one row per user and ui one row per interaction — both billions
    # at 100 TB (the round-6 plan audit found the planner broadcasting
    # the localCheckpoint-descended ui side of the pair self-join, the
    # driver-OOM shape). Sort-merge on user_id lets the semi-join, the
    # pair self-join, and their sorts share one user_id exchange; the
    # per-ITEM sizes frames below stay broadcast — items are
    # catalog-bounded, which is this query's whole orientation.
    ui = raw.join(
        widths.hint("merge"), "user_id", "left_semi"
    ).localCheckpoint()
    sizes = ui.groupBy("item").agg(F.count("*").cast("long").alias("sz"))
    a, b = ui.alias("a"), ui.alias("b")
    inter = (
        a.join(b.hint("merge"), "user_id")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("long").alias("i"))
    )
    sa = sizes.select(F.col("item").alias("item_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("item").alias("item_b"), F.col("sz").alias("szb"))
    j = (
        inter.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .withColumn(
            "jaccard_ppm",
            F.expr("CAST((i * 1000000) div (sza + szb - i) AS BIGINT)"),
        )
        .filter(F.col("jaccard_ppm") >= 400000)
    )
    return j.select(
        "item_a", "item_b", F.col("i").alias("n_common"), "jaccard_ppm"
    )


_KCORE_EDGES_SQL = """
      SELECT src, dst FROM (
        SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
      WHERE w >= 2"""


@register(
    "graph_kcore_parts",
    oracle=kcore_sql(_KCORE_EDGES_SQL),
    tags=("mining", "graph", "iterative"),
)
def q_graph_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the support->=2 co-purchase graph — the graph-pruning
    dual of the growth algorithms (PageRank/BFS/label propagation):
    synchronous peeling drops every part whose surviving co-purchase
    degree falls below 2 until the fixpoint, leaving the dense
    repeatedly-co-bought backbone (pendant chains and one-off
    attachments peel away even though they met the support floor).
    The support threshold keeps the base graph sparse enough to HAVE
    structure (the raw co-purchase graph at fixture scale is near
    complete — nothing would peel).  Each round is one degree aggregate
    + two endpoint hash joins, localCheckpoint-pinned; bounded at 10
    rounds with a result-identical early exit (fixture converges in
    <= 7 across all SFs — the bound is pinned by the fixpoint property
    test)."""
    from .graph import kcore

    li = tables.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    return kcore(pairs, k=2, rounds=10)
