"""Pattern-mining and CDC operators: market-basket association rules,
multi-source BFS reachability, snapshot diffing, and negative sampling.

No reference counterpart (traubad/FlinkSentimentAnalysis has neither a
transactions table nor graphs, SURVEY.md §2.3); these extend the
training-data-pipeline surface — co-occurrence statistics for retrieval
/ recommendation corpora, hop-bounded reachability for graph curation,
CDC diffs for incremental dataset refresh, and negative sampling for
contrastive training pairs.

Exactness follows registry conventions: all counts/ratios stay in
BIGINT (lift is reported in ppm via positive-integer floordiv — Spark
``div`` == DuckDB ``//``), sums accumulate in DECIMAL(28,6) and cast to
DOUBLE once, missing sides coalesce to sentinels, and the one sampling
primitive is the shared md5 lottery (ext/hashing.py), never an RNG.

100-TB shapes:
- basket pairs: the a-priori prune (items below min-support cannot
  form a frequent pair) runs BEFORE the pair self-join, so the
  quadratic step only sees frequent items; the self-join is
  co-partitioned on the basket key (pairs never cross baskets) and the
  pair aggregate partial-combines map-side.  Hot baskets are bounded
  by the per-order line count (TPC-H ≤ 7 per SF rule; a retail-scale
  variant would cap basket width the same way the dedup family caps
  shingle df).
- BFS: frontier expansion is one co-partitioned join per hop with the
  level set anti-joined out — O(diameter) rounds, each
  localCheckpoint-pinned so the lazy plan stays flat (the
  graph.py/iterative.py convention); the driver never sees a node.
- snapshot diff: two filtered aggregates (each with its time predicate
  pushed to the scan — the partition-pruning analog of reading two
  table versions) and ONE co-partitioned full outer join on the key.
- negative sampling: the candidate grid is built by broadcasting the
  item vocabulary (bounded here; at web-scale item counts the same
  shape buckets the vocabulary and samples candidates per bucket
  before the anti-join), the observed-pairs anti-join is
  co-partitioned on the entity key, and the per-entity lottery rank
  is a window over at most |vocabulary| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import h60, h60_sql

LIFT_PPM = 1_000_000


# ---------------------------------------------------------------------------
# shared graph builders (one definition per engine, every consumer in
# this module reads these — a tweak like basket-width capping lands in
# exactly two places, never silently diverging from the oracles)
# ---------------------------------------------------------------------------


def _basket_items(
    lineitem: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct (basket, item) pairs, localCheckpoint-pinned — every
    caller consumes this frame more than once (edge build + nodes +
    marginals), so one materialization replaces repeated scans."""
    return (
        lineitem.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .localCheckpoint()
    )


def _copurchase_edges(items: DataFrame, weighted: bool) -> DataFrame:
    """Directed co-purchase edges from the pinned items frame: one
    (src, dst) per co-basket item pair — weighted with the shared-
    basket count, or distinct pairs.  Co-partitioned self-join on the
    basket key (pairs never cross baskets), localCheckpoint-pinned for
    the callers' per-round reuse."""
    a = items.alias("a")
    b = items.alias("b")
    joined = (
        a.join(b, "basket")
        .filter(F.col("a.item") != F.col("b.item"))
    )
    if weighted:
        edges = joined.groupBy(
            F.col("a.item").alias("src"), F.col("b.item").alias("dst")
        ).agg(F.count("*").cast("long").alias("w"))
    else:
        edges = joined.select(
            F.col("a.item").alias("src"), F.col("b.item").alias("dst")
        ).distinct()
    # Pinned hash-partitioned on src (round 16, guide §2.4): both
    # iterative consumers join this frame on src EVERY round (BFS's
    # frontier expand, LPA's vote send), so the partitioning surviving
    # the checkpoint turns a per-round Exchange of the FAT edge side
    # into one repartition at build time.
    #
    # SKEW CAVEAT (ADVICE r16): per-src degree here is NOT bounded by
    # construction — it is the sum of co-basket partners over every
    # basket containing src.  Basket width is capped (TPC-H <= 7
    # lines/order) but a catalog-popular item appears in MANY baskets,
    # so on a real power-law catalog one src key can own a large slice
    # of the edge list, and a pre-partitioned RDD side forfeits AQE
    # skew-splitting in every BFS/LPA round (the dedup-graph failure
    # mode graph.py documents and reverted).  TPC-H item popularity is
    # near-uniform (measured max/median src degree ~2x at sf0.1), which
    # is why the pin wins on this data; for skewed catalogs keep the
    # edges on plain localCheckpoint + per-round AQE, or salt src.
    from ..tables import pinned_by

    return pinned_by(edges, "src")


def user_item_frame(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Distinct (user, props.$.k) interactions with NULL items dropped,
    localCheckpoint-pinned — the single definition of the user-item
    frame shared by negative sampling and the CF similarity query (a
    null-handling or cast change lands once, never drifting between
    consumers)."""
    return (
        events.select(
            F.col(key_col),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
        .localCheckpoint()
    )


def user_item_cte(table: str = "events", key_col: str = "user_id") -> str:
    """DuckDB mirror of ``user_item_frame`` exposing ``ui(user_id, item)``.

    TRY_CAST, not ``::INT``: Spark's get_json_object + int cast yields
    NULL on a non-numeric ``k`` (the row is dropped by the filter)
    while a plain DuckDB cast would throw — TRY_CAST makes both engines
    drop unparseable values identically."""
    return f"""ui AS (
      SELECT DISTINCT {key_col},
             TRY_CAST(json_extract_string(props, '$.k') AS INT) AS item
      FROM {table}
      WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL)"""


def _items_cte(table: str, basket_col: str, item_col: str) -> str:
    return (
        f"items AS (SELECT DISTINCT {basket_col} AS basket, "
        f"{item_col} AS item FROM {table})"
    )


def _edges_cte(weighted: bool) -> str:
    if weighted:
        return """edges AS (
          SELECT a.item AS src, b.item AS dst, count(*)::BIGINT AS w
          FROM items a JOIN items b ON a.basket = b.basket AND a.item <> b.item
          GROUP BY 1, 2)"""
    return """edges AS (
          SELECT DISTINCT a.item AS src, b.item AS dst
          FROM items a JOIN items b ON a.basket = b.basket AND a.item <> b.item)"""


# ---------------------------------------------------------------------------
# market-basket pair mining (a-priori pruned co-occurrence + lift)
# ---------------------------------------------------------------------------


def basket_pair_lift(
    lineitem: DataFrame,
    min_support: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Frequent item pairs over baskets with integer-exact lift:
    (item_a < item_b) pairs co-occurring in >= ``min_support`` baskets,
    reported with both marginals and
    ``lift_ppm = (pair_n * n_baskets * 1e6) div (n_a * n_b)``.

    The a-priori prune is lossless: support(a,b) <= min(support(a),
    support(b)), so items below min_support are dropped before the
    pair join ever forms — the frequent-pair answer is unchanged while
    the quadratic step shrinks to the frequent-item sub-basket.
    """
    items = _basket_items(lineitem, basket_col, item_col)
    freq = items.groupBy("item").agg(F.count("*").cast("long").alias("n_item"))
    frequent = freq.filter(F.col("n_item") >= min_support)
    pruned = items.join(
        F.broadcast(frequent.select("item")), "item", "left_semi"
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        # merge hint: pruned descends from the _basket_items
        # localCheckpoint, whose stats read small — without the hint
        # the planner broadcast one CORPUS-SIZED side of this
        # interactions self-join (round-6 plan audit, the driver-OOM
        # shape). Sort-merge on the basket key keeps both sides
        # shuffled/co-partitioned; AQE may still downgrade to
        # broadcast from true runtime sizes.
        a.join(b.hint("merge"), "basket")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("long").alias("pair_n"))
        .filter(F.col("pair_n") >= min_support)
    )
    n_baskets = items.select("basket").distinct().agg(
        F.count("*").cast("long").alias("n_baskets")
    )
    fa = frequent.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    fb = frequent.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_n",
            "n_a",
            "n_b",
            # the numerator can exceed BIGINT at real basket counts
            # (pair_n * n_baskets * 1e6); DECIMAL(38,0) / HUGEINT keep
            # the floordiv exact on both engines to ~1e38
            F.expr(
                f"CAST((CAST(pair_n AS DECIMAL(38,0))"
                f" * CAST(n_baskets AS DECIMAL(38,0)) * {LIFT_PPM})"
                f" div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))"
                f" AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def basket_pair_lift_sql(
    table: str = "lineitem",
    min_support: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> str:
    return f"""
    WITH {_items_cte(table, basket_col, item_col)},
    freq AS (
      SELECT item, count(*)::BIGINT AS n_item FROM items GROUP BY 1
      HAVING count(*) >= {min_support}),
    pruned AS (
      SELECT i.basket, i.item FROM items i JOIN freq USING (item)),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS pair_n
      FROM pruned a JOIN pruned b ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= {min_support}),
    nb AS (SELECT count(DISTINCT basket)::BIGINT AS n_baskets FROM items)
    SELECT p.item_a, p.item_b, p.pair_n, fa.n_item AS n_a, fb.n_item AS n_b,
           ((p.pair_n::HUGEINT * nb.n_baskets * {LIFT_PPM})
            // (fa.n_item::HUGEINT * fb.n_item))::BIGINT
             AS lift_ppm
    FROM pairs p
    JOIN freq fa ON fa.item = p.item_a
    JOIN freq fb ON fb.item = p.item_b
    CROSS JOIN nb
    """


# ---------------------------------------------------------------------------
# multi-source BFS (hop levels over the co-purchase graph)
# ---------------------------------------------------------------------------


def copurchase_bfs_hops(
    lineitem: DataFrame,
    n_seeds: int = 3,
    max_hops: int = 3,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Multi-source BFS hop levels over the item co-purchase graph
    (items adjacent iff they share a basket), seeded at the ``n_seeds``
    highest-support items (ties by item id).  One row per node:
    (part, hops), hops in 0..max_hops or -1 if unreached.

    Each round joins only the NEW frontier against the edge list and
    anti-joins the already-levelled set, so work per round is
    proportional to the frontier's out-edges — the textbook O(diameter)
    distributed BFS.  The first-discovery hop is the minimum distance
    by BFS invariant, which is what the oracle's min-over-all-walks
    recursive CTE computes.

    Join pins: frontier and levels both descend from per-round
    ``localCheckpoint``s whose stats read small, yet one hop from a
    high-support seed the frontier IS most of a co-purchase graph —
    so the expand join and the seen-set anti-join are
    ``shuffle_hash``-pinned (the graph.py round-6 hazard), as is the
    final node-levels outer join.  Gate:
    tests/test_plans.py::test_bfs_expand_shape.
    """
    items = _basket_items(lineitem, basket_col, item_col)
    edges = _copurchase_edges(items, weighted=False)
    nodes = items.select("item").distinct()
    seeds = (
        items.groupBy("item")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "item")
        .limit(n_seeds)
        .select("item")
    )
    from ..tables import pinned_by

    levels = seeds.withColumn("hop", F.lit(0).cast("long")).localCheckpoint()
    frontier = levels.select("item")
    for i in range(1, max_hops + 1):
        # nxt's checkpoint is LAZY (the graph.py round-13 probe-fusion
        # pattern): the eager union checkpoint below is the round's one
        # materialization job and persists nxt's blocks as it computes
        # them; next round's frontier then reads the persisted blocks.
        # Eager here paid a second job per round for nothing.
        nxt = bfs_expand(frontier, edges, levels, i).localCheckpoint(eager=False)
        # pinned hash-partitioned on item (round 16, guide §2.4): the
        # seen-set anti-join probes this frame on item every later
        # round — with the expand's distinct already partitioned on
        # item, the anti-join is then exchange-free on both sides, and
        # the final node-levels outer join reads it co-partitioned too.
        levels = pinned_by(levels.union(nxt), "item")
        frontier = nxt.select("item")
    return nodes.join(levels.hint("shuffle_hash"), "item", "left").select(
        F.col("item").alias("part"),
        F.coalesce(F.col("hop"), F.lit(-1)).cast("long").alias("hops"),
    )


def bfs_expand(
    frontier: DataFrame, edges: DataFrame, levels: DataFrame, hop: int
) -> DataFrame:
    """One BFS expansion: frontier × out-edges → distinct targets →
    drop already-levelled → stamp the hop.  Both joins shuffle_hash-
    pinned: every input descends from a localCheckpoint (stats read
    small) while frontier/levels can be node-sized, so leaving the
    broadcast election to the lying stats risks the measured round-6
    OOM shape.  Exposed separately so the per-round plan is
    gate-able."""
    return (
        frontier.hint("shuffle_hash")
        .join(edges, frontier["item"] == edges["src"])
        .select(F.col("dst").alias("item"))
        .distinct()
        .join(levels.select("item").hint("shuffle_hash"), "item", "left_anti")
        .withColumn("hop", F.lit(hop).cast("long"))
    )


def copurchase_bfs_hops_sql(
    table: str = "lineitem",
    n_seeds: int = 3,
    max_hops: int = 3,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> str:
    """Oracle: recursive-CTE walk enumeration bounded at ``max_hops``;
    min(hop) per node is the BFS distance (every walk length >= the
    shortest is enumerated, UNION dedupes (node, hop) pairs so the
    recursion terminates on cycles)."""
    return f"""
    WITH RECURSIVE
    {_items_cte(table, basket_col, item_col)},
    {_edges_cte(weighted=False)},
    seeds AS (
      SELECT item FROM (SELECT item, count(*) AS n FROM items GROUP BY 1)
      ORDER BY n DESC, item LIMIT {n_seeds}),
    reach(item, hop) AS (
      SELECT item, 0::BIGINT FROM seeds
      UNION
      SELECT e.dst, r.hop + 1 FROM reach r
      JOIN edges e ON e.src = r.item
      WHERE r.hop < {max_hops}),
    lv AS (SELECT item, min(hop) AS hops FROM reach GROUP BY 1)
    SELECT n.item AS part, coalesce(lv.hops, -1)::BIGINT AS hops
    FROM (SELECT DISTINCT item FROM items) n
    LEFT JOIN lv ON lv.item = n.item
    """


# ---------------------------------------------------------------------------
# CDC snapshot diff (windowed per-key state, full-outer classify)
# ---------------------------------------------------------------------------


def snapshot_diff(
    events: DataFrame,
    cut_a: str,
    cut_b: str,
    window_days: int = 1,
    key_col: str = "user_id",
) -> DataFrame:
    """Change-data-capture diff between two per-key activity snapshots:
    state = (n_events, exact sum of value) over the ``window_days``-day
    window starting at each cut.  One row per key present in either
    snapshot, classified ``added`` (new side only) / ``removed`` (old
    side only) / ``changed`` / ``unchanged``; absent sides report the
    -1 / -1.0 sentinels.

    The equality test compares DECIMAL-accumulated sums cast to DOUBLE
    — bit-exact on both engines, so 'unchanged' is well-defined.  The
    window bounds are pure epoch-microsecond comparisons (the loader's
    ts carries the wall clock as its instant): a timestamp-literal
    compare would shift with the session timezone.
    """
    from datetime import datetime, timezone

    def snap(cut: str) -> DataFrame:
        lo_us = int(
            datetime.strptime(cut, "%Y-%m-%d")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )
        hi_us = lo_us + window_days * 86_400_000_000
        return (
            events.filter(
                (F.unix_micros("ts") >= F.lit(lo_us))
                & (F.unix_micros("ts") < F.lit(hi_us))
            )
            .groupBy(key_col)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(28,6)"))
                .cast("double")
                .alias("s"),
            )
        )

    old = snap(cut_a).select(
        F.col(key_col), F.col("n").alias("old_n"), F.col("s").alias("old_sum")
    )
    new = snap(cut_b).select(
        F.col(key_col), F.col("n").alias("new_n"), F.col("s").alias("new_sum")
    )
    j = old.join(new, key_col, "full_outer")
    return j.select(
        F.col(key_col),
        F.when(F.col("old_n").isNull(), F.lit("added"))
        .when(F.col("new_n").isNull(), F.lit("removed"))
        .when(
            (F.col("old_n") == F.col("new_n"))
            & (F.col("old_sum") == F.col("new_sum")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        F.coalesce("old_n", F.lit(-1)).cast("long").alias("old_n"),
        F.coalesce("old_sum", F.lit(-1.0)).alias("old_sum"),
        F.coalesce("new_n", F.lit(-1)).cast("long").alias("new_n"),
        F.coalesce("new_sum", F.lit(-1.0)).alias("new_sum"),
    )


def snapshot_diff_sql(
    cut_a: str,
    cut_b: str,
    window_days: int = 1,
    table: str = "events",
    key_col: str = "user_id",
) -> str:
    def snap(cut: str) -> str:
        return f"""
          SELECT {key_col}, count(*)::BIGINT AS n,
                 sum(value::DECIMAL(28,6))::DOUBLE AS s
          FROM {table}
          WHERE ts >= TIMESTAMP '{cut}'
            AND ts < TIMESTAMP '{cut}' + INTERVAL {window_days} DAY
          GROUP BY 1"""

    return f"""
    WITH old AS ({snap(cut_a)}), new AS ({snap(cut_b)})
    SELECT coalesce(old.{key_col}, new.{key_col}) AS {key_col},
           CASE WHEN old.n IS NULL THEN 'added'
                WHEN new.n IS NULL THEN 'removed'
                WHEN old.n = new.n AND old.s = new.s THEN 'unchanged'
                ELSE 'changed' END AS change_type,
           coalesce(old.n, -1)::BIGINT AS old_n,
           coalesce(old.s, -1.0)::DOUBLE AS old_sum,
           coalesce(new.n, -1)::BIGINT AS new_n,
           coalesce(new.s, -1.0)::DOUBLE AS new_sum
    FROM old FULL OUTER JOIN new ON old.{key_col} = new.{key_col}
    """


# ---------------------------------------------------------------------------
# negative sampling (anti-join grid + md5 lottery)
# ---------------------------------------------------------------------------


def negative_sample(
    events: DataFrame,
    k: int = 3,
    key_col: str = "user_id",
    salt: str = "negsamp",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each entity, ``k`` items (here: ``props.k`` values) the entity
    was NEVER observed with, drawn by the shared md5 lottery — the
    smallest-hash negatives win, ties broken by item.  Output
    (user_id, item, rk) with rk in 1..k.

    Determinism makes the sample reproducible across engines AND
    across re-runs on re-partitioned data — the property an RNG-based
    sampler loses the moment the partitioning changes.

    Rows whose props lack a numeric ``k`` are dropped BEFORE the grid:
    a NULL item would survive the anti-join on both engines but sort
    at opposite ends of the lottery window (Spark NULLS FIRST vs
    DuckDB NULLS LAST), silently diverging the sample.  The parsed
    projection is localCheckpoint-pinned — entities, vocabulary, and
    observed pairs all read it, so one scan+parse replaces three.
    """
    observed = user_item_frame(events, key_col)
    entities = observed.select(key_col).distinct()
    vocab = observed.select("item").distinct()
    grid = entities.crossJoin(F.broadcast(vocab))
    # merge hint: observed descends from the user_item_frame
    # localCheckpoint (stats read small), and without it the planner
    # broadcast the CORPUS-SIZED interaction frame into the anti-join
    # (round-6 plan audit). Sort-merge keeps the anti-join
    # co-partitioned on (user, item) as the docstring promises.
    negs = grid.join(observed.hint("merge"), [key_col, "item"], "left_anti")
    lot = h60(
        F.concat(
            F.lit(f"{salt}:"),
            F.col(key_col).cast("string"),
            F.lit(":"),
            F.col("item").cast("string"),
        )
    )
    w = Window.partitionBy(key_col).orderBy(lot.asc(), F.col("item").asc())
    return (
        negs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(key_col, F.col("item").cast("long").alias("item"), "rk")
    )


def negative_sample_sql(
    k: int = 3, table: str = "events", key_col: str = "user_id", salt: str = "negsamp"
) -> str:
    h = h60_sql(f"'{salt}:'||{key_col}::VARCHAR||':'||item::VARCHAR")
    return f"""
    WITH {user_item_cte(table, key_col)},
    entities AS (SELECT DISTINCT {key_col} FROM ui),
    vocab AS (SELECT DISTINCT item FROM ui),
    observed AS (SELECT {key_col}, item FROM ui),
    negs AS (
      SELECT e.{key_col}, v.item
      FROM entities e CROSS JOIN vocab v
      WHERE NOT EXISTS (SELECT 1 FROM observed o
                        WHERE o.{key_col} = e.{key_col} AND o.item = v.item))
    SELECT {key_col}, item::BIGINT AS item, rk FROM (
      SELECT {key_col}, item,
             row_number() OVER (PARTITION BY {key_col}
                                ORDER BY {h}, item)::BIGINT AS rk
      FROM negs)
    WHERE rk <= {k}
    """


# ---------------------------------------------------------------------------
# label propagation (deterministic, fixed rounds)
# ---------------------------------------------------------------------------


def lpa_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous label-propagation round: weighted neighbor vote
    → per-node argmax (ties to the smallest label) → adopt, keeping
    the old label where no vote arrived.  Inside the loop the label
    frame always descends from a ``localCheckpoint`` whose LogicalRDD
    stats read small while the frame is NODE-SIZED (the item
    vocabulary — corpus-scale on a real catalog), so both label-side
    joins are ``shuffle_hash``-pinned against the measured round-6
    mis-broadcast hazard (graph.py's peel_round/cc_send_min contract).
    Exposed separately so the per-round plan is gate-able
    (tests/test_plans.py::test_lpa_round_shape)."""
    votes = (
        edges.join(
            labels.select(F.col("item").alias("src"), "lbl").hint("shuffle_hash"),
            "src",
        )
        .groupBy(F.col("dst").alias("item"), "lbl")
        .agg(F.sum("w").cast("long").alias("ws"))
    )
    best = (
        votes.groupBy("item")
        .agg(
            F.min(
                F.struct((-F.col("ws")).alias("nws"), F.col("lbl").alias("l"))
            ).alias("b")
        )
        .select("item", F.col("b.l").alias("new_lbl"))
    )
    return labels.join(best.hint("shuffle_hash"), "item", "left").select(
        "item", F.coalesce("new_lbl", "lbl").alias("lbl")
    )


def label_propagation(
    lineitem: DataFrame,
    rounds: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Community detection by deterministic label propagation over the
    weighted co-purchase graph (edge weight = number of shared
    baskets): labels start as the node id; each round every node
    adopts the label with the greatest incoming weight among its
    neighbors' current labels (ties to the smallest label; isolated
    nodes keep their own).  Fixed ``rounds`` synchronous rounds, so
    both engines run the identical update — an iterative community
    algorithm under the full hash gate, like PageRank/k-means
    (ext/iterative.py).

    Scale: the label frame is node-sized and joins the edge list
    co-partitioned on src (shuffle_hash-pinned in :func:`lpa_round` —
    checkpoint-descended stats must not elect it for broadcast); the
    vote aggregate partial-combines on (dst, label) map-side; every
    round is localCheckpoint-pinned so the plan depth stays O(1).
    """
    from ..tables import pinned

    items = _basket_items(lineitem, basket_col, item_col)
    edges = _copurchase_edges(items, weighted=True)
    # partitioning-preserving pins (round 16, guide §2.4): nodes keeps
    # the distinct's hashpartitioning(item), and every round's label
    # frame keeps its item-keyed join-output partitioning — so the
    # vote-send join reads edges co-partitioned on src (the pinned_by
    # in _copurchase_edges) against labels already partitioned on
    # item==src, and the adopt join reads labels against the argmax's
    # groupBy(item) output, all exchange-free; the only per-round
    # Exchanges left are the two narrow vote aggregates.
    nodes = pinned(items.select("item").distinct())
    labels = nodes.select("item", F.col("item").alias("lbl"))
    for _ in range(rounds):
        labels = pinned(lpa_round(edges, labels))
    return labels.select(
        F.col("item").alias("part"), F.col("lbl").cast("long").alias("label")
    )


def label_propagation_sql(
    table: str = "lineitem",
    rounds: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> str:
    parts = [
        _items_cte(table, basket_col, item_col),
        _edges_cte(weighted=True),
        "nodes AS (SELECT DISTINCT item FROM items)",
        "l0 AS (SELECT item, item AS lbl FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""b{r} AS (
              SELECT item, lbl FROM (
                SELECT e.dst AS item, l.lbl, sum(e.w) AS ws,
                       row_number() OVER (PARTITION BY e.dst
                                          ORDER BY sum(e.w) DESC, l.lbl) AS rn
                FROM edges e JOIN l{r - 1} l ON l.item = e.src
                GROUP BY e.dst, l.lbl)
              WHERE rn = 1)"""
        )
        parts.append(
            f"""l{r} AS (
              SELECT n.item, coalesce(b.lbl, p.lbl) AS lbl
              FROM nodes n
              LEFT JOIN b{r} b ON b.item = n.item
              JOIN l{r - 1} p ON p.item = n.item)"""
        )
    joined = ",\n".join(parts)
    return f"""WITH {joined}
    SELECT item AS part, lbl::BIGINT AS label FROM l{rounds}"""


# ---------------------------------------------------------------------------
# a-priori level 3 (frequent triples)
# ---------------------------------------------------------------------------


def basket_triple_support(
    lineitem: DataFrame,
    min_support: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Frequent item TRIPLES — the full a-priori recursion one level
    past the pair miner: a triple can only be frequent if all three of
    its sub-pairs are, so the basket-co-partitioned three-way join is
    filtered by broadcast semi-joins against the frequent-PAIR set
    before anything counts.  Both prunes (level-1 items, level-2
    pairs) are lossless, so the oracle is the naive unpruned triple
    join with the same HAVING.
    """
    items = _basket_items(lineitem, basket_col, item_col)
    freq = (
        items.groupBy("item")
        .agg(F.count("*").alias("n_item"))
        .filter(F.col("n_item") >= min_support)
    )
    pruned = items.join(F.broadcast(freq.select("item")), "item", "left_semi")
    a, b = pruned.alias("a"), pruned.alias("b")
    # ONE materialization of the quadratic basket pair join feeds both
    # the pair-support aggregate and the candidate stream (the module's
    # one-materialization convention — re-deriving it would run the
    # dominant stage twice). merge hints on the interaction-frame join
    # sides here and below: pruned/cand descend from localCheckpoints
    # whose stats read small, and the planner otherwise broadcast a
    # corpus-sized side (round-6 plan audit, the driver-OOM shape).
    cand = (
        a.join(b.hint("merge"), "basket")
        .filter(F.col("a.item") < F.col("b.item"))
        .select("basket", F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .localCheckpoint()
    )
    pairs2 = (
        cand.groupBy(F.col("ia").alias("pa"), F.col("ib").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_support)
        .select("pa", "pb")
        .localCheckpoint()  # semi-joined three times below
    )
    ab = cand.join(
        F.broadcast(pairs2),
        (F.col("ia") == F.col("pa")) & (F.col("ib") == F.col("pb")),
        "left_semi",
    )
    c = pruned.alias("c")
    triples = (
        ab.join(c.hint("merge"), "basket")
        .filter(F.col("c.item") > F.col("ib"))
        .select("basket", "ia", "ib", F.col("c.item").alias("ic"))
        .join(
            F.broadcast(pairs2),
            (F.col("ib") == F.col("pa")) & (F.col("ic") == F.col("pb")),
            "left_semi",
        )
        .join(
            F.broadcast(pairs2),
            (F.col("ia") == F.col("pa")) & (F.col("ic") == F.col("pb")),
            "left_semi",
        )
    )
    return (
        triples.groupBy(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            F.col("ic").alias("item_c"),
        )
        .agg(F.count("*").cast("long").alias("triple_n"))
        .filter(F.col("triple_n") >= min_support)
    )


def basket_triple_support_sql(
    table: str = "lineitem",
    min_support: int = 2,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> str:
    """Oracle: the naive three-way join — the level prunes are
    lossless, so pruned and naive answers must match exactly."""
    return f"""
    WITH {_items_cte(table, basket_col, item_col)}
    SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
           count(*)::BIGINT AS triple_n
    FROM items a
    JOIN items b ON a.basket = b.basket AND a.item < b.item
    JOIN items c ON c.basket = a.basket AND b.item < c.item
    GROUP BY 1, 2, 3
    HAVING count(*) >= {min_support}
    """
