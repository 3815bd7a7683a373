"""Graph algorithms over DataFrames: connected components (iterative)
and triangle counting (one plan).

The one algorithm class Catalyst cannot express in a single plan —
fixpoint iteration. The driver coordinates rounds (Pregel-style) but
touches only a convergence scalar per round; all data movement stays
distributed. Used for transitive near-duplicate clustering: LSH pair
output gives edges, components give the true duplicate groups when
similarity chains (a~b, b~c, a!~c) must merge.

Scale behavior: min-label propagation converges in O(diameter) rounds
(near-dup graphs are clique-ish — small diameter); each round is one
join + one aggregate on the same key. ``localCheckpoint`` truncates the
lineage every round — without it the plan doubles per iteration and
planning time, not data, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cc_send_min(e: DataFrame, labels: DataFrame) -> DataFrame:
    """One connected-components round: min-label propagation plus ONE
    pointer-shortcut hop.

    Send phase: every vertex's current label crosses its out-edges and
    folds with the vertex's own label by min.  Shortcut phase
    (pointer doubling, round 12): the folded label is itself a vertex
    id ``u`` in the same component, so follow it once —
    ``label(v) := label(u)`` — which at most DOUBLES the hop distance
    covered per round; the loop converges in O(log diameter) rounds
    instead of O(diameter).  Measured on the fused multimodal pair
    graph at sf0.1 (diameter ~13 from MinHash band chains): 14 rounds
    → 9, CC wall 6.9 → ~5 s (ids are not aligned along the chains, so
    one shortcut hop compresses less than ideal doubling — still
    logarithmic: a planted 10,000-hop chain converges inside 20
    rounds); at 100× a chain-y corpus is exactly where O(diameter)
    rounds would bite.  Both the fixpoint and the trajectory stay
    deterministic: labels only decrease, every label is a
    same-component vertex id, and a stable point forces every label
    to the component min (the same fixpoint as plain min-label
    propagation — see test_cc_long_chain_logarithmic_rounds).

    Both joins are ``shuffle_hash``-pinned: the label frame is
    dup-graph-sized (corpus-scale on a dup-heavy corpus) and, inside
    the loop, always descends from a
    ``localCheckpoint`` whose LogicalRDD stats read small — the
    measured round-6 hazard where the planner wrongly broadcasts a
    corpus-sized frame (``peel_round``'s contract).  The fold is
    localCheckpointed before the shortcut because the shortcut join
    consumes it TWICE (probe and parent build) — un-pinned, the send
    join + aggregate would execute twice per round (caught by the
    cc_round plan gate's join count).  Split into
    :func:`cc_fold_min` / :func:`cc_shortcut` so each stage's plan
    shape is gate-able (the loop's checkpoints hide them from the
    registered query's final plan)."""
    return cc_shortcut(cc_fold_min(e, labels).localCheckpoint())


def cc_fold_min(e: DataFrame, labels: DataFrame) -> DataFrame:
    """The send+fold stage: one shuffle_hash edge-label join plus one
    map-side-combined min aggregate."""
    nbr = e.join(labels.hint("shuffle_hash"), e.src == labels.id).select(
        F.col("dst").alias("id"), "label"
    )
    return labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))


def cc_shortcut(folded: DataFrame) -> DataFrame:
    """The pointer-shortcut stage over a MATERIALIZED fold:
    ``label(v) := label(label(v))``.  The inner join is total — every
    label value is a vertex id and the fold has one row per vertex —
    and ``plabel <= label`` because labels only decrease."""
    parent = folded.select(
        F.col("id").alias("label"), F.col("label").alias("plabel")
    )
    return folded.join(parent.hint("shuffle_hash"), "label").select(
        "id", F.col("plabel").alias("label")
    )


def cc_label_sum(labels: DataFrame):
    """The convergence probe for NUMERIC vertex ids, joinless
    (round 12): every step of the round is per-vertex NON-INCREASING
    (the min-fold includes the vertex's own label; the shortcut
    substitutes ``label(u) <= u = label(v)``), so the labels changed
    this round **iff** the label sum decreased — one map-side-combined
    aggregate replaces the new-vs-old equi-join the probe used to pay
    (a corpus-sized shuffle per round at 100×).  DECIMAL(38,0)
    accumulation: exact at any corpus size, and Spark 4 ANSI mode
    would abort a silently overflowing BIGINT sum anyway.  Non-numeric
    ids (entity resolution's canonical NAMES) have no exact monotone
    scalar, so they keep the :func:`cc_changed` join probe — a sum of
    label hashes would be order-insensitive but admits collisions,
    and the engine does not trade exactness for a per-round join.

    NULL handling (ADVICE r12): SUM over an empty frame is NULL, and a
    non-ANSI decimal(38,0) overflow would ALSO return NULL — and
    ``None == None`` would silently declare convergence on
    still-changing labels.  The empty case is a real 0 (no vertices, no
    change possible); the overflow case raises instead.  Headroom
    argument: labels are 64-bit ids, |sum| <= n_vertices * 2^63 < 1e38
    for any corpus below ~1e19 rows, so the raise is unreachable in
    practice — it exists so the failure mode is a loud error, never a
    wrong cluster."""
    row = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    if row["n"] == 0:
        return 0
    if row["s"] is None:
        raise ArithmeticError(
            "cc_label_sum overflowed decimal(38,0) — convergence probe "
            "cannot be trusted; this needs >~1e19 vertices"
        )
    return row["s"]


def cc_changed(new_labels: DataFrame, labels: DataFrame) -> DataFrame:
    """The convergence probe for NON-NUMERIC vertex ids: rows whose
    label changed this round.  Both sides are corpus-sized checkpoint
    descendants, so the join is ``shuffle_hash``-pinned for the same
    reason as :func:`cc_send_min` (a mis-broadcast labels frame here
    is an executor OOM at 100×)."""
    return (
        new_labels.withColumnRenamed("label", "new_label")
        .join(labels.hint("shuffle_hash"), "id")
        .filter(F.col("new_label") != F.col("label"))
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    shortcut_from: int = 3,
) -> DataFrame:
    """(id, component) with component = min vertex id reachable in the
    undirected graph. Isolated vertices are their own component.

    Each round sends every vertex's current label to its neighbors and
    takes the min; converged when no label changes. Deterministic for
    any partitioning (min is commutative/associative).  Both per-round
    joins run through :func:`cc_send_min`, which pins ``shuffle_hash``
    against the checkpoint-descended-stats broadcast hazard (see its
    docstring); convergence is detected by the joinless
    :func:`cc_label_sum` monotone probe (gate:
    tests/test_plans.py::test_cc_round_shape).

    Raises RuntimeError if ``max_iter`` rounds pass without convergence
    — returning silently non-converged labels would hand transitive
    dedup wrong clusters with no signal (a chain longer than the bound
    needs more rounds, not a wrong answer).  Rounds before
    ``shortcut_from`` run the plain min-label fold only; from
    ``shortcut_from`` on, :func:`cc_send_min` adds the pointer-shortcut
    hop, so convergence takes O(shortcut_from + log diameter) rounds
    (a planted 10,000-hop chain fits the default bound; see the
    adaptive-shortcut comment in the loop for why small-diameter
    graphs should not pay the extra join).  The full
    large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") remains the documented
    escalation if a graph ever exhausts even that.
    """
    # Deliberately NOT pre-partitioned by src (round-16 A/B): pinning e
    # by src (tables.pinned_by) looked like the §2.4 win — the send
    # join probes e on src every round in its own job — but a
    # pre-partitioned RDD side cannot be AQE skew-split, and dup-pair
    # graphs are exactly the skewed-src case: dedup_multimodal_keep_set
    # measured 7.9 -> 15.8 s with the pin (both one-step and
    # pin-of-pin variants).  The per-round src Exchange under AQE IS
    # the skew handling; it stays.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    verts = vertices.select(F.col(id_col).alias("id"))
    # The loop runs over TOUCHED vertices only (round 12): a vertex
    # with no edges is trivially its own component, so it never needs
    # to ride the per-round joins.  On a dedup corpus the pair graph is
    # a small fraction of the corpus — at 100 TB this turns every
    # per-round shuffle from corpus-sized to dup-graph-sized.  e is
    # symmetric, so src alone covers every endpoint; shuffle_hash for
    # the usual checkpoint-descended-stats reason.
    touched = e.select(F.col("src").alias("id")).distinct()
    labels = (
        verts.join(touched.hint("shuffle_hash"), "id", "left_semi")
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    # .distinct() restores the one-row-per-id output contract for
    # duplicate-id inputs (ADVICE r12): touched vertices collapse in the
    # first fold round's groupBy('id'), but edge-free vertices bypass
    # the loop entirely, so their duplicates would survive to the
    # output.  Registered callers feed unique ids, so for them this
    # dedup shuffles already-unique rows once — off the iterative
    # loop's critical path (the union below is lazy until the caller
    # acts on the result).
    isolated = (
        verts.join(touched.hint("shuffle_hash"), "id", "left_anti")
        .distinct()
        .select("id", F.col("id").alias("label"))
    )

    from pyspark.sql import types as T

    numeric = isinstance(labels.schema["label"].dataType, T.NumericType)
    # No upfront probe job (round 13): round 1 can never be convergent
    # on a graph with a real edge — a symmetric edge (a, b), a != b,
    # always lowers max(a, b)'s label, so the round-1 sum strictly
    # decreases and comparing it against the initial sum is a wasted
    # corpus scan + Spark job.  Degenerate graphs (no edges, or
    # self-loops only) just pay one extra no-change round over an empty
    # or tiny touched frame before the probe agrees — correct, and
    # cheaper than probing every real call.
    prev_sum = None
    for rnd in range(1, max_iter + 1):
        # Adaptive pointer-shortcut (round 13, VERDICT r12 ask #1): the
        # shortcut join + its fold checkpoint pay for themselves only
        # when labels must travel far — on the small-diameter clique-ish
        # graphs real dup families form, plain min-label converges
        # before round ``shortcut_from`` and never buys the extra join
        # (dedup_components' measured 1.35-1.8x regression when the
        # shortcut ran unconditionally).  Chains engage doubling from
        # round ``shortcut_from`` on, so convergence stays
        # O(shortcut_from + log diameter) — the fixpoint is identical
        # either way (both stages preserve the min-label fixpoint).
        stepped = (
            cc_send_min(e, labels)
            if rnd >= shortcut_from
            else cc_fold_min(e, labels)
        )
        # LAZY checkpoint: the convergence probe is the next action
        # anyway, so it materializes the round's labels and computes
        # the sum in ONE Spark job — the eager-checkpoint version paid
        # a separate materialization job per round, pure fixed overhead
        # at high round counts (the ×20 keep-set profile's dominant
        # term).  Subsequent rounds read the persisted partitions.
        new_labels = stepped.localCheckpoint(eager=False)
        if numeric:
            s = cc_label_sum(new_labels)
            done = s == prev_sum  # monotone labels: equal sum == no change
            prev_sum = s
        else:
            done = cc_changed(new_labels, labels).count() == 0
        labels = new_labels
        if done:
            return labels.union(isolated)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(labels still changing); raise max_iter"
    )


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph
    (vertices with no triangle are omitted).

    The classic two-join plan on ORIENTED edges: orient every edge
    low->high, join e1(a,b) x e2(b,c) into wedges a<b<c, then close
    each wedge against e3(a,c). Orientation makes each triangle match
    exactly once, and — the scale property — bounds the wedge count by
    sum(min(deg)^2) instead of sum(deg^2): the classic heavy-hitter
    mitigation for skewed degree distributions. Both joins are hash
    equi-joins; Catalyst broadcasts when a side is small.
    """
    lo = F.least(F.col(src_col), F.col(dst_col))
    hi = F.greatest(F.col(src_col), F.col(dst_col))
    # pin the oriented edge list: it is referenced THREE times (both
    # wedge sides + the closing join), and the caller's edge frame is
    # typically itself an expensive pair-generation pipeline (the LSH
    # banded joins), so the unpinned plan re-ran that pipeline per
    # reference (guide §1.2/§3.3; |E| rows, cheap to materialize).
    e = (
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    wedges = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )  # a-b, b-c with a<b<c
    tris = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).select("a", "b", "c")
    # one reference to the triangle frame: explode the vertex triple
    # instead of a 3-way union of projections (which re-ran BOTH joins
    # per branch) — identical multiset of (vertex) rows.
    per_vertex = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_vertex


def triangle_count_sql(edges_sql: str) -> str:
    """DuckDB mirror over an edge-list subquery (columns src, dst)."""
    return f"""
    WITH raw AS ({edges_sql}),
    e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ),
    tris AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT id, count(*) AS n_triangles
    FROM (SELECT a AS id FROM tris UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris)
    GROUP BY 1
    """


def peel_round(e: DataFrame, k: int) -> DataFrame:
    """One synchronous k-core peel round over an (src, dst) edge frame:
    drop every edge with an endpoint whose current degree is < k.  One
    map-side-combined degree aggregate plus two hash joins keyed on the
    endpoint — both keep-side joins shuffle_hash-pinned, because in the
    iterative loop every side descends from a localCheckpoint whose
    LogicalRDD stats read small while the node frame is corpus-sized
    (the round-6 broadcast hazard).  Exposed separately so the per-round
    plan shape is gate-able (the loop's checkpoints hide it from the
    registered query's final plan)."""
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    keep = deg.filter(F.col("deg") >= k).select("node")
    return (
        e.join(keep.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .join(keep.withColumnRenamed("node", "dst").hint("shuffle_hash"), "dst")
        .select("src", "dst")
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, core_deg): the subgraph surviving ``rounds`` synchronous
    peeling rounds at threshold ``k`` — each round drops every vertex
    whose degree in the CURRENT surviving subgraph is < k, with
    core_deg the vertex's final within-core degree.  Once peeling
    reaches its fixpoint the result IS the classic k-core (the unique
    maximal subgraph with min degree >= k); ``rounds`` bounds the peel
    depth so both engines compute the identical deterministic result
    even on a pathological chain that would need more rounds (the
    registered fixture converges well inside the bound — pinned by
    test).  Stops early when an edge-count round is a no-op: the
    surviving set is then stable, so extra rounds cannot change it and
    the early exit is result-identical to the oracle's full unroll.

    Scale: each round is one map-side-combined degree aggregate plus
    two hash joins keyed on the endpoint (both sides
    checkpoint-descended — shuffle_hash-pinned so the node-sized keep
    frame never broadcasts at corpus scale); localCheckpoint per round
    truncates the lineage, the iterative-algorithm contract shared
    with connected_components/label propagation."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .localCheckpoint()
    )
    prev = e.count()
    for _ in range(rounds):
        # LAZY checkpoint + count probe fuse into ONE Spark job per
        # round (the connected_components round-13 pattern): the count
        # materializes the marked RDD, and the next round's three
        # reads of `e` (degree union's two arms + the edge filter) hit
        # the persisted blocks.  Eager paid a separate
        # materialization job per round — pure fixed overhead.
        e = peel_round(e, k).localCheckpoint(eager=False)
        n = e.count()
        if n == prev:
            break
        prev = n
    return (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("core_deg"))
    )


def kcore_sql(edges_sql: str, k: int = 2, rounds: int = 10) -> str:
    """DuckDB mirror: the peel unrolled to exactly ``rounds`` levels
    (the label_propagation_sql unroll pattern) over an edge-list
    subquery (columns src, dst) — identical to the Spark fixpoint
    whenever convergence happens inside the bound, and identical to
    the bounded peel otherwise.

    Every level is ``AS MATERIALIZED``: DuckDB INLINES plain CTEs, and
    each level references its predecessor three times (the degree
    union's two arms + the edge filter), so a 10-round unroll would
    expand to ~3^10 copies of the base scan — measured as an EMFILE
    crash (tens of thousands of simultaneous parquet opens), not just
    slowness.  Materialization makes each level compute once, matching
    the Spark side's per-round localCheckpoint."""
    ctes = [f"e0 AS MATERIALIZED ({edges_sql})"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS deg
        FROM (SELECT src AS node FROM e{r - 1}
              UNION ALL SELECT dst AS node FROM e{r - 1})
        GROUP BY node)
      WHERE deg >= {k})"""
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r - 1} e
      JOIN k{r} a ON a.node = e.src
      JOIN k{r} b ON b.node = e.dst)"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT node, count(*)::BIGINT AS core_deg
    FROM (SELECT src AS node FROM e{rounds}
          UNION ALL SELECT dst AS node FROM e{rounds})
    GROUP BY node
    """
