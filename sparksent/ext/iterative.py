"""Iterative algorithms made oracle-exact: Lloyd k-means and PageRank.

Iterative ML/graph algorithms are usually excluded from cross-engine
hash checks because float accumulation order diverges between engines
after one round.  Both operators here stay BIT-EXACT through every
iteration by doing all per-round arithmetic in scaled BIGINTs:

- vectors/ranks are scaled to integers once at the scan
  (``floor(x * 1e6)`` — one float multiply on identical operands);
- distances / contributions are integer sums (order-insensitive);
- the only divisions are either integer floordiv on positive values
  (Spark ``div`` == DuckDB ``//`` for positives) or an IEEE double
  division of two exact integers < 2^53 followed by ``floor`` —
  deterministic and identical in both engines (and in the Python
  driver loop: ``int / int`` is correctly-rounded double true
  division, the same operation).

No reference counterpart (traubad/FlinkSentimentAnalysis has neither
vectors nor graphs); these extend the training-data-pipeline surface
(cluster-balanced sampling, importance-ranked vocabularies) the brief
makes first-class.

100-TB shapes:
- k-means is the canonical broadcast-loop: per iteration one
  map-side-combined (cluster, pos) aggregate whose shuffle carries
  k x dims partial sums per task, re-broadcast as next round's
  centroid frame — MLlib's topology, but with the centroids kept in
  a DataFrame end-to-end (the driver never holds a vector; each
  round's k x dims frame is localCheckpoint-pinned).
- PageRank keeps the edge list as the partitioned big side (built by
  a doc_id-co-partitioned self-join, never all-pairs across docs);
  per iteration the rank vector joins in and partial-aggregates on
  dst.  At this fixture the rank/out-weight sides are bounded by the
  token vocabulary and are broadcast; at web-scale node counts the
  same plan co-partitions edges and ranks on src (one shuffle per
  iteration) — the textbook Pregel/GraphX layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

V_SCALE = 1_000_000  # 6 fractional digits; |x_s| <= ~6e5 on unit-ish vecs
PR_TOTAL = 1_000_000_000_000  # total PageRank mass, in 1e-12 units


# ---------------------------------------------------------------------------
# k-means (Lloyd, fixed iterations, deterministic seeds)
# ---------------------------------------------------------------------------


def _scaled_vec(vec_col: str) -> F.Column:
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(V_SCALE))).cast("long")
    )


# Above this k, assignment switches from the codegen pos-join shape to
# the shuffle-free broadcast-row shape (see _assign).  64 keeps every
# fixture/oracle run (k=8..10) on the codegen path and every
# self-scaled corpus (k ~ N/256 >= 157 at x20) on the bounded-shuffle
# path; both paths are integer-exact and pinned equal by
# tests/test_properties.py::test_kmeans_assign_paths_agree.
ASSIGN_BROADCAST_MIN_K = 64


def _assign(xs: DataFrame, cents: DataFrame, k_hint: int) -> DataFrame:
    """(id, cl, d): nearest centroid by squared L2 over the scaled
    ints, ties broken by the smaller cluster id.  Two path-equal
    shapes, chosen by ``k_hint`` (the bpe_encode dual-engine pattern):

    SMALL k (< ASSIGN_BROADCAST_MIN_K — every fixture): vectors
    posexplode to (id, pos, x) and broadcast-join the k x dims centroid
    frame on pos; per-(id, cluster) squared diffs partial-aggregate
    map-side, and the argmin is a min over (d, j) structs
    (field-lexicographic ordering = the (distance, id) tie-break).
    All integer, codegen'd, constant expression size; the N x k
    (id, cluster, d) shuffle it pays is negligible at bounded k.

    LARGE k (self-scaled corpora, k ~ N/256): that N x k shuffle is
    O(N^2/256) rows and was measured growing 3.4x per corpus doubling
    (SCALE.md round-8 section) — so the centroid frame instead folds
    into ONE broadcast row of array<struct<j, cvec>> (sorted by j) and
    the argmin becomes a pure per-row expression: ``transform`` maps
    each centroid to struct(d, j) (``zip_with`` + ``aggregate`` integer
    squared-L2) and ``array_min`` takes the lexicographic struct min —
    the identical tie-break.  Assignment then shuffles NOTHING
    (measured x40: semdedup shuffle 1,347 -> 132 MB); the cost is the
    interpreted higher-order-function constant (HOF lambdas don't
    enter whole-stage codegen), ~1.3x local CPU — the right trade
    exactly when the shuffle is the scale hazard, and why small k
    keeps the codegen shape.  Expression size is constant in k and
    dims (data-driven lambdas, not unrolled literals — the bpe
    fold-depth lesson); the broadcast row is k x dims longs, the same
    budget MLlib spends on its centroid matrix."""
    if k_hint < ASSIGN_BROADCAST_MIN_K:
        ex = xs.select("id", F.posexplode("v").alias("pos", "x"))
        per_cluster = (
            ex.join(F.broadcast(cents), "pos")
            .groupBy("id", "j")
            .agg(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d")
            )
        )
        best = per_cluster.groupBy("id").agg(F.min(F.struct("d", "j")).alias("b"))
        return best.select("id", F.col("b.j").alias("cl"), F.col("b.d").alias("d"))
    cvecs = cents.groupBy("j").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    crow = cvecs.agg(F.sort_array(F.collect_list(F.struct("j", "cvec"))).alias("cs"))
    # path-equality contract: the small-k posexplode shape silently
    # DROPS rows whose vector is NULL or empty (no rows to explode);
    # this shape would otherwise keep them (crossJoin) and emit a
    # NULL-distance assignment — filter to the same drop semantics
    # (F.size is -1 for NULL, 0 for empty; both excluded)
    xs = xs.filter(F.size("v") > 0)
    dj = F.transform(
        F.col("cs"),
        lambda cent: F.struct(
            F.aggregate(
                F.zip_with(F.col("v"), cent["cvec"], lambda x, c: (x - c) * (x - c)),
                F.lit(0).cast("long"),
                lambda a, b: a + b,
            ).alias("d"),
            cent["j"].alias("j"),
        ),
    )
    return (
        xs.crossJoin(F.broadcast(crow))
        # path-equality contract, empty-centroid edge: with zero
        # centroid rows the agg above still yields ONE row with cs=[],
        # so array_min would emit every vector with a NULL assignment
        # — whereas the small-k join shape returns zero rows. Filter
        # to the same semantics (ADVICE r8).
        .filter(F.size("cs") > 0)
        .select("id", F.array_min(dj).alias("b"))
        .select("id", F.col("b.j").alias("cl"), F.col("b.d").alias("d"))
    )


def scaled_base(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    carry: list | None = None,
) -> DataFrame:
    """(id, v[, carry...]) — the Lloyd loop's scaled-integer input,
    pinned once for all consumers.  ``carry`` lets vector-attaching
    consumers (SemDeDup's side frame, trained-IVF's cell layout) ride
    raw-vector/norm columns on the SAME pin instead of re-scanning the
    corpus for an attach join (guide §1.2: one corpus pass).

    Deliberately a PLAIN pin, not ``tables.pinned_by("id")``: the
    repartition+AQE-off variant was A/B-tested (round 16) and measured
    SLOWER on every kmeans-family query except multimodal_embed_topk
    (e.g. kmeans_embeddings_2iter 2.41 -> 2.76 s, ivfpq_adc
    3.26 -> 5.06 s isolated) — the id-keyed downstream exchanges it
    removes are narrow or reused, while the pin-time repartition is a
    real extra shuffle of the WIDE frame, and a pre-partitioned RDD
    side forfeits AQE skew-splitting (the dedup_multimodal_keep_set
    2.4x regression that reverted the CC edge pin)."""
    cols = [
        F.col(id_col).cast("long").alias("id"),
        _scaled_vec(vec_col).alias("v"),
    ]
    return df.select(*cols, *(carry or [])).localCheckpoint()


def _kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    xs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The shared Lloyd loop: ``iters`` (assign -> update) rounds from
    the seed vectors with ``id < k``, returning (final assignment
    (id, cl, d), final centroid frame (j, pos, c)).  Used by both
    :func:`kmeans_cluster_stats` and :func:`kmeans_assignments`.

    ``xs``: optional prebuilt pinned (id, v) scaled frame — the IVF-PQ
    composition builds it once and shares it with the PQ coding stages
    (round 16, guide §1.2); must be floor(x * V_SCALE) longs."""
    if xs is None:
        xs = scaled_base(df, id_col, vec_col)
    cents = xs.filter(F.col("id") < k).select(
        F.col("id").alias("j"), F.posexplode("v").alias("pos", "c")
    )
    for _ in range(iters):
        assigned = _assign(xs, cents, k)
        # shuffle_hash: both sides' stats read huge (xs is a pinned
        # RDD), so broadcast cannot fire and the unhinted planner
        # would pick sort-merge — the hint keeps the sort-free build
        # on the narrow (id, cl) side.
        cents = (
            xs.join(assigned.select("id", "cl").hint("shuffle_hash"), "id")
            .select("cl", F.posexplode("v").alias("pos", "x"))
            .groupBy("cl", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .select(
                F.col("cl").alias("j"),
                "pos",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("c"),
            )
            .localCheckpoint()
        )
    return _assign(xs, cents, k), cents


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector final cluster assignment (id, cl, d) after ``iters``
    Lloyd rounds — the building block SemDeDup composes on."""
    final, _ = _kmeans_fit(df, k, iters, id_col, vec_col)
    return final


def kmeans_cluster_stats(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means, ``iters`` (assign -> update) rounds from the k
    seed vectors with ``id < k``, then a final assignment; returns one
    row per surviving cluster: (cluster, n, inertia, centroid_checksum).

    Fully distributed: centroids live in a k x dims DataFrame the whole
    way — the driver loop only BUILDS the plan, it never sees a vector.
    Each round's centroid frame is localCheckpoint-pinned (k x dims
    rows) so the lazy plan stays flat instead of re-deriving every
    earlier round.  Clusters that lose all members simply drop out of
    the next round (k shrinks) — the same rule the SQL mirror's join
    semantics produce, so both engines shrink identically.

    Exactness: distances are integer; the centroid update is
    ``floor(sum / n)`` where ``sum / n`` is IEEE double division of
    exact integers < 2^53 — identical in both engines.
    """
    final, cents = _kmeans_fit(df, k, iters, id_col, vec_col)
    stats = final.groupBy("cl").agg(
        F.count("*").cast("long").alias("n"), F.sum("d").cast("long").alias("inertia")
    )
    ck = cents.groupBy("j").agg(F.sum("c").cast("long").alias("centroid_checksum"))
    return stats.join(
        F.broadcast(ck.withColumnRenamed("j", "cl")), "cl"
    ).select(F.col("cl").alias("cluster"), "n", "inertia", "centroid_checksum")


def kmeans_ctes_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The shared Lloyd-loop CTE text: assignment CTEs a1..a{iters+1}
    against centroid CTEs c0 (seeds) .. c{iters}; argmin via QUALIFY
    row_number ordered by (d, j) — the same (distance, id) tie-break.
    The final assignment is ``a{iters+1}(id, v, cl, d)``; used by both
    :func:`kmeans_cluster_stats_sql` and the SemDeDup oracle."""
    parts = [
        # the len() predicate mirrors the Spark paths' NULL/empty-vector
        # drop (posexplode emits nothing; the broadcast-row path filters
        # size(v) > 0) — without it a degenerate embedding would keep a
        # NULL/padded list_zip distance row only on the oracle side
        # (ADVICE r8; fixtures have none, so fixture hashes are unchanged)
        f"""xs AS (
          SELECT {id_col}::BIGINT AS id,
                 list_transform({vec_col}, x -> floor(x::DOUBLE * {float(V_SCALE)!r})::BIGINT) AS v
          FROM {table}
          WHERE {vec_col} IS NOT NULL AND len({vec_col}) > 0)""",
        f"c0 AS (SELECT id AS j, v AS c FROM xs WHERE id < {k})",
    ]
    for i in range(1, iters + 2):
        parts.append(
            f"""a{i} AS (
              SELECT id, v, j AS cl, d FROM (
                SELECT xs.id, xs.v, c{i - 1}.j,
                       list_sum(list_transform(list_zip(xs.v, c{i - 1}.c),
                                p -> (p[1]-p[2])*(p[1]-p[2])))::BIGINT AS d
                FROM xs CROSS JOIN c{i - 1})
              QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, j) = 1)"""
        )
        if i <= iters:
            parts.append(
                f"""c{i} AS (
                  SELECT cl AS j, list(cs ORDER BY pos) AS c FROM (
                    SELECT cl, pos, floor((sum(x)::BIGINT)::DOUBLE / count(*))::BIGINT AS cs
                    FROM (SELECT cl, generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS x
                          FROM a{i})
                    GROUP BY cl, pos)
                  GROUP BY cl)"""
            )
    return ",\n".join(parts)


def kmeans_cluster_stats_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`kmeans_cluster_stats`, composed from
    the shared Lloyd CTEs."""
    return f"""WITH {kmeans_ctes_sql(table, k, iters, id_col, vec_col)}
    SELECT a.cl AS cluster, count(*)::BIGINT AS n, sum(a.d)::BIGINT AS inertia,
           ck.centroid_checksum
    FROM a{iters + 1} a
    JOIN (SELECT j AS cl, list_sum(c)::BIGINT AS centroid_checksum FROM c{iters}) ck
      USING (cl)
    GROUP BY a.cl, ck.centroid_checksum"""


# ---------------------------------------------------------------------------
# PageRank (fixed-point integer, fixed iterations)
# ---------------------------------------------------------------------------


def pagerank_iterations(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping: int = 85,
    node_col: str = "tok",
) -> DataFrame:
    """The shared integer-PageRank loop over ``edges(src, dst, w)`` and
    ``nodes(node_col)``: ``iters`` rounds of

    ``pr' = (100-damping)*PR_TOTAL div (100*n_nodes)
            + damping * sum((pr * w) div out_w) div 100``

    — all positive-integer floordivs (bit-exact in both engines; see
    the module docstring), dangling nodes keep teleport mass and leak
    the rest (the standard simplification).  Callers must pass
    edge/node frames whose lineage is safe to scan once per round
    (``localCheckpoint`` anything expensive — both call sites do).
    Returns ``(node_col, out_weight, pr)``.

    Scale: the rank and out-weight sides are node-cardinality and
    broadcast here; at web-scale node counts the same round structure
    co-partitions edges and ranks on src (one shuffle per iteration) —
    the textbook Pregel/GraphX layout."""
    ncount = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    # ONE out-weight aggregate for the whole run: outw is consumed by
    # every round's contrib join AND the final out_weight join, so the
    # unpinned frame re-ran the edge aggregate iters+1 times
    # (guide §1.2; node-cardinality, cheap to pin).
    outw = (
        edges.groupBy("src")
        .agg(F.sum("w").cast("long").alias("ow"))
        .localCheckpoint()
    )
    ranks = nodes.crossJoin(F.broadcast(ncount)).select(
        node_col,
        "n_nodes",
        F.expr(f"CAST({PR_TOTAL} div n_nodes AS BIGINT)").alias("pr"),
    )
    teleport = (
        f"CAST(({100 - damping} * CAST({PR_TOTAL} AS BIGINT))"
        f" div (100 * n_nodes) AS BIGINT)"
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                F.broadcast(ranks.select(F.col(node_col).alias("src"), "pr")), "src"
            )
            .join(F.broadcast(outw), "src")
            .select("dst", F.expr("CAST((pr * w) div ow AS BIGINT)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        # Rebuild the node side from the PINNED `nodes` frame, not from
        # the running `ranks` plan: with `ranks` referenced twice per
        # round (contrib broadcast + rank rebuild) the unpinned plan
        # doubled the whole prior-round subtree per round — 2^iters
        # copies of the first propagation (guide §3.3).  `nodes` is the
        # same node set `ranks` carries (crossJoin(ncount) re-attaches
        # the scalar), so each round references the prior round exactly
        # ONCE and the plan stays linear in iters with no per-round
        # materialization barrier.
        ranks = (
            nodes.crossJoin(F.broadcast(ncount))
            .join(
                F.broadcast(contrib.withColumnRenamed("dst", node_col)),
                node_col,
                "left",
            )
            .select(
                node_col,
                "n_nodes",
                (
                    F.expr(teleport)
                    + F.expr(
                        f"CAST(({damping} * coalesce(contrib, CAST(0 AS BIGINT)))"
                        f" div 100 AS BIGINT)"
                    )
                ).alias("pr"),
            )
        )
    return ranks.join(
        F.broadcast(outw.withColumnRenamed("src", node_col)), node_col, "left"
    ).select(
        node_col,
        F.coalesce("ow", F.lit(0)).cast("long").alias("out_weight"),
        F.col("pr").cast("long").alias("pr"),
    )


def pagerank_rounds_sql(
    iters: int = 3, damping: int = 85, node_col: str = "tok"
) -> list[str]:
    """The unrolled-round CTE parts of the PageRank oracle, expecting
    ``edges(src, dst, w)`` and ``nodes({node_col})`` CTEs upstream;
    ends in ``r{iters}`` plus ``outw`` (the final SELECT joins them)."""
    t = 100 - damping
    parts = [
        "nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes)",
        "outw AS (SELECT src, sum(w)::BIGINT AS ow FROM edges GROUP BY 1)",
        f"r0 AS (SELECT {node_col}, ({PR_TOTAL} // n_nodes)::BIGINT AS pr"
        f" FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""ct{i} AS (
              SELECT e.dst AS {node_col}, sum((r.pr * e.w) // o.ow)::BIGINT AS contrib
              FROM edges e
              JOIN r{i - 1} r ON e.src = r.{node_col}
              JOIN outw o ON e.src = o.src
              GROUP BY 1)"""
        )
        parts.append(
            f"""r{i} AS (
              SELECT n.{node_col},
                     (({t} * {PR_TOTAL}::BIGINT) // (100 * nn.n_nodes)
                      + ({damping} * coalesce(c.contrib, 0)) // 100)::BIGINT AS pr
              FROM nodes n CROSS JOIN nn
              LEFT JOIN ct{i} c ON n.{node_col} = c.{node_col})"""
        )
    return parts


def word_pagerank(
    docs: DataFrame,
    iters: int = 3,
    damping: int = 85,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PageRank over the word co-occurrence graph: nodes are distinct
    tokens, a directed edge src->dst with weight w for every ordered
    token pair co-occurring in w documents (symmetric by construction).

    Rank mass is the integer ``PR_TOTAL``; each round
    ``pr' = (100-damping)*PR_TOTAL div (100*n_nodes)
            + damping * sum((pr * w) div out_w) div 100``
    — all positive-integer floordivs, so every round is bit-exact in
    both engines.  Nodes whose docs contain no second token have no
    out-edges; they still receive teleport mass each round and their
    (truncated) mass leaks — the standard dangling simplification,
    identical on both sides.

    Scale: the edge build self-joins the (doc, token) pairs
    co-partitioned on doc_id (bounded per-doc token sets, never a
    corpus cross join); per iteration the rank and out-weight sides
    are vocabulary-bounded and broadcast, and the contribution
    aggregate partial-combines on dst before its shuffle.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    a, b = toks.alias("a"), toks.alias("b")
    edges = (
        a.join(b, "doc_id")
        .filter(F.col("a.tok") != F.col("b.tok"))
        .groupBy(F.col("a.tok").alias("src"), F.col("b.tok").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint()  # consumed by outw + every iteration
    )
    nodes = toks.select("tok").distinct().localCheckpoint()
    return pagerank_iterations(edges, nodes, iters, damping, node_col="tok")


def word_pagerank_sql(
    table: str = "documents",
    iters: int = 3,
    damping: int = 85,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    parts = [
        f"""toks AS (
          SELECT DISTINCT doc_id, tok FROM (
            SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS tok
            FROM {table})
          WHERE tok <> '')""",
        """edges AS (
          SELECT a.tok AS src, b.tok AS dst, count(*)::BIGINT AS w
          FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok <> b.tok
          GROUP BY 1, 2)""",
        "nodes AS (SELECT DISTINCT tok FROM toks)",
    ]
    parts += pagerank_rounds_sql(iters, damping, node_col="tok")
    joined = ",\n".join(parts)
    return f"""WITH {joined}
    SELECT r.tok, coalesce(o.ow, 0)::BIGINT AS out_weight, r.pr
    FROM r{iters} r LEFT JOIN outw o ON r.tok = o.src"""


# ---------------------------------------------------------------------------
# cluster-balanced sampling (the module-docstring motivation, realized)
# ---------------------------------------------------------------------------

BALANCED_PER_CLUSTER = 16


def kmeans_balanced_sample(
    df: DataFrame,
    k: int = 8,
    per_cluster: int = BALANCED_PER_CLUSTER,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced deterministic sample: k-means the embedding
    space (the shared oracle-exact Lloyd loop), then take exactly
    ``per_cluster`` vectors from EVERY cluster — the
    diversity-preserving sample a curation pipeline draws when a
    uniform sample would be dominated by the majority mode (the
    "cluster-balanced sampling" use the module docstring names).

    Determinism: within a cluster, rows rank by (md5-hash of the id
    string, id) — a cross-engine-stable pseudo-random order (the
    sampling modules' convention), so the sample is a pure function of
    the data.  Output: (vec_id, cluster, rk), rk = 1..per_cluster.

    Scale: assignment is the dual-path Lloyd loop (shuffle-free
    broadcast-row argmin at self-scaled k); the per-cluster take is a
    rank window Spark rewrites to WindowGroupLimit — every shuffle-map
    task emits at most per_cluster rows per cluster seen, so the rank
    shuffle carries <= k x per_cluster rows however large the corpus
    (the session_concurrency_capped bound, reused)."""
    from .hashing import h60

    assign = kmeans_assignments(df, k, iters, id_col=id_col, vec_col=vec_col)
    from pyspark.sql import Window

    w = Window.partitionBy("cl").orderBy(
        h60(F.col("id").cast("string")).asc(), F.col("id").asc()
    )
    return (
        assign.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_cluster)
        .select(
            F.col("id").alias(id_col),
            F.col("cl").cast("long").alias("cluster"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def kmeans_balanced_sample_sql(
    table: str = "embeddings",
    k: int = 8,
    per_cluster: int = BALANCED_PER_CLUSTER,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`kmeans_balanced_sample`, composed from
    the shared Lloyd CTEs + the same md5-rank take."""
    from .hashing import h60_sql

    return f"""WITH {kmeans_ctes_sql(table, k, iters, id_col, vec_col)}
    SELECT id::BIGINT AS {id_col}, cl::BIGINT AS cluster, rk::BIGINT AS rk
    FROM (
      SELECT id, cl, row_number() OVER (
               PARTITION BY cl
               ORDER BY {h60_sql("id::VARCHAR")}, id) AS rk
      FROM a{iters + 1})
    WHERE rk <= {per_cluster}
    """


# ---------------------------------------------------------------------------
# HITS (hubs & authorities, Kleinberg 1999), integer-exact
# ---------------------------------------------------------------------------

# Total hub/authority mass after each normalization, in 1e-9 units.
# Deliberately smaller than PR_TOTAL: the raw update multiplies a
# score (<= HITS_TOTAL after normalization) by the TOTAL edge weight
# before summing, so the BIGINT safety bound is
# HITS_TOTAL * sum(w) < 2^63  =>  sum(w) < ~9.2e9 links.  That covers
# every fixture and any single-shard corpus; at full web scale the
# same loop would drop HITS_TOTAL another 1e3 or rescale per round by
# the running max — documented trade, not a silent overflow.
HITS_TOTAL = 1_000_000_000


def hits_iterations(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    node_col: str = "host",
) -> DataFrame:
    """Weighted HITS over ``edges(src, dst, w)`` / ``nodes(node_col)``:
    per round ``auth_raw(v) = sum_{u->v} hub(u)*w`` then
    ``hub_raw(u) = sum_{u->v} auth(v)*w``, each followed by the
    integer L1 normalization ``x = x_raw div max(sum(x_raw) div
    HITS_TOTAL, 1)`` — divide-by-the-scale-factor rather than
    multiply-then-divide, so no intermediate exceeds
    score_max * sum(w) (the module-constant bound) and both engines
    truncate identically.  The normalized L1 total is APPROXIMATE:
    ``sum_raw div floor(sum_raw/TOTAL)`` lands in
    (TOTAL/2, 2*TOTAL) — HITS only consumes relative magnitudes, and
    the looser constant buys the overflow-free update.  Hubs start at ``HITS_TOTAL div n_nodes``;
    nodes with no in-edges hold authority 0, sinks hold hub 0 — the
    fixture's share/cdn hosts are the planted witnesses.

    Returns ``(node_col, hub, auth)``.  Callers pass checkpoint-safe
    edge/node frames (both call sites localCheckpoint), exactly the
    :func:`pagerank_iterations` contract; per round the score side is
    node-cardinality (broadcast here, co-partitioned on the join key
    at web-scale node counts)."""
    ncount = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    scores = nodes.crossJoin(F.broadcast(ncount)).select(
        node_col,
        F.expr(f"CAST({HITS_TOTAL} div n_nodes AS BIGINT)").alias("hub"),
        F.lit(0).cast("long").alias("auth"),
    )

    def _normalized(score_col: str, key_in: str, key_out: str) -> DataFrame:
        """(node_col, x): the half-round update — propagate
        ``score_col`` across edges from ``key_in`` to ``key_out``,
        then L1-normalize by the divide-by-scale-factor rule."""
        raw = (
            edges.join(
                F.broadcast(
                    scores.select(F.col(node_col).alias(key_in), score_col)
                ),
                key_in,
            )
            .select(
                F.col(key_out).alias(node_col),
                (F.col(score_col) * F.col("w")).cast("long").alias("c"),
            )
            .groupBy(node_col)
            .agg(F.sum("c").cast("long").alias("raw"))
            # pin each half-round's node-cardinality raw frame: it has
            # TWO consumers (the L1 total and the normalize join), and
            # the running `scores` plan feeds the next half-round — an
            # unpinned frame doubles the whole prior-round subtree per
            # consumer, so the final plan held 2^(2*iters) copies of the
            # first propagation (measured: host_hits 7.7 s pinned vs
            # 5.4 s for the same graph's 3-round PageRank; guide §3.3
            # "materialise an intermediate to truncate the plan")
            .localCheckpoint()
        )
        tot = raw.agg(
            F.greatest(
                F.expr(f"CAST(coalesce(sum(raw), 0) div {HITS_TOTAL} AS BIGINT)"),
                F.lit(1).cast("long"),
            ).alias("d")
        )
        return (
            nodes.crossJoin(F.broadcast(tot))
            .join(F.broadcast(raw), node_col, "left")
            .select(
                node_col,
                F.expr("CAST(coalesce(raw, 0) div d AS BIGINT)").alias("x"),
            )
        )

    for _ in range(iters):
        auth = _normalized("hub", "src", "dst")
        scores = scores.select(node_col, "hub").join(
            F.broadcast(auth.withColumnRenamed("x", "auth")), node_col
        )
        hub = _normalized("auth", "dst", "src")
        scores = scores.select(node_col, "auth").join(
            F.broadcast(hub.withColumnRenamed("x", "hub")), node_col
        )
    return scores.select(
        node_col,
        F.col("hub").cast("long").alias("hub"),
        F.col("auth").cast("long").alias("auth"),
    )


def hits_rounds_sql(iters: int = 2, node_col: str = "host") -> list[str]:
    """Unrolled-round CTE parts of the HITS oracle, expecting
    ``edges(src, dst, w)`` and ``nodes({node_col})`` upstream; ends in
    ``h{iters}`` (hub) and ``a{iters}`` (auth), both MATERIALIZED —
    each level is referenced twice (next half-round + final SELECT or
    the raw join), and DuckDB inlines plain CTEs exponentially."""
    n = node_col
    parts = [
        "nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nodes)",
        f"h0 AS MATERIALIZED (SELECT {n}, ({HITS_TOTAL} // n_nodes)::BIGINT"
        f" AS hub FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""ar{i} AS (
              SELECT e.dst AS {n}, sum(h.hub * e.w)::BIGINT AS raw
              FROM edges e JOIN h{i - 1} h ON e.src = h.{n} GROUP BY 1)"""
        )
        parts.append(
            f"ad{i} AS (SELECT greatest(coalesce(sum(raw), 0) // {HITS_TOTAL},"
            f" 1)::BIGINT AS d FROM ar{i})"
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (
              SELECT nd.{n}, (coalesce(r.raw, 0) // t.d)::BIGINT AS auth
              FROM nodes nd CROSS JOIN ad{i} t
              LEFT JOIN ar{i} r ON nd.{n} = r.{n})"""
        )
        parts.append(
            f"""hr{i} AS (
              SELECT e.src AS {n}, sum(a.auth * e.w)::BIGINT AS raw
              FROM edges e JOIN a{i} a ON e.dst = a.{n} GROUP BY 1)"""
        )
        parts.append(
            f"hd{i} AS (SELECT greatest(coalesce(sum(raw), 0) // {HITS_TOTAL},"
            f" 1)::BIGINT AS d FROM hr{i})"
        )
        parts.append(
            f"""h{i} AS MATERIALIZED (
              SELECT nd.{n}, (coalesce(r.raw, 0) // t.d)::BIGINT AS hub
              FROM nodes nd CROSS JOIN hd{i} t
              LEFT JOIN hr{i} r ON nd.{n} = r.{n})"""
        )
    return parts
