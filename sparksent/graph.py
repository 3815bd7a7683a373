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


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) with component = min vertex id reachable in the
    undirected graph. Isolated vertices are their own component.

    Each round sends every vertex's current label to its neighbors and
    takes the min; converged when no label changes. Deterministic for
    any partitioning (min is commutative/associative).

    Raises RuntimeError if ``max_iter`` rounds pass without convergence
    — returning silently non-converged labels would hand transitive
    dedup wrong clusters with no signal (a chain longer than max_iter
    hops needs more rounds, not a wrong answer).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr = e.join(labels, e.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        new_labels = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "id")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(last round still changed {changed} labels); raise max_iter"
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
    e = edges.select(lo.alias("a"), hi.alias("b")).filter(F.col("a") != F.col("b")).distinct()
    wedges = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )  # a-b, b-c with a<b<c
    tris = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).select("a", "b", "c")
    per_vertex = (
        tris.select(F.col("a").alias("id"))
        .union(tris.select("b"))
        .union(tris.select("c"))
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
