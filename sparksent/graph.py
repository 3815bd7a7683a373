"""Iterative graph algorithms over DataFrames: connected components.

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
