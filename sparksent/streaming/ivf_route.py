"""Streaming IVF cell routing: assign INCOMING embeddings to their
nearest trained-index cell — the admission-control twin of
``streaming/neardup.py`` for the vector side of an ingest pipeline
(route each new vector to the index shard / at-rest partition that
will store and serve it; the batch search operators
``ext/similarity.py::ivf_trained_topk`` / ``ivfpq_adc_topk`` then read
only those cells).

Streaming legality by construction: the centroid structure is folded
ONCE per index version into a single broadcastable row (array of
(cell, centroid-vector) structs, the ``ext/iterative.py::_assign``
large-k shape), and routing is a PURE per-row projection — constant-key
stream-static equi-join against the one-row frame, then a
``transform`` + ``array_min`` integer argmin.  No window, no state, no
shuffle: append-mode-legal at any rate, per-batch cost linear in the
batch alone.  The argmin is the scaled-int squared-L2 with ties to the
smaller cell id — bit-identical to the Lloyd loop's own assignment, so
routing the training corpus through the router reproduces
``kmeans_assignments`` exactly (pinned in
tests/test_streaming_equivalence.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ext.iterative import _kmeans_fit, _scaled_vec


def ivf_centroid_row(
    corpus: DataFrame,
    n_centroids: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The static side, computed once per index version: train the
    Lloyd cells on ``corpus`` (the shared oracle-exact loop) and fold
    the final centroid frame into ONE row ``cs = array<struct<j,
    cvec>>`` sorted by cell id — k x dims longs, broadcastable at any
    self-scaled k (the MLlib centroid-matrix budget).  localCheckpoint
    pins it so per-batch routing never re-derives the training plan."""
    from ..ext.similarity import n_centroids_for

    if n_centroids is None:
        n_centroids = n_centroids_for(corpus.count())
    _, cents = _kmeans_fit(corpus, n_centroids, iters, id_col, vec_col)
    cvecs = cents.groupBy("j").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    return cvecs.agg(
        F.sort_array(F.collect_list(F.struct("j", "cvec"))).alias("cs")
    ).localCheckpoint()


def route_to_cells(
    df: DataFrame,
    crow: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, d): each vector's nearest trained cell by
    scaled-int squared L2, ties to the smaller cell id.  ``df`` may be
    a STREAM (the op is a stateless projection: constant-key equi-join
    against the broadcast one-row centroid frame, then a per-row
    ``array_min`` argmin) or a batch frame (the batch twin the
    equivalence test compares against).  NULL/empty vectors are
    dropped — the Lloyd loop's own semantics."""
    xs = df.select(
        F.col(id_col).cast("long").alias("id"), _scaled_vec(vec_col).alias("v")
    ).filter(F.size("v") > 0)
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
        xs.withColumn("__k", F.lit(1))
        .join(
            F.broadcast(crow.withColumn("__k", F.lit(1))).filter(F.size("cs") > 0),
            "__k",
        )
        .select(F.col("id").alias(id_col), F.array_min(dj).alias("b"))
        .select(
            id_col,
            F.col("b.j").cast("long").alias("cell"),
            F.col("b.d").cast("long").alias("d"),
        )
    )
