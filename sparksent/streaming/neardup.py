"""Incremental near-duplicate detection: a STREAM of new documents
checked against an indexed static corpus — the production shape of
"does this incoming document duplicate anything we already have".

The batch dedup family (sparksent/ext/dedup.py) answers the
corpus-vs-itself question; this answers the new-vs-corpus question
without rescanning the corpus: the corpus is summarized ONCE into its
(band, band-signature) MinHash index, and each micro-batch of new
documents computes its own signatures per-row (shuffle-free — the
minhash pipeline is pure projection math, so it is streaming-legal) and
hash-joins its band rows against the index. With the index broadcast
(or bucketed on (band, bsig) at rest), the per-batch cost is
O(new docs x bands), independent of corpus size.

Scope, stated honestly: this detects new-vs-CORPUS duplicates only.
New-vs-new duplicates inside the stream need either the batch self-join
over the accumulated store or a stateful variant; a production pipeline
runs this operator for admission control and the batch family for
periodic full dedup. The reference (traubad/FlinkSentimentAnalysis) has
no dedup at all; this extends its streaming surface with the curation
operator a 100 TB ingest actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ext.dedup import minhash_bands, minhash_signatures, signature_agreement


def minhash_band_index(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The static side, computed once per corpus version:
    (band, bsig, corpus_id, corpus_sig). At rest this is a table
    partitioned/bucketed on (band, bsig); here it is a DataFrame the
    caller may broadcast."""
    sigs = minhash_signatures(corpus, id_col, text_col)
    return minhash_bands(sigs).select(
        "band",
        "bsig",
        F.col("id").alias("corpus_id"),
        F.col("sig").alias("corpus_sig"),
    )


def streaming_neardup_candidates(
    stream_docs: DataFrame,
    corpus_index: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_index: bool = True,
) -> DataFrame:
    """(new_id, corpus_id, est_jaccard) for every incoming document
    whose estimated Jaccard vs some corpus document passes ``threshold``.

    Stream-static equi-join on (band, bsig): stateless except for the
    final per-pair dropDuplicates (a pair colliding in several bands
    would otherwise emit once per band). That dedup state is one row per
    EMITTED pair — bounded by true matches, not by traffic; bound it
    further with a watermark on arrival time if matches are unbounded.
    """
    sigs = minhash_signatures(stream_docs, id_col, text_col)
    bands = minhash_bands(sigs).select(
        F.col("id").alias("new_id"), F.col("sig").alias("new_sig"), "band", "bsig"
    )
    idx = F.broadcast(corpus_index) if broadcast_index else corpus_index
    return (
        bands.join(idx, ["band", "bsig"])
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select(
            "new_id",
            "corpus_id",
            signature_agreement(F.col("new_sig"), F.col("corpus_sig")).alias(
                "est_jaccard"
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["new_id", "corpus_id"])
    )
