"""Fused multimodal signature extraction: ONE Arrow-batched decode
pass per corpus scan, emitting every media modality's dedup signature
at once (VERDICT r11 ask #3).

The composed ``dedup_multimodal_keep_set`` previously ran each
modality's registered pair query unchanged, which meant FOUR
independent scans of ``documents`` and THREE independent payload
decode passes (image, audio, video — measured 8.15 s ≈ the sum of the
four pair stages at sf0.1).  At 100 TB the payload decode is the
dominant cost, so a 4× decode is real money even though every pair
join was already signature-sized.

This stage decodes once: per document, one mapInPandas row carrying
- ``img_hw``   — the 4 perceptual-dHash 16-bit words,
- ``aud_hw``   — the 4 energy-gradient fingerprint words,
- ``vid_sig``  — the slot-ordered sampled-frame content hashes,
computed by the SAME per-doc helpers the per-modality stages call
(:func:`imagedup.phash_words`, :func:`audiodup.afp_words`,
:func:`videodup.frame_hashes`), so fused and per-modality signatures
are identical by construction (pinned by
tests/test_multimodal.py::test_fused_signatures_match_per_modality).
Downstream, each modality's banded pair join consumes a projection of
the ONE localCheckpointed signature frame — the joins and their
df-cap/shuffle_hash contracts are the per-modality functions' own,
unchanged.

Text MinHash deliberately stays OUT of this stage: its signature
pipeline is whole-stage-codegen'd JVM column expressions over ``text``
(shingle → hash → min), and folding it into Python would move
vectorized JVM work onto the Arrow path to save one cheap narrow scan
— the wrong direction; the expensive scans are the payload decodes,
which are Python-bound either way.

The per-modality registered queries (dedup_image_phash,
dedup_audio_fingerprint, dedup_video_framehash) keep their own
single-modality decode stages — a user running ONE modality should
not pay for three decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import rebalance
from .audiodup import afp_words
from .imagedup import phash_words
from .videodup import frame_hashes

MMSIG_SCHEMA = (
    "media_id long, img_hw array<int>, aud_hw array<int>, vid_sig array<long>"
)


def mmsig_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: all three media signatures per document in
    one pass.  Payload bytes and pixels/samples never leave the
    worker; output is ~(4 + 4 + kk) small ints per document at any
    corpus size."""
    for pdf in batches:
        rows = [
            (mid, phash_words(mid), afp_words(mid), frame_hashes(mid))
            for mid in (int(m) for m in pdf["media_id"])
        ]
        yield pd.DataFrame(
            rows, columns=["media_id", "img_hw", "aud_hw", "vid_sig"]
        )


def multimodal_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, img_hw, aud_hw, vid_sig): the one-decode-pass
    signature frame.  Callers localCheckpoint it once and fan out the
    per-modality pair joins from the materialization."""
    narrow = rebalance(docs.select(F.col(id_col).alias("media_id")))
    return narrow.mapInPandas(mmsig_stats, MMSIG_SCHEMA)


def fused_pair_graph(docs: DataFrame, sigs: DataFrame) -> DataFrame:
    """The four-modality near-duplicate pair graph (id_a, id_b) over a
    signature frame from :func:`multimodal_signatures`: the image,
    audio, and video banded pair joins each consume a projection of
    ``sigs`` (ONE decode pass), text MinHash runs its JVM-side
    pipeline over ``docs``.  Each modality's join is the registered
    per-modality plan unchanged (phash_band_pairs twice,
    framehash_pair_join, minhash_lsh_pairs) — plan-gated by
    tests/test_plans.py::test_multimodal_keep_set_single_decode."""
    from . import dedup
    from .imagedup import phash_band_pairs
    from .videodup import framehash_pair_join

    img = phash_band_pairs(sigs.select("media_id", F.col("img_hw").alias("hw")))
    aud = phash_band_pairs(sigs.select("media_id", F.col("aud_hw").alias("hw")))
    vid = framehash_pair_join(
        sigs.select(
            "media_id",
            F.size("vid_sig").alias("n_slots"),
            F.posexplode("vid_sig").alias("slot", "fhash"),
        )
    )
    return (
        dedup.minhash_lsh_pairs(docs).select("id_a", "id_b")
        .unionByName(img.select("id_a", "id_b"))
        .unionByName(aud.select("id_a", "id_b"))
        .unionByName(vid.select("id_a", "id_b"))
        .distinct()
    )
