"""Multimodal quality gating: the Gopher-gate analog for media — per
document, integer-exact quality signals from REAL decodes of every
modality, composed into one keep/drop flag.  A 100 TB multimodal
ingest gates media the way it gates text: degenerate (near-constant)
images, tiny images, mostly-silent or heavily-clipped audio, and
single-scene stub clips are curation drops before any model sees them.

Signals (each from the real byte path, never the law shortcut):
- image: decoded distinct-color count (a near-constant image carries
  no visual signal) and pixel count — format-routed BMP/PPM/PNG
  decode via the imagedup payload router;
- audio: silence fraction (|s| < 50 of int16 full scale) and clipping
  fraction (|s| >= 990 of the law's ~1000 peak) in exact ppm over the
  decoded PCM — RIFF/WAVE round-trip;
- video: frame count from the REAL AVI container demux (avih header
  cross-validated against the movi chunk walk; no entropy decode —
  the gate needs the count, not the pixels).

Thresholds sit inside the fixture distributions (measured at 5k docs:
colors p10=31, pixels p10=32, silence p90=65,420 ppm, clipping
p90=18,518 ppm, frames uniform 2-7) so BOTH classes populate at any
SF — the same fixture-aware calibration as the text Gopher gate.

The oracle restates each signal from the shared per-modality law CTEs
(imagedup.variant_pixels_ctes / audiodup.clip_samples_ctes /
videodup.clip_dims_cte, prefix-namespaced) — the laws are stated in
SQL exactly once across all oracles, so a law change cannot make the
pair and quality oracles silently disagree.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import rebalance

MIN_COLORS = 32  # distinct decoded colors (near-constant images drop)
MIN_PIXELS = 32
MAX_SILENCE_PPM = 65_000  # |s| < SILENCE_ABS of int16
MAX_CLIP_PPM = 18_000  # |s| >= CLIP_ABS
MIN_FRAMES = 3
SILENCE_ABS = 50
CLIP_ABS = 990

MMQ_SCHEMA = (
    "doc_id long, img_colors long, n_pixels long, n_samples long, "
    "n_silence long, n_clip long, n_frames long"
)


def mmq_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: per doc, synthesize + REAL-decode the three
    media variants and reduce to the raw integer counts; ppm math and
    the gate predicate stay JVM-side (codegen) in
    :func:`multimodal_quality_gate`."""
    import numpy as np

    from .audiodup import synth_variant_samples
    from .imagedup import _variant_payload, synth_variant_pixels
    from .multimodal import (
        decode_media,
        decode_wav,
        parse_avi_index,
        wav_payload_from_samples,
    )
    from .videodup import synth_variant_avi

    for pdf in batches:
        rows = []
        for mid in pdf["doc_id"]:
            mid = int(mid)
            img = synth_variant_pixels(mid)
            payload, mime = _variant_payload(mid, img)
            dec = decode_media(payload, mime)
            colors = int(len(np.unique(dec[:, :, 0])))
            npx = int(dec.shape[0] * dec.shape[1])
            s = decode_wav(
                wav_payload_from_samples(synth_variant_samples(mid))
            ).astype(np.int64)
            n_sil = int((np.abs(s) < SILENCE_ABS).sum())
            n_clip = int((np.abs(s) >= CLIP_ABS).sum())
            meta, _frames = parse_avi_index(synth_variant_avi(mid))
            rows.append(
                (mid, colors, npx, len(s), n_sil, n_clip, meta["n_frames"])
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "img_colors", "n_pixels", "n_samples",
                "n_silence", "n_clip", "n_frames",
            ],
        )


def multimodal_quality_gate(docs: DataFrame) -> DataFrame:
    """(doc_id, img_colors, n_pixels, silence_ppm, clip_ppm, n_frames,
    keep): the composite media gate.  One Arrow-batched decode stage
    emits seven small ints per document (payloads, pixels, and samples
    never leave the worker); the ppm ratios and the five-rule
    conjunction are codegen'd column expressions — the exact shape of
    the text Gopher gate, so at 100 TB this is one scan plus per-row
    math, zero shuffles before the consumer's."""
    narrow = rebalance(docs.select("doc_id"))
    raw = narrow.mapInPandas(mmq_stats, MMQ_SCHEMA)
    silence_ppm = F.expr("n_silence * 1000000 div n_samples")
    clip_ppm = F.expr("n_clip * 1000000 div n_samples")
    keep = (
        (F.col("img_colors") >= MIN_COLORS)
        & (F.col("n_pixels") >= MIN_PIXELS)
        & (silence_ppm <= MAX_SILENCE_PPM)
        & (clip_ppm <= MAX_CLIP_PPM)
        & (F.col("n_frames") >= MIN_FRAMES)
    )
    return raw.select(
        "doc_id",
        "img_colors",
        "n_pixels",
        silence_ppm.alias("silence_ppm"),
        clip_ppm.alias("clip_ppm"),
        "n_frames",
        F.when(keep, 1).otherwise(0).cast("long").alias("keep"),
    )


def multimodal_quality_gate_sql(table: str = "documents") -> str:
    """DuckDB mirror over the three shared law CTEs (prefix-namespaced
    so the modalities compose in one WITH block): distinct colors and
    pixel count from the image law grid, silence/clipping ppm from the
    sample law, frame count from the clip-dims law, the same five-rule
    conjunction."""
    from .audiodup import clip_samples_ctes
    from .imagedup import variant_pixels_ctes
    from .videodup import clip_dims_cte

    return f"""
    WITH {variant_pixels_ctes(table, "i")},
    {clip_samples_ctes(table, "a")},
    {clip_dims_cte(table, "v")},
    img AS (
      SELECT b.doc_id,
             count(DISTINCT b.r)::BIGINT AS img_colors,
             (max(b.width) * max(b.height))::BIGINT AS n_pixels
      FROM ibase b GROUP BY 1
    ),
    aud AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_samples,
             sum(CASE WHEN abs(v) < {SILENCE_ABS} THEN 1 ELSE 0 END)::BIGINT
               AS n_silence,
             sum(CASE WHEN abs(v) >= {CLIP_ABS} THEN 1 ELSE 0 END)::BIGINT
               AS n_clip
      FROM asamp GROUP BY 1
    ),
    vid AS (SELECT doc_id, n::BIGINT AS n_frames FROM vdims)
    SELECT i.doc_id, i.img_colors, i.n_pixels,
           (a.n_silence * 1000000 // a.n_samples)::BIGINT AS silence_ppm,
           (a.n_clip * 1000000 // a.n_samples)::BIGINT AS clip_ppm,
           v.n_frames,
           (CASE WHEN i.img_colors >= {MIN_COLORS}
                  AND i.n_pixels >= {MIN_PIXELS}
                  AND a.n_silence * 1000000 // a.n_samples <= {MAX_SILENCE_PPM}
                  AND a.n_clip * 1000000 // a.n_samples <= {MAX_CLIP_PPM}
                  AND v.n_frames >= {MIN_FRAMES}
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM img i JOIN aud a USING (doc_id) JOIN vid v USING (doc_id)
    """
