"""Audio near-duplicate detection: Haitsma-Kalker-style energy-band
fingerprint over DECODED PCM + the shared banded Hamming pair join —
completing the dedup modality set (text: MinHash/simhash families;
image: ext/imagedup.py; audio: this module).  A 100 TB audio corpus
dedups on SAMPLES: the same clip re-encoded or lightly edited has
different bytes but an almost identical energy-envelope fingerprint.

Method (public: the sign-of-energy-difference fingerprint of Haitsma &
Kalker, "A Highly Robust Audio Fingerprint System", ISMIR 2002,
simplified to the integer-exact single-frame form; banding per
Leskovec/Rajaraman/Ullman ch. 3, the pigeonhole trick shared with
simhash_pairs and image_phash_pairs):

1. decode the clip bytes to PCM16 samples — REAL RIFF/WAVE round-trip
   via :func:`sparksent.ext.multimodal.wav_payload_from_samples` /
   ``decode_wav`` (chunk walk, fmt validation);
2. partition the clip into 65 near-equal time bins (sample t of an
   n-sample clip lands in bin ``t * 65 // n``) and take each bin's
   MEAN energy (sum of squared samples floor-divided by the bin's
   sample count — BIGINT-exact).  Mean, not sum, is load-bearing:
   near-equal bins still differ by one sample, and the raw-sum form
   made the gradient bits substantially a function of that BIN-SIZE
   pattern (which depends only on n) — measured at 5k clips, ~8k
   accidental cross-seed pairs from size-correlated fingerprints; the
   mean form (Haitsma-Kalker's normalized energies) restores
   per-sample randomness and zero accidental pairs at 100k clips;
3. fingerprint: bit(i) = 1 iff E[i+1] > E[i] — 64 energy-gradient
   signs, stored as FOUR 16-bit words;
4. pair via the SAME banded (word_idx, word_value) equi-join as the
   image modality — pigeonhole-exact for Hamming distance <= 3, df cap
   against degenerate (silent/constant) corpora, exact popcount(xor)
   filter.  The Spark pair stage IS :func:`imagedup.phash_band_pairs`;
   the oracle tail IS :func:`imagedup.banded_hamming_tail_sql`.

The reference (traubad/FlinkSentimentAnalysis) has no media surface;
this extends the engine's multimodal family with the audio dedup
modality a real ingest needs.

Fixture clip law: the container has no audio corpus, so clips are
SYNTHESIZED deterministically from doc_id and round-trip through the
real WAV encoder/decoder (the multimodal strategy — the oracle
restates samples from the law by grid expansion, the Spark side never
shortcuts the byte path).  doc_ids form groups of 4 sharing a seed:
variants 0-2 are sample-identical (exact audio dups under different
ids), variant 3 adds +40 to the first 6 samples — a planted NEAR
duplicate that disturbs only the first time bins' energies, flipping
at most a few gradient bits.

The sample law is QUADRATIC in t with seed-keyed coefficients drawn
from CO-PRIME prime moduli::

    a = (seed*13 + 11) % 1997;  b = (seed*17 + 7) % 1993
    s(t) = (a*(t+3)*(t+5) + b*t*t + 53*((t + 2*seed) % 5)) % 2001 - 1000

Both design choices are load-bearing, found by measuring candidate
pairs at 100k clips (prototyped in numpy before wiring):
- a LINEAR law (slope*t + ...) is a modular rotation sequence whose
  windowed energy sums carry three-distance-theorem structure — seeds
  sharing a residue class produced fingerprints within Hamming 1 even
  at wildly different clip lengths (~11k accidental pairs at 5k
  clips); the quadratic form behaves like the image law's bilinear
  pixel law instead;
- drawing a, b mod 2001 aliases seeds 2001 apart onto the SAME sample
  shape (16-192 residual accidental pairs depending on how clip
  lengths line up); mod 1997/1993 pushes the joint alias period past
  3.9M seeds.  Measured at 100k clips: 150,000 planted in-group
  pairs, ZERO cross-group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import rebalance
from .imagedup import (
    PHASH_MAX_DF,
    PHASH_MAX_HAMMING,
    banded_hamming_tail_sql,
    phash_band_pairs,
)

AFP_GROUP = 4  # doc_ids per seed group (variants 0-2 exact, 3 near)
AFP_BINS = 65  # 65 energy bins -> 64 gradient-sign bits
AFP_N_MOD = 800  # n_samples = seed % 800 + 72
AFP_N_MIN = 72
AFP_PERTURB_N = 6  # variant 3: first 6 samples get +40
AFP_PERTURB = 40

AFP_SCHEMA = "media_id long, w0 int, w1 int, w2 int, w3 int"


def synth_variant_samples(doc_id: int):
    """(n,) int16 PCM for the grouped near-duplicate clip law."""
    import numpy as np

    seed, variant = doc_id // AFP_GROUP, doc_id % AFP_GROUP
    n = seed % AFP_N_MOD + AFP_N_MIN
    t = np.arange(n, dtype=np.int64)
    a = (seed * 13 + 11) % 1997
    b = (seed * 17 + 7) % 1993
    s = ((a * (t + 3) * (t + 5) + b * t * t + 53 * ((t + 2 * seed) % 5)) % 2001) - 1000
    if variant == AFP_GROUP - 1:
        s = s + np.where(t < AFP_PERTURB_N, AFP_PERTURB, 0)
    return s.astype(np.int16)


def afp_words(mid: int) -> list[int]:
    """The per-clip fingerprint alone: synthesize the WAV payload,
    decode it back through the real RIFF chunk walker, MEAN-energy the
    65 near-equal time bins, fold the 64 gradient signs into four
    16-bit words.  Shared by :func:`afp_stats` and the FUSED
    multimodal signature stage (ext/mmsig.py), so both paths hash
    identically by construction."""
    import numpy as np

    from .multimodal import decode_wav, wav_payload_from_samples

    shifts = np.arange(16, dtype=np.int64)
    payload = wav_payload_from_samples(synth_variant_samples(mid))
    s = decode_wav(payload).astype(np.int64)
    n = len(s)
    idx = np.arange(n) * AFP_BINS // n
    e = np.zeros(AFP_BINS, dtype=np.int64)
    np.add.at(e, idx, s * s)
    cnt = np.bincount(idx, minlength=AFP_BINS).astype(np.int64)
    e = e // np.maximum(cnt, 1)  # mean energy; empty bin -> 0
    bits = (e[1:] > e[:-1]).astype(np.int64)
    return [int((bits[w * 16:(w + 1) * 16] << shifts).sum()) for w in range(4)]


def afp_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: synthesize a real WAV FILE for the variant
    law, decode it back through the real RIFF chunk walker, bin the
    samples into 65 near-equal windows, and emit the 64
    energy-gradient signs as four 16-bit words.  Payload bytes and
    samples never leave the worker; the output is 4 small ints per
    clip at ANY corpus size."""
    for pdf in batches:
        rows = [(int(mid), *afp_words(int(mid))) for mid in pdf["media_id"]]
        yield pd.DataFrame(rows, columns=["media_id", "w0", "w1", "w2", "w3"])


def audio_fingerprints(docs: DataFrame) -> DataFrame:
    """documents -> real WAV encode -> real decode -> 65-bin energies
    -> gradient fingerprint, one Arrow-batched mapInPandas:
    (media_id, hw ARRAY<INT>[4 x 16-bit words])."""
    narrow = rebalance(docs.select(F.col("doc_id").alias("media_id")))
    fp = narrow.mapInPandas(afp_stats, AFP_SCHEMA)
    return fp.select("media_id", F.array("w0", "w1", "w2", "w3").alias("hw"))


def audio_fp_pairs(
    docs: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    max_df: int | None = PHASH_MAX_DF,
) -> DataFrame:
    """(id_a, id_b, hamming) for audio-clip pairs within
    ``max_hamming`` bits of fingerprint distance.  The pair stage IS
    the image modality's :func:`imagedup.phash_band_pairs` — banded
    equi-join, df cap, exact popcount filter — over the audio hash
    frame; only the 64-bit derivation differs.  Scale shape identical:
    decode is Arrow-batched per-row Python emitting 4 ints/clip, the
    shuffle carries fingerprint words, never samples."""
    fp = audio_fingerprints(docs).localCheckpoint()
    return phash_band_pairs(fp, max_hamming, max_df)


def clip_samples_ctes(table: str, prefix: str = "") -> str:
    """The variant clip LAW alone as CTEs — ``{prefix}dims(doc_id,
    seed, variant, n)`` and ``{prefix}samp(doc_id, n, t, v)`` — shared by
    the fingerprint-pair oracle and the multimodal quality-gate oracle
    so the law is stated in SQL exactly once.  ``prefix`` namespaces
    the CTEs when several modality laws compose in one oracle."""
    g, p = AFP_GROUP, prefix
    return f"""{p}dims AS (
      SELECT doc_id, doc_id // {g} AS seed, doc_id % {g} AS variant,
             ((doc_id // {g}) % {AFP_N_MOD} + {AFP_N_MIN})::BIGINT AS n
      FROM {table}
    ),
    {p}samp AS (
      SELECT d.doc_id, d.n, g.t,
             (((d.seed * 13 + 11) % 1997) * (g.t + 3) * (g.t + 5)
              + ((d.seed * 17 + 7) % 1993) * g.t * g.t
              + 53 * ((g.t + 2 * d.seed) % 5)) % 2001 - 1000
             + CASE WHEN d.variant = {g - 1} AND g.t < {AFP_PERTURB_N}
                    THEN {AFP_PERTURB} ELSE 0 END AS v
      FROM {p}dims d,
           LATERAL (SELECT unnest(generate_series(0, d.n - 1)) AS t) g
    )"""


def audio_fp_pairs_sql(
    table: str = "documents",
    max_hamming: int = PHASH_MAX_HAMMING,
    max_df: int | None = PHASH_MAX_DF,
) -> str:
    """DuckDB mirror: variant-law samples by grid expansion
    (:func:`clip_samples_ctes`), the SAME integer bin/energy/gradient
    sequence (empty bins restated as energy 0 via the bin grid left
    join), then the SHARED banded Hamming tail — a fingerprint that
    binned a sample differently, packed a bit elsewhere, or capped a
    different hot set cannot match."""
    return f"""
    WITH {clip_samples_ctes(table)},
    eb AS (
      SELECT doc_id, (t * {AFP_BINS} // n)::BIGINT AS b,
             (sum(v * v)::BIGINT // count(*))::BIGINT AS e
      FROM samp GROUP BY 1, 2
    ),
    bin_grid AS (
      SELECT d.doc_id, gb.b
      FROM dims d,
           LATERAL (SELECT unnest(generate_series(0, {AFP_BINS - 1})) AS b) gb
    ),
    energy AS (
      SELECT g.doc_id, g.b, coalesce(e.e, 0)::BIGINT AS e
      FROM bin_grid g LEFT JOIN eb e ON e.doc_id = g.doc_id AND e.b = g.b
    ),
    bits AS (
      SELECT a.doc_id, a.b AS i,
             CASE WHEN nx.e > a.e THEN 1 ELSE 0 END AS bit
      FROM energy a
      JOIN energy nx ON nx.doc_id = a.doc_id AND nx.b = a.b + 1
      WHERE a.b < {AFP_BINS - 1}
    ),
    {banded_hamming_tail_sql(max_hamming, max_df)}
    """
