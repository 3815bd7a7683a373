"""Video near-duplicate detection: sampled-frame CONTENT hashes +
slot-agreement scoring — completing the dedup modality set (text,
image, audio, VIDEO).  A 100 TB video corpus dedups at frame/shot
granularity: a re-encoded or lightly edited clip shares most of its
frames' content with the original even when the container bytes are
entirely different.

Method (the frame-hash form of shot-level video dedup; the signature-
agreement scoring is the MinHash-band machinery of ext/dedup.py at
frame granularity):

1. demux the clip's REAL RIFF/AVI container and entropy-decode the
   uniformly sampled MJPEG frames (sample-THEN-decode — only the k
   sampled frames pay the JPEG decode, the multimodal
   ``frame_decode_sampled`` law: slot i of a kk=min(k, n)-slot
   signature decodes frame ``i*n//kk``, so short clips cover every
   frame once);
2. per sampled frame, a canonical CONTENT string (dims + the 8x8
   block-value grid row-major — frames are block-constant by the
   MJPEG fixture law, so the blocks are read back from DECODED pixels
   at the block corners) hashed to 60 bits via the cross-engine md5
   form (ext/hashing.h60: both engines agree on md5 bytes);
3. clip signature = the kk frame hashes in slot order; two clips are
   near-dups when they agree on >= half their slots (exact dups agree
   on all).  The candidate stage is an equi-join on (slot, fhash) —
   EXACT for any agreement >= 1 slot, and a 60-bit content hash makes
   accidental candidates a 2^-60 event, so the join only ever carries
   true frame matches — followed by a per-pair agreement count.

The reference (traubad/FlinkSentimentAnalysis) has no media surface;
this extends the engine's multimodal family with the video dedup
modality a real ingest needs.

Fixture clip law: groups of 4 doc_ids share a seed; variants 0-2 are
byte-identical clips (exact video dups under different ids), variant 3
adds +97 (mod 256) to the top-left 2x2 BLOCKS of frame 0 only — a
planted NEAR duplicate that keeps every other sampled frame identical,
so its agreement is exactly (kk-1)/kk.  Per-frame pixels follow a
block-granular quadratic law with seed-keyed coefficients drawn from
co-prime prime moduli (251/241 — the audio law's anti-aliasing
lesson); frames stay 8x8-block-constant, the one input family the
lossy JPEG round-trips bit-exactly (flat quant table, DC-only
encoding), so the decoded pixels ARE the law and the oracle restates
every hash without parsing a byte.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import rebalance
from .hashing import h60_sql

VFP_GROUP = 4  # doc_ids per seed group (variants 0-2 exact, 3 near)
VFP_K = 4  # sampled frames per clip (slots = min(K, n_frames))
VFP_FRAMES_MOD = 6  # n_frames = seed % 6 + 2
VFP_W_MOD, VFP_W_MIN = 41, 24  # width 24..64: 3-8 block columns
VFP_H_MOD, VFP_H_MIN = 29, 20  # height 20..48: 3-6 block rows
VFP_PERTURB = 97  # variant 3: +97 on frame 0's top-left 2x2 blocks

VFH_SCHEMA = "media_id long, n_slots int, slot int, fhash long"


def clip_dims(seed: int) -> tuple[int, int, int]:
    """(n_frames, width, height) for a seed group."""
    return (
        seed % VFP_FRAMES_MOD + 2,
        seed % VFP_W_MOD + VFP_W_MIN,
        seed % VFP_H_MOD + VFP_H_MIN,
    )


def _block_law(seed: int, fno: int, bx: int, by: int, variant: int) -> int:
    a = (seed * 13 + 11) % 251
    b = (seed * 17 + 7) % 241
    v = (
        a * (bx + 3) * (by + 5)
        + b * (bx * by + (fno + 1) * (bx + 2 * by + 1))
        + 53 * ((bx + 2 * by + fno + seed) % 5)
    ) % 256
    if variant == VFP_GROUP - 1 and fno == 0 and bx < 2 and by < 2:
        v = (v + VFP_PERTURB) % 256
    return v


def synth_variant_avi(doc_id: int) -> bytes:
    """A REAL MJPEG-in-AVI clip for the grouped variant law: every
    '00dc' chunk a complete baseline JFIF frame of the block law."""
    from .multimodal import _avi_container, _synth_jpeg_from_blocks

    seed, variant = doc_id // VFP_GROUP, doc_id % VFP_GROUP
    n, w, h = clip_dims(seed)
    frames = [
        _synth_jpeg_from_blocks(
            w, h,
            lambda bx, by, f=f: _block_law(seed, f, bx, by, variant),
        )
        for f in range(n)
    ]
    return _avi_container(frames, w, h, handler=b"MJPG")


def frame_hashes(mid: int) -> list[int]:
    """The per-clip signature alone: synthesize the real AVI, demux
    it, decode ONLY the kk sampled frames (sample-then-decode), read
    the block grid back from the decoded pixels, md5-hash the
    canonical content string — the slot-ordered list of 60-bit frame
    hashes.  Shared by :func:`vfh_stats` and the FUSED multimodal
    signature stage (ext/mmsig.py), so both paths hash identically by
    construction."""
    import hashlib

    from .multimodal import decode_media, parse_avi_index

    payload = synth_variant_avi(mid)
    meta, frames = parse_avi_index(payload, keep_data=True)
    n, w, h = meta["n_frames"], meta["width"], meta["height"]
    kk = min(VFP_K, n)
    out = []
    for i in range(kk):
        fno = i * n // kk
        px = decode_media(frames[fno]["data"], "image/jpeg")
        # block-constant by format: blocks read at corners
        blocks = px[::8, ::8, 0]
        canon = f"{w}x{h}:" + ",".join(
            str(int(v)) for row in blocks for v in row
        )
        out.append(int(hashlib.md5(canon.encode()).hexdigest()[:15], 16))
    return out


def vfh_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: synthesize the real AVI, demux it, decode
    ONLY the kk sampled frames (sample-then-decode), read the block
    grid back from the decoded pixels, hash the canonical content
    string.  One (media_id, n_slots, slot, fhash) row per sampled
    frame — bytes and pixels never leave the worker."""
    for pdf in batches:
        rows = []
        for mid in pdf["media_id"]:
            mid = int(mid)
            fhs = frame_hashes(mid)
            kk = len(fhs)
            rows.extend((mid, kk, i, fh) for i, fh in enumerate(fhs))
        yield pd.DataFrame(
            rows, columns=["media_id", "n_slots", "slot", "fhash"]
        )


def video_frame_sigs(docs: DataFrame) -> DataFrame:
    """documents -> real AVI demux -> sampled-frame JPEG decode ->
    per-slot 60-bit content hash, one Arrow-batched mapInPandas."""
    narrow = rebalance(docs.select(F.col("doc_id").alias("media_id")))
    return narrow.mapInPandas(vfh_stats, VFH_SCHEMA)


def video_framehash_pairs(docs: DataFrame) -> DataFrame:
    """(id_a, id_b, n_match, n_slots) for clip pairs agreeing on at
    least HALF their sampled-frame content hashes (2*n_match >=
    n_slots; exact dups agree on all slots).

    Plan/scale: the signature frame is localCheckpointed (decode runs
    once, not once per join side); candidates equi-join on
    (slot, fhash) — exact for any agreement, and the 60-bit hash keeps
    the join carrying only true frame matches (no df-cap needed: a
    hash bucket's size is the true multiplicity of that frame content,
    the thing being measured) — then ONE (id_a, id_b) aggregate counts
    matching slots.  Shuffle carries (slot, hash) ints per sampled
    frame, never pixels.  Pairs with different slot counts never score
    (agreement over unlike signatures is undefined); same-seed
    variants always share kk."""
    return framehash_pair_join(video_frame_sigs(docs).localCheckpoint())


def framehash_pair_join(sigs: DataFrame) -> DataFrame:
    """The (slot, fhash) agreement join over an arbitrary
    (media_id, n_slots, slot, fhash) frame — split from the decode
    stage (the phash_band_pairs pattern) so the fused multimodal
    signature stage (ext/mmsig.py) can reuse the identical pair plan
    over its one-decode-pass signatures."""
    left = sigs.select(
        F.col("media_id").alias("id_a"),
        F.col("n_slots").alias("ns_a"),
        "slot", "fhash",
    )
    right = sigs.select(
        F.col("media_id").alias("id_b"),
        F.col("n_slots").alias("ns_b"),
        "slot", "fhash",
    )
    # shuffle_hash: both sides are corpus-sized and checkpoint-descended
    # (stats read small) — without the hint the planner BROADCASTS the
    # whole signature frame, the round-6 lying-stats hazard
    return (
        left.join(right.hint("shuffle_hash"), ["slot", "fhash"])
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("ns_a") == F.col("ns_b")))
        .groupBy("id_a", "id_b", F.col("ns_a").alias("n_slots"))
        .agg(F.count("*").cast("long").alias("n_match"))
        .filter(F.col("n_match") * 2 >= F.col("n_slots"))
        .select(
            "id_a", "id_b", "n_match", F.col("n_slots").cast("long").alias("n_slots")
        )
    )


def clip_dims_cte(table: str, prefix: str = "") -> str:
    """The clip-dimension LAW alone — ``{prefix}dims(doc_id, seed,
    variant, n, w, h)`` — shared by the frame-hash pair oracle and the
    multimodal quality-gate oracle."""
    g, p = VFP_GROUP, prefix
    return f"""{p}dims AS (
      SELECT doc_id, doc_id // {g} AS seed, doc_id % {g} AS variant,
             (doc_id // {g}) % {VFP_FRAMES_MOD} + 2 AS n,
             (doc_id // {g}) % {VFP_W_MOD} + {VFP_W_MIN} AS w,
             (doc_id // {g}) % {VFP_H_MOD} + {VFP_H_MIN} AS h
      FROM {table}
    )"""


def video_framehash_pairs_sql(table: str = "documents") -> str:
    """DuckDB mirror: clip dims (:func:`clip_dims_cte`), sampled
    slots, block-law values, the SAME canonical content string and
    md5-h60 hash, the SAME (slot, fhash) join + agreement count — a
    decoder that sampled a different frame, read a block elsewhere, or
    canonicalized differently cannot match."""
    g = VFP_GROUP
    canon = (
        "w::VARCHAR || 'x' || h::VARCHAR || ':' || "
        "string_agg(v::VARCHAR, ',' ORDER BY by, bx)"
    )
    return f"""
    WITH {clip_dims_cte(table)},
    slots AS (
      SELECT d.*, least({VFP_K}, d.n) AS kk, gs.slot,
             gs.slot * d.n // least({VFP_K}, d.n) AS fno
      FROM dims d,
           LATERAL (SELECT unnest(generate_series(0, least({VFP_K}, d.n) - 1))
                    AS slot) gs
    ),
    blocks AS (
      SELECT s.doc_id, s.kk, s.slot, s.w, s.h, gb.bx, gb.by,
             (((s.seed * 13 + 11) % 251) * (gb.bx + 3) * (gb.by + 5)
              + ((s.seed * 17 + 7) % 241)
                * (gb.bx * gb.by + (s.fno + 1) * (gb.bx + 2 * gb.by + 1))
              + 53 * ((gb.bx + 2 * gb.by + s.fno + s.seed) % 5)) % 256
             + CASE WHEN s.variant = {g - 1} AND s.fno = 0
                         AND gb.bx < 2 AND gb.by < 2
                    THEN {VFP_PERTURB} ELSE 0 END AS v0
      FROM slots s,
           LATERAL (SELECT bx.x AS bx, by.y AS by
                    FROM (SELECT unnest(generate_series(0, (s.w + 7) // 8 - 1))
                          AS x) bx,
                         (SELECT unnest(generate_series(0, (s.h + 7) // 8 - 1))
                          AS y) by) gb
    ),
    sig AS (
      SELECT doc_id, kk AS n_slots, slot,
             {h60_sql(canon)} AS fhash
      FROM (SELECT doc_id, kk, slot, w, h, bx, by, v0 % 256 AS v FROM blocks)
      GROUP BY doc_id, kk, slot, w, h
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*)::BIGINT AS n_match,
           a.n_slots::BIGINT AS n_slots
    FROM sig a JOIN sig b USING (slot, fhash)
    WHERE a.doc_id < b.doc_id AND a.n_slots = b.n_slots
    GROUP BY a.doc_id, b.doc_id, a.n_slots
    HAVING count(*) * 2 >= a.n_slots
    """
