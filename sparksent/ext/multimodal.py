"""Multimodal column plumbing (SURVEY.md §7.1 M5).

Image/audio/video payloads are opaque ``BINARY`` columns with typed
metadata structs; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker sees column batches, never rows.
The decode itself is STUBBED (no media libraries in this container —
``decode_media`` raises NotImplementedError and documents the contract);
``fake_decode_features`` is the deterministic stand-in that keeps the
whole Spark-side pipeline (schema, batching, partitioning, UDF
signature) real and testable.

At 100 TB: media tables are partitioned by (modality, date); the decode
stage is the classic CPU-bound mapInPandas — scale by partition count,
never by driver loops. Feature outputs are narrow (id + floats), so the
expensive binary column is pruned immediately after the map.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import rebalance

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, head_byte int, checksum long"
)


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB — full pixel/sample decode (PIL/ffmpeg/torchaudio) is not
    available in this environment. Contract: payload bytes + mime ->
    ndarray (H,W,C) image / (samples, channels) audio / frame iterator
    video. Swap this single function to go live; everything around it is
    real Spark plumbing — and HEADER decoding (format, dimensions, bit
    depth) is fully real already: see :func:`parse_image_header`."""
    raise NotImplementedError(
        "full media decode requires an image/audio library not present in "
        "this container; parse_image_header decodes real headers, and "
        "fake_decode_features is the deterministic byte-feature path"
    )


# ---------------------------------------------------------------------------
# real header decode (pure Python — no media libraries needed)
# ---------------------------------------------------------------------------


def parse_image_header(payload: bytes | None):
    """Decode (format, width, height, bit_depth) from real image bytes.

    Pure-Python parsers for the three classic formats:
    - PNG: 8-byte signature then the IHDR chunk — width/height are
      big-endian u32 at offsets 16/20, bit depth at 24.
    - JPEG: marker scan from SOI (FFD8) skipping variable-length
      segments until a frame header SOFn (C0-CF except C4/C8/CC);
      height/width are big-endian u16 at +5/+7, sample precision at +4.
    - GIF: 'GIF87a'/'GIF89a' then width/height little-endian u16.

    Returns (None, None, None, None) for unrecognized/truncated bytes —
    per-record degradation, same contract as the CSV parser (a corrupt
    blob cannot kill a 100 TB scan).
    """
    if not payload:
        return (None, None, None, None)
    b = payload
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("png", w, h, b[24])
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return ("jpeg", None, None, None)  # corrupt marker stream
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("jpeg", w, h, b[i + 4])
            i += 2 + seg_len
        return ("jpeg", None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("gif", w, h, 8)
    return (None, None, None, None)


def synth_image_payload(media_id: int, body: bytes) -> bytes:
    """Deterministic REAL image headers for the fixture corpus: format
    rotates by id % 3, dimensions are arithmetic in the id (so the
    DuckDB oracle can state the expected decode output without parsing
    bytes). The body is the document text — irrelevant to header
    parsing, present so payloads have realistic non-header content."""
    w = media_id % 640 + 1
    h = media_id % 480 + 1
    m = media_id % 3
    if m == 0:  # PNG signature + IHDR
        ihdr = (13).to_bytes(4, "big") + b"IHDR"
        ihdr += w.to_bytes(4, "big") + h.to_bytes(4, "big")
        ihdr += bytes([8, 2, 0, 0, 0]) + b"\x00\x00\x00\x00"  # depth..crc
        return b"\x89PNG\r\n\x1a\n" + ihdr + body
    if m == 1:  # JPEG: SOI + APP0 (skipped by the scan) + SOF0
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
        sof0 = b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        sof0 += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        return b"\xff\xd8" + app0 + sof0 + body
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + body


HEADER_SCHEMA = "media_id long, format string, width int, height int, bit_depth int"


def decode_image_headers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: real header parse per payload, Arrow-batched."""
    for pdf in batches:
        parsed = [parse_image_header(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "format": [p[0] for p in parsed],
                "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                "bit_depth": pd.array([p[3] for p in parsed], dtype="Int32"),
            }
        )


def _synth_payload_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "payload": [
                    synth_image_payload(int(i), t.encode("utf-8"))
                    for i, t in zip(pdf["media_id"], pdf["text"])
                ],
            }
        )


def image_media_from_documents(docs: DataFrame) -> DataFrame:
    """documents -> (media_id, payload BINARY) with real PNG/JPEG/GIF
    header bytes (format/dims deterministic in doc_id)."""
    narrow = rebalance(docs.select(F.col("doc_id").alias("media_id"), "text"))
    return narrow.mapInPandas(_synth_payload_batches, "media_id long, payload binary")


def _synth_then_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fused synth+decode: one Python worker round-trip instead of two
    (one Arrow ship of the text in, headers out — the payload bytes
    never cross a worker boundary). The parser still only reads the
    bytes the synthesizer wrote; the functions stay independent."""
    yield from decode_image_headers(_synth_payload_batches(batches))


def extract_image_headers(docs: DataFrame) -> DataFrame:
    """End-to-end: synthesize payloads, then DECODE the real bytes back.
    The two stages fuse into one mapInPandas (a separate-stage variant
    exists via image_media_from_documents + decode_image_headers and is
    what a real pipeline with a stored media table would run)."""
    narrow = rebalance(docs.select(F.col("doc_id").alias("media_id"), "text"))
    return narrow.mapInPandas(_synth_then_decode, HEADER_SCHEMA)


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: byte-level features computable by
    the oracle (length, first byte, additive checksum mod 997). Shape
    and batching are identical to a real decoder."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "head_byte": payloads.map(lambda b: b[0] if b else -1),
                "checksum": payloads.map(
                    lambda b: sum(b) % 997 if b is not None else -1
                ),
            }
        )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from the documents fixture
    (text bytes as payload) — no new random data, oracle-reproducible."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """The decode/feature stage: mapInPandas over (media_id, payload)
    only — metadata and payload columns are pruned before the Python
    boundary so Arrow ships the minimum."""
    narrow = rebalance(media.select("media_id", "payload"))
    return narrow.mapInPandas(fake_decode_features, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# resize + frame sampling (task-spec multimodal surface)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "out_w int, out_h int, out_bytes long"
)


def resize_plan(batches: Iterator[pd.DataFrame], max_w: int = 224, max_h: int = 224):
    """mapInPandas stage: parse each payload's REAL header, then compute
    the aspect-fit resize control plane — scale factor, output dims,
    output byte size (out_w*out_h*3, the RGB buffer a real resampler
    would emit). The pixel resample itself is the STUB (no image lib in
    this container); everything a scheduler/planner needs from a resize
    stage — dims, buffer sizes, batch shape — is computed from the real
    decoded header."""
    for pdf in batches:
        rows = []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            fmt, w, h, _ = parse_image_header(payload)
            if w is None:
                rows.append((int(mid), fmt, None, None, None, None, None))
                continue
            scale = min(max_w / w, max_h / h, 1.0)
            ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
            rows.append((int(mid), fmt, w, h, ow, oh, ow * oh * 3))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_id", "format", "width", "height", "out_w", "out_h", "out_bytes",
            ],
        )


def resize_images(docs: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """synth payload -> real header decode -> aspect-fit resize plan,
    fused into ONE Arrow-batched mapInPandas (payload bytes never leave
    the worker)."""
    def fused(batches: Iterator[pd.DataFrame]):
        yield from resize_plan(_synth_payload_batches(batches), max_w, max_h)

    narrow = rebalance(docs.select(F.col("doc_id").alias("media_id"), "text"))
    return narrow.mapInPandas(fused, RESIZE_SCHEMA)


def resize_images_sql(
    table: str = "documents", max_w: int = 224, max_h: int = 224
) -> str:
    """Oracle: the synthetic header dims are arithmetic in doc_id, and
    the aspect-fit math is plain IEEE double ops (identical results both
    engines — division, min, multiply, floor)."""
    return f"""
    WITH dims AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END
               AS format,
             (doc_id % 640 + 1)::INT AS width,
             (doc_id % 480 + 1)::INT AS height
      FROM {table}
    ),
    s AS (
      SELECT *, least({max_w}.0 / width, {max_h}.0 / height, 1.0) AS scale
      FROM dims
    )
    SELECT media_id, format, width, height,
           greatest(1, floor(width * scale))::INT AS out_w,
           greatest(1, floor(height * scale))::INT AS out_h,
           (greatest(1, floor(width * scale))
            * greatest(1, floor(height * scale)) * 3)::BIGINT AS out_bytes
    FROM s
    """


FRAME_SCHEMA = "media_id long, sample_idx int, frame_no long, frame_fp long"


def frame_sample(media: DataFrame, k: int = 8) -> DataFrame:
    """Uniform k-frame sampling of a 'video' (stand-in: the document,
    with n_frames = payload byte length): a ROW-EXPANDING mapInPandas
    (1 video in, <=k frames out) emitting (sample_idx, frame_no,
    frame_fp). frame_no = floor(i * n_frames / k) — the uniform
    sampler every video pipeline uses; the frame DECODE is the stub
    (frame_fp is a deterministic stand-in fingerprint, (media_id*31 +
    frame_no) % 997), while the expansion shape, schema, and batch
    plumbing are real."""
    def fn(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                for i in range(min(k, n)):
                    fno = i * n // k
                    rows.append((int(mid), i, fno, (int(mid) * 31 + fno) % 997))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_idx", "frame_no", "frame_fp"]
            )

    narrow = rebalance(media.select("media_id", "payload"))
    return narrow.mapInPandas(fn, FRAME_SCHEMA)


def frame_sample_sql(table: str = "documents", k: int = 8) -> str:
    """Oracle over the documents-derived media table (payload = UTF-8
    text bytes, so n_frames = strlen of the ASCII fixture text)."""
    return f"""
    WITH v AS (SELECT doc_id AS media_id, strlen(text)::BIGINT AS n FROM {table}),
    idx AS (SELECT unnest(generate_series(0, {k - 1})) AS sample_idx)
    SELECT media_id, sample_idx::INT AS sample_idx,
           (sample_idx * n) // {k} AS frame_no,
           (media_id * 31 + (sample_idx * n) // {k}) % 997 AS frame_fp
    FROM v JOIN idx ON sample_idx < least({k}, n)
    """
