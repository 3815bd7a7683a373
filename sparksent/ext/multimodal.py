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
    """STUB — real decode (PIL/ffmpeg/torchaudio) is not available in
    this environment. Contract: payload bytes + mime -> ndarray
    (H,W,C) image / (samples, channels) audio / frame iterator video.
    Swap this single function to go live; everything around it is real
    Spark plumbing."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "container; use fake_decode_features for the deterministic test path"
    )


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
