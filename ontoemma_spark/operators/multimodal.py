"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extraction kernels are STUBBED (the container has no
image/audio libraries) behind clearly-marked NotImplementedError or a
deterministic fake — but the Spark-side plumbing is real and tested:
schema, Arrow batch shape, mapInPandas signature, partitioning. Swapping
a real decoder (PIL/torchaudio) into `_decode_stub` is the only change
needed for production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, width int, height int"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes bigint, sha256 string, feature array<float>"

REAL_DECODERS_AVAILABLE = False  # no PIL/cv2/torchaudio in this container


def _decode_stub(payload: bytes, kind: str, feat_dim: int = 8) -> list[float]:
    """Deterministic fake feature vector: bytes of sha256 scaled to
    [0, 1). A real deployment replaces this with the actual decoder +
    model; everything around it (batching, schema, partitioning) is
    production-shaped."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug a real image/audio decoder here")
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i] / 256.0 for i in range(feat_dim)]


def extract_media_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow-batched,
    one Python interpreter visit per batch (not per row); at scale the
    input should be repartitioned so batches are size-uniform (binary
    payload skew), e.g. .repartition(n, "media_id")."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _decode_stub(b, "", feat_dim)),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Native (no-Python) metadata projection over binary columns —
    byte length and magic-byte sniffing stay JVM-side."""
    payload = F.col("payload")
    return media.select(
        "media_id",
        "kind",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.when(F.hex(F.substring(payload, 1, 2)) == "FFD8", "image/jpeg")
        .when(F.hex(F.substring(payload, 1, 4)) == "89504E47", "image/png")
        .otherwise("application/octet-stream")
        .alias("sniffed_mime"),
    )


def synthetic_media(spark, n: int = 50) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = (b"\xff\xd8" if kind == "image" else b"RIFF") + bytes(
            [(i * 7 + j) % 256 for j in range(16 + i % 5)]
        )
        rows.append((f"m{i:04d}", kind, payload, "application/octet-stream", None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
