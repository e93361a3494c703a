"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``. The decode step itself is
STUBBED (the image/audio libs are not in this container): with
``fake=True`` a deterministic fake decoder produces stable feature
vectors from the bytes (so the Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real and tested); with ``fake=False`` it
raises ``NotImplementedError`` at the exact point a real decoder (Pillow /
torchaudio / pyav) would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (hash-derived bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * (4 + i % 8)
        meta = {
            "width": 64 + 8 * (i % 16) if kind != "audio" else None,
            "height": 64 + 8 * (i % 12) if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (1 + i % 10) if kind == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((f"m{i:05d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decoder': stable feature vector from content bytes."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 2001).astype(np.float32) / 1000.0 - 1.0


def extract_features(media: DataFrame, fake: bool = True, dim: int = 16) -> DataFrame:
    """Decode + feature-extract kernel over mapInPandas (Arrow batches).

    Real implementation point: replace ``_fake_decode`` with the actual
    decoder per ``kind`` (Pillow for image, soundfile for audio, pyav
    frame-sampling for video). Batch shape, schema and partitioning are
    identical either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires Pillow/soundfile/pyav — "
                    "not available in this container; use fake=True"
                )
            feats = [
                _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )
