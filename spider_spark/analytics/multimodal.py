"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the DECODE kernels are
stubbed (deterministic fake features, clearly marked) — but everything
Spark-side is real and tested: schemas, Arrow batch shapes, mapInPandas
signatures, partitioning.  Swapping in Pillow/ffmpeg later only changes
the numpy kernel bodies.

Media rows pair with the crawl graft's media spans: a media span's
``media_ref`` resolves to a row in a ``media(media_ref, kind, payload,
meta)`` table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("kind", StringType()),           # image / audio / video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("meta", MapType(StringType(), StringType())),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_features", ArrayType(FloatType())),
])


def _fake_decode(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the payload bytes.
    Replace with a real codec (Pillow / torchaudio / pyav) off-sandbox.
    Raises on None to mirror a codec's behavior on missing data."""
    if payload is None:
        raise NotImplementedError("no payload; real decoder would fail here")
    h = np.frombuffer(payload[: out_dim * 4].ljust(out_dim * 4, b"\0"), dtype=np.uint32)
    return (h.astype(np.float32) % 1000.0) / 1000.0


def extract_image_features(media: DataFrame, out_dim: int = 16) -> DataFrame:
    """mapInPandas image feature extraction: one Arrow batch in, one
    out; resilient to bad payloads (dropped, as a filter stage would)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    feats = _fake_decode(r["payload"], out_dim)
                except NotImplementedError:
                    continue
                meta = r["meta"] or {}
                rows.append({
                    "media_ref": r["media_ref"],
                    "width": int(meta.get("width", 0)),
                    "height": int(meta.get("height", 0)),
                    "channels": int(meta.get("channels", 3)),
                    "features": feats.tolist(),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)
    )


def sample_video_frames(media: DataFrame, every_n: int = 10,
                        out_dim: int = 8) -> DataFrame:
    """mapInPandas frame sampling: emits multiple rows per input row
    (the fan-out shape a real decoder produces)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"] or {}
                n_frames = int(meta.get("n_frames", 0))
                for idx in range(0, n_frames, every_n):
                    feats = _fake_decode(
                        (r["payload"] or b"") + idx.to_bytes(4, "little"), out_dim
                    )
                    rows.append({
                        "media_ref": r["media_ref"],
                        "frame_idx": idx,
                        "frame_features": feats.tolist(),
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "video")
        .mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)
    )


def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (payload bytes
    derived from (seed, i))."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        meta = {"width": str(64 + i), "height": str(48 + i)}
        if kind == "video":
            meta["n_frames"] = str(30 + i)
        rows.append((f"http://media.example/m/{i}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
