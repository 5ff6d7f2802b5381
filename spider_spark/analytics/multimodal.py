"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded and featurized inside Arrow-batched mapInPandas.

Real pure-numpy codecs for formats the sandbox can handle end-to-end:

  * image — BMP, 24-bit uncompressed BI_RGB (bottom-up, 4-byte row
    padding): full header parse + pixel decode in numpy
  * audio — WAV RIFF, PCM 16-bit: chunk walk + sample decode in numpy
  * video — a trivial uncompressed frame container (``VID0`` magic,
    frame count, length-prefixed BMP frames); real codecs (H.264 etc.)
    need ffmpeg/pyav which the sandbox lacks — the CONTAINER demux and
    per-frame decode here are real, only inter-frame compression is out
    of scope (swapping in pyav changes one function)

Batch shape: the outer per-payload loop runs over ``.values`` arrays
(variable-length binaries force a per-payload loop — Pillow does the
same); every pixel/sample-level operation inside is whole-array numpy.
No ``iterrows``, no per-element Python on pixel data.

Crawl-graft pairing: a media span's ``media_ref`` resolves to a row of
``media(media_ref, kind, payload, meta)``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
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

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_features", ArrayType(FloatType())),
])

RESIZED_IMAGE_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),        # re-encoded BMP
])

MEDIA_SUMMARY_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("kind", StringType()),
    StructField("dim", LongType()),
    StructField("feat_sum", DoubleType()),
])

N_HIST_BINS = 16  # gray-level histogram bins in the image feature vector


# ---------------------------------------------------------------------------
# BMP codec (24-bit uncompressed BI_RGB)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) -> BMP bytes (bottom-up BGR, padded rows)."""
    h, w, c = pixels.shape
    assert c == 3
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up, RGB->BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """BMP bytes -> (height, width, channels, HxWx3 uint8 RGB).
    Raises ValueError on anything but 24-bit uncompressed BI_RGB."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    need = data_off + row_size * h
    if len(payload) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * h, offset=data_off)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return h, w, 3, rows[:, :, ::-1]  # BGR->RGB


# ---------------------------------------------------------------------------
# WAV codec (RIFF PCM 16-bit)

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> WAV bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, int16 sample array
    [n, channels] flattened interleaved).  PCM16 only."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            # bounds-check before unpack: a declared size larger than
            # the remaining bytes must surface as ValueError (the
            # operators' drop-bad-payloads contract), not struct.error
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, channels, samples


# ---------------------------------------------------------------------------
# video container: "VID0" | uint32 n_frames | n x (uint32 len | BMP bytes)

def encode_video(frames: list[np.ndarray]) -> bytes:
    out = [b"VID0", struct.pack("<I", len(frames))]
    for fr in frames:
        bmp = encode_bmp(fr)
        out.append(struct.pack("<I", len(bmp)))
        out.append(bmp)
    return b"".join(out)


def demux_video(payload: bytes) -> list[bytes]:
    """Container walk -> list of encoded frame payloads."""
    if payload is None or len(payload) < 8 or payload[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated VID0 frame table")
        (ln,) = struct.unpack_from("<I", payload, pos)
        if pos + 4 + ln > len(payload):
            raise ValueError("truncated VID0 frame payload")
        frames.append(payload[pos + 4: pos + 4 + ln])
        pos += 4 + ln
    return frames


# ---------------------------------------------------------------------------
# feature kernels (whole-array numpy over decoded pixels/samples)

def resize_image(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize by whole-array fancy indexing (no
    per-pixel Python): output (out_h, out_w, C) views the source rows/
    cols selected by integer coordinate maps."""
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot resize an empty image")
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return pixels[rows[:, None], cols[None, :]]


def image_features(pixels: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> [mean_r,g,b, std_r,g,b, 16-bin gray histogram]
    (length 6 + N_HIST_BINS), all float32 in [0, 1]-ish ranges."""
    px = pixels.reshape(-1, 3).astype(np.float32) / 255.0
    mean = px.mean(axis=0)
    std = px.std(axis=0)
    gray = px.mean(axis=1)
    hist, _ = np.histogram(gray, bins=N_HIST_BINS, range=(0.0, 1.0))
    hist = hist.astype(np.float32) / max(1, gray.size)
    return np.concatenate([mean, std, hist]).astype(np.float32)


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """int16 samples -> [rms, zero-crossing rate, 8-band mean |energy|]
    (length 10), float32."""
    x = samples.astype(np.float32) / 32768.0
    if x.size == 0:
        return np.zeros(10, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
    bands = np.array_split(np.abs(x), 8)
    band_e = np.array([b.mean() if b.size else 0.0 for b in bands], dtype=np.float32)
    return np.concatenate([[rms, zcr], band_e]).astype(np.float32)


# ---------------------------------------------------------------------------
# mapInPandas operators

def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + featurize; undecodable payloads are
    dropped (the filter-stage behavior of a real pipeline)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ws, hs, cs, feats = [], [], [], [], []
            for ref, payload in zip(pdf["media_ref"].values,
                                    pdf["payload"].values):
                try:
                    h, w, c, px = decode_bmp(payload)
                except ValueError:
                    continue
                refs.append(ref)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                feats.append(image_features(px).tolist())
            # explicit dtypes: an empty batch would otherwise infer
            # float64 columns that Arrow cannot convert to list<float>
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "width": pd.Series(ws, dtype="int64"),
                "height": pd.Series(hs, dtype="int64"),
                "channels": pd.Series(cs, dtype="int64"),
                "features": pd.Series(feats, dtype="object"),
            })

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, rates, ns, feats = [], [], [], []
            for ref, payload in zip(pdf["media_ref"].values,
                                    pdf["payload"].values):
                try:
                    rate, _, samples = decode_wav(payload)
                except ValueError:
                    continue
                refs.append(ref)
                rates.append(rate)
                ns.append(int(samples.size))
                feats.append(audio_features(samples, rate).tolist())
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "sample_rate": pd.Series(rates, dtype="int64"),
                "n_samples": pd.Series(ns, dtype="int64"),
                "features": pd.Series(feats, dtype="object"),
            })

    return (
        media.filter(F.col("kind") == "audio")
        .mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)
    )


def resize_images(media: DataFrame, out_h: int = 16,
                  out_w: int = 16) -> DataFrame:
    """Arrow-batched decode → nearest-neighbor resize → re-encode:
    the thumbnail/normalization stage of a training pipeline.  Output
    payloads are valid BMPs at (out_h, out_w); undecodable inputs are
    dropped (same filter-stage contract as extract_image_features).
    Per-payload Python is the outer loop only — the pixel work is
    whole-array numpy indexing (resize_image)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ws, hs, payloads = [], [], [], []
            for ref, payload in zip(pdf["media_ref"].values,
                                    pdf["payload"].values):
                try:
                    _, _, _, px = decode_bmp(payload)
                    small = resize_image(px, out_h, out_w)
                except ValueError:
                    continue
                refs.append(ref)
                ws.append(out_w)
                hs.append(out_h)
                payloads.append(encode_bmp(small))
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "width": pd.Series(ws, dtype="int64"),
                "height": pd.Series(hs, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            })

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(_resize, RESIZED_IMAGE_SCHEMA)
    )


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Demux + decode every n-th frame; fan-out (multiple output rows
    per input row), the shape a real frame sampler produces."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, feats = [], [], []
            for ref, payload in zip(pdf["media_ref"].values,
                                    pdf["payload"].values):
                try:
                    frames = demux_video(payload)
                except ValueError:
                    continue
                for idx in range(0, len(frames), every_n):
                    try:
                        _, _, _, px = decode_bmp(frames[idx])
                    except ValueError:
                        continue
                    refs.append(ref)
                    idxs.append(idx)
                    feats.append(image_features(px).tolist())
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_features": pd.Series(feats, dtype="object"),
            })

    return (
        media.filter(F.col("kind") == "video")
        .mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)
    )


def media_feature_summary(media: DataFrame, every_n: int = 10) -> DataFrame:
    """ONE-PASS decode + featurize + reduce over ALL media kinds:
    (media_ref, kind, dim, feat_sum) where dim is width / n_samples /
    sampled-frame count and feat_sum the raw (unrounded) feature-vector
    sum — summed sequentially, matching a JVM ``aggregate`` left fold
    over the float32-exact values.

    The per-kind extract_* operators above are the API when a caller
    needs the full feature vectors; this fused variant exists because
    a summary over a mixed table otherwise costs one scan + one Python
    stage PER KIND plus a union and a per-frame groupBy — at small
    batch counts the extra Python stage spawns dominate, and at scale
    the three scans read the same payload bytes three times.  Dropped
    payloads follow the same contract: undecodable media (or video
    with zero decodable sampled frames) yields no row."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, kinds, dims, sums = [], [], [], []
            for ref, kind, payload in zip(pdf["media_ref"].values,
                                          pdf["kind"].values,
                                          pdf["payload"].values):
                try:
                    if kind == "image":
                        _, w, _, px = decode_bmp(payload)
                        dim, s = int(w), sum(image_features(px).tolist())
                    elif kind == "audio":
                        rate, _, samples = decode_wav(payload)
                        dim = int(samples.size)
                        s = sum(audio_features(samples, rate).tolist())
                    elif kind == "video":
                        frames = demux_video(payload)
                        tot, cnt = 0.0, 0
                        for idx in range(0, len(frames), every_n):
                            try:
                                _, _, _, px = decode_bmp(frames[idx])
                            except ValueError:
                                continue
                            tot += sum(image_features(px).tolist())
                            cnt += 1
                        if cnt == 0:
                            continue
                        dim, s = cnt, tot
                    else:
                        continue
                except ValueError:
                    continue
                refs.append(ref)
                kinds.append(kind)
                dims.append(dim)
                sums.append(float(s))
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "kind": pd.Series(kinds, dtype="object"),
                "dim": pd.Series(dims, dtype="int64"),
                "feat_sum": pd.Series(sums, dtype="float64"),
            })

    return media.mapInPandas(_extract, MEDIA_SUMMARY_SCHEMA)


# ---------------------------------------------------------------------------

def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL encoded payloads
    (BMP / WAV / VID0), derived from (seed, i)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng((seed, i))
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 8 + i % 5, 6 + i % 4
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_bmp(px)
            meta = {"width": str(w), "height": str(h)}
        elif kind == "audio":
            samples = (rng.integers(-2**14, 2**14, size=400 + 10 * i)
                       .astype(np.int16))
            payload = encode_wav(samples, 8000)
            meta = {"sample_rate": "8000"}
        else:
            n_frames = 12 + i % 9
            frames = [rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
                      for _ in range(n_frames)]
            payload = encode_video(frames)
            meta = {"n_frames": str(n_frames)}
        rows.append((f"http://media.example/m/{i}", kind, payload, meta))
    # createDataFrame slices a local list into defaultParallelism (32)
    # partitions: each downstream mapInPandas branch then runs ~32
    # near-empty Python tasks whose worker-spawn cost dwarfs the decode
    # work.  Size partitions for ~16 payloads each instead — a REAL
    # media table read from parquet gets its partitioning from the
    # scan, so this only affects the synthetic source.  repartition,
    # not coalesce: a LocalTableScan feeding a Python eval directly
    # pays a measured ~4 s/job pathology on this Spark build; the
    # exchange breaks the adjacency (see engine.bootstrap).
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(
        max(1, n // 16))
