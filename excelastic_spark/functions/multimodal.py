"""Multimodal columns: image/audio/video as opaque binary + typed metadata,
decoded and featurized inside Arrow-batched pandas iterators.

Decode kernels (``decoder='real'``), stdlib-only — no PIL/ffmpeg needed:

* **audio (WAV)** — parsed with the stdlib ``wave`` module + numpy PCM
  decode; features are real DSP scalars (duration, RMS, zero-crossing rate,
  band energies of a coarse DFT).
* **image (PPM P6)** — the binary Netpbm format parsed with struct/numpy;
  features are a nearest-neighbor 4x4 grayscale thumbnail (the classic
  resize-then-embed shape) plus mean/std.
* **video** — no container/codec parser is available in the stdlib, so the
  video branch keeps the honest ``NotImplementedError`` seam; its
  *plumbing* (frame-sample planning, schema, batching) is real and tested,
  and ``decoder='fake'`` provides a deterministic stand-in so end-to-end
  pipelines remain testable.

``decoder='fake'`` produces a deterministic pseudo-feature from the payload
hash for every kind — the oracle-checkable path used by the correctness
gate (media derived from the documents table; n_bytes/sha re-derived by
DuckDB).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature from the payload digest — the portable
    stand-in used when no real kernel applies (and by the gate)."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


# --------------------------------------------------------------------------
# real decode kernels (stdlib)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        channels = w.getnchannels()
        rate = w.getframerate()
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, rate


def wav_features(payload: bytes, dim: int) -> np.ndarray:
    """Real audio features: [duration_s, rms, zero_crossing_rate,
    band_energy_0..k] padded/truncated to ``dim``."""
    x, rate = decode_wav(payload)
    n = x.size
    feats = [n / rate if rate else 0.0]
    if n:
        feats.append(float(np.sqrt(np.mean(x * x))))
        feats.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
        spec = np.abs(np.fft.rfft(x))
        bands = np.array_split(spec, max(1, dim - 3))
        feats.extend(float(np.sqrt(np.mean(b * b))) if b.size else 0.0 for b in bands)
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(feats))] = np.asarray(feats[:dim], dtype=np.float32)
    return out


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary Netpbm P6 -> uint8 array (h, w, 3)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> single-whitespace, then raw RGB
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — the vectorized index-gather form every
    image pipeline uses before featurization."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def image_features(payload: bytes, dim: int) -> np.ndarray:
    """Real image features: 4x4 nearest-neighbor grayscale thumbnail
    (normalized) + [mean, std], padded/truncated to ``dim``."""
    img = decode_ppm(payload)
    gray = img.astype(np.float64).mean(axis=2) / 255.0
    thumb = resize_nearest(gray, 4, 4).ravel()
    feats = list(thumb) + [float(gray.mean()), float(gray.std())]
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(feats))] = np.asarray(feats[:dim], dtype=np.float32)
    return out


def _real_decode(kind: str, payload: bytes, dim: int) -> np.ndarray:
    if kind == "audio":
        return wav_features(payload, dim)
    if kind == "image":
        return image_features(payload, dim)
    raise NotImplementedError(
        "real video decode needs a codec library (none in the stdlib/"
        "container); the frame-sample PLAN is real (frame_sample_plan) — "
        "plug ffmpeg here per sampled frame at deployment"
    )


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow batches).
    ``decoder='real'`` runs the stdlib WAV/PPM kernels (video raises, see
    module docstring); ``'fake'`` is the deterministic hash stand-in."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decoder == "real":
                feats = [
                    _real_decode(k, bytes(p), dim)
                    for k, p in zip(pdf["kind"], payloads)
                ]
            else:
                feats = [_fake_decode(bytes(p), dim) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_sha": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, schema=FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Plan frame-sample points for video rows (pure Catalyst: no decode
    needed to plan; the decode happens in extract_features per sampled
    frame at scale). Returns one row per (media_id, frame_ts_ms)."""
    video = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull()
    )
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("duration_ms") - 1,
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


# --------------------------------------------------------------------------
# deterministic real-media synthesis (tests + demos)


def make_wav(seed: int, ms: int = 200, rate: int = 8000) -> bytes:
    """Real 16-bit mono WAV: a seeded sine + harmonic."""
    rng = np.random.default_rng(seed)
    freq = 200 + int(rng.integers(0, 800))
    t = np.arange(int(rate * ms / 1000)) / rate
    x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(2 * np.pi * 2 * freq * t)
    pcm = (x * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_ppm(seed: int, w: int = 32, h: int = 24) -> bytes:
    """Real P6 PPM: seeded gradient + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    img = np.stack(
        [base, base[::-1], rng.integers(0, 256, (h, w), dtype=np.uint8)], axis=2
    )
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + img.tobytes()


def synthesize_media(
    spark, n: int = 64, seed: int = 42, real: bool = False
) -> DataFrame:
    """Deterministic media table. ``real=True`` emits genuine WAV/PPM
    payloads for audio/image rows (video payloads stay opaque seeded
    bytes — there is no stdlib video encoder either)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng(seed * 7919 + i)
        kind = kinds[i % 3]
        if real and kind == "audio":
            payload = make_wav(seed * 31 + i)
        elif real and kind == "image":
            payload = make_ppm(seed * 37 + i)
        else:
            payload = bytes(rng.integers(0, 256, size=128 + i % 64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "image": "image/x-portable-pixmap" if real else "image/png",
                    "audio": "audio/wav",
                    "video": "video/mp4",
                }[kind],
                32 if kind == "image" else None,
                24 if kind == "image" else None,
                5000 + i * 100 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
