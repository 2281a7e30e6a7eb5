"""Multimodal columns: image/audio/video as opaque binary + typed metadata,
decoded and featurized inside Arrow-batched pandas iterators.

Decode kernels (``decoder='real'``), stdlib-only — no PIL/ffmpeg needed:

* **audio (WAV)** — parsed with the stdlib ``wave`` module + numpy PCM
  decode; features are real DSP scalars (duration, RMS, zero-crossing rate,
  band energies of a coarse DFT).
* **image (PPM P6)** — the binary Netpbm format parsed with struct/numpy;
  features are a nearest-neighbor 4x4 grayscale thumbnail (the classic
  resize-then-embed shape) plus mean/std.
* **video (uncompressed AVI)** — a RIFF/AVI container with raw RGB24
  ``DIB`` frames (public format: the RIFF chunk grammar + BITMAPINFOHEADER
  layout), parsed with struct/numpy: header dims + fps from ``avih``/
  ``strh``, frames from the ``movi`` ``00db`` chunks (bottom-up BGR rows,
  4-byte aligned). Features sample frames on the same every-ms grid as
  :func:`frame_sample_plan`. Compressed codecs (H.264 etc.) decode through
  the optional ffmpeg seam (:func:`decode_video_ffmpeg`) when an ffmpeg
  binary is on PATH — executor-side subprocess inside the same
  mapInPandas kernel — and fail loudly at :func:`decode_video` otherwise.

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


def _riff_chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF chunk run;
    chunks are 2-byte aligned."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Uncompressed AVI -> (frames uint8 (n, h, w, 3) RGB top-down, fps).

    Parses the public RIFF/AVI layout: ``avih`` for dims, ``strh`` for the
    rate/scale fps fraction, ``strf`` (BITMAPINFOHEADER) to require 24-bit
    BI_RGB, then every ``00db``/``00dc`` chunk under LIST ``movi`` as one
    bottom-up BGR frame with 4-byte-aligned rows."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    rate = scale = None
    usec_per_frame = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, rate, scale, usec_per_frame
        for fourcc, p, size in _riff_chunks(payload, pos, end):
            if fourcc == b"LIST":
                walk(p + 4, p + size)  # skip the list-type fourcc
            elif fourcc == b"avih":
                (usec_per_frame,) = struct.unpack_from("<I", payload, p)
                width, height = struct.unpack_from("<II", payload, p + 32)
            elif fourcc == b"strh":
                if payload[p : p + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", payload, p + 20)
            elif fourcc == b"strf":
                bitcount, compression = struct.unpack_from("<HI", payload, p + 14)
                if bitcount != 24 or compression != 0:
                    raise ValueError(
                        "only uncompressed 24-bit BI_RGB AVI is supported "
                        "(plug ffmpeg at this seam for codec'd video)"
                    )
            elif fourcc in (b"00db", b"00dc"):
                frames.append(payload[p : p + size])

    try:
        walk(12, len(payload))
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI: truncated record stream ({e})") from e
    if not width or not height or not frames:
        raise ValueError("corrupt AVI: missing header or frames")
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1e6 / usec_per_frame
    else:
        raise ValueError("corrupt AVI: no frame timing")
    stride = (width * 3 + 3) & ~3
    out = np.empty((len(frames), height, width, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        rows = np.frombuffer(fb, dtype=np.uint8, count=stride * height)
        bgr = rows.reshape(height, stride)[:, : width * 3].reshape(
            height, width, 3
        )
        out[i] = bgr[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    return out, fps


def ffmpeg_available() -> bool:
    """True when an ffmpeg + ffprobe pair is on PATH — the optional
    compressed-codec seam. The engine never requires it: uncompressed
    RIFF/AVI decodes with the stdlib kernel above."""
    import shutil

    return bool(shutil.which("ffmpeg")) and bool(shutil.which("ffprobe"))


def decode_video_ffmpeg(payload: bytes) -> tuple[np.ndarray, float]:
    """Compressed-codec decode via an ffmpeg subprocess: ffprobe reports
    dims + fps, then ffmpeg emits rawvideo RGB24 on stdout — the same
    (frames, fps) contract as :func:`decode_avi`. Runs executor-side
    inside the mapInPandas kernel (one short-lived subprocess per payload;
    at scale the fork cost amortizes against decode cost, and the payload
    never touches the driver). Pipe-unseekable containers (MP4 with a
    trailing moov) should be remuxed before ingest; AVI/MKV/MPEG-TS pipe
    fine."""
    import json as _json
    import subprocess

    probe = subprocess.run(
        [
            "ffprobe", "-v", "error", "-select_streams", "v:0",
            "-show_entries", "stream=width,height,avg_frame_rate",
            "-of", "json", "pipe:0",
        ],
        input=payload, capture_output=True, timeout=120,
    )
    if probe.returncode != 0:
        raise ValueError(
            f"ffprobe could not parse the payload: {probe.stderr.decode(errors='replace')[:200]}"
        )
    streams = _json.loads(probe.stdout or b"{}").get("streams") or []
    if not streams:
        raise ValueError("ffprobe found no video stream in the payload")
    st = streams[0]
    width, height = int(st["width"]), int(st["height"])
    num, _, den = st.get("avg_frame_rate", "0/1").partition("/")
    fps = (float(num) / float(den)) if float(den or 0) else 0.0
    dec = subprocess.run(
        [
            "ffmpeg", "-v", "error", "-i", "pipe:0",
            "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
        ],
        input=payload, capture_output=True, timeout=600,
    )
    if dec.returncode != 0 or not dec.stdout:
        raise ValueError(
            f"ffmpeg decode failed: {dec.stderr.decode(errors='replace')[:200]}"
        )
    frame_bytes = width * height * 3
    n = len(dec.stdout) // frame_bytes
    frames = (
        np.frombuffer(dec.stdout, dtype=np.uint8, count=n * frame_bytes)
        .reshape(n, height, width, 3)
        .copy()
    )
    if not fps:
        fps = float(n)  # degenerate: treat the clip as one second
    return frames, fps


def decode_video(payload: bytes) -> tuple[np.ndarray, float]:
    """Video decode with the codec seam resolved at runtime: the stdlib
    RIFF/AVI kernel handles uncompressed 24-bit BI_RGB; anything else
    (compressed fourcc, non-AVI container) falls through to ffmpeg when
    present, and otherwise re-raises the stdlib error naming the seam."""
    try:
        return decode_avi(payload)
    except ValueError:
        if ffmpeg_available():
            return decode_video_ffmpeg(payload)
        raise


def video_features(payload: bytes, dim: int, every_ms: int = 1000) -> np.ndarray:
    """Real video features: [duration_s, n_frames, gray_mean, gray_std,
    per-sampled-frame gray means...] padded/truncated to ``dim``. Frames
    are sampled on the same every-ms grid as :func:`frame_sample_plan`, so
    the planned and decoded pipelines line up."""
    frames, fps = decode_video(payload)
    n = frames.shape[0]
    duration_s = n / fps if fps else 0.0
    gray = frames.astype(np.float64).mean(axis=3) / 255.0
    feats = [duration_s, float(n), float(gray.mean()), float(gray.std())]
    ts = 0.0
    while ts < duration_s * 1000 and len(feats) < dim:
        idx = min(int(ts / 1000 * fps), n - 1)
        feats.append(float(gray[idx].mean()))
        ts += every_ms
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(feats))] = np.asarray(feats[:dim], dtype=np.float32)
    return out


def _real_decode(kind: str, payload: bytes, dim: int) -> np.ndarray:
    if kind == "audio":
        return wav_features(payload, dim)
    if kind == "image":
        return image_features(payload, dim)
    return video_features(payload, dim)


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow batches).
    ``decoder='real'`` runs the stdlib WAV/PPM/AVI kernels; ``'fake'`` is
    the deterministic hash stand-in."""

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


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def make_avi(
    frames: np.ndarray, fps: int = 10
) -> bytes:
    """Real uncompressed AVI from uint8 (n, h, w, 3) RGB frames: RIFF
    container, ``avih``/``strh``/``strf`` headers, one ``00db`` DIB chunk
    per frame (bottom-up BGR, 4-byte-aligned rows)."""
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = []
    for f in frames:
        bgr = f[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        frame_bytes.append(rows.tobytes())
    frame_size = stride * h
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIiI4h", 0, 0, 0, 0, 1, fps, 0, n, frame_size, -1, 0,
            0, 0, w, h,
        )
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", fb) for fb in frame_bytes))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def make_video(seed: int, w: int = 16, h: int = 12, n_frames: int = 8, fps: int = 10) -> bytes:
    """Deterministic real AVI: seeded per-frame gradient + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for t in range(n_frames):
        base = ((xx * 17 + yy * 5 + t * 29) % 256).astype(np.uint8)
        frames[t] = np.stack(
            [base, base[::-1], rng.integers(0, 256, (h, w), dtype=np.uint8)],
            axis=2,
        )
    return make_avi(frames, fps)


def synthesize_media(
    spark, n: int = 64, seed: int = 42, real: bool = False
) -> DataFrame:
    """Deterministic media table. ``real=True`` emits genuine WAV/PPM/AVI
    payloads — audio duration is a fixed 200 ms, image dims 32x24, video
    ``6 + i % 5`` frames at 10 fps / 16x12 — all simple functions of the
    media_id so an engine-independent oracle can re-derive the decoded
    structure (the correctness gate does exactly that)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng(seed * 7919 + i)
        kind = kinds[i % 3]
        n_frames = 6 + i % 5
        if real and kind == "audio":
            payload = make_wav(seed * 31 + i)
        elif real and kind == "image":
            payload = make_ppm(seed * 37 + i)
        elif real and kind == "video":
            payload = make_video(seed * 41 + i, n_frames=n_frames)
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
                    "video": "video/x-msvideo" if real else "video/mp4",
                }[kind],
                {"image": 32, "video": 16 if real else None}.get(kind),
                {"image": 24, "video": 12 if real else None}.get(kind),
                (n_frames * 100 if real else 5000 + i * 100)
                if kind == "video"
                else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def probe_media(media: DataFrame) -> DataFrame:
    """Decode every payload with the REAL kernels and report the container
    structure: (media_id, kind, width, height, duration_ms, n_frames) —
    nulls where the kind has no such axis. This is the decoded-side dual of
    the metadata columns: a value-checkable proof the decoders actually
    read the bytes."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("n_frames", LongType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "duration_ms", "n_frames")}
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(p)
                w = h = dur = nf = None
                if kind == "image":
                    img = decode_ppm(payload)
                    h, w = int(img.shape[0]), int(img.shape[1])
                elif kind == "audio":
                    x, rate = decode_wav(payload)
                    dur = round(1000 * x.size / rate)
                else:
                    frames, fps = decode_avi(payload)
                    nf = int(frames.shape[0])
                    h, w = int(frames.shape[1]), int(frames.shape[2])
                    dur = round(1000 * nf / fps)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
                out["n_frames"].append(nf)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=schema)
