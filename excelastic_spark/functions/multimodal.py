"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed in Arrow-batched pandas iterators.

The Spark-side machinery here is real and tested (schemas, partition-safe
mapInPandas signatures, deterministic batch shapes); the actual media codecs
(PIL/ffmpeg/librosa) are NOT in this container, so the decode kernels are
stubbed behind clearly-marked seams: ``decoder='fake'`` produces
deterministic pseudo-content from the payload hash (so pipelines are
testable end-to-end), ``decoder='real'`` raises NotImplementedError at the
exact call site where the library would be invoked.
"""

from __future__ import annotations

import hashlib
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
    """Deterministic pseudo-feature from the payload digest — stands in for
    a real decode+embed kernel; replace with PIL/ffmpeg here."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow batches).
    The batch shape, schema and partitioning here are exactly what a real
    image/audio featurizer needs; only the kernel is swapped."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in container); "
                    "use decoder='fake' for the deterministic test kernel"
                )
            payloads = pdf["payload"]
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


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.default_rng(seed * 7919 + i)
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=128 + i % 64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 + i * 100 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
