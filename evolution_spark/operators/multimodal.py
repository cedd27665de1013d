"""Multimodal column support: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-preserving
transforms, deterministic fake decoders — is real and tested. The actual
media decoding (PIL/libav/ffmpeg) is STUBBED: this container ships no media
libraries, so decoders raise ``NotImplementedError`` unless
``fake=True`` requests the deterministic fake (hash-derived pixels/samples),
which exercises every byte of the pipeline except the codec itself.

Scale design: media bytes never shuffle — every transform here is a narrow
``mapInPandas`` over the scan, so a 100 TB image corpus processes at scan
speed with Arrow-batch transfer into Python only where a codec is genuinely
required.
"""

from __future__ import annotations

import hashlib
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
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: derives a pseudo-pixel buffer from the
    payload's sha256 — stable across runs/engines, exercises the full
    Arrow<->pandas path without a codec."""
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer((digest * 8)[:256], dtype=np.uint8).astype(np.float32)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to a raw sample array.

    STUB: real decoding needs PIL (image) / soundfile (audio) / av (video),
    none of which exist in this container. ``fake=True`` substitutes the
    deterministic fake decoder."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        f"decoding kind={kind!r} requires a media codec library (PIL/soundfile/av); "
        "none is installed in this environment — pass fake=True for the "
        "deterministic test decoder"
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload -> fixed-width feature vector via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); batch shape: the pandas iterator
    yields input-partition-sized chunks, and each output row carries a
    FEATURE_DIM float vector."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                raw = decode_media(bytes(payload), "any", fake=fake)
                # mean-pool into FEATURE_DIM buckets
                pooled = raw[: (len(raw) // FEATURE_DIM) * FEATURE_DIM].reshape(
                    FEATURE_DIM, -1
                ).mean(axis=1)
                feats.append([float(x) for x in pooled])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, _FEATURES_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize plumbing (STUB codec). With ``fake=True`` the payload is
    re-hashed to the target size deterministically; a real deployment swaps
    the inner function for PIL's ``Image.resize`` without touching the Spark
    plumbing."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    out.append(None)
                    continue
                raw = decode_media(bytes(payload), "image", fake=fake)
                resized = np.resize(raw, target).astype(np.uint8)
                out.append(resized.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize, _RESIZE_SCHEMA)


_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing (STUB codec): one output row per sampled
    frame (row-expanding mapInPandas — the streaming-friendly shape for
    frame extraction at scale)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = decode_media(bytes(payload), "video", fake=fake)
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    # deterministic per-frame slice of the fake decode
                    frames.append(np.roll(raw, i).astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_sample, _FRAMES_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-level stats over media payloads — pure JVM (no decode):
    per-kind counts, payload sizes, null rates."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("payload").alias("n_with_payload"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )
