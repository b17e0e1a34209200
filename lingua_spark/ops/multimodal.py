"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through Python
row objects. The actual codecs are STUBBED (this container has no
image/audio libraries): ``decode_stub`` produces a deterministic fake
feature vector from the payload hash, and the real decoder slot raises
NotImplementedError. The Spark-side plumbing — schema, batching,
partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    MEDIA_SCHEMA.fields[:2]
    + [
        StructField("feature", ArrayType(FloatType())),
        StructField("payload_sha", StringType()),
    ]
)


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real decoder slot — requires imaging/audio libs absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_stub (deterministic fake) for plumbing tests"
    )


def decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake feature: FEATURE_DIM floats from the sha256."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / np.float32(65535.0))[:FEATURE_DIM]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out;
    payloads stay columnar end to end."""
    from ..engine.udfs import ship_package

    ship_package(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            shas = [
                hashlib.sha256(p if p is not None else b"").hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_sha": shas,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame,
    uniformly spaced across duration_ms. Real shape: a mapInPandas stage
    that EXPANDS rows (1 video -> n frames) keeping payload bytes
    columnar; the frame decoder is stubbed (no codecs in this container)
    as a deterministic byte slice of the payload, with the real decode
    slot being ``decode_real``."""
    from ..engine.udfs import ship_package

    ship_package(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_ts_ms": [],
                "frame_payload": [],
            }
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["duration_ms"],
            ):
                if kind != "video":
                    continue
                p = bytes(payload) if payload is not None else b""
                dur = int(dur) if dur is not None else 0
                for k in range(n_frames):
                    # stub "decode": deterministic rotating byte slice
                    start = (k * max(1, len(p) // n_frames)) % max(len(p), 1)
                    frame = p[start : start + 32] if p else b""
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame_ts_ms"].append(
                        int(k * dur / n_frames) if n_frames else 0
                    )
                    out["frame_payload"].append(frame)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kinds[i % 3],
                bytearray(payload),
                "application/octet-stream",
                64,
                64,
                1000,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
