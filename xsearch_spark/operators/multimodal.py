"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic fake decoder parses our synthetic header.
Everything Spark-side — schema, partitioning, UDF signatures, Arrow
batch shapes, feature vectors — is real and tested; swapping the fake
for PIL/torchaudio is a one-function change inside the UDF.

Asset layout (one row per asset):
    asset_id: long, media_type: string (image|audio|video),
    payload: binary, meta: struct<width:int, height:int, n_frames:int>

Synthetic payload format (deterministic from asset_id, seed 42):
    bytes 0..3   magic b"XMM0"
    bytes 4..7   width  (uint32 LE)
    bytes 8..11  height (uint32 LE)
    bytes 12..15 n_frames (uint32 LE)
    then n_frames frames of width*height bytes (hash-derived)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"XMM0"
FEATURE_DIM = 16  # byte-histogram feature bins

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), False),
                    StructField("height", IntegerType(), False),
                    StructField("n_frames", IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)


def _fake_payload(asset_id: int, width: int, height: int, n_frames: int) -> bytes:
    header = MAGIC + struct.pack("<III", width, height, n_frames)
    frame_sz = width * height
    frames = []
    for f in range(n_frames):
        seed = hashlib.sha256(f"{asset_id}:{f}:42".encode()).digest()
        reps = frame_sz // len(seed) + 1
        frames.append((seed * reps)[:frame_sz])
    return header + b"".join(frames)


def synth_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table (pure function of n)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        frames = 1 if kind == "image" else 4 + (i % 4)
        rows.append((i, kind, _fake_payload(i, w, h, frames), (w, h, frames)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an (h, w) array.

    Real codecs (PIL/libjpeg) are NOT in this container — the real
    branch is a clearly-marked stub per the build contract.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic synthetic decoder"
        )
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    w, h, _n = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)


DECODED_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("payload_bytes", LongType(), False),
    ]
)


def extract_meta(assets: DataFrame) -> DataFrame:
    """Parse headers via mapInPandas (vectorized over the Arrow batch's
    payload column — the pattern a real decoder plugs into)."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [struct.unpack("<III", p[4:16]) for p in pdf["payload"]]
            w, h, nf = (list(t) for t in zip(*metas)) if metas else ([], [], [])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "width": np.array(w, dtype=np.int32),
                    "height": np.array(h, dtype=np.int32),
                    "n_frames": np.array(nf, dtype=np.int32),
                    "payload_bytes": pdf["payload"].map(len).to_numpy(np.int64),
                }
            )

    return assets.mapInPandas(it, DECODED_META_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset feature vector: normalized 16-bin byte histogram of the
    body (deterministic stand-in for an embedding model). NumPy-
    vectorized per batch: one bincount over all payload bytes."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for p in pdf["payload"]:
                body = np.frombuffer(p, dtype=np.uint8, offset=16)
                hist = np.bincount(body >> 4, minlength=FEATURE_DIM).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(), "features": feats}
            )

    return assets.mapInPandas(it, FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames(assets: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: explode every ``every``-th frame into its
    own row — the fan-out shape of a real video pipeline (one input
    batch -> many output rows, streamed per Arrow batch)."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                w, h, nf = struct.unpack("<III", p[4:16])
                fs = w * h
                for f in range(0, nf, every):
                    ids.append(aid)
                    idxs.append(f)
                    frames.append(p[16 + f * fs : 16 + (f + 1) * fs])
            yield pd.DataFrame(
                {
                    "asset_id": np.array(ids, dtype=np.int64),
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "frame": frames,
                }
            )

    return assets.filter(F.col("media_type") == "video").mapInPandas(it, FRAMES_SCHEMA)
