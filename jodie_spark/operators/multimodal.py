"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, Arrow-batched ``mapInPandas``
pipelines, partition sizing — is real and tested. The codec layer
(actual JPEG/WAV/MP4 decode) is STUBBED: the runtime has no imaging or
audio libraries, so ``decode=fake`` produces deterministic
hash-derived outputs with the correct shapes, and ``decode=real``
raises ``NotImplementedError`` at the point where a codec library
(Pillow/ffmpeg/torchaudio) would be called. Swapping the stub for a
real decoder changes only the inner function body — the distributed
plan (batch iteration, schema, partitioning) is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def with_media_metadata(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """Attach cheap structural metadata (no decode): byte length and a
    content digest — all JVM-side."""
    return df.withColumn("n_bytes", F.length(F.col(binary_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(binary_col))
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image header parsing: dimensions
    derived from the content digest, stable across runs/partitions."""
    h = hashlib.md5(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def decode_images(
    df: DataFrame, binary_col: str = "data", mode: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """Decode an image binary column to (width, height, n_pixels).

    Arrow-batched ``mapInPandas``: executors stream record batches, so
    peak memory is one batch of decoded rows per core regardless of
    table size. ``mode='real'`` marks where Pillow would be invoked.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_pixels", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if mode == "real":
                raise NotImplementedError(
                    "real image decode requires an imaging library (e.g. Pillow): "
                    "replace this branch with Image.open(io.BytesIO(b))"
                )
            dims = [_fake_decode_dims(b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["width"] = [w for w, _ in dims]
            pdf["height"] = [h for _, h in dims]
            pdf["n_pixels"] = [w * h for w, h in dims]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def extract_features(
    df: DataFrame, binary_col: str = "data", dim: int = 16, mode: str = "fake"
) -> DataFrame:
    """Content → feature vector (``array<float>``). Fake mode derives a
    deterministic unit vector from the md5 digest — the right shape for
    wiring into :mod:`jodie_spark.operators.similarity` downstream.
    ``mode='real'`` marks the model-inference call site."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if mode == "real":
                raise NotImplementedError(
                    "real feature extraction requires a vision/audio model runtime"
                )
            feats = []
            for b in pdf[binary_col]:
                seed = int.from_bytes(hashlib.md5(b or b"").digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim)
                feats.append((v / np.linalg.norm(v)).astype("float32").tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "data",
    every_ms: int = 1000,
    mode: str = "fake",
) -> DataFrame:
    """Video → one row per sampled frame (frame_idx, frame_ts_ms,
    frame_data). Fake mode synthesizes a deterministic frame count from
    the content digest; the explode/flatMap shape (one input row → N
    output rows, streamed per Arrow batch) is exactly what a real
    ffmpeg-backed sampler needs."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame_data", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if mode == "real":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/pyav bindings"
                )
            rows = []
            for _, row in pdf.iterrows():
                b = row[binary_col] or b""
                n_frames = 1 + hashlib.md5(b).digest()[2] % 4
                for i in range(n_frames):
                    r = dict(row)
                    r["frame_idx"] = i
                    r["frame_ts_ms"] = i * every_ms
                    r["frame_data"] = hashlib.md5(b + bytes([i])).digest()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(batches, out_schema)
