"""Media (image + audio) near-duplicate removal by perceptual hash.

The multimodal twins of text SimHash dedup: a 64-bit content hash per
blob — dHash over DECODED image pixels (the same picture stored as BMP
and as PNG collides), a loudness-envelope hash over decoded PCM audio —
then the generic banded
:func:`jodie_spark.operators.text_dedup.hamming_dedup`: bucket-join on
16-bit hash bands (pigeonhole guarantees recall for hamming ≤ bands-1),
exact ``bit_count(xor)`` verification, higher id of each verified pair
drops.

Scale shape: decoding is Arrow-batched ``mapInPandas`` (one pass, peak
memory = one batch of decoded images per core); after it only (id,
64-bit hash) rows shuffle — the image bytes never enter the dedup
exchange. ``mode='fake'`` hash-derives the hash from the raw bytes for
oracle-checkable plumbing tests without decodable fixtures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_image_dhash(
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "real",
    hash_col: str = "image_hash",
) -> DataFrame:
    """Attach the 64-bit perceptual hash of each image binary."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(hash_col, T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for b in pdf[binary_col]:
                if mode == "real":
                    from jodie_spark.operators.codecs import decode_image, dhash

                    _w, _h, px = decode_image(bytes(b), with_pixels=True)
                    hashes.append(dhash(px))
                else:
                    d = hashlib.md5(bytes(b or b"")).digest()
                    hashes.append(int.from_bytes(d[:8], "big", signed=True))
            pdf = pdf.copy()
            pdf[hash_col] = hashes
            yield pdf

    return df.mapInPandas(batches, out_schema)


def image_dedup(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    bands: int = 4,
    mode: str = "real",
) -> DataFrame:
    """Drop the higher-id image of every pair whose perceptual hashes
    are within ``max_hamming`` bits — exact and cross-format for true
    duplicates (identical pixels ⇒ hamming 0 whatever the container)."""
    from jodie_spark.operators.text_dedup import hamming_dedup

    hashed = with_image_dhash(df, binary_col=binary_col, mode=mode)
    return hamming_dedup(
        hashed, "image_hash", id_col, max_hamming=max_hamming, bands=bands
    ).drop("image_hash")


def with_audio_hash(
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "real",
    hash_col: str = "audio_hash",
    n_windows: int = 64,
) -> DataFrame:
    """64-bit audio content hash: decode the WAV, mono-mix, split into
    ``n_windows`` equal windows, one bit per window = RMS energy above
    the track median — a coarse loudness-envelope fingerprint that is
    stable under sample-exact re-encodings and small gain-free edits."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(hash_col, T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            hashes = []
            for b in pdf[binary_col]:
                if mode == "real":
                    from jodie_spark.operators.codecs import decode_wav

                    _r, _c, _n, samples = decode_wav(bytes(b), with_samples=True)
                    mono = samples.astype(np.float64).mean(axis=1)
                    pad = (-len(mono)) % n_windows
                    if pad:
                        mono = np.concatenate([mono, np.zeros(pad)])
                    rms = np.sqrt((mono.reshape(n_windows, -1) ** 2).mean(axis=1))
                    bits = rms > np.median(rms)
                    v = 0
                    for bit in bits:
                        v = (v << 1) | int(bit)
                    if v >= 1 << 63:
                        v -= 1 << 64
                    hashes.append(v)
                else:
                    d = hashlib.md5(bytes(b or b"")).digest()
                    hashes.append(int.from_bytes(d[:8], "big", signed=True))
            pdf = pdf.copy()
            pdf[hash_col] = hashes
            yield pdf

    return df.mapInPandas(batches, out_schema)


def audio_dedup(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    bands: int = 4,
    mode: str = "real",
) -> DataFrame:
    """Audio near-dup removal: the loudness-envelope hash through the
    same banded :func:`hamming_dedup` as text SimHash and image dHash."""
    from jodie_spark.operators.text_dedup import hamming_dedup

    hashed = with_audio_hash(df, binary_col=binary_col, mode=mode)
    return hamming_dedup(
        hashed, "audio_hash", id_col, max_hamming=max_hamming, bands=bands
    ).drop("audio_hash")
