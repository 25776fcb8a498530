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
from collections.abc import Callable, Iterator

import numpy as np

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _guarded_decode(fn: Callable, b, on_error: str):
    """Run one real-mode decode kernel with the job-survival contract:
    a NULL blob or an undecodable/unsupported payload yields a NULL
    hash (``on_error='skip'``, the default — the row simply never
    enters the banded join, because a NULL bucket key matches nothing)
    instead of a single bad row aborting the whole dedup stage.
    ``on_error='raise'`` keeps the loud failure for pipelines that
    want corrupt fixtures surfaced."""
    if b is None:
        if on_error == "raise":
            raise ValueError("NULL media payload (on_error='raise')")
        return None
    try:
        return fn(bytes(b))
    except Exception:
        if on_error == "raise":
            raise
        return None


def with_image_dhash(
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "real",
    hash_col: str = "image_hash",
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Attach the 64-bit perceptual hash of each image binary. NULL or
    undecodable blobs hash to NULL under ``on_error='skip'``.

    ``decoder_overrides`` routes formats the baseline codecs cannot
    decode (MP4 frames, HEIC, ...) — or formats where a native
    library is simply faster — to external decoders: a dict from
    sniffed format name to ``bytes -> (H, W, 3) uint8`` pixel array.
    Routed rows join the banded dedup exactly like baseline-decoded
    ones; rows whose format has no override (and no baseline decoder)
    skip cleanly under ``on_error='skip'``."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(hash_col, T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(raw: bytes):
            from jodie_spark.operators.codecs import decode_image, dhash

            _w, _h, px = decode_image(
                raw, with_pixels=True, overrides=decoder_overrides
            )
            return dhash(px)

        for pdf in it:
            hashes = []
            for b in pdf[binary_col]:
                if mode == "real":
                    hashes.append(_guarded_decode(one, b, on_error))
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
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Drop the higher-id image of every pair whose perceptual hashes
    are within ``max_hamming`` bits — exact and cross-format for true
    duplicates (identical pixels ⇒ hamming 0 whatever the container)."""
    from jodie_spark.operators.text_dedup import _hamming_dup_ids

    # decode each image exactly ONCE: the (id, hash) proxy feeds the
    # banded pair-finding (materialized inside _hamming_dup_ids) and the
    # survivor election; the caller's frame joins back by id, so the
    # expensive mapInPandas decode never re-evaluates on a join side or
    # the output side (it used to run 3x — guide §8 "decide with small
    # rows"). on_error='skip' semantics unchanged: undecodable rows are
    # absent from the proxy and therefore from the survivors.
    hashed = with_image_dhash(
        df, binary_col=binary_col, mode=mode, on_error=on_error,
        decoder_overrides=decoder_overrides,
    )
    proxy = hashed.select(
        F.col(id_col).alias("id"), F.col("image_hash").alias("sh")
    ).localCheckpoint(eager=False)
    dup_ids = _hamming_dup_ids(proxy, max_hamming, bands, materialized=True)
    keep = proxy.select("id").join(dup_ids, "id", "left_anti")
    return df.join(keep.withColumnRenamed("id", id_col), id_col, "left_semi")


def with_audio_hash(
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "real",
    hash_col: str = "audio_hash",
    n_windows: int = 64,
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """64-bit audio content hash: decode the audio (WAV or FLAC —
    FLAC is lossless, so a FLAC re-encode of the same PCM collides at
    hamming 0), mono-mix, split into
    ``n_windows`` equal windows, one bit per window = RMS energy above
    the track median — a coarse loudness-envelope fingerprint that is
    stable under sample-exact re-encodings and small gain-free edits.
    NULL or undecodable blobs hash to NULL under ``on_error='skip'``."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(hash_col, T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(raw: bytes):
            from jodie_spark.operators.codecs import decode_flac, decode_wav, sniff

            kind = sniff(raw)
            if decoder_overrides and kind in decoder_overrides:
                # external decoder contract: bytes -> (samples (N, C)
                # ndarray, sample_rate) — e.g. an ffmpeg-backed MP3/AAC
                # decode on an equipped cluster
                samples, _rate = decoder_overrides[kind](raw)
                samples = np.asarray(samples)
                if samples.ndim == 1:
                    samples = samples[:, None]
            elif kind == "flac":
                _r, _c, _n, samples = decode_flac(raw, with_samples=True)
            else:
                _r, _c, _n, samples = decode_wav(raw, with_samples=True)
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
            return v

        for pdf in it:
            hashes = []
            for b in pdf[binary_col]:
                if mode == "real":
                    hashes.append(_guarded_decode(one, b, on_error))
                else:
                    d = hashlib.md5(bytes(b or b"")).digest()
                    hashes.append(int.from_bytes(d[:8], "big", signed=True))
            pdf = pdf.copy()
            pdf[hash_col] = hashes
            yield pdf

    return df.mapInPandas(batches, out_schema)


def with_video_frame_hashes(
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "real",
    hash_col: str = "frame_hashes",
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Per-video ``array<long>`` of per-frame dHashes (decoded frame
    stream). A video is thus a SET of 64-bit perceptual frame hashes —
    the right input for MinHash set similarity. NULL or undecodable
    blobs get a NULL hash set under ``on_error='skip'``."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(hash_col, T.ArrayType(T.LongType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(raw: bytes):
            from jodie_spark.operators.codecs import dhash, iter_frame_stream
            from jodie_spark.operators.codecs import decode_ppm, sniff

            kind = sniff(raw)
            if decoder_overrides and kind in decoder_overrides:
                # external decoder contract: bytes -> iterable of
                # (H, W, 3) uint8 frame arrays — e.g. ffmpeg frame
                # sampling for MP4 on an equipped cluster
                return [dhash(np.asarray(px)) for px in decoder_overrides[kind](raw)]
            hs = []
            for _i, _w, _h, fb in iter_frame_stream(raw):
                _, _, px = decode_ppm(fb)
                hs.append(dhash(px))
            return hs

        for pdf in it:
            col = []
            for b in pdf[binary_col]:
                if mode == "real":
                    col.append(_guarded_decode(one, b, on_error))
                else:
                    d = hashlib.md5(bytes(b or b"")).digest()
                    col.append(
                        [
                            int.from_bytes(d[i : i + 8], "big", signed=True)
                            for i in (0, 8)
                        ]
                    )
            pdf = pdf.copy()
            pdf[hash_col] = col
            yield pdf

    return df.mapInPandas(batches, out_schema)


def video_dedup(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    mode: str = "real",
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Video near-dup removal: two videos are duplicates when the
    Jaccard similarity of their frame-dHash SETS is ≥ ``threshold``
    (frame order and container irrelevant — re-encoded or re-ordered
    cuts of the same footage collide). Candidates come from MinHash LSH
    bands over the frame-hash sets (the text-dedup machinery, reused
    verbatim); every candidate pair is verified with the EXACT Jaccard
    via array_intersect/array_union before anything drops — no false
    positives from bucket luck. Higher id of each verified pair drops."""
    from jodie_spark.operators.text_dedup import (
        _banded,
        minhash_signature_from_hashes,
    )

    hashed = with_video_frame_hashes(
        df, binary_col=binary_col, mode=mode, on_error=on_error,
        decoder_overrides=decoder_overrides,
    )
    # decode each video exactly ONCE: keyed feeds the LSH self-join
    # (both sides), fa and fb — without the checkpoint the frame-decode
    # mapInPandas re-evaluated on every reference (4x per action)
    keyed = hashed.select(
        F.col(id_col).alias("id"),
        F.array_distinct("frame_hashes").alias("fh"),
    ).localCheckpoint(eager=False)
    sigs = (
        keyed.withColumn(
            "sig", minhash_signature_from_hashes(F.col("fh"), num_hashes)
        )
        .withColumn("bb", F.explode(_banded("sig", num_hashes, bands)))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    fa = keyed.select(F.col("id").alias("id_a"), F.col("fh").alias("fh_a"))
    fb = keyed.select(F.col("id").alias("id_b"), F.col("fh").alias("fh_b"))
    dup_ids = (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(
            F.size(F.array_intersect("fh_a", "fh_b"))
            >= threshold * F.size(F.array_union("fh_a", "fh_b"))
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dup_ids, id_col, "left_anti")


def audio_dedup(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    bands: int = 4,
    mode: str = "real",
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Audio near-dup removal: the loudness-envelope hash through the
    same banded :func:`hamming_dedup` as text SimHash and image dHash.
    Decode-once proxy shape — see :func:`image_dedup`."""
    from jodie_spark.operators.text_dedup import _hamming_dup_ids

    hashed = with_audio_hash(
        df, binary_col=binary_col, mode=mode, on_error=on_error,
        decoder_overrides=decoder_overrides,
    )
    proxy = hashed.select(
        F.col(id_col).alias("id"), F.col("audio_hash").alias("sh")
    ).localCheckpoint(eager=False)
    dup_ids = _hamming_dup_ids(proxy, max_hamming, bands, materialized=True)
    keep = proxy.select("id").join(dup_ids, "id", "left_anti")
    return df.join(keep.withColumnRenamed("id", id_col), id_col, "left_semi")
