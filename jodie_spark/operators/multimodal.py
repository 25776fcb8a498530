"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, Arrow-batched ``mapInPandas``
pipelines, partition sizing — is real and tested. The codec layer has
two tiers:

- ``mode='real'`` decodes the dependency-free baseline formats in
  :mod:`jodie_spark.operators.codecs` — BMP/PPM/PNG images (PNG via
  stdlib zlib: 8-bit non-interlaced, all scanline filters), RIFF PCM
  WAV audio, concatenated-PPM frame streams — entirely in numpy.
  Formats that truly need external libraries (JPEG/MP4) raise
  ``ValueError`` naming the sniffed format; swapping in Pillow/ffmpeg
  changes only the inner decode call, the distributed plan (Arrow
  batch iteration, schema, partitioning) is unchanged.
- ``mode='fake'`` produces deterministic hash-derived outputs with the
  correct shapes — oracle-checkable without any binary fixtures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

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
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "fake",
    batch_hint: int | None = None,
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Decode an image binary column to (width, height, n_pixels).

    Arrow-batched ``mapInPandas``: executors stream record batches, so
    peak memory is one batch of decoded rows per core regardless of
    table size. ``mode='real'`` marks where Pillow would be invoked.
    NULL or undecodable blobs yield NULL dims under ``on_error='skip'``
    (the default) rather than one bad row aborting the whole stage.
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
        from jodie_spark.operators.media_dedup import _guarded_decode

        def one(raw: bytes):
            from jodie_spark.operators.codecs import decode_image

            return decode_image(
                raw, with_pixels=False, overrides=decoder_overrides
            )[:2]

        for pdf in it:
            if mode == "real":
                dims = [
                    _guarded_decode(one, b, on_error) or (None, None)
                    for b in pdf[binary_col]
                ]
            else:
                dims = [_fake_decode_dims(b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["width"] = [w for w, _ in dims]
            pdf["height"] = [h for _, h in dims]
            pdf["n_pixels"] = [
                w * h if w is not None and h is not None else None for w, h in dims
            ]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def image_pixel_stats(
    df: DataFrame,
    binary_col: str = "data",
    mode: str = "fake",
    on_error: str = "skip",
    decoder_overrides: dict[str, Callable] | None = None,
) -> DataFrame:
    """Sum of decoded pixel values (after RGB normalization) — a cheap
    whole-image checksum proving the decode reconstructed actual pixel
    data (PNG scanline filters, palettes, BMP row order), not just the
    header. Same Arrow-batched mapInPandas shape as decode_images.
    NULL or undecodable blobs yield a NULL px_sum under
    ``on_error='skip'`` (the default)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("px_sum", T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jodie_spark.operators.media_dedup import _guarded_decode

        def one(raw: bytes):
            from jodie_spark.operators.codecs import decode_image

            _w, _h, px = decode_image(
                raw, with_pixels=True, overrides=decoder_overrides
            )
            return int(px.astype(np.int64).sum())

        for pdf in it:
            sums = []
            for b in pdf[binary_col]:
                if mode == "real":
                    sums.append(_guarded_decode(one, b, on_error))
                else:
                    h = hashlib.md5(bytes(b or b"")).digest()
                    sums.append(int.from_bytes(h[:4], "big"))
            pdf = pdf.copy()
            pdf["px_sum"] = sums
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
            feats = []
            for b in pdf[binary_col]:
                if mode == "real":
                    feats.append(_real_features(bytes(b or b""), dim))
                else:
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
            rows = []
            for _, row in pdf.iterrows():
                b = bytes(row[binary_col] or b"")
                if mode == "real":
                    from jodie_spark.operators.codecs import iter_frame_stream

                    for i, _w, _h, fb in iter_frame_stream(b):
                        r = dict(row)
                        r["frame_idx"] = i
                        r["frame_ts_ms"] = i * every_ms
                        r["frame_data"] = fb
                        rows.append(r)
                else:
                    n_frames = 1 + hashlib.md5(b).digest()[2] % 4
                    for i in range(n_frames):
                        r = dict(row)
                        r["frame_idx"] = i
                        r["frame_ts_ms"] = i * every_ms
                        r["frame_data"] = hashlib.md5(b + bytes([i])).digest()
                        rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(batches, out_schema)


def _real_features(b: bytes, dim: int) -> list[float]:
    """Content-derived feature vector from the baseline codecs: images
    → a dim-bucket mean-luminance profile (resize to a 1×dim strip);
    audio → dim windowed RMS energies. Deterministic, normalized."""
    from jodie_spark.operators.codecs import (
        decode_image,
        decode_wav,
        resize_nearest,
        sniff,
    )

    kind = sniff(b)
    if kind in ("bmp", "ppm", "png"):
        _w, _h, px = decode_image(b, with_pixels=True)
        lum = px.astype(np.float64).mean(axis=2)  # (h, w) luminance
        strip = resize_nearest(lum[:, :, None], dim, 1)[0, :, 0]
        v = strip
    elif kind in ("wav", "flac"):
        if kind == "flac":
            from jodie_spark.operators.codecs import decode_flac

            _r, _c, n, samples = decode_flac(b, with_samples=True)
        else:
            _r, _c, n, samples = decode_wav(b, with_samples=True)
        mono = samples.astype(np.float64).mean(axis=1)
        # dim equal windows, RMS each (pad the tail window)
        pad = (-len(mono)) % dim
        if pad:
            mono = np.concatenate([mono, np.zeros(pad)])
        v = np.sqrt((mono.reshape(dim, -1) ** 2).mean(axis=1))
    else:
        raise ValueError(
            f"no baseline feature extractor for {kind!r} — route to an "
            "external model runtime"
        )
    norm = np.linalg.norm(v)
    if norm == 0:
        v = np.ones(dim)
        norm = np.linalg.norm(v)
    return (v / norm).astype("float32").tolist()


def decode_audio(
    df: DataFrame, binary_col: str = "data", mode: str = "fake"
) -> DataFrame:
    """Decode an audio binary column to (sample_rate, n_channels,
    n_samples, duration_ms). Real mode parses RIFF PCM WAV headers or
    FLAC STREAMINFO (jodie_spark.operators.codecs); fake mode
    hash-derives the values
    deterministically. Same Arrow-batched mapInPandas shape as
    decode_images."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, chans, counts = [], [], []
            for b in pdf[binary_col]:
                if mode == "real":
                    from jodie_spark.operators.codecs import (
                        decode_flac,
                        decode_wav,
                        sniff,
                    )

                    if sniff(bytes(b)) == "flac":
                        r, c, n, _ = decode_flac(bytes(b), with_samples=False)
                    else:
                        r, c, n, _ = decode_wav(bytes(b), with_samples=False)
                else:
                    h = hashlib.md5(bytes(b or b"")).digest()
                    r, c, n = 8000 * (1 + h[0] % 6), 1 + h[1] % 2, 1000 + h[2] * 37
                rates.append(r)
                chans.append(c)
                counts.append(n)
            pdf = pdf.copy()
            pdf["sample_rate"] = rates
            pdf["n_channels"] = chans
            pdf["n_samples"] = counts
            pdf["duration_ms"] = [
                int(n * 1000 // r) for n, r in zip(counts, rates)
            ]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def probe_media(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """Container-level probe of ANY supported media blob — the
    filter/triage pass a multimodal pipeline runs before spending
    decode cycles: ``container`` (sniffed), ``duration_ms``, ``width``
    / ``height`` (images + video tracks), ``video_codec`` /
    ``audio_codec`` fourccs, ``n_video_samples`` / ``n_audio_samples``
    and ``audio_rate``. MP4 parses the ISO-BMFF box tree (headers
    only, no codec work); WAV/FLAC parse format headers; images parse
    dimension headers. Unknown containers yield a sniffed name with
    NULL fields — they never abort the batch."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("container", T.StringType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("video_codec", T.StringType()),
            T.StructField("audio_codec", T.StringType()),
            T.StructField("n_video_samples", T.LongType()),
            T.StructField("n_audio_samples", T.LongType()),
            T.StructField("audio_rate", T.IntegerType()),
        ]
    )
    cols = [
        "container", "duration_ms", "width", "height", "video_codec",
        "audio_codec", "n_video_samples", "n_audio_samples", "audio_rate",
    ]

    def one(raw: bytes) -> dict:
        from jodie_spark.operators.codecs import (
            decode_flac,
            decode_image,
            decode_wav,
            probe_mp4,
            sniff,
        )

        kind = sniff(raw)
        r: dict = {c: None for c in cols}
        r["container"] = kind
        try:
            if kind == "mp4":
                info = probe_mp4(raw)
                r["duration_ms"] = info.get("duration_ms")
                for t in info["tracks"]:
                    if t.get("handler") == "vide":
                        r["width"] = t.get("width")
                        r["height"] = t.get("height")
                        r["video_codec"] = t.get("codec")
                        r["n_video_samples"] = t.get("n_samples")
                    elif t.get("handler") == "soun":
                        r["audio_codec"] = t.get("codec")
                        r["n_audio_samples"] = t.get("n_samples")
                        r["audio_rate"] = t.get("sample_rate")
            elif kind == "wav":
                rate, _c, n, _ = decode_wav(raw, with_samples=False)
                r["audio_codec"] = "pcm"
                r["audio_rate"] = rate
                r["n_audio_samples"] = n
                r["duration_ms"] = int(n * 1000 // rate) if rate else None
            elif kind == "flac":
                rate, _c, n, _ = decode_flac(raw, with_samples=False)
                r["audio_codec"] = "flac"
                r["audio_rate"] = rate
                r["n_audio_samples"] = n
                r["duration_ms"] = int(n * 1000 // rate) if rate else None
            elif kind in ("bmp", "ppm", "png", "jpeg", "gif"):
                w, h, _ = decode_image(raw, with_pixels=False)
                r["width"], r["height"] = w, h
                r["video_codec"] = kind
        except Exception:
            pass  # a malformed blob keeps its sniffed container, NULL fields
        return r

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            probed = [one(bytes(b or b"")) for b in pdf[binary_col]]
            pdf = pdf.copy()
            for c in cols:
                pdf[c] = [p[c] for p in probed]
            yield pdf

    return df.mapInPandas(batches, out_schema)
