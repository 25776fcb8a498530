"""Dependency-free baseline media codecs (pure Python + numpy).

These make ``mode='real'`` in :mod:`jodie_spark.operators.multimodal`
actually exercisable in a minimal runtime: BMP (24-bit uncompressed)
and PPM (P6) for images, RIFF/WAVE PCM for audio, and a trivial
"concatenated PPM" stream as a parseable video stand-in. Compressed
formats (JPEG/PNG/MP4/...) still require external libraries — the
decode functions raise ``ValueError`` with the sniffed format name so
callers can route those rows to a Pillow/ffmpeg-backed decoder when
one is available.

All functions operate on ``bytes`` and are called from Arrow-batched
``mapInPandas`` kernels — one Python call per ROW but with all the
array math in numpy; there is no Spark dependency in this module.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------


def sniff(b: bytes) -> str:
    """Best-effort container identification for routing."""
    if not b:
        return "empty"
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] in (b"P6", b"P5", b"P3"):
        return "ppm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(b) > 11 and b[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes (bottom-up rows, BGR,
    4-byte row padding — the standard layout)."""
    h, w, _ = pixels.shape
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + data_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    bgr = pixels[:, :, ::-1]  # RGB → BGR
    pad = b"\x00" * (row_size - 3 * w)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + bytes(rows)


def decode_bmp(b: bytes, with_pixels: bool = True):
    """BMP bytes → (width, height, pixels|None). Supports the 24-bit
    uncompressed BITMAPINFOHEADER layout ``encode_bmp`` writes (and any
    conforming writer); refuses other bit depths / compressions."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError(f"not a BMP payload (sniffed: {sniff(b)})")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    bits = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bits != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (got {bits}-bit, c={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    if not with_pixels:
        return w, h, None
    row_size = (3 * w + 3) // 4 * 4
    raw = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# PPM — P6 binary
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def _ppm_header(b: bytes) -> tuple[int, int, int]:
    """Parse the P6 header (whitespace/comment tolerant) → (w, h, data
    offset)."""
    if b[:2] != b"P6":
        raise ValueError(f"not a P6 PPM payload (sniffed: {sniff(b)})")
    fields: list[int] = []
    i = 2
    n = len(b)
    while len(fields) < 3 and i < n:
        c = b[i : i + 1]
        if c == b"#":  # comment to EOL
            while i < n and b[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and b[j : j + 1].isdigit():
                j += 1
            fields.append(int(b[i:j]))
            i = j
        else:
            raise ValueError("malformed PPM header")
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    i += 1  # single whitespace after maxval
    return fields[0], fields[1], i


def decode_ppm(b: bytes, with_pixels: bool = True):
    w, h, off = _ppm_header(b)
    if not with_pixels:
        return w, h, None
    raw = np.frombuffer(b, dtype=np.uint8, count=3 * w * h, offset=off)
    return w, h, raw.reshape(h, w, 3).copy()


def decode_image(b: bytes, with_pixels: bool = True):
    """Route to the matching baseline decoder; raise for formats that
    need an external library (callers surface the format name)."""
    kind = sniff(b)
    if kind == "bmp":
        return decode_bmp(b, with_pixels)
    if kind == "ppm":
        return decode_ppm(b, with_pixels)
    raise ValueError(
        f"no baseline decoder for {kind!r} — JPEG/PNG need an imaging "
        "library (e.g. Pillow); route these rows to an external codec"
    )


def resize_nearest(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    src_h, src_w = pixels.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return pixels[np.ix_(ys, xs)]


# ---------------------------------------------------------------------------
# WAV — RIFF PCM (16-bit or 8-bit)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n,) or (n, channels) int16 → RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(b: bytes, with_samples: bool = True):
    """WAV bytes → (sample_rate, n_channels, n_samples, samples|None).
    PCM (format 1) 8/16-bit only."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"not a WAV payload (sniffed: {sniff(b)})")
    i = 12
    n = len(b)
    rate = ch = bits = None
    data_off = data_len = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", b, i + 8)
            bits = struct.unpack_from("<H", b, i + 22)[0]
            if audio_fmt != 1:
                raise ValueError(f"only PCM WAV supported (format {audio_fmt})")
        elif cid == b"data":
            data_off, data_len = i + 8, clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data_off is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (got {bits})")
    bytes_per = (bits // 8) * ch
    n_samples = data_len // bytes_per
    if not with_samples:
        return rate, ch, n_samples, None
    if bits == 16:
        raw = np.frombuffer(b, dtype="<i2", count=n_samples * ch, offset=data_off)
    else:
        raw = (
            np.frombuffer(b, dtype=np.uint8, count=n_samples * ch, offset=data_off).astype(
                np.int16
            )
            - 128
        ) * 256
    return rate, ch, n_samples, raw.reshape(n_samples, ch)


# ---------------------------------------------------------------------------
# "video": concatenated P6 frames (a parseable dependency-free stand-in)
# ---------------------------------------------------------------------------


def encode_frame_stream(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def iter_frame_stream(b: bytes):
    """Yield (frame_idx, width, height, frame_bytes) for each P6 frame
    in a concatenated stream."""
    i = 0
    idx = 0
    n = len(b)
    while i < n:
        chunk = b[i:]
        w, h, off = _ppm_header(chunk)
        end = off + 3 * w * h
        yield idx, w, h, chunk[:end]
        i += end
        idx += 1
