"""Dependency-free baseline media codecs (pure Python + numpy).

These make ``mode='real'`` in :mod:`jodie_spark.operators.multimodal`
actually exercisable in a minimal runtime: BMP (24-bit uncompressed),
PPM (P6), PNG (stdlib zlib: 8-bit non-interlaced gray / RGB /
palette / RGBA, scanline filters 0-4), and baseline JPEG (sequential
DCT / huffman SOF0, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling and restart markers — together PNG+JPEG are the two
dominant real-corpus image formats) for images, RIFF/WAVE PCM for
audio, and a trivial "concatenated PPM" stream as a parseable video
stand-in. Formats that genuinely need external libraries
(progressive JPEG / MP4 / ...) raise ``ValueError`` with the sniffed
format name so callers can route those rows to a Pillow/ffmpeg-backed
decoder when one is available.

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


# ---------------------------------------------------------------------------
# PNG — stdlib-zlib baseline: 8-bit non-interlaced, color types
# 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA),
# scanline filters 0-4.  Interlaced (Adam7) and 16-bit images refuse
# with a clear message; JPEG still needs an external library.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filters=0) -> bytes:
    """uint8 array → PNG bytes. ``(h, w, 3)`` → RGB, ``(h, w, 4)`` →
    RGBA, ``(h, w)`` → grayscale; 8-bit, non-interlaced. ``filters``
    is the per-scanline filter type (int applied to every row, or a
    list of per-row types 0-4) — the forward filter is applied so any
    conforming decoder reconstructs the same pixels; useful for
    exercising the unfilter paths in tests."""
    import zlib

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.shape[2] == 3:
        color_type, channels = 2, 3
    elif px.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported channel count {px.shape[2]}")
    h, w = px.shape[:2]
    flat = px.reshape(h, w * channels).astype(np.int16)
    ftypes = [filters] * h if isinstance(filters, int) else list(filters)
    if len(ftypes) != h:
        raise ValueError("one filter type per scanline required")
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int16)
    for y in range(h):
        line, f = flat[y], ftypes[y]
        left = np.concatenate([np.zeros(channels, np.int16), line[:-channels]])
        upleft = np.concatenate([np.zeros(channels, np.int16), prev[:-channels]])
        if f == 0:
            out = line
        elif f == 1:
            out = line - left
        elif f == 2:
            out = line - prev
        elif f == 3:
            out = line - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = line - pred
        else:
            raise ValueError(f"unknown filter type {f}")
        raw += bytes([f]) + (out & 0xFF).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(b: bytes, with_pixels: bool = True):
    """PNG bytes → (width, height, rgb|None) where rgb is ``(h, w, 3)``
    uint8 — grayscale replicates to 3 channels, alpha is dropped,
    palette images resolve through PLTE. Supports the dominant
    real-corpus shape (8-bit non-interlaced, filters 0-4); refuses
    16-bit and Adam7-interlaced images with the reason."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG payload (sniffed: {sniff(b)})")
    pos, idat, palette = 8, bytearray(), None
    w = h = depth = color_type = interlace = None
    n = len(b)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (got {depth}-bit)")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if not with_pixels:
        return w, h, None
    channels = _PNG_CHANNELS[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumulative sum over pixels, per channel byte
            rec = np.cumsum(line.reshape(-1, channels), axis=0) & 0xFF
            rec = rec.reshape(-1)
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential on the left pixel
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - channels] if i >= channels else 0
                up = prev[i]
                if f == 3:
                    rec[i] = (line[i] + ((a + up) >> 1)) & 0xFF
                else:
                    c = prev[i - channels] if i >= channels else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    arr = out.reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        rgb = palette[arr[:, :, 0]]
    elif color_type == 0:
        rgb = np.repeat(arr, 3, axis=2)
    elif color_type == 4:
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
    elif color_type == 6:
        rgb = arr[:, :, :3]
    else:
        rgb = arr
    return w, h, np.ascontiguousarray(rgb)


def decode_image(b: bytes, with_pixels: bool = True):
    """Route to the matching baseline decoder; raise for formats that
    need an external library (callers surface the format name)."""
    kind = sniff(b)
    if kind == "bmp":
        return decode_bmp(b, with_pixels)
    if kind == "ppm":
        return decode_ppm(b, with_pixels)
    if kind == "png":
        return decode_png(b, with_pixels)
    raise ValueError(
        f"no baseline decoder for {kind!r} — JPEG needs an imaging "
        "library (e.g. Pillow); route these rows to an external codec"
    )


def dhash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """Difference hash (dHash): grayscale → nearest-resize to
    ``(hash_size, hash_size+1)`` → one bit per horizontal gradient
    sign. 64 bits at the default size; near-identical images land
    within a few bits of hamming distance regardless of the container
    format they were encoded in. Returns a SIGNED 64-bit int (two's
    complement) so the value round-trips Spark's LongType exactly."""
    gray = pixels.astype(np.float64).mean(axis=2) if pixels.ndim == 3 else pixels.astype(np.float64)
    small = resize_nearest(gray[:, :, None], hash_size + 1, hash_size)[:, :, 0]
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


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
