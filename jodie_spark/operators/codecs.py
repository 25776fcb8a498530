"""Dependency-free baseline media codecs (pure Python + numpy).

These make ``mode='real'`` in :mod:`jodie_spark.operators.multimodal`
actually exercisable in a minimal runtime: BMP (24-bit uncompressed),
PPM (P6), PNG (stdlib zlib: depths 1/2/4/8/16, gray / RGB / palette /
RGBA, scanline filters 0-4, Adam7 interlace), and baseline JPEG
(:func:`decode_jpeg` — sequential huffman SOF0/SOF1, grayscale or
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling and restart markers;
verified against real libjpeg-written files — together PNG+JPEG are
the two dominant real-corpus image formats) for images, RIFF/WAVE PCM
for audio, and a trivial "concatenated PPM" stream as a parseable
video stand-in. GIF (87a/89a LZW, interlace, local palettes —
:func:`decode_gif`, verified against real full-LZW files) rounds out
the image set. :func:`encode_jpeg` (baseline 4:4:4, Annex K tables)
and :func:`encode_gif` (literal-code LZW) exist for fixture
generation. JPEG covers baseline/extended sequential (SOF0/SOF1)
AND progressive (SOF2 — spectral selection + successive approximation,
T.81 Annex G). Audio covers RIFF WAV (integer PCM 8/16/24/32,
IEEE float32, WAVE_FORMAT_EXTENSIBLE) and native FLAC (RFC 9639 —
fixed + LPC predictors, rice partitions, all stereo decorrelation
modes, CRC-verified). Formats that genuinely need external libraries
(MP4 / MP3 / HEIC / ...) raise ``ValueError`` with the sniffed format
name so callers can route those rows to a Pillow/ffmpeg-backed decoder
when one is available (``decoder_overrides``).

All functions operate on ``bytes`` and are called from Arrow-batched
``mapInPandas`` kernels — one Python call per ROW but with all the
array math in numpy; there is no Spark dependency in this module.
"""

from __future__ import annotations

import struct
from array import array

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
    if b[:4] == b"fLaC":
        return "flac"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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


def _bmp_mask_extract(px: np.ndarray, mask: int) -> np.ndarray:
    """One channel from packed 16/32-bit BMP pixels: shift by the
    mask's lowest set bit, then rescale the field to 8 bits exactly
    (255 * v / (2^width - 1), rounded)."""
    if mask == 0:
        return np.zeros(px.shape, dtype=np.uint8)
    shift = (mask & -mask).bit_length() - 1
    width = int(mask).bit_count()
    v = (px >> np.uint32(shift)) & np.uint32(mask >> shift)
    if width == 8:
        return v.astype(np.uint8)
    full = (1 << width) - 1
    return ((v.astype(np.uint32) * 255 + full // 2) // full).astype(np.uint8)


def decode_bmp(b: bytes, with_pixels: bool = True):
    """BMP bytes → (width, height, pixels|None). Covers the
    uncompressed real-corpus envelope over BITMAPINFOHEADER and its
    extensions: 24-bit BGR (what ``encode_bmp`` writes), 32-bit BGRX
    (alpha dropped), 16-bit (BI_RGB 5-5-5 default), 8-bit palette, and
    BI_BITFIELDS with arbitrary channel masks for 16/32-bit (masks
    read at offset 54, where both the header-embedded V4/V5 layout and
    the three DWORDs following a 40-byte header put them). RLE and
    sub-8-bit depths refuse with the reason."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError(f"not a BMP payload (sniffed: {sniff(b)})")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    bits = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    colors_used = struct.unpack_from("<I", b, 46)[0]
    if compression not in (0, 3) or bits not in (8, 16, 24, 32) or (
        compression == 3 and bits not in (16, 32)
    ):
        raise ValueError(
            f"unsupported BMP shape ({bits}-bit, compression {compression}) "
            "— RLE/sub-8-bit need an external decoder"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    if not with_pixels:
        return w, h, None
    row_size = (bits * w + 31) // 32 * 4
    raw = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)
    if bits == 24:
        rgb = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
    elif bits == 8:
        n_colors = colors_used or 256
        pal = np.frombuffer(
            b, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(-1, 4)[:, 2::-1]  # BGRX → RGB
        idx = rows[:, :w]
        rgb = pal[np.clip(idx, 0, n_colors - 1)]
    else:
        if compression == 3:
            rm, gm, bm = struct.unpack_from("<III", b, 54)
        elif bits == 16:
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F  # BI_RGB 16-bit = 5-5-5
        else:
            rm, gm, bm = 0x00FF0000, 0x0000FF00, 0x000000FF  # BGRX
        dtype = "<u2" if bits == 16 else "<u4"
        step = bits // 8
        px = (
            rows[:, : w * step]
            .reshape(h, w, step)
            .copy()
            .view(dtype)
            .reshape(h, w)
            .astype(np.uint32)
        )
        rgb = np.stack(
            [_bmp_mask_extract(px, m) for m in (rm, gm, bm)], axis=2
        )
    if not top_down:
        rgb = rgb[::-1]
    return w, h, np.ascontiguousarray(rgb)


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
# PNG — stdlib-zlib baseline: bit depths 1/2/4/8/16, color types
# 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA),
# scanline filters 0-4, Adam7 interlace (round 11). 16-bit reduces to
# the high byte; sub-byte gray scales by 255/(2^d-1). Only spec-invalid
# combinations refuse, with the reason.
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


#: Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_defilter(
    raw: bytes, off: int, stride: int, height: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Undo scanline filters 0-4 over ``height`` lines of ``stride``
    bytes starting at ``off`` (each line led by its filter byte); the
    "left" byte sits ``bpp`` (bytes per pixel, >=1) back. Returns
    ((height, stride) uint8, offset after the last line)."""
    if len(raw) < off + height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        off += stride + 1
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumulative sum over pixels, per byte lane
            rec = np.cumsum(line.reshape(-1, bpp), axis=0) & 0xFF
            rec = rec.reshape(-1)
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential on the left byte
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                if f == 3:
                    rec[i] = (line[i] + ((a + up) >> 1)) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out, off


def _png_expand(
    mat: np.ndarray, w: int, depth: int, channels: int, scale_gray: bool
) -> np.ndarray:
    """Defiltered scanline bytes → (h, w, channels) uint8 samples.
    16-bit takes the big-endian high byte (the standard 16→8 reduce);
    sub-byte depths (1/2/4, gray or palette index) unpack MSB-first
    with the spec's exact 255/(2^d-1) gray scaling."""
    h = mat.shape[0]
    if depth == 8:
        return mat[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return mat[:, : w * channels * 2].reshape(h, w * channels, 2)[
            :, :, 0
        ].reshape(h, w, channels)
    # sub-byte depths: channels == 1 (gray or palette index)
    bits = np.unpackbits(mat, axis=1)
    weights = np.left_shift(1, np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(h, -1, depth) * weights).sum(axis=2).astype(np.uint8)
    vals = vals[:, :w]
    if scale_gray:
        vals = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return vals.reshape(h, w, 1)


def decode_png(b: bytes, with_pixels: bool = True):
    """PNG bytes → (width, height, rgb|None) where rgb is ``(h, w, 3)``
    uint8 — grayscale replicates to 3 channels, alpha is dropped,
    palette images resolve through PLTE. Covers the real-corpus
    envelope: bit depths 1/2/4/8/16, color types 0/2/3/4/6, scanline
    filters 0-4, and Adam7 interlace (each pass an independently
    filtered sub-image scattered by the pass geometry). 16-bit samples
    reduce to their high byte; sub-byte grayscale scales by
    255/(2^d−1) per the spec."""
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
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(f"bit depth {depth} is only valid for gray/palette PNG")
    if depth == 16 and color_type == 3:
        raise ValueError("16-bit palette PNG is not a valid combination")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if not with_pixels:
        return w, h, None
    channels = _PNG_CHANNELS[color_type]
    bpp = max(1, channels * depth // 8)
    scale_gray = color_type == 0 and depth < 8

    def stride(px: int) -> int:
        return (px * channels * depth + 7) // 8

    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        mat, _ = _png_defilter(raw, 0, stride(w), h, bpp)
        arr = _png_expand(mat, w, depth, channels, scale_gray)
    else:  # Adam7 (validated above)
        arr = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # pass empty for these dimensions
            mat, off = _png_defilter(raw, off, stride(pw), ph, bpp)
            arr[y0::dy, x0::dx] = _png_expand(mat, pw, depth, channels, scale_gray)
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


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (SOF0/SOF1), pure numpy
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: pixels = A.T @ coefs @ A
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte-unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        byte = self.d[self.pos]
        if byte == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        v = (self.bits >> self.nbits) & 1
        self.bits &= (1 << self.nbits) - 1
        return v

    def align(self) -> None:
        self.bits = 0
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


_BUILD_HUFF_CACHE: dict = {}


def _build_huff(counts: list[int], symbols: bytes):
    """Canonical JPEG Huffman table: ({(length, code): symbol},
    16-bit-peek symbol LUT, length LUT) — the dict drives the
    marker-safe slow path, the LUTs the one-lookup fast path. Cached
    by the DHT payload (the 65536-entry LUT build is per-table work
    that repeats identically across a corpus of Annex-K images)."""
    key = (bytes(counts), bytes(symbols))
    hit = _BUILD_HUFF_CACHE.get(key)
    if hit is not None:
        return hit
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    sym_b, ln_b = _build_huff_lut(counts, bytes(symbols))
    out = (table, sym_b, ln_b)
    if len(_BUILD_HUFF_CACHE) > 64:
        _BUILD_HUFF_CACHE.clear()
    _BUILD_HUFF_CACHE[key] = out
    return out


def _huff_decode(br: _BitReader, table) -> int:
    """One peek-LUT lookup when 16 buffered bits are available; the
    original bit-walk only within 16 bits of a marker. Swallowing
    _MarkerHit during the greedy fill is safe: _fill raises BEFORE
    advancing past the marker, so reader state is untouched and the
    slow path re-raises exactly where the bit-walk always did."""
    dict_table, sym_b, ln_b = table
    if br.nbits < 16:
        try:
            while br.nbits < 16:
                br._fill()
        except _MarkerHit:
            pass
    if br.nbits >= 16:
        v = (br.bits >> (br.nbits - 16)) & 0xFFFF
        length = ln_b[v]
        if length == 0:
            raise ValueError("invalid JPEG huffman code")
        br.nbits -= length
        br.bits &= (1 << br.nbits) - 1
        return sym_b[v]
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = dict_table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _build_huff_lut(counts: list[int], symbols: bytes) -> tuple[bytes, bytes]:
    """16-bit peek lookup for a canonical JPEG Huffman table:
    (symbol[65536], codelength[65536]) as bytes objects (C-speed int
    indexing). Entry i covers every bitstream whose next 16 bits are i;
    length 0 marks an invalid prefix. One lookup replaces up to 16
    read_bit() + dict.get() rounds per symbol (the baseline decoder's
    hottest path)."""
    sym = bytearray(65536)
    ln = bytearray(65536)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = symbols[k : k + 1] * span
            ln[base : base + span] = bytes([length]) * span
            code += 1
            k += 1
        code <<= 1
    return bytes(sym), bytes(ln)


#: fused decode tables keyed by the DHT payload itself — real corpora
#: overwhelmingly ship the Annex K tables, so across a batch of images
#: the (one-time, numpy-vectorized) build cost amortizes to ~zero.
_FUSED_LUT_CACHE: dict = {}
#: DHT payloads seen at least once: a table that repeats is corpus-shared
#: (Annex K), so its pair tier amortizes — build it on the second use.
#: Optimized-Huffman corpora (fresh DHT per image) never repeat a key
#: and stay on the cheaper single tier for small images.
_FUSED_SEEN: set = set()
#: identity sentinels marking "pair tier not built" (a REAL pair table
#: can be all-zero for pathological codes, so compare by identity)
_ZERO_PAIR_TOT = b"\x00" * 65536
_ZERO_PAIR_RUN = b"\x00" * 65536
_ZERO_PAIR_VAL = array("i", bytes(4 * 65536))
#: all 16-bit windows, reused by every table build
_IDX16_I32 = np.arange(65536, dtype=np.int32)
_IDX16_I64 = np.arange(65536, dtype=np.int64)


def _build_fused_luts(
    counts: list[int], symbols: bytes, is_ac: bool, pairs: bool = True
):
    """Fused one-lookup decode tables for a canonical Huffman table.

    Returns ``(tot, run, val, ptot, prun2, pval2, sym, ln)``:

    - ``tot[v16]``: ``code_len + magnitude_size`` when the 16-bit peek
      window fully resolves ONE coefficient — i.e. the extend bits sit
      inside the window too, so ``val[v16]`` is the final extended
      value and ``run[v16]`` the zero-run. 0 ⇒ slow path (EOB, ZRL,
      invalid prefix, or code+size spilling past 16 bits).
    - ``ptot[v16]``: total bits when TWO consecutive coefficients
      resolve inside the same window (``prun2``/``pval2`` describe the
      second one). Valid because a complete prefix code + its extend
      bits within the top ``t1`` bits make the remaining ``16-t1`` bits
      position-independent: the zero-filled low bits of the shifted
      index cannot influence a second symbol whose own ``tot ≤ 16-t1``.
      Measured pair-hit rates: ~92% on 64x48 noise thumbnails (q90),
      ~65% on photographic content (q85) — which is why the hot loop
      retires ~1.45 coefficients per iteration.
    - ``sym``/``ln``: the classic one-symbol LUTs for the slow path.

    DC tables reuse the shape with ``run == 0`` and no pair tier; a DC
    size-0 code (diff = 0) is itself fully resolved by the code alone.

    ``pairs=False`` skips the pair tier (its gathers are the expensive
    part of the build) and stores identity sentinels instead — callers
    pass it for small images, where the pair tier's in-image saving
    does not cover its build cost when the DHT is fresh. A key that
    repeats (``_FUSED_SEEN``) upgrades to the full tables on its next
    request, reusing the cached single tier, so corpus-shared tables
    always end up paired while per-image optimized-Huffman tables stay
    on the cheap path.
    """
    key = (bytes(counts), bytes(symbols), is_ac)
    want_pairs = is_ac and (pairs or key in _FUSED_SEEN)
    hit = _FUSED_LUT_CACHE.get(key)
    if hit is not None and not (want_pairs and hit[3] is _ZERO_PAIR_TOT):
        return hit
    if len(_FUSED_SEEN) > 256:
        _FUSED_SEEN.clear()
    _FUSED_SEEN.add(key)
    if hit is not None:
        # pair-tier upgrade: single tier + classic LUTs come from the
        # cached entry; only the gathers below run
        tot = np.frombuffer(hit[0], np.uint8)
        run = np.frombuffer(hit[1], np.uint8)
        val = np.frombuffer(hit[2], np.int32)
        val_a = hit[2]
        sym_b, ln_b = hit[6], hit[7]
        t1 = tot.astype(np.int64)
        v2 = (_IDX16_I64 << t1) & 0xFFFF
        t2 = tot[v2]
        okp = (tot > 0) & (t2 > 0) & (t1 + t2 <= 16)
        ptot = ((t1 + t2) * okp).astype(np.uint8).tobytes()
        prun2 = (run[v2] * okp).astype(np.uint8).tobytes()
        pval2 = array("i")
        pval2.frombytes((val[v2] * okp).astype(np.int32).tobytes())
        out = (hit[0], hit[1], val_a, ptot, prun2, pval2, sym_b, ln_b)
        _FUSED_LUT_CACHE[key] = out
        return out
    sym_b, ln_b = _build_huff_lut(counts, bytes(symbols))
    # the single tier derives WHOLE-ARRAY from the classic sym/ln LUTs
    # (already span-filled at C speed): every entry's code length and
    # symbol are known, so the extend-bit field location and value are
    # ~10 numpy ops over all 65536 entries — no per-symbol Python loop
    # (which cost more than the decode it saved on optimized-Huffman
    # corpora that ship a fresh DHT per image)
    # boolean-multiply selection instead of np.where, and shifts instead
    # of table gathers: where/fancy-index cost ~190 us each at 65536 —
    # this chain is ~15 cheap elementwise ops (~0.3 ms/table)
    ln8 = np.frombuffer(ln_b, np.uint8)
    sym8 = np.frombuffer(sym_b, np.uint8)
    ln = ln8.astype(np.int32)
    if is_ac:
        size = (sym8 & 15).astype(np.int32)
    else:
        size = sym8.astype(np.int32)
    ok = (ln8 > 0) & (size > 0) & (ln + size <= 16)
    shift = (16 - ln - size) * ok
    mask = np.left_shift(np.int32(1), size) - 1
    raw = (_IDX16_I32 >> shift) & mask
    half = np.left_shift(np.int32(1), np.maximum(size - 1, 0))
    ext = raw - mask * (raw < half)
    tot64 = (ln + size) * ok
    if not is_ac:
        # DC size-0 code: diff = 0, fully resolved by the code alone
        tot64 += ln * ((ln8 > 0) & (size == 0))
    tot = tot64.astype(np.uint8)
    run = ((sym8 >> 4) * ok).astype(np.uint8) if is_ac else np.zeros(
        65536, dtype=np.uint8
    )
    val = (ext * ok).astype(np.int32)
    # value tiers live in array('i'), not lists: indexing returns a
    # Python int at list speed, frombytes is a memcpy (~100x cheaper
    # than tolist — per-image table builds matter for optimized-Huffman
    # corpora where every image ships its own DHT), and each table is
    # 256 KB instead of megabytes of int objects
    if want_pairs:
        t1 = tot.astype(np.int64)
        v2 = (_IDX16_I64 << t1) & 0xFFFF
        t2 = tot[v2]
        okp = (tot > 0) & (t2 > 0) & (t1 + t2 <= 16)
        ptot = ((t1 + t2) * okp).astype(np.uint8).tobytes()
        prun2 = (run[v2] * okp).astype(np.uint8).tobytes()
        pval2 = array("i")
        pval2.frombytes((val[v2] * okp).astype(np.int32).tobytes())
    else:
        ptot, prun2, pval2 = _ZERO_PAIR_TOT, _ZERO_PAIR_RUN, _ZERO_PAIR_VAL
    val_a = array("i")
    val_a.frombytes(val.tobytes())
    out = (tot.tobytes(), run.tobytes(), val_a, ptot, prun2, pval2,
           sym_b, ln_b)
    if len(_FUSED_LUT_CACHE) > 16:
        _FUSED_LUT_CACHE.clear()
    _FUSED_LUT_CACHE[key] = out
    return out


def _split_entropy_segments(b: bytes, start: int) -> list[bytes]:
    """Entropy-coded bytes from ``start`` split at RSTn markers, 0xFF00
    byte-stuffing removed — done ONCE per scan with C-level find/replace
    so the hot decode loop never tests for markers."""
    segs: list[bytes] = []
    i = start
    seg_start = start
    n = len(b)
    while True:
        j = b.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append(b[seg_start:n])
            break
        nxt = b[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        segs.append(b[seg_start:j])
        if 0xD0 <= nxt <= 0xD7:  # restart marker: next segment follows
            seg_start = i = j + 2
            continue
        break  # real marker (EOI / next scan): end of entropy data
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


def decode_jpeg(b: bytes, with_pixels: bool = True):
    """Baseline/extended sequential JPEG (SOF0/SOF1) → (width, height,
    rgb|None): huffman entropy decode, dequantize, 8x8 IDCT, chroma
    upsampling for 4:4:4 / 4:2:2 / 4:2:0, restart markers, JFIF
    YCbCr→RGB. Progressive (SOF2) delegates to
    :func:`_decode_progressive`; arithmetic-coded and lossless JPEGs
    raise with the reason so callers can route them to an external
    codec."""
    if b[:3] != b"\xff\xd8\xff":
        raise ValueError(f"not a JPEG payload (sniffed: {sniff(b)})")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[list[int], bytes]] = {}
    frame = None
    restart_interval = 0
    scan = None
    i = 2
    n = len(b)
    while i < n - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack_from(">H", b, i)
        seg = b[i + 2 : i + length]
        i += length
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_prec, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq_prec:
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 3 + 3 * c + 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:  # SOF2 — progressive DCT, huffman
            return _decode_progressive(b, with_pixels)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended sequential (SOF0/SOF1) and "
                "progressive (SOF2) JPEG supported "
                f"(got SOF marker 0x{marker:02X}) — route to an external codec"
            )
        elif marker == 0xC4:  # DHT — keep the raw (counts, symbols)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = bytes(seg[p + 17 : p + 17 + total])
                huff[(tc, th)] = (counts, symbols)
                p += 17 + total
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 15})
            data_start = i
            break
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS segments")
    w, h = frame["w"], frame["h"]
    if not with_pixels:
        return w, h, None

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    total_mcus = mcux * mcuy
    A = _DCT_A

    # --- entropy decode, fused value-LUTs + local-int bit buffer (the
    # per-bit dict-walk reader was >60% of decode wall time; the
    # two-LUT symbol decode + per-field extend arithmetic another big
    # slice). Segments are pre-unstuffed and pre-split at restart
    # markers; ONE 16-bit-peek lookup resolves code + extend bits to
    # the final coefficient value, and a pair tier retires TWO
    # coefficients per lookup when both fit the window (~1.45
    # coeffs/iteration measured, see _build_fused_luts). Refills pull
    # 8 bytes per struct.unpack_from with the accumulator masked at
    # refill time so Python ints stay ≤ ~80 bits. The IDCT / dequant /
    # de-zigzag run BATCHED over all blocks per component after the
    # scan instead of per 8x8 block.
    # pair tier only when the image is big enough for its build cost to
    # pay off in-image (fresh-DHT case); shared tables upgrade via
    # _FUSED_SEEN on their second image regardless of size
    big = total_mcus * sum(c["v"] * c["h"] for c in comps) >= 512
    fused = {
        key: _build_fused_luts(counts, syms, key[0] == 1, pairs=big)
        for key, (counts, syms) in huff.items()
    }
    segs = _split_entropy_segments(b, data_start)
    per_comp: dict[int, list[list[int]]] = {c["id"]: [] for c in comps}
    scan_plan = []
    for sc in scan:
        comp = by_id[sc["id"]]
        dtb, _dr, dvl, _dp1, _dp2, _dp3, dsy, dln = fused[(0, sc["dc"])]
        atb, arb, avl, apt, apr, apv, asy, aln = fused[(1, sc["ac"])]
        scan_plan.append(
            (sc["id"], comp["v"] * comp["h"],
             dtb, dvl, dsy, dln,
             atb, arb, avl, apt, apr, apv, asy, aln)
        )
    pred = {c["id"]: 0 for c in comps}
    uq8 = struct.Struct(">Q").unpack_from
    # two 0xFF pad bytes per segment: the 16-bit peek may reach past the
    # final (shorter) code into the byte-padding region; a complete
    # prefix code resolves identically whatever the trailing bits are,
    # and genuinely truncated streams still hit IndexError right after.
    # The 8-byte fast refill stops 8 bytes from the end (fast_stop) and
    # hands the tail to the byte-at-a-time path, so IndexError fires at
    # exactly the same consumed-bit position as the classic reader.
    seg_idx = 0
    data = segs[0] + b"\xff\xff"
    fast_stop = len(data) - 8
    pos = 0
    acc = 0
    nacc = 0
    mcu_count = 0
    truncated = False
    try:
        for _mcu in range(total_mcus):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if seg_idx + 1 < len(segs):
                    seg_idx += 1
                    data = segs[seg_idx] + b"\xff\xff"
                    fast_stop = len(data) - 8
                    pos = acc = nacc = 0
                else:  # no marker was written: just byte-align
                    drop = nacc & 7
                    nacc -= drop
                    acc &= (1 << nacc) - 1
                pred = dict.fromkeys(pred, 0)
            mcu_count += 1
            for (cid, nblk,
                 dc_tot, dc_val, dc_sym, dc_ln,
                 ac_tot, ac_run, ac_val,
                 ac_ptot, ac_prun2, ac_pval2,
                 ac_sym, ac_ln) in scan_plan:
                pred_c = pred[cid]
                blocks_c = per_comp[cid]
                for _blk in range(nblk):
                    zz = [0] * 64
                    # ---- DC ----
                    if nacc < 16:
                        if pos <= fast_stop:
                            acc = (((acc & ((1 << nacc) - 1)) << 64)
                                   | uq8(data, pos)[0])
                            pos += 8
                            nacc += 64
                        else:
                            while nacc < 16:
                                acc = (acc << 8) | data[pos]  # IndexError ⇒ truncated
                                pos += 1
                                nacc += 8
                    v16 = (acc >> (nacc - 16)) & 0xFFFF
                    t = dc_tot[v16]
                    if t:
                        nacc -= t
                        pred_c += dc_val[v16]
                    else:
                        length = dc_ln[v16]
                        if length == 0:
                            raise ValueError("invalid JPEG huffman code")
                        s = dc_sym[v16]
                        nacc -= length
                        if s:
                            while nacc < s:
                                acc = (acc << 8) | data[pos]
                                pos += 1
                                nacc += 8
                            nacc -= s
                            r = (acc >> nacc) & ((1 << s) - 1)
                            pred_c += r if r >= (1 << (s - 1)) else r - (1 << s) + 1
                    zz[0] = pred_c
                    # ---- AC ----
                    k = 1
                    while k < 64:
                        if nacc < 16:
                            if pos <= fast_stop:
                                acc = (((acc & ((1 << nacc) - 1)) << 64)
                                       | uq8(data, pos)[0])
                                pos += 8
                                nacc += 64
                            else:
                                while nacc < 16:
                                    acc = (acc << 8) | data[pos]
                                    pos += 1
                                    nacc += 8
                        v16 = (acc >> (nacc - 16)) & 0xFFFF
                        t = ac_tot[v16]
                        if t:
                            k += ac_run[v16]
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = ac_val[v16]
                            t2 = ac_ptot[v16]
                            if t2:
                                k2 = k + 1 + ac_prun2[v16]
                                if k2 < 64:
                                    zz[k2] = ac_pval2[v16]
                                    k = k2 + 1
                                    nacc -= t2
                                    continue
                                # second coefficient would overflow: consume
                                # only the first; the next iteration re-reads
                                # it and raises exactly where the classic
                                # decoder did
                            k += 1
                            nacc -= t
                            continue
                        length = ac_ln[v16]
                        if length == 0:
                            raise ValueError("invalid JPEG huffman code")
                        rs = ac_sym[v16]
                        nacc -= length
                        size = rs & 15
                        if size == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        while nacc < size:
                            acc = (acc << 8) | data[pos]
                            pos += 1
                            nacc += 8
                        nacc -= size
                        r = (acc >> nacc) & ((1 << size) - 1)
                        zz[k] = r if r >= (1 << (size - 1)) else r - (1 << size) + 1
                        k += 1
                    acc &= (1 << nacc) - 1
                    blocks_c.extend(zz)  # flat: np.array on a flat list
                    # is ~5x cheaper than on a list of 64-lists
                pred[cid] = pred_c
    except IndexError:
        truncated = True  # EOI / next marker mid-MCU: keep what decoded
    out_planes = []
    zig = np.asarray(_ZIGZAG)
    for c in comps:
        cv, ch = c["v"], c["h"]
        nbl = total_mcus * cv * ch
        got = per_comp[c["id"]]
        # int64 here, not float64: CPython's int→int64 fast path makes
        # np.array() on the (mostly-small-int) flat coefficient list
        # ~8x cheaper; the dequant multiply below promotes to float64
        # exactly (|coef| ≤ 32767, q ≤ 65535 — well inside 2^53)
        zzm = (
            np.array(got, dtype=np.int64).reshape(-1, 64)
            if got
            else np.zeros((0, 64))
        )
        q64 = qt[c["tq"]].astype(np.float64)
        nat = np.zeros((nbl, 64), dtype=np.float64)
        nat[: zzm.shape[0], zig] = zzm * q64  # dequant + de-zigzag, batched
        blocks = nat.reshape(-1, 8, 8)
        out = A.T @ blocks @ A + 128.0
        if truncated and zzm.shape[0] < nbl:
            out[zzm.shape[0] :] = 0.0  # parity with the per-block writer
        p = (
            out.reshape(mcuy, mcux, cv, ch, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * cv * 8, mcux * ch * 8)
        )
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return w, h, np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)
    return w, h, np.ascontiguousarray(rgb)


def _decode_progressive(b: bytes, with_pixels: bool = True):
    """Progressive JPEG (SOF2, huffman) → (width, height, rgb|None).

    T.81 Annex G decoding: coefficients accumulate across scans —
    spectral selection (Ss..Se bands) and successive approximation
    (Ah/Al bit planes) in any legal progression — then one dequantize +
    IDCT pass at EOI. Supports interleaved DC scans, non-interleaved
    per-component scans, EOB runs, DC/AC refinement bits, and restart
    markers. DRI (0xDD) is tracked and restarts are consumed
    POSITIONALLY by MCU count: refinement scans start with raw bit
    reads, so a reactive marker-hit handler would first swallow the
    pre-marker padding 1-bits as correction bits and corrupt blocks it
    cannot roll back. Algorithm structure follows the public spec
    (same logic as libjpeg's jdphuff.c, re-derived)."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    huff_raw: dict[tuple[int, int], tuple[list[int], bytes]] = {}
    frame = None
    geom = None
    # per-component coefficient accumulator: ONE flat Python list per
    # component (64 slots per block, grid-row-major). Scans touch
    # single coefficients at a time, and CPython list stores/loads are
    # ~4x cheaper than numpy scalar access — the whole grid converts to
    # numpy once, at EOI.
    coef: dict[int, list] = {}
    restart_interval = 0
    i = 2
    n = len(b)
    while i < n - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        i += 2
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            continue  # 0x00 = stuffed-FF remnant of a finished scan
        if marker == 0xD9:
            break
        (length,) = struct.unpack_from(">H", b, i)
        seg = b[i + 2 : i + length]
        i += length
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq_prec, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq_prec:
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                qt[tq] = vals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xC2:
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 3 + 3 * c + 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
            if not with_pixels:
                return w, h, None
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            geom = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy}
            for c in comps:
                # full MCU-padded block grid; zigzag-order coefficients
                c["gby"] = mcuy * c["v"]
                c["gbx"] = mcux * c["h"]
                coef[c["id"]] = [0] * (c["gby"] * c["gbx"] * 64)
                # non-interleaved scan dims (T.81 A.1.1: ceil of the
                # component's own sample extents)
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                c["nbx"] = (cw + 7) // 8
                c["nby"] = (ch + 7) // 8
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF inside progressive stream")
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                huff[(tc, th)] = _build_huff(counts, symbols)
                huff_raw[(tc, th)] = (counts, bytes(symbols))
                p += 17 + total
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("progressive SOS before SOF2")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append({"id": cs, "dc": tables >> 4, "ac": tables & 15})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            i = _progressive_scan(
                b, i, frame, geom, coef, huff, huff_raw, scomps, ss, se, ah, al,
                restart_interval,
            )
    if frame is None:
        raise ValueError("progressive JPEG missing SOF2")
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax, vmax = geom["hmax"], geom["vmax"]
    A = _DCT_A
    out_planes = []
    for c in comps:
        gby, gbx = c["gby"], c["gbx"]
        zz = np.array(coef[c["id"]], dtype=np.int64).reshape(
            gby, gbx, 64
        ) * qt[c["tq"]][None, None, :].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz
        blocks = nat.reshape(gby, gbx, 8, 8)
        # batched matmul over (N, 8, 8) like the baseline path — BLAS
        # dispatch beats the general einsum contraction ~3x here
        px = (A.T @ blocks.reshape(-1, 8, 8) @ A + 128.0).reshape(
            blocks.shape
        )
        p = px.transpose(0, 2, 1, 3).reshape(gby * 8, gbx * 8)
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return w, h, np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)
    return w, h, np.ascontiguousarray(rgb)


def _progressive_scan(
    b, pos, frame, geom, coef, huff, huff_raw, scomps, ss, se, ah, al,
    restart_interval=0,
):
    """Decode one progressive scan's entropy data starting at ``pos``;
    returns the position of the terminating marker. With a nonzero DRI
    restart markers are consumed POSITIONALLY at MCU-count boundaries
    (byte-align, skip RSTn, reset DC predictors + EOB run) BEFORE the
    boundary block decodes — a reactive marker-hit handler cannot work
    for refinement scans, whose leading raw bit reads would consume
    the pre-marker padding 1-bits as correction bits and corrupt
    blocks that are never rolled back. A reactive reset remains as the
    fallback for non-conformant streams (stray RSTn without DRI).

    AC-first scans run the same fused value-LUT loop as the baseline
    decoder (one 16-bit-window lookup per coefficient, a pair tier for
    two) inlined over the reader's state; everything the fast loop
    cannot retire — EOB runs, ZRL, codes spilling past the window,
    marker proximity, the band tail — delegates to the classic
    ``ac_first_slow`` continuation, which owns all the subtle T.81
    Annex G semantics exactly as before."""
    comps = {c["id"]: c for c in frame["comps"]}
    pred = {sc["id"]: 0 for sc in scomps}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    # flat task list in scan order: (mcu_index, comp_id, base, scomp)
    # where base indexes the component's flat coefficient list at the
    # block's 64-slot row (grid stride = the MCU-padded gbx, also for
    # non-interleaved scans whose own extent nbx may be smaller); for
    # non-interleaved scans the MCU is a single block (T.81 B.2.3), so
    # restart intervals count blocks there
    tasks: list[tuple] = []
    if len(scomps) > 1:
        if ss != 0:
            raise ValueError("interleaved progressive AC scan is illegal")
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                mcu = my * geom["mcux"] + mx
                for sc in scomps:
                    c = comps[sc["id"]]
                    gbx = c["gbx"]
                    for v_ in range(c["v"]):
                        for h_ in range(c["h"]):
                            base = ((my * c["v"] + v_) * gbx + mx * c["h"] + h_) * 64
                            tasks.append((mcu, sc["id"], base, sc))
    else:
        sc = scomps[0]
        c = comps[sc["id"]]
        gbx = c["gbx"]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                tasks.append((by * c["nbx"] + bx, sc["id"], (by * gbx + bx) * 64, sc))

    br = _BitReader(b, pos)
    is_ac_first = ss != 0 and ah == 0
    fused_ac = (
        {
            sc["ac"]: _build_fused_luts(
                *huff_raw[(1, sc["ac"])], True, pairs=len(tasks) >= 512
            )
            for sc in scomps
        }
        if is_ac_first
        else {}
    )

    def dc_first(lst, base, sc):
        s = _huff_decode(br, huff[(0, sc["dc"])])
        diff = _extend(br.read(s), s) if s else 0
        pred[sc["id"]] += diff
        lst[base] = pred[sc["id"]] << al

    def dc_refine(lst, base):
        if br.read_bit():
            lst[base] |= p1

    def ac_first_slow(lst, base, sc, k):
        """Classic per-symbol decode from band index ``k`` — the single
        owner of EOB-run/ZRL semantics (and of marker handling, via the
        reader's own fill)."""
        nonlocal eobrun
        act = huff[(1, sc["ac"])]
        while k <= se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 15
            if s:
                k += r
                if k > se:
                    raise ValueError("progressive AC index overflow")
                lst[base + k] = _extend(br.read(s), s) << al
                k += 1
            else:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read(r)
                    break
                k += 16

    def ac_first(lst, base, sc):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        tot_b, run_b, val_l, ptot_b, prun2_b, pval2_l, _s, _l = fused_ac[sc["ac"]]
        d = br.d
        pos_ = br.pos
        bits = br.bits
        nbits = br.nbits
        k = ss
        while k <= se:
            if nbits < 16:
                hit_marker = False
                while nbits < 16:
                    byte = d[pos_]  # IndexError ⇒ truncated, as _fill
                    if byte == 0xFF:
                        nxt = d[pos_ + 1]
                        if nxt != 0x00:
                            hit_marker = True
                            break
                        pos_ += 2
                    else:
                        pos_ += 1
                    bits = (bits << 8) | byte
                    nbits += 8
                if hit_marker:
                    # marker not consumed: hand the band tail to the
                    # classic path, whose fill raises _MarkerHit at the
                    # exact same reader position
                    br.pos = pos_
                    br.bits = bits & ((1 << nbits) - 1)
                    br.nbits = nbits
                    return ac_first_slow(lst, base, sc, k)
            v16 = (bits >> (nbits - 16)) & 0xFFFF
            t = tot_b[v16]
            if t:
                k += run_b[v16]
                if k > se:
                    raise ValueError("progressive AC index overflow")
                lst[base + k] = val_l[v16] << al
                t2 = ptot_b[v16]
                if t2:
                    k2 = k + 1 + prun2_b[v16]
                    if k2 <= se:
                        lst[base + k2] = pval2_l[v16] << al
                        k = k2 + 1
                        nbits -= t2
                        continue
                k += 1
                nbits -= t
                continue
            # EOB run / ZRL / spill / invalid: classic path owns it
            br.pos, br.bits, br.nbits = pos_, bits & ((1 << nbits) - 1), nbits
            return ac_first_slow(lst, base, sc, k)
        br.pos, br.bits, br.nbits = pos_, bits & ((1 << nbits) - 1), nbits

    def ac_refine(lst, base, sc):
        nonlocal eobrun
        act = huff[(1, sc["ac"])]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_decode(br, act)
                r, s = rs >> 4, rs & 15
                val = 0
                if s:
                    # per T.81 G.1.2.3 s is always 1 in refinement scans
                    val = p1 if br.read_bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # advance over r zero-history coefficients, emitting
                # correction bits for every nonzero-history one passed
                while k <= se:
                    cur = lst[base + k]
                    if cur:
                        if br.read_bit() and not (cur & p1):
                            lst[base + k] = cur + (p1 if cur >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    lst[base + k] = val
                k += 1
        if eobrun > 0:
            # EOB-covered block: only correction bits for nonzero history
            while k <= se:
                cur = lst[base + k]
                if cur:
                    if br.read_bit() and not (cur & p1):
                        lst[base + k] = cur + (p1 if cur >= 0 else m1)
                k += 1
            eobrun -= 1

    idx = 0
    rst_done = 0  # highest MCU boundary whose RSTn was already consumed
    while idx < len(tasks):
        mcu, cid, base, sc = tasks[idx]
        if (
            restart_interval
            and mcu > rst_done
            and mcu % restart_interval == 0
            and (idx == 0 or tasks[idx - 1][0] != mcu)
        ):
            rst_done = mcu
            # the encoder byte-aligned and wrote RSTn exactly here; any
            # buffered bits are padding within the already-consumed byte
            # (the reader never buffers past the current byte), so the
            # marker begins at br.pos after optional 0xFF fill bytes
            p = br.pos
            while p + 1 < len(b) and b[p] == 0xFF and b[p + 1] == 0xFF:
                p += 1
            if p + 1 < len(b) and b[p] == 0xFF and 0xD0 <= b[p + 1] <= 0xD7:
                br.align()
                br.pos = p + 2
                pred = {s_["id"]: 0 for s_ in scomps}
                eobrun = 0
            # else: DRI declared but no marker here — non-conformant;
            # keep decoding, the reactive handler below catches strays
        lst = coef[cid]
        try:
            if ss == 0 and ah == 0:
                dc_first(lst, base, sc)
            elif ss == 0:
                dc_refine(lst, base)
            elif ah == 0:
                ac_first(lst, base, sc)
            else:
                ac_refine(lst, base, sc)
            idx += 1
        except _MarkerHit as mh:
            m = mh.marker & 0xFF
            if 0xD0 <= m <= 0xD7:  # RSTn: reset, retry this block
                pred = {s_["id"]: 0 for s_ in scomps}
                eobrun = 0
                br = _BitReader(b, br.pos + 2)
            else:  # next SOS/EOI/... — scan ends here
                return br.pos
    return br.pos


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive JFIF JPEG (SOF2, 4:4:4): a DC
    scan with one bit of successive approximation (Al=1) + its DC
    refinement scan, then one full-band AC scan per component. Uses the
    SAME quantization + huffman tables as :func:`encode_jpeg`, so the
    coefficients — and therefore the decoded pixels — are bit-identical
    to the baseline encoding of the same input: the roundtrip partner
    that proves :func:`_decode_progressive` correct. A nonzero
    ``restart_interval`` emits DRI plus RSTn markers in EVERY scan's
    entropy data (T.81 requires them in each scan once DRI is
    nonzero; non-interleaved AC scans count one block per MCU), with
    the marker number restarting at RST0 per scan."""
    h, w, _ = pixels.shape
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)[_ZIGZAG]
    qc = np.clip((_STD_CHROMA_Q * scale + 50) // 100, 1, 255)[_ZIGZAG]

    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    bw, bh = (w + 7) // 8, (h + 7) // 8
    dc_l, ac_l = _enc_huff(*_STD_DC_LUMA), _enc_huff(*_STD_AC_LUMA)
    dc_c, ac_c = _enc_huff(*_STD_DC_CHROMA), _enc_huff(*_STD_AC_CHROMA)
    A = _DCT_A
    planes = [(y, ql), (cb, qc), (cr, qc)]
    padded = []
    for plane, _q in planes:
        p = np.empty((bh * 8, bw * 8))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p)
    # quantized zigzag coefficients for every (comp, block) up front —
    # FDCT/quantize/last-nonzero batched, entropy symbols appended to
    # flat (value, nbits) lists and packed in one numpy pass per scan
    # segment (same treatment as the round-11 baseline encoder)
    zz_rows = []
    last_rows = []
    for ci, (_, q) in enumerate(planes):
        p = padded[ci]
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coefs = A @ (blocks - 128.0) @ A.T
        zzm = np.round(coefs.reshape(-1, 64)[:, _ZIGZAG] / q).astype(np.int64)
        nz = zzm != 0
        nz[:, 0] = False
        last = np.where(nz.any(axis=1), 63 - np.argmax(nz[:, ::-1], axis=1), 0)
        zz_rows.append(zzm.tolist())
        last_rows.append(last.tolist())

    # --- scan 1: interleaved DC first, Al=1 ---
    vals: list[int] = []
    lens: list[int] = []
    segments: list[bytes] = []
    pred = [0, 0, 0]
    dc_tabs = [dc_l, dc_c, dc_c]
    mcu_idx = 0
    rst = 0
    for bi in range(bh * bw):
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            segments.append(_pack_bits_stuffed(vals, lens))
            segments.append(bytes([0xFF, 0xD0 + rst]))
            vals, lens = [], []
            rst = (rst + 1) % 8
            pred = [0, 0, 0]
        mcu_idx += 1
        for ci in range(3):
            t = zz_rows[ci][bi][0] >> 1  # point transform Al=1
            diff = t - pred[ci]
            pred[ci] = t
            s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
            code, ln = dc_tabs[ci][s]
            vals.append(code)
            lens.append(ln)
            if s:
                vals.append(diff if diff >= 0 else diff + (1 << s) - 1)
                lens.append(s)
    segments.append(_pack_bits_stuffed(vals, lens))
    dc_scan1 = b"".join(segments)

    # --- scan 2: interleaved DC refine, Ah=1 Al=0 (one raw bit/block) ---
    vals, lens, segments = [], [], []
    mcu_idx = 0
    rst = 0
    for bi in range(bh * bw):
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            segments.append(_pack_bits_stuffed(vals, lens))
            segments.append(bytes([0xFF, 0xD0 + rst]))
            vals, lens = [], []
            rst = (rst + 1) % 8
        mcu_idx += 1
        for ci in range(3):
            vals.append(zz_rows[ci][bi][0] & 1)
            lens.append(1)
    segments.append(_pack_bits_stuffed(vals, lens))
    dc_scan2 = b"".join(segments)

    # --- scans 3-5: per-component AC 1..63, no successive approx ---
    ac_scans = []
    ac_tabs = [ac_l, ac_c, ac_c]
    for ci in range(3):
        act = ac_tabs[ci]
        vals, lens, segments = [], [], []
        mcu_idx = 0
        rst = 0
        for bi in range(bh * bw):
            # non-interleaved scan: one block per MCU (T.81 B.2.3)
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                segments.append(_pack_bits_stuffed(vals, lens))
                segments.append(bytes([0xFF, 0xD0 + rst]))
                vals, lens = [], []
                rst = (rst + 1) % 8
            mcu_idx += 1
            zz = zz_rows[ci][bi]
            last_nz = last_rows[ci][bi]
            run = 0
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act[0xF0]
                    vals.append(code)
                    lens.append(ln)
                    run -= 16
                s = v.bit_length() if v >= 0 else (-v).bit_length()
                code, ln = act[(run << 4) | s]
                vals.append(code)
                lens.append(ln)
                vals.append(v if v >= 0 else v + (1 << s) - 1)
                lens.append(s)
                run = 0
            if last_nz < 63:
                code, ln = act[0x00]  # EOB (run length 1)
                vals.append(code)
                lens.append(ln)
        segments.append(_pack_bits_stuffed(vals, lens))
        ac_scans.append(b"".join(segments))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(ql[z]) for z in range(64)))
    out += seg(0xDB, bytes([1]) + bytes(int(qc[z]) for z in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += seg(0xC2, sof)
    for (tc, th), (counts, symbols) in (
        ((0, 0), _STD_DC_LUMA), ((1, 0), _STD_AC_LUMA),
        ((0, 1), _STD_DC_CHROMA), ((1, 1), _STD_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    # scan 1: DC first (all comps), Ss=0 Se=0 Ah=0 Al=1
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x01]))
    out += dc_scan1
    # scan 2: DC refine, Ah=1 Al=0 (DC table unused but declared)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x10]))
    out += dc_scan2
    # scans 3-5: AC full band per component
    for ci, cid in enumerate((1, 2, 3)):
        out += seg(0xDA, bytes([1, cid, 0x00 if ci == 0 else 0x01, 1, 63, 0x00]))
        out += ac_scans[ci]
    out += b"\xff\xd9"
    return bytes(out)


# Annex K tables — the standard luminance/chrominance quantization and
# huffman tables every baseline encoder ships.
_STD_LUMA_Q = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32,
)
_STD_CHROMA_Q = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32,
)
_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], bytes(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bytes(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes(
        [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
         0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
         0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
         0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
         0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
         0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
         0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
         0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
         0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
         0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
         0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
         0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
         0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
         0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
    ),
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes(
        [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
         0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
         0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
         0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
         0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
         0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
         0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
         0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
         0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
         0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
         0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
         0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
         0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
         0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
    ),
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            byte = (self.acc >> self.nacc) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)


def _enc_huff(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _pack_bits_stuffed(vals: list[int], lens: list[int]) -> bytes:
    """Assemble variable-width big-endian fields into JPEG entropy
    bytes in one numpy pass: 1-pad to a byte boundary (T.81 F.1.2.3),
    packbits, then 0xFF-stuff with a C-level replace. Field values
    must already be non-negative (the encoder biases negatives)."""
    v = np.array(vals, dtype=np.int64)
    ln = np.array(lens, dtype=np.int64)
    total = int(ln.sum())
    pad = (-total) % 8
    if pad:
        v = np.append(v, (1 << pad) - 1)
        ln = np.append(ln, pad)
        total += pad
    if not total:
        return b""
    ends = np.cumsum(ln)
    shifts = np.repeat(ends, ln) - 1 - np.arange(total, dtype=np.int64)
    bits = ((np.repeat(v, ln) >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits).tobytes().replace(b"\xff", b"\xff\x00")


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG (4:4:4, standard Annex K
    quantization scaled by ``quality`` and standard huffman tables) —
    the roundtrip partner of :func:`decode_jpeg` for fixture
    generation; real-corpus decoding is the decoder's job.
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs."""
    h, w, _ = pixels.shape
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    # Annex K tables are natural (row-major) order; the DQT segment and
    # the per-coefficient divisors below use ZIGZAG order, like every
    # real encoder — reorder once here
    ql = np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)[_ZIGZAG]
    qc = np.clip((_STD_CHROMA_Q * scale + 50) // 100, 1, 255)[_ZIGZAG]

    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    bw, bh = (w + 7) // 8, (h + 7) // 8
    dc_l, ac_l = _enc_huff(*_STD_DC_LUMA), _enc_huff(*_STD_AC_LUMA)
    dc_c, ac_c = _enc_huff(*_STD_DC_CHROMA), _enc_huff(*_STD_AC_CHROMA)
    A = _DCT_A
    pred = [0, 0, 0]
    planes = [
        (y, ql, dc_l, ac_l),
        (cb, qc, dc_c, ac_c),
        (cr, qc, dc_c, ac_c),
    ]
    # FDCT + quantize BATCHED per plane; per-block zigzag rows as plain
    # lists and a vectorized bit-packer replace the per-coefficient
    # _BitWriter calls (same treatment as the round-11 decoder rewrite)
    zz_lists = []
    last_lists = []
    for ci, (plane, q, _dct, _act) in enumerate(planes):
        p = np.empty((bh * 8, bw * 8))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:, w:] = p[:, w - 1 : w]
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coefs = A @ (blocks - 128.0) @ A.T
        # zigzag-ordered coefficients over zigzag-ordered Q
        zzm = np.round(coefs.reshape(-1, 64)[:, _ZIGZAG] / q).astype(np.int64)
        nz = zzm != 0
        nz[:, 0] = False
        last = np.where(nz.any(axis=1), 63 - np.argmax(nz[:, ::-1], axis=1), 0)
        zz_lists.append(zzm.tolist())
        last_lists.append(last.tolist())
    vals: list[int] = []
    lens: list[int] = []
    segments: list[bytes] = []
    mcu_idx = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                segments.append(_pack_bits_stuffed(vals, lens))
                segments.append(bytes([0xFF, 0xD0 + rst]))
                vals, lens = [], []
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            mcu_idx += 1
            bi = by * bw + bx
            for ci, (_, _q, dct, act) in enumerate(planes):
                zz = zz_lists[ci][bi]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
                code, ln = dct[s]
                vals.append(code)
                lens.append(ln)
                if s:
                    vals.append(diff if diff >= 0 else diff + (1 << s) - 1)
                    lens.append(s)
                run = 0
                last_nz = last_lists[ci][bi]
                for k in range(1, last_nz + 1):
                    v = zz[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        vals.append(code)
                        lens.append(ln)
                        run -= 16
                    s = v.bit_length() if v >= 0 else (-v).bit_length()
                    code, ln = act[(run << 4) | s]
                    vals.append(code)
                    lens.append(ln)
                    vals.append(v if v >= 0 else v + (1 << s) - 1)
                    lens.append(s)
                    run = 0
                if last_nz < 63:
                    code, ln = act[0x00]
                    vals.append(code)
                    lens.append(ln)
    segments.append(_pack_bits_stuffed(vals, lens))
    entropy = b"".join(segments)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(ql[z]) for z in range(64)))
    out += seg(0xDB, bytes([1]) + bytes(int(qc[z]) for z in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += seg(0xC0, sof)
    for (tc, th), (counts, symbols) in (
        ((0, 0), _STD_DC_LUMA), ((1, 0), _STD_AC_LUMA),
        ((0, 1), _STD_DC_CHROMA), ((1, 1), _STD_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF — 87a/89a, LZW, global/local palettes, interlace
# ---------------------------------------------------------------------------


#: single-byte bytes objects, shared by every LZW dictionary
_B1 = [bytes([i]) for i in range(256)]
#: initial LZW dictionaries per min_code_size — entries are immutable
#: bytes, so a shallow copy per CLEAR replaces the per-reset listcomp
_GIF_DICT_BASE: dict[int, list[bytes]] = {}


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/END codes, code
    width grows to 12 bits. Returns ``n_pixels`` palette indexes."""
    clear = 1 << min_code_size
    end = clear + 1
    base = _GIF_DICT_BASE.get(min_code_size)
    if base is None:
        base = _B1[:clear] + [b"", b""]
        _GIF_DICT_BASE[min_code_size] = base
    out = bytearray()
    outlen = 0
    # bit stream state; the fast refill pulls 4 bytes per
    # int.from_bytes while at least 4 remain — the byte tail keeps the
    # truncated-stream return at the exact same consumed position
    acc = 0
    nbits = 0
    pos = 0
    ndata = len(data)
    fast_stop = ndata - 4
    ifb = int.from_bytes
    width = min_code_size + 1
    dictionary = base.copy()
    dlen = len(dictionary)
    prev: bytes | None = None

    while outlen < n_pixels:
        if nbits < width:
            if pos <= fast_stop:
                acc |= ifb(data[pos : pos + 4], "little") << nbits
                nbits += 32
                pos += 4
            else:
                while nbits < width:
                    if pos >= ndata:
                        return bytes(out)  # truncated: keep what decoded
                    acc |= data[pos] << nbits
                    nbits += 8
                    pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = base.copy()
            dlen = len(dictionary)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < dlen:
            entry = dictionary[code]
        elif code == dlen and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        outlen += len(entry)
        if prev is not None:
            dictionary.append(prev + entry[:1])
            dlen += 1
            if dlen == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def decode_gif(b: bytes, with_pixels: bool = True):
    """GIF87a/89a bytes → (width, height, rgb|None) for the FIRST
    image block: LZW decode, global or local palette, Adam-less GIF
    4-pass interlace. Extensions (graphic control, comments,
    application) are skipped; transparency renders as its palette
    color (hashing/dedup never needs alpha)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload (sniffed: {sniff(b)})")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            palette = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if not with_pixels:
                return iw, ih, None
            if palette is None:
                raise ValueError("GIF image without any color table")
            min_code_size = b[pos]
            pos += 1
            lzw = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                lzw += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(min_code_size, bytes(lzw), iw * ih), np.uint8
            )
            if len(idx) < iw * ih:  # truncated: pad with background 0
                idx = np.concatenate([idx, np.zeros(iw * ih - len(idx), np.uint8)])
            grid = idx[: iw * ih].reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                order = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            rgb = palette[np.clip(grid, 0, len(palette) - 1)]
            return iw, ih, np.ascontiguousarray(rgb)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF contains no image block")


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB with ≤256 distinct colors → GIF89a bytes
    (exact palette, literal-code LZW with periodic CLEARs — valid
    output any GIF decoder accepts; lossless for paletted content).
    The roundtrip partner of :func:`decode_gif` for fixtures."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs ≤256 distinct colors (got {len(colors)})")
    bits = max(1, int(len(colors) - 1).bit_length())
    table_size = 1 << bits
    palette = np.zeros((table_size, 3), dtype=np.uint8)
    palette[: len(colors)] = colors

    grid = idx.reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        grid = grid[order]
    seq = grid.reshape(-1)

    min_code_size = max(2, bits)
    clear = 1 << min_code_size
    width = min_code_size + 1
    acc = 0
    nacc = 0
    data = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    # literal codes only; re-CLEAR before the dictionary would force a
    # wider code (every literal stays below 2^width after the clear)
    budget = (1 << width) - clear - 3
    count = 0
    for v in seq:
        if count == budget:
            emit(clear)
            count = 0
        emit(int(v))
        count += 1
    emit(clear + 1)  # END
    if nacc:
        data.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(b: bytes, with_pixels: bool = True, overrides=None):
    """Route to the matching baseline decoder; raise for formats that
    need an external library (callers surface the format name).

    ``overrides`` maps a sniffed format name (:func:`sniff`) to an
    external decoder ``bytes -> (H, W, 3) uint8 ndarray`` — e.g.
    ``{"mp4": ..., "jpeg": pillow_decode}`` on a Pillow/ffmpeg-equipped
    cluster. An override takes precedence over the baseline decoder for
    its format, so callers can also swap in a faster native JPEG path.
    Exceptions from an override propagate — the Spark kernels wrap
    every decode in their ``on_error`` guard, so a failing override
    row skips exactly like an undecodable baseline row."""
    kind = sniff(b)
    if overrides and kind in overrides:
        px = np.asarray(overrides[kind](b))
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError(
                f"decoder override for {kind!r} must return an "
                f"(H, W, 3) array, got shape {px.shape}"
            )
        h, w = int(px.shape[0]), int(px.shape[1])
        return (w, h, px.astype(np.uint8)) if with_pixels else (w, h)
    if kind == "bmp":
        return decode_bmp(b, with_pixels)
    if kind == "ppm":
        return decode_ppm(b, with_pixels)
    if kind == "png":
        return decode_png(b, with_pixels)
    if kind == "jpeg":
        return decode_jpeg(b, with_pixels)
    if kind == "gif":
        return decode_gif(b, with_pixels)
    raise ValueError(
        f"no baseline decoder for {kind!r} — this format needs an "
        "external library (e.g. Pillow/ffmpeg); route these rows to an "
        "external codec via decoder_overrides"
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
    Integer PCM (format 1) at 8/16/24/32 bits, IEEE float32 (format 3),
    and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping either — the shapes
    real audio corpora actually carry. Samples normalize to the int16
    range (8-bit rescales up; 24/32-bit and float reduce down), so
    downstream fingerprints are bit-depth independent."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"not a WAV payload (sniffed: {sniff(b)})")
    i = 12
    n = len(b)
    rate = ch = bits = audio_fmt = None
    data_off = data_len = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", b, i + 8)
            bits = struct.unpack_from("<H", b, i + 22)[0]
            if audio_fmt == 0xFFFE and clen >= 40:
                # EXTENSIBLE: the real format code is the first two
                # bytes of the SubFormat GUID (after cbSize, valid
                # bits, and the channel mask)
                audio_fmt = struct.unpack_from("<H", b, i + 32)[0]
            if audio_fmt not in (1, 3):
                raise ValueError(
                    f"only PCM/float WAV supported (format {audio_fmt})"
                )
        elif cid == b"data":
            data_off, data_len = i + 8, clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data_off is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt == 3 and bits != 32:
        raise ValueError(f"float WAV must be 32-bit (got {bits})")
    if audio_fmt == 1 and bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {bits}")
    bytes_per = (bits // 8) * ch
    n_samples = data_len // bytes_per
    if not with_samples:
        return rate, ch, n_samples, None
    count = n_samples * ch
    if audio_fmt == 3:  # IEEE float32 in [-1, 1]
        f = np.frombuffer(b, dtype="<f4", count=count, offset=data_off)
        raw = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    elif bits == 16:
        raw = np.frombuffer(b, dtype="<i2", count=count, offset=data_off)
    elif bits == 8:  # unsigned, rescaled up to the 16-bit range
        raw = (
            np.frombuffer(b, dtype=np.uint8, count=count, offset=data_off).astype(
                np.int16
            )
            - 128
        ) * 256
    elif bits == 24:  # little-endian signed 3-byte, high 16 bits kept
        tri = np.frombuffer(
            b, dtype=np.uint8, count=count * 3, offset=data_off
        ).reshape(-1, 3).astype(np.int32)
        v = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
        v -= (v & 0x800000) << 1  # sign-extend bit 23
        raw = (v >> 8).astype(np.int16)
    else:  # 32-bit signed PCM, high 16 bits kept
        raw = (
            np.frombuffer(b, dtype="<i4", count=count, offset=data_off) >> 16
        ).astype(np.int16)
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


# ---------------------------------------------------------------------------
# FLAC — free lossless audio codec (native decode; fixture encoder)
# ---------------------------------------------------------------------------

# CRC tables from the FLAC spec polynomials (header CRC-8 poly 0x07,
# frame CRC-16 poly 0x8005), generated once at import
def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        r = byte << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8_TABLE[c ^ byte]
    return c


def _crc16_loop(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16_TABLE[((c >> 8) ^ byte) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


def _crc16_np_tables():
    """Vectorized CRC-16/IBM support tables. CRC is linear over GF(2):
    crc(M) = XOR_i  b_i(x) * x^(8*d_i + 16) mod G,  d_i = bytes after i.
    x is invertible mod G (G(0)=1), so x^e mod G is periodic in e; we
    find the period numerically and tabulate one full cycle, plus a
    256-entry reducer for (v << 16) mod G. With those, the whole CRC is
    8 shift-xor numpy passes + one xor-reduce — no per-byte Python."""
    period = 0
    r = 1
    pows = [1]
    for k in range(1, 1 << 17):
        r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1)
        if r == 1:
            period = k
            break
        pows.append(r)
    if not period:  # unreachable for this G; keeps the fallback honest
        return None, None, 0
    red = []
    for v in range(256):
        c = v << 16
        for bit in range(23, 15, -1):
            if c & (1 << bit):
                c ^= 0x18005 << (bit - 16)
        red.append(c)
    return (
        np.array(pows, dtype=np.uint32),
        np.array(red, dtype=np.uint32),
        period,
    )


_CRC16_POW, _CRC16_RED, _CRC16_PERIOD = _crc16_np_tables()


def _crc16(data: bytes) -> int:
    if len(data) < 256 or _CRC16_PERIOD == 0:
        return _crc16_loop(data)
    a = np.frombuffer(data, dtype=np.uint8).astype(np.uint32)
    n = a.shape[0]
    e = (8 * (n - 1 - np.arange(n, dtype=np.int64)) + 16) % _CRC16_PERIOD
    r = _CRC16_POW[e]
    acc = np.zeros(n, dtype=np.uint32)
    for k in range(8):
        acc ^= (r << np.uint32(k)) * ((a >> np.uint32(k)) & np.uint32(1))
    out = _CRC16_RED[acc >> np.uint32(16)] ^ (acc & np.uint32(0xFFFF))
    return int(np.bitwise_xor.reduce(out))


class _PlainBitWriter:
    """MSB-first bit writer with NO byte stuffing (FLAC, unlike JPEG)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
            self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def write_bits(self, arr: np.ndarray) -> None:
        """Append a 0/1 uint8 bit array (MSB-first) — the bulk lane:
        full bytes go through np.packbits instead of per-bit write()."""
        if self.nacc:
            lead = np.fromiter(
                ((self.acc >> (self.nacc - 1 - k)) & 1 for k in range(self.nacc)),
                dtype=np.uint8,
                count=self.nacc,
            )
            arr = np.concatenate([lead, arr])
            self.acc = 0
            self.nacc = 0
        nfull = arr.shape[0] & ~7
        if nfull:
            self.out += np.packbits(arr[:nfull]).tobytes()
        for bit in arr[nfull:]:
            self.write(int(bit), 1)


class _PlainBitReader:
    """MSB-first bit reader over plain bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nacc = 0

    def read(self, n: int) -> int:
        while self.nacc < n:
            if self.pos >= len(self.d):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.d[self.pos]
            self.pos += 1
            self.nacc += 8
        self.nacc -= n
        v = (self.acc >> self.nacc) & ((1 << n) - 1)
        self.acc &= (1 << self.nacc) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nacc = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nacc + 7) // 8


def _read_frame_utf8(br: _PlainBitReader) -> int:
    """The UTF-8-style variable-length frame/sample number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    v = b0 & (0x3F >> n)
    for _ in range(n):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _write_frame_utf8(bw: _PlainBitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # count 6-bit payload groups beyond the lead byte
    groups = []
    while True:
        groups.append(v & 0x3F)
        v >>= 6
        lead_bits = 6 - len(groups)
        if v < (1 << lead_bits):
            break
    n = len(groups)
    lead = ((0xFF << (7 - n)) & 0xFF) | v
    bw.write(lead, 8)
    for g in reversed(groups):
        bw.write(0x80 | g, 8)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _seek_bits(br: _PlainBitReader, bitpos: int) -> None:
    """Position ``br`` exactly at absolute bit offset ``bitpos``."""
    br.pos = bitpos >> 3
    br.acc = 0
    br.nacc = 0
    if bitpos & 7:
        br.read(bitpos & 7)


def _bit_pos(br: _PlainBitReader) -> int:
    return br.pos * 8 - br.nacc


def _field_signs(vals: np.ndarray, nbits: int) -> np.ndarray:
    """Two's-complement sign extension of an unsigned nbits field."""
    return np.where(vals >= (1 << (nbits - 1)), vals - (1 << nbits), vals)


def _read_fields(bits: np.ndarray, pos: int, count: int, nbits: int) -> np.ndarray:
    """``count`` consecutive ``nbits``-wide big-endian fields → int64."""
    if nbits == 0:
        return np.zeros(count, dtype=np.int64)
    if pos + count * nbits > bits.shape[0]:
        raise ValueError("FLAC bitstream truncated")
    seg = bits[pos : pos + count * nbits].reshape(count, nbits).astype(np.int64)
    weights = np.left_shift(np.int64(1), np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return seg @ weights


def _decode_residual(
    br: _PlainBitReader, blocksize: int, order: int,
    bits: np.ndarray, ones: np.ndarray,
) -> np.ndarray:
    """Rice/rice2 residual partitions, numpy-vectorized (VERDICT r10
    item 3 — the per-sample bit loop was the hottest pure-codec path).

    The only sequential part of a rice partition is locating each
    code's unary terminator (the next 1-bit), because the ``param``
    LSB bits that follow it contain arbitrary 1s. With the positions
    of ALL 1-bits precomputed (``ones``), the terminator sequence is
    the orbit of ``f(j) = first 1-bit index ≥ ones[j] + param + 1``
    starting from the first 1-bit in the partition — materialized by
    pointer doubling (f, f², f⁴, …), so the whole partition is
    O(log count) vectorized rounds instead of a per-sample loop.
    The slice bound is structural for ANY bitstring: each code
    consumes exactly one terminator 1-bit and at most ``param``
    1-bits in its LSB field, so ``count`` codes span at most
    ``count*(1+param)`` entries of ``ones``. Everything else
    (quotients, LSB fields, zigzag, sign-extension) is closed-form
    array arithmetic over the terminator positions.
    """
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    n_parts = 1 << po
    if blocksize % n_parts:
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    pos = _bit_pos(br)
    for p in range(n_parts):
        count = blocksize // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC predictor order exceeds partition size")
        param = int(_read_fields(bits, pos, 1, pbits)[0])
        pos += pbits
        if param == escape:
            raw = int(_read_fields(bits, pos, 1, 5)[0])
            pos += 5
            vals = _read_fields(bits, pos, count, raw)
            out[w : w + count] = _field_signs(vals, raw) if raw else 0
            pos += count * raw
        elif count:
            step = 1 + param
            oi0 = int(np.searchsorted(ones, pos, side="left"))
            sl = ones[oi0 : oi0 + count * step + 1]
            slen = sl.shape[0]
            if slen == 0:
                raise ValueError("FLAC bitstream truncated")
            # f[j] = first 1-bit index >= sl[j] + step, as a rank query
            # against a cumulative ones count over the window — O(n)
            # with tiny constants where searchsorted(sl, sl+step) paid
            # O(n log n) per partition
            lo = int(sl[0])
            hi = int(sl[-1]) + step
            co = np.cumsum(bits[lo:hi], dtype=np.int64)
            tgt = sl + (step - 1 - lo)  # index of bit (sl[j]+step)-1
            np.clip(tgt, 0, co.shape[0] - 1, out=tgt)
            # the window may hold ones past the slice end — anything at
            # or beyond slen means "terminator outside the structural
            # bound", i.e. the sentinel
            f = np.minimum(co[tgt], slen)
            f = np.append(f, slen)  # sentinel: exhausted maps to itself
            orbit = np.empty(count, dtype=np.int64)
            orbit[0] = 0
            done = 1
            while done < count:
                take = min(done, count - done)
                orbit[done : done + take] = f[orbit[:take]]
                done += take
                if done < count:
                    f = f[f]  # f^L -> f^2L
            if int(orbit[-1]) >= slen:  # strictly increasing ⇒ max is last
                raise ValueError("FLAC bitstream truncated")
            t = sl[orbit]
            starts = np.empty(count, dtype=np.int64)
            starts[0] = pos
            starts[1:] = t[:-1] + step
            q = t - starts
            if param:
                fidx = t[:, None] + 1 + np.arange(param, dtype=np.int64)
                if int(t[-1]) + param >= bits.shape[0]:
                    raise ValueError("FLAC bitstream truncated")
                weights = np.left_shift(
                    np.int64(1), np.arange(param - 1, -1, -1, dtype=np.int64)
                )
                u = (q << np.int64(param)) | (bits[fidx].astype(np.int64) @ weights)
            else:
                u = q
            out[w : w + count] = (u >> np.int64(1)) ^ -(u & np.int64(1))  # zigzag
            pos = int(t[-1]) + step
        w += count
    _seek_bits(br, pos)
    return out


def _undifference(res: np.ndarray, warm: list[int], order: int) -> np.ndarray:
    """Invert the order-``order`` FIXED predictor: the residual is the
    order-th finite difference of the samples, so reconstruction is
    ``order`` cumulative sums, each seeded with the corresponding
    warm-up difference — exact in int64 (|Δ^4| ≤ 2^35, blocksize ≤
    2^16 ⇒ partial sums < 2^51)."""
    if order == 0:
        return res
    w = np.asarray(warm, dtype=np.int64)
    deltas = [w]
    for _ in range(1, order):
        deltas.append(np.diff(deltas[-1]))
    arr = res
    for k in range(order - 1, -1, -1):
        seed = int(deltas[k][0])
        arr = np.concatenate(([seed], seed + np.cumsum(arr)))
    return arr


def _decode_subframe(
    br: _PlainBitReader, blocksize: int, bps: int,
    bits: np.ndarray, ones: np.ndarray,
) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        pos = _bit_pos(br)
        out = _field_signs(_read_fields(bits, pos, blocksize, bps), bps)
        _seek_bits(br, pos + blocksize * bps)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, blocksize, order, bits, ones)
        out = _undifference(res, warm, order)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order, bits, ones)
        # the quantized-LPC recurrence floor-shifts at every step, so it
        # cannot be expressed as a prefix scan; run it as a plain-int
        # loop with the common small orders unrolled on local variables
        o = [int(x) for x in warm]
        rl = res.tolist()
        if order == 1:
            c0 = coefs[0]
            prev = o[-1]
            for r in rl:
                prev = ((c0 * prev) >> shift) + r
                o.append(prev)
        elif order == 2:
            c0, c1 = coefs
            p1, p2 = o[-1], o[-2]
            for r in rl:
                p1, p2 = ((c0 * p1 + c1 * p2) >> shift) + r, p1
                o.append(p1)
        else:
            rc = list(enumerate(coefs))
            for r in rl:
                pred = sum(c * o[-1 - j] for j, c in rc) >> shift
                o.append(pred + r)
        out = np.asarray(o, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = out << np.int64(wasted)
    return out


_FLAC_RATES = {
    4: 8000, 5: 16000, 6: 22050, 7: 24000, 8: 32000,
    9: 44100, 10: 48000, 11: 96000,
}


def decode_flac(b: bytes, with_samples: bool = True):
    """FLAC bytes → (sample_rate, n_channels, n_samples, samples|None),
    ``samples`` int32 of shape (n, channels). Full subset decode:
    CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes, rice + rice2
    residual partitions (escape codes, wasted bits), all four stereo
    decorrelation modes, UTF-8 frame numbers, CRC-8 header and CRC-16
    frame verification. Implemented from the public FLAC format spec
    (RFC 9639)."""
    if b[:4] != b"fLaC":
        raise ValueError(f"not a FLAC payload (sniffed: {sniff(b)})")
    i = 4
    rate = channels = bps = total = None
    while True:
        hdr = b[i]
        btype = hdr & 0x7F
        blen = int.from_bytes(b[i + 1 : i + 4], "big")
        if btype == 0:  # STREAMINFO
            si = b[i + 4 : i + 4 + blen]
            br = _PlainBitReader(si)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)  # min framesize
            br.read(24)  # max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        i += 4 + blen
        if hdr & 0x80:  # last metadata block
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if not with_samples:
        return rate, channels, total, None

    # one bit-expansion + 1-bit index for the whole payload: the
    # vectorized residual decoder consumes these instead of a
    # bit-at-a-time reader (memory 8×/~64× the blob — fine for the
    # per-row media blobs this Arrow-batched decode path sees)
    bits = np.unpackbits(np.frombuffer(b, dtype=np.uint8))
    ones = np.flatnonzero(bits).astype(np.int64)

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    n = len(b)
    while i < n - 1:
        frame_start = i
        br = _PlainBitReader(b, i)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_frame_utf8(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code, bps)
        hdr_end = br.byte_pos()
        crc8 = br.read(8)
        if _crc8(b[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_sub = ch_code + 1
            subs = [
                _decode_subframe(br, blocksize, fbps, bits, ones)
                for _ in range(n_sub)
            ]
        elif ch_code in (8, 9, 10):
            n_sub = 2
            b0 = fbps + (1 if ch_code == 9 else 0)
            b1 = fbps + (1 if ch_code in (8, 10) else 0)
            s0 = _decode_subframe(br, blocksize, b0, bits, ones)
            s1 = _decode_subframe(br, blocksize, b1, bits, ones)
            one = np.int64(1)
            if ch_code == 8:  # left/side
                subs = [s0, s0 - s1]
            elif ch_code == 9:  # side/right
                subs = [s1 + s0, s1]
            else:  # mid/side
                m = (s0 << one) | (s1 & one)
                subs = [(m + s1) >> one, (m - s1) >> one]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if n_sub != channels:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        br.align()
        crc_end = br.byte_pos()
        crc16 = br.read(16)
        if _crc16(b[frame_start:crc_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].append(subs[c])
        i = br.byte_pos()

    samples = np.stack(
        [
            np.concatenate(ch) if ch else np.empty(0, dtype=np.int64)
            for ch in chans
        ]
    ).T
    if total:
        samples = samples[:total]
    return rate, channels, samples.shape[0], samples.astype(np.int32)


def _zigzag(res: np.ndarray) -> np.ndarray:
    """Signed residual → unsigned rice symbol: (|r|<<1) - (r<0)."""
    return (res << np.int64(1)) ^ (res >> np.int64(63))


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, total bits) minimizing the rice cost — the full 0..14
    sweep the scalar encoder did per-element, as one matmul-shaped
    shift-sum (VERDICT r10 item 3: _rice_cost was 55% of encode)."""
    params = np.arange(15, dtype=np.int64)
    costs = (u[None, :] >> params[:, None]).sum(axis=1) + u.shape[0] * (1 + params)
    p = int(np.argmin(costs))  # first minimum — same tie-break as min()
    return p, int(costs[p])


def _fields_bits(vals: np.ndarray, nbits: int) -> np.ndarray:
    """Fixed-width big-endian fields → flat 0/1 bit array."""
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.int64)
    return ((vals[:, None] >> shifts) & np.int64(1)).astype(np.uint8).ravel()


def _rice_bits(u: np.ndarray, param: int) -> np.ndarray:
    """Rice-code ``u`` into a 0/1 bit array: per symbol q zeros, a 1,
    then the param LSBs — positions are closed-form from a cumsum of
    code lengths, so no per-sample bit loop."""
    q = u >> np.int64(param)
    lengths = q + 1 + param
    ends = np.cumsum(lengths)
    arr = np.zeros(int(ends[-1]) if u.shape[0] else 0, dtype=np.uint8)
    offs = ends - lengths
    arr[offs + q] = 1
    if param:
        idx = (offs + q + 1)[:, None] + np.arange(param, dtype=np.int64)
        shifts = np.arange(param - 1, -1, -1, dtype=np.int64)
        arr[idx] = ((u[:, None] >> shifts) & np.int64(1)).astype(np.uint8)
    return arr


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 4096,
    channel_mode: str = "independent",
    use_lpc: bool = False,
) -> bytes:
    """(n,) or (n, channels) int16 → FLAC bytes, the lossless roundtrip
    partner of :func:`decode_flac`. Subframes pick the best FIXED order
    0-2 by residual magnitude (``use_lpc=True`` emits the order-2
    predictor through the LPC subframe format instead — same residuals,
    exercises the LPC decode path); residuals rice-code with a
    per-subframe parameter sweep and a VERBATIM fallback. Stereo
    ``channel_mode``: 'independent', 'left-side', 'right-side' or
    'mid-side'."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if channels > 2 and channel_mode != "independent":
        raise ValueError("decorrelation modes need exactly 2 channels")
    bps = 16

    out = bytearray(b"fLaC")
    si = _PlainBitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.out += bytes(16)  # md5 unset (0 = not computed)
    out.append(0x80)  # last block, STREAMINFO
    out += len(si.out).to_bytes(3, "big")
    out += si.out

    def subframe(bw: _PlainBitWriter, sig: np.ndarray, sbps: int) -> None:
        mask = (1 << sbps) - 1
        if int(sig.min()) == int(sig.max()):
            bw.write(0, 1)
            bw.write(0, 6)  # CONSTANT
            bw.write(0, 1)
            bw.write(int(sig[0]) & mask, sbps)
            return
        best_order, best_u, best_cost = None, None, None
        for order in (0, 1, 2):
            if sig.shape[0] <= order:
                continue
            # FIXED-predictor residual IS the order-th finite difference
            u = _zigzag(np.diff(sig, order) if order else sig)
            p, cost = _best_rice_param(u)
            cost += order * sbps
            if best_cost is None or cost < best_cost:
                best_order, best_u, best_cost, best_p = order, u, cost, p
        verbatim_cost = sig.shape[0] * sbps
        if best_cost is None or verbatim_cost <= best_cost:
            bw.write(0, 1)
            bw.write(1, 6)  # VERBATIM
            bw.write(0, 1)
            bw.write_bits(_fields_bits(sig & np.int64(mask), sbps))
            return
        order = best_order
        if use_lpc and order == 2:
            # order-2 predictor through the LPC format: precision 15,
            # shift 5, coefficients [2<<5, -1<<5]
            bw.write(0, 1)
            bw.write(32 + order - 1, 6)
            bw.write(0, 1)
            for v in sig[:order]:
                bw.write(int(v) & mask, sbps)
            bw.write(15 - 1, 4)
            bw.write(5, 5)
            bw.write((2 << 5) & 0x7FFF, 15)
            bw.write((-1 << 5) & 0x7FFF, 15)
        else:
            bw.write(0, 1)
            bw.write(8 + order, 6)  # FIXED
            bw.write(0, 1)
            for v in sig[:order]:
                bw.write(int(v) & mask, sbps)
        bw.write(0, 2)  # rice method 0 (4-bit params)
        bw.write(0, 4)  # partition order 0
        bw.write(best_p, 4)
        bw.write_bits(_rice_bits(best_u, best_p))

    frame_no = 0
    for start in range(0, n, block_size):
        block = samples[start : start + block_size]
        blocksize = block.shape[0]
        bw = _PlainBitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # blocksize follows as 16-bit
        sr_code = {v: k for k, v in _FLAC_RATES.items()}.get(sample_rate, 0)
        bw.write(sr_code, 4)
        ch_map = {"independent": channels - 1, "left-side": 8,
                  "right-side": 9, "mid-side": 10}
        bw.write(ch_map[channel_mode], 4)
        bw.write(4, 3)  # 16 bps
        bw.write(0, 1)
        _write_frame_utf8(bw, frame_no)
        bw.write(blocksize - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)

        cols = [block[:, c] for c in range(channels)]
        if channel_mode == "independent":
            for c in range(channels):
                subframe(bw, cols[c], bps)
        elif channel_mode == "left-side":
            subframe(bw, cols[0], bps)
            subframe(bw, cols[0] - cols[1], bps + 1)
        elif channel_mode == "right-side":
            subframe(bw, cols[0] - cols[1], bps + 1)
            subframe(bw, cols[1], bps)
        else:  # mid-side
            subframe(bw, (cols[0] + cols[1]) >> np.int64(1), bps)
            subframe(bw, cols[0] - cols[1], bps + 1)
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        out += bw.out
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF — container METADATA parsing (ISO 14496-12). Sample
# payloads (H.264/AAC/...) still need external codecs via
# decoder_overrides; this parses what a corpus pipeline filters on:
# brand, duration, track geometry, codecs, sample counts.
# ---------------------------------------------------------------------------


def _iter_boxes(b: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", b, i)[0]
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", b, i + 8)[0]
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, i + hdr, i + size
        i += size


def _fullbox(b: bytes, off: int):
    version = b[off]
    return version, off + 4


def probe_mp4(b: bytes) -> dict:
    """MP4/ISO-BMFF container metadata → dict with ``brand``,
    ``duration_ms`` and per-track entries (``handler`` vide/soun,
    ``codec`` fourcc, ``width``/``height`` or ``channels``/
    ``sample_rate``, ``n_samples``, ``media_bytes``). Pure box-tree
    walking — no codec work, O(metadata bytes)."""
    if sniff(b) != "mp4":
        raise ValueError(f"not an MP4 payload (sniffed: {sniff(b)})")
    out: dict = {"brand": b[8:12].decode("latin1"), "tracks": []}
    moov = None
    for btype, s, e in _iter_boxes(b, 0, len(b)):
        if btype == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for btype, s, e in _iter_boxes(b, *moov):
        if btype == b"mvhd":
            v, p = _fullbox(b, s)
            if v == 1:
                ts = struct.unpack_from(">I", b, p + 16)[0]
                dur = struct.unpack_from(">Q", b, p + 20)[0]
            else:
                ts = struct.unpack_from(">I", b, p + 8)[0]
                dur = struct.unpack_from(">I", b, p + 12)[0]
            out["duration_ms"] = int(dur * 1000 / ts) if ts else 0
        elif btype == b"trak":
            trk: dict = {}
            for t2, s2, e2 in _iter_boxes(b, s, e):
                if t2 == b"tkhd":
                    v, p = _fullbox(b, s2)
                    # v0: times/id/dur = 20B, v1: 32B; then 16B
                    # layer/group/volume/reserved + 36B matrix
                    geo = p + (20 if v == 0 else 32) + 16 + 36
                    trk["width"] = struct.unpack_from(">I", b, geo)[0] >> 16
                    trk["height"] = struct.unpack_from(">I", b, geo + 4)[0] >> 16
                elif t2 == b"mdia":
                    for t3, s3, e3 in _iter_boxes(b, s2, e2):
                        if t3 == b"hdlr":
                            trk["handler"] = b[s3 + 8 : s3 + 12].decode("latin1")
                        elif t3 == b"minf":
                            for t4, s4, e4 in _iter_boxes(b, s3, e3):
                                if t4 != b"stbl":
                                    continue
                                for t5, s5, e5 in _iter_boxes(b, s4, e4):
                                    if t5 == b"stsd":
                                        _v, p5 = _fullbox(b, s5)
                                        n = struct.unpack_from(">I", b, p5)[0]
                                        if n >= 1:
                                            entry_type = b[p5 + 8 : p5 + 12]
                                            trk["codec"] = entry_type.decode(
                                                "latin1"
                                            )
                                            ep = p5 + 4 + 8 + 8  # entry hdr
                                            if trk.get("handler") == "vide":
                                                trk["width"] = struct.unpack_from(
                                                    ">H", b, ep + 16
                                                )[0]
                                                trk["height"] = struct.unpack_from(
                                                    ">H", b, ep + 18
                                                )[0]
                                            elif trk.get("handler") == "soun":
                                                trk["channels"] = struct.unpack_from(
                                                    ">H", b, ep + 8
                                                )[0]
                                                trk["sample_rate"] = (
                                                    struct.unpack_from(
                                                        ">I", b, ep + 16
                                                    )[0]
                                                    >> 16
                                                )
                                    elif t5 == b"stsz":
                                        _v, p5 = _fullbox(b, s5)
                                        fixed = struct.unpack_from(">I", b, p5)[0]
                                        cnt = struct.unpack_from(">I", b, p5 + 4)[0]
                                        trk["n_samples"] = cnt
                                        if fixed:
                                            trk["media_bytes"] = fixed * cnt
                                        else:
                                            sizes = struct.unpack_from(
                                                f">{cnt}I", b, p5 + 8
                                            )
                                            trk["media_bytes"] = int(sum(sizes))
            out["tracks"].append(trk)
    return out


def encode_mp4_stub(
    width: int = 0,
    height: int = 0,
    n_video_samples: int = 0,
    audio_rate: int = 0,
    n_audio_samples: int = 0,
    duration_ms: int = 1000,
    payload: bytes = b"",
) -> bytes:
    """Minimal valid ISO-BMFF fixture muxer: ftyp + moov (mvhd + one
    trak per requested media kind with tkhd/mdia/hdlr/stbl boxes) +
    mdat carrying ``payload``. The 'codec' entries are avc1/mp4a
    SHELLS — headers a probe/filter pipeline reads, with no codec
    bitstream, exactly the shape :func:`probe_mp4` targets."""

    def box(btype: bytes, *payloads: bytes) -> bytes:
        body = b"".join(payloads)
        return struct.pack(">I", 8 + len(body)) + btype + body

    ts = 1000
    dur = duration_ms

    def trak(handler: bytes, codec: bytes, entry: bytes, n_samples: int,
             w: int = 0, h: int = 0) -> bytes:
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07",  # version 0, enabled
            bytes(8),  # times
            struct.pack(">I", 1), bytes(4),  # track id, reserved
            struct.pack(">I", dur), bytes(8),
            bytes(8),  # layer/group/volume/reserved
            # identity matrix
            struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
            struct.pack(">II", w << 16, h << 16),
        )
        mdhd = box(
            b"mdhd", b"\x00\x00\x00\x00", bytes(8),
            struct.pack(">II", ts, dur), b"\x55\xc4\x00\x00",
        )
        hdlr = box(
            b"hdlr", b"\x00\x00\x00\x00", bytes(4), handler, bytes(12), b"\x00"
        )
        stsd = box(
            b"stsd", b"\x00\x00\x00\x00", struct.pack(">I", 1),
            box(codec, bytes(6), struct.pack(">H", 1), entry),
        )
        stts = box(b"stts", b"\x00\x00\x00\x00",
                   struct.pack(">III", 1, n_samples, 1))
        stsc = box(b"stsc", b"\x00\x00\x00\x00",
                   struct.pack(">IIII", 1, 1, max(n_samples, 1), 1))
        stsz = box(b"stsz", b"\x00\x00\x00\x00",
                   struct.pack(">II", 16, n_samples))
        stco = box(b"stco", b"\x00\x00\x00\x00", struct.pack(">II", 1, 0))
        stbl = box(b"stbl", stsd, stts, stsc, stsz, stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd, hdlr, minf)
        return box(b"trak", tkhd, mdia)

    traks = []
    if n_video_samples:
        # visual sample entry: 16 reserved + width/height + ...
        entry = (
            bytes(16)
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x480000, 0x480000)
            + bytes(4)
            + struct.pack(">H", 1)
            + bytes(32)
            + struct.pack(">Hh", 24, -1)
        )
        traks.append(trak(b"vide", b"avc1", entry, n_video_samples, width, height))
    if n_audio_samples:
        # audio sample entry: 8 reserved + channels/bits + rate<<16
        entry = (
            bytes(8)
            + struct.pack(">HH", 2, 16)
            + bytes(4)
            + struct.pack(">I", audio_rate << 16)
        )
        traks.append(trak(b"soun", b"mp4a", entry, n_audio_samples))
    mvhd = box(
        b"mvhd", b"\x00\x00\x00\x00", bytes(8),
        struct.pack(">II", ts, dur),
        struct.pack(">I", 0x10000), struct.pack(">H", 0x100), bytes(10),
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        bytes(24), struct.pack(">I", 2),
    )
    moov = box(b"moov", mvhd, *traks)
    ftyp = box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isomiso2mp41")
    mdat = box(b"mdat", payload)
    return ftyp + moov + mdat
