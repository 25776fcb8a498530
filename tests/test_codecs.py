"""Baseline codecs (BMP/PPM/PNG/WAV/frame-stream) + real-mode
multimodal operators. Round-trip property: encode → decode is the
identity on dimensions and pixel/sample content."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jodie_spark.operators.codecs import (
    _PNG_SIG,
    _png_chunk,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_frame_stream,
    encode_png,
    encode_ppm,
    encode_wav,
    iter_frame_stream,
    resize_nearest,
    sniff,
)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    b = encode_bmp(px)
    assert sniff(b) == "bmp"
    # exact BMP size formula (also the multimodal_decode oracle's):
    assert len(b) == 54 + ((3 * w + 3) // 4 * 4) * h
    w2, h2, px2 = decode_bmp(b)
    assert (w2, h2) == (w, h)
    assert np.array_equal(px, px2)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    b = encode_ppm(px)
    assert sniff(b) == "ppm"
    w2, h2, px2 = decode_ppm(b)
    assert (w2, h2) == (w, h)
    assert np.array_equal(px, px2)


def test_ppm_header_with_comments():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    b = b"P6\n# a comment\n3 2\n# another\n255\n" + px.tobytes()
    w, h, px2 = decode_ppm(b)
    assert (w, h) == (3, 2) and np.array_equal(px, px2)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    ch=st.integers(min_value=1, max_value=2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
    b = encode_wav(samples, rate)
    assert sniff(b) == "wav"
    r2, c2, n2, s2 = decode_wav(b)
    assert (r2, c2, n2) == (rate, ch, n)
    assert np.array_equal(samples, s2)


def test_frame_stream_roundtrip():
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8) for _ in range(3)
    ]
    b = encode_frame_stream(frames)
    out = list(iter_frame_stream(b))
    assert [i for i, *_ in out] == [0, 1, 2]
    for (i, w, h, fb), orig in zip(out, frames):
        assert (w, h) == (6, 4)
        _, _, px = decode_ppm(fb)
        assert np.array_equal(px, orig)


def test_decode_image_routes_and_refuses():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image(encode_bmp(px), with_pixels=False)[:2] == (2, 2)
    assert decode_image(encode_ppm(px), with_pixels=False)[:2] == (2, 2)
    assert decode_image(encode_png(px), with_pixels=False)[:2] == (2, 2)
    # JPEG now routes to the baseline decoder; a truncated payload
    # fails inside it rather than at the router
    with pytest.raises(ValueError, match="SOF"):
        decode_image(b"\xff\xd8\xff\xe0\x00\x04xxrest")
    with pytest.raises(ValueError, match="no baseline decoder"):
        decode_image(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 8)  # mp4
    with pytest.raises(ValueError, match="IHDR"):  # truncated PNG
        decode_image(b"\x89PNG\r\n\x1a\nrest")


# ---------------------------------------------------------------------------
# PNG — stdlib-zlib baseline
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=29),
    h=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31),
    filt=st.integers(min_value=0, max_value=4),
)
def test_png_rgb_roundtrip_all_filters(w, h, seed, filt):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    b = encode_png(px, filters=filt)
    assert sniff(b) == "png"
    got_w, got_h, rec = decode_png(b)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(rec, px)


def test_png_mixed_filters_per_row():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    b = encode_png(px, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert np.array_equal(decode_png(b)[2], px)


def test_png_gray_replicates_and_rgba_drops_alpha():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    _, _, rec = decode_png(encode_png(gray, filters=4))
    assert np.array_equal(rec, np.repeat(gray[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    _, _, rec = decode_png(encode_png(rgba, filters=3))
    assert np.array_equal(rec, rgba[:, :, :3])


def test_png_palette_decode():
    """Hand-built color-type-3 fixture (our encoder never writes
    palettes, so this exercises decode independently)."""
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    b = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, rec = decode_png(b)
    assert (w, h) == (3, 2)
    assert np.array_equal(rec, pal[idx])


def test_png_refuses_invalid_shapes_with_reason():
    """16-bit and Adam7 are SUPPORTED since round 11
    (test_png_foreign_features_decode); only spec-invalid combinations
    refuse now, still with an explanatory reason."""
    bad_depth = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 3, 2, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad_depth)
    bad_combo = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="gray/palette"):
        decode_png(bad_combo)
    bad_interlace = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad_interlace)


def test_png_real_mode_pixel_stats(spark):
    """image_pixel_stats on a BMP/PNG mix: the decoded-pixel checksum
    proves the unfilter paths reconstruct content, not just headers."""
    from jodie_spark.operators.multimodal import decode_images, image_pixel_stats

    rng = np.random.default_rng(9)
    rows = []
    for i in range(5):
        px = rng.integers(0, 256, (4 + i, 3 + i, 3), dtype=np.uint8)
        enc = encode_bmp(px) if i % 2 == 0 else encode_png(px, filters=i % 5)
        rows.append((i, bytearray(enc), int(px.astype(np.int64).sum())))
    df = spark.createDataFrame(rows, "id int, data binary, exp_sum long")
    out = image_pixel_stats(decode_images(df, mode="real"), mode="real").collect()
    for r in out:
        assert r["px_sum"] == r["exp_sum"]
        assert r["n_pixels"] == (4 + r["id"]) * (3 + r["id"])


def test_resize_nearest():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = resize_nearest(px, 3, 2)
    assert small.shape == (2, 3, 3)
    assert np.array_equal(small[0, 0], px[0, 0])


def test_real_mode_spark_operators(spark):
    """End-to-end real decode through the Arrow-batched operators."""
    from jodie_spark.operators.multimodal import (
        decode_audio,
        decode_images,
        extract_features,
        sample_frames,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        w, h = 3 + i, 2 + i
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, "bmp", bytearray(encode_bmp(px)), w, h))
        rows.append((100 + i, "ppm", bytearray(encode_ppm(px)), w, h))
    df = spark.createDataFrame(
        rows, "id int, kind string, data binary, exp_w int, exp_h int"
    )
    out = decode_images(df, mode="real").collect()
    for r in out:
        assert (r["width"], r["height"]) == (r["exp_w"], r["exp_h"])
        assert r["n_pixels"] == r["exp_w"] * r["exp_h"]

    feats = extract_features(df, dim=8, mode="real").collect()
    for r in feats:
        v = np.array(r["features"])
        assert len(v) == 8 and abs(np.linalg.norm(v) - 1.0) < 1e-5

    wav_rows = [
        (i, bytearray(encode_wav(np.zeros((8000 * (i + 1), 1), dtype=np.int16), 8000)))
        for i in range(3)
    ]
    adf = spark.createDataFrame(wav_rows, "id int, data binary")
    audio = {r["id"]: r for r in decode_audio(adf, mode="real").collect()}
    for i in range(3):
        assert audio[i]["sample_rate"] == 8000
        assert audio[i]["duration_ms"] == (i + 1) * 1000

    stream = encode_frame_stream(
        [rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8) for _ in range(4)]
    )
    vdf = spark.createDataFrame([(1, bytearray(stream))], "id int, data binary")
    frames = sample_frames(vdf, every_ms=40, mode="real").collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(sniff(bytes(r["frame_data"])) == "ppm" for r in frames)


# ---------------------------------------------------------------------------
# JPEG — baseline sequential decoder + fixture encoder
# ---------------------------------------------------------------------------

import base64

# Real libjpeg-written files (public test data): a 2x2 grayscale
# single-component JPEG (IPython test suite) and the 16x16 4:2:0
# YCbCr-subsampled Python logo (CPython test suite) — independent
# evidence that the decoder speaks the real convention (marker layout,
# canonical huffman, zigzag, dequant, IDCT, chroma upsampling), not
# merely its own encoder's dialect.
_GRAY_2X2 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof"
    "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA/8QAHwAA"
    "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR"
    "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF"
    "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip"
    "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB"
    "AAA/ACv/2Q=="
)
_LOGO_16 = base64.b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)


def test_jpeg_decodes_real_libjpeg_grayscale():
    from jodie_spark.operators.codecs import decode_jpeg, sniff

    assert sniff(_GRAY_2X2) == "jpeg"
    w, h, px = decode_jpeg(_GRAY_2X2)
    assert (w, h) == (2, 2) and px.shape == (2, 2, 3)
    # grayscale source: all three channels replicate
    assert (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 1] == px[:, :, 2]).all()


def test_jpeg_decodes_real_libjpeg_420_color():
    from jodie_spark.operators.codecs import decode_jpeg

    w, h, px = decode_jpeg(_LOGO_16)
    assert (w, h) == (16, 16) and px.shape == (16, 16, 3)
    # the Python-logo thumbnail is a real color image: channels differ,
    # full value range is exercised, and the decode is deterministic
    assert not (px[:, :, 0] == px[:, :, 2]).all()
    assert px.min() < 64 and px.max() > 192
    w2, h2, px2 = decode_jpeg(_LOGO_16)
    assert (px == px2).all()


@pytest.mark.parametrize("restart", [0, 2])
def test_jpeg_roundtrip_smooth_image(restart):
    from jodie_spark.operators.codecs import decode_jpeg, encode_jpeg

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 / w), (yy * 255 / h), 128 + 90 * np.sin(xx / 4.0) * np.cos(yy / 6.0)],
        axis=2,
    ).astype(np.uint8)
    b = encode_jpeg(img, quality=90, restart_interval=restart)
    W, H, px = decode_jpeg(b)
    assert (W, H) == (w, h)
    err = np.abs(px.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3.0


def test_jpeg_fused_lut_tables_match_canonical_decode():
    """Property check of the fused value-LUT tiers against a canonical
    bit-walk over the same table: for random 16-bit windows, the single
    tier must report (code_len+size, run, extended value) exactly when
    the window fully resolves one coefficient, and the pair tier must
    equal two consecutive canonical decodes whenever it claims a pair.
    Uses the standard Annex K luminance AC table (the one real corpora
    ship) plus a skewed custom table with long codes to exercise the
    slow-path boundary (code+size > 16 ⇒ tot == 0)."""
    from jodie_spark.operators.codecs import _build_fused_luts, _extend

    def canonical(counts, symbols):
        # (length, code) -> symbol, rebuilt independently of the LUTs
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        return table

    def walk_one(table, window, bits_left):
        """Decode one AC coefficient from the MSB side of `window`
        (bits_left wide). Returns (consumed, run, value) or None when
        it does not fully resolve (EOB/ZRL/invalid/spill)."""
        code = 0
        for length in range(1, 17):
            if length > bits_left:
                return None
            code = (code << 1) | ((window >> (bits_left - length)) & 1)
            sym = table.get((length, code))
            if sym is None:
                continue
            size = sym & 15
            if size == 0 or length + size > bits_left:
                return None
            raw = (window >> (bits_left - length - size)) & ((1 << size) - 1)
            return (length + size, sym >> 4, _extend(raw, size))
        return None

    # Annex K luminance AC (pulled from an encoded fixture's DHT) and a
    # pathological table: one 2-bit code with size 15 (spills) + fillers
    from jodie_spark.operators.codecs import encode_jpeg
    import struct as _struct

    blob = encode_jpeg(np.zeros((8, 8, 3), np.uint8), quality=90)
    i, tables = 2, []
    while i < len(blob) - 1:
        if blob[i] != 0xFF:
            i += 1
            continue
        m = blob[i + 1]
        i += 2
        if m in (0xD8, 0x01):
            continue
        if m in (0xD9, 0xDA):
            break
        (ln,) = _struct.unpack_from(">H", blob, i)
        seg = blob[i + 2 : i + ln]
        i += ln
        if m == 0xC4:
            p = 0
            while p < len(seg):
                tc = seg[p] >> 4
                counts = list(seg[p + 1 : p + 17])
                tot = sum(counts)
                if tc == 1:
                    tables.append((counts, bytes(seg[p + 17 : p + 17 + tot])))
                p += 17 + tot
    assert tables, "encoded fixture carries AC DHT segments"
    skew_counts = [0, 1, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    skew_syms = bytes([0x2F, 0x01, 0x11, 0x21])  # run2/size15 spills at len 2
    tables.append((skew_counts, skew_syms))

    rng = np.random.default_rng(123)
    for counts, syms in tables:
        tot_b, run_b, val_l, ptot_b, prun2_b, pval2_l, _s, _l = _build_fused_luts(
            counts, syms, True
        )
        table = canonical(counts, syms)
        for v16 in rng.integers(0, 65536, 4000):
            v16 = int(v16)
            one = walk_one(table, v16, 16)
            if one is None:
                assert tot_b[v16] == 0, (counts, v16)
                continue
            consumed, r1, x1 = one
            assert tot_b[v16] == consumed
            assert run_b[v16] == r1
            assert val_l[v16] == x1
            two = walk_one(table, v16, 16 - consumed)
            if two is None:
                assert ptot_b[v16] == 0
            else:
                c2, r2, x2 = two
                assert ptot_b[v16] == consumed + c2
                assert prun2_b[v16] == r2
                assert pval2_l[v16] == x2


def test_jpeg_truncated_stream_returns_partial_not_raise():
    """Parity contract for the 8-byte fast refill: a stream cut mid-MCU
    must still return the decoded prefix (truncated=keep semantics),
    with IndexError firing at the same consumed-bit position as the
    classic byte-at-a-time reader."""
    from jodie_spark.operators.codecs import decode_jpeg, encode_jpeg

    img = np.random.default_rng(11).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    full = encode_jpeg(img, quality=80)
    W, H, whole = decode_jpeg(full)
    for cut in (len(full) // 2, len(full) - 20):
        w, h, px = decode_jpeg(full[:cut])
        assert (w, h) == (W, H)
        assert px.shape == whole.shape
        # blocks decoded before the cut are bit-identical to the full
        # decode (the DC predictor chain is a prefix); the zero-filled
        # tail differs from it
        assert np.array_equal(px[:8], whole[:8])
        assert not np.array_equal(px, whole)
    # a cut inside the final code makes the 0xFF padding reach the
    # decoder as an all-ones window: the classic reader raised
    # ValueError here and the fast-refill path must too (verified
    # against the pre-fused decoder byte-for-byte on this payload)
    with pytest.raises(ValueError, match="invalid JPEG huffman code"):
        decode_jpeg(full[: len(full) - 3])
    # an undamaged stream decodes identically through the fast refill
    assert np.array_equal(decode_jpeg(full)[2], whole)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    quality=st.integers(15, 97),
    restart=st.sampled_from([0, 0, 0, 2, 5]),
    progressive=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_jpeg_roundtrip_fuzz(h, w, quality, restart, progressive, seed):
    """Property fuzz over the whole encode→decode pipeline: arbitrary
    dims (incl. non-multiple-of-8), qualities, restart intervals, and
    both scan scripts. The decoded image must be dimension-exact and
    within quantization error of the source; baseline and progressive
    encodings of the same pixels (same tables) must decode IDENTICALLY
    — the cross-check that exercises every fused-LUT tier and the
    classic slow paths against each other on random content."""
    from jodie_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = (
        rng.integers(0, 256, (h, w, 3)).astype(np.float64) * 0.5
        + rng.integers(0, 128)
    ).clip(0, 255).astype(np.uint8)
    enc = encode_jpeg_progressive if progressive else encode_jpeg
    blob = enc(img, quality=quality, restart_interval=restart)
    W, H, px = decode_jpeg(blob)
    assert (W, H) == (w, h)
    assert px.shape == (h, w, 3)
    if quality >= 85:
        err = np.abs(px.astype(int) - img.astype(int))
        assert err.mean() < 24, err.mean()
    # baseline and progressive carry identical coefficients
    twin = (encode_jpeg if progressive else encode_jpeg_progressive)(
        img, quality=quality, restart_interval=restart
    )
    assert np.array_equal(decode_jpeg(twin)[2], px)


def test_jpeg_pair_tier_policy_small_images_upgrade_on_reuse():
    """A small image with a fresh DHT builds single-tier-only tables
    (pair gathers are the expensive part of the build and don't pay off
    in-image below ~512 blocks); the SAME tables requested again — the
    corpus-shared case — upgrade to the full pair tier. Pixels are
    identical either way."""
    from jodie_spark.operators import codecs

    codecs._FUSED_LUT_CACHE.clear()
    codecs._BUILD_HUFF_CACHE.clear()
    codecs._FUSED_SEEN.clear()
    img = np.random.default_rng(17).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = codecs.encode_jpeg(img, quality=85)  # 4 MCUs << 512 blocks
    _, _, cold_px = codecs.decode_jpeg(blob)
    ac_entries = [v for k, v in codecs._FUSED_LUT_CACHE.items() if k[2]]
    assert ac_entries and all(
        e[3] is codecs._ZERO_PAIR_TOT for e in ac_entries
    ), "first small-image decode must skip the pair tier"
    _, _, warm_px = codecs.decode_jpeg(blob)
    ac_entries = [v for k, v in codecs._FUSED_LUT_CACHE.items() if k[2]]
    assert all(
        e[3] is not codecs._ZERO_PAIR_TOT for e in ac_entries
    ), "second use of the same DHT must upgrade to the pair tier"
    assert np.array_equal(cold_px, warm_px)
    # big images build pairs immediately, fresh DHT or not
    codecs._FUSED_LUT_CACHE.clear()
    codecs._FUSED_SEEN.clear()
    big = np.random.default_rng(18).integers(0, 256, (96, 144, 3), dtype=np.uint8)
    codecs.decode_jpeg(codecs.encode_jpeg(big, quality=85))  # 216 MCUs * 3 > 512
    ac_entries = [v for k, v in codecs._FUSED_LUT_CACHE.items() if k[2]]
    assert ac_entries and all(e[3] is not codecs._ZERO_PAIR_TOT for e in ac_entries)


def test_jpeg_fused_lut_cache_reuse():
    """Images sharing DHT payloads (the usual Annex K case) must reuse
    the fused tables rather than rebuilding 65536-entry LUTs per image."""
    from jodie_spark.operators import codecs

    codecs._FUSED_LUT_CACHE.clear()
    rng = np.random.default_rng(3)
    blobs = [
        codecs.encode_jpeg(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), quality=90
        )
        for _ in range(3)
    ]
    for b in blobs:
        codecs.decode_jpeg(b)
    # one DC + one AC table for luma, same pair for chroma => ≤4 entries
    assert 0 < len(codecs._FUSED_LUT_CACHE) <= 4


def test_jpeg_non_multiple_of_8_dims_and_header_only():
    from jodie_spark.operators.codecs import decode_jpeg, encode_jpeg

    img = np.random.default_rng(5).integers(0, 256, (17, 19, 3), dtype=np.uint8)
    b = encode_jpeg(img, quality=75)
    w, h, none = decode_jpeg(b, with_pixels=False)
    assert (w, h, none) == (19, 17, None)
    W, H, px = decode_jpeg(b)
    assert px.shape == (17, 19, 3)


def test_jpeg_routes_through_decode_image_and_dhash_collides():
    from jodie_spark.operators.codecs import (
        decode_image,
        dhash,
        encode_bmp,
        encode_jpeg,
    )

    h, w = 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 / w), (yy * 255 / h), np.full((h, w), 77)], axis=2
    ).astype(np.uint8)
    _, _, from_bmp = decode_image(encode_bmp(img))
    _, _, from_jpg = decode_image(encode_jpeg(img, quality=92))
    d = bin((dhash(from_bmp) ^ dhash(from_jpg)) & (2**64 - 1)).count("1")
    # lossy but perceptually identical: hashes within the dedup budget
    assert d <= 2


def test_jpeg_lossless_sof_refuses_with_reason():
    from jodie_spark.operators.codecs import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC3  # rewrite SOF0 → SOF3 (lossless, unsupported)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(b))


def test_jpeg_progressive_matches_baseline_bit_for_bit():
    """encode_jpeg_progressive uses the same quantization + huffman
    tables as encode_jpeg, so the progressive decode must be IDENTICAL
    to the baseline decode of the same input — covers DC successive
    approximation (Al=1 first scan + refinement scan), non-interleaved
    per-component AC scans, EOB handling, ZRL, and restart markers
    inside a progressive DC scan."""
    from jodie_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
        sniff,
    )

    rng = np.random.default_rng(7)
    for shape, q, ri in [
        ((16, 12, 3), 85, 0),
        ((24, 17, 3), 70, 0),   # non-multiple-of-8 edges
        ((8, 8, 3), 97, 0),     # single MCU
        ((33, 29, 3), 85, 2),   # restart markers every 2 MCUs
    ]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        prog = encode_jpeg_progressive(px, quality=q, restart_interval=ri)
        assert sniff(prog) == "jpeg"
        wb, hb, pb = decode_jpeg(encode_jpeg(px, quality=q))
        wp, hp, pp = decode_jpeg(prog)
        assert (wp, hp) == (wb, hb) == (shape[1], shape[0])
        assert np.array_equal(pb, pp)
    # smooth gradients (realistic spectra, long zero runs)
    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, (yy * 5) % 256], axis=2
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px, 80))[2],
        decode_jpeg(encode_jpeg_progressive(px, 80))[2],
    )


def test_jpeg_progressive_ac_successive_approximation():
    """AC successive approximation (the refinement path
    encode_jpeg_progressive does not emit): a hand-assembled
    single-component SOF2 stream with known coefficients — DC scan, AC
    first scan at Al=1, then an AC refinement scan (Ah=1, Al=0)
    carrying newly-significant coefficients, correction bits, and
    per-block EOBs. Decoded pixels must equal the direct IDCT of the
    planted coefficients."""
    from jodie_spark.operators.codecs import (
        _BitWriter,
        _category,
        _DCT_A,
        _enc_huff,
        _STD_AC_LUMA,
        _STD_DC_LUMA,
        _ZIGZAG,
        decode_jpeg,
    )

    # two 8x8 blocks (8x16 grayscale), zigzag-order coefficients
    zzA = np.zeros(64, dtype=np.int64)
    zzA[0], zzA[1], zzA[3], zzA[7], zzA[20], zzA[33] = -13, 5, -4, 1, -1, 7
    zzB = np.zeros(64, dtype=np.int64)
    zzB[0], zzB[2], zzB[10], zzB[62] = 6, -3, 1, -5
    blocks = [zzA, zzB]

    dc_t = _enc_huff(*_STD_DC_LUMA)
    ac_t = _enc_huff(*_STD_AC_LUMA)

    def put_mag(bwr, v, s):
        bwr.write(v if v >= 0 else v + (1 << s) - 1, s)

    # scan 1: DC first, Al=0
    bwr = _BitWriter()
    pred = 0
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _category(diff)
        code, ln = dc_t[s]
        bwr.write(code, ln)
        if s:
            put_mag(bwr, diff, s)
    bwr.flush()
    dc_scan = bytes(bwr.out)

    # scan 2: AC first, Ss=1 Se=63 Al=1 (values sign*(|v|>>1); |v|==1 omitted)
    bwr = _BitWriter()
    for zz in blocks:
        t = [(1 if v > 0 else -1) * (abs(int(v)) >> 1) for v in zz]
        last = max((k for k in range(1, 64) if t[k]), default=0)
        run = 0
        for k in range(1, last + 1):
            if t[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_t[0xF0]
                bwr.write(code, ln)
                run -= 16
            s = _category(t[k])
            code, ln = ac_t[(run << 4) | s]
            bwr.write(code, ln)
            put_mag(bwr, t[k], s)
            run = 0
        if last < 63:
            code, ln = ac_t[0x00]
            bwr.write(code, ln)
    bwr.flush()
    ac_first = bytes(bwr.out)

    # scan 3: AC refine, Ah=1 Al=0 — newly-significant (|v|==1) emit
    # (run<<4)|1 + sign bit; history-nonzero (|v|>1) emit buffered
    # correction bits (|v| & 1); trailing state closes with EOB
    bwr = _BitWriter()
    for zz in blocks:
        absv = [abs(int(v)) for v in zz]
        run, corr = 0, []
        for k in range(1, 64):
            if absv[k] == 0:
                run += 1
            elif absv[k] > 1:
                corr.append(absv[k] & 1)
            else:  # newly significant
                code, ln = ac_t[(run << 4) | 1]
                bwr.write(code, ln)
                bwr.write(1 if zz[k] > 0 else 0, 1)
                for bit in corr:
                    bwr.write(bit, 1)
                run, corr = 0, []
        if run or corr:
            code, ln = ac_t[0x00]  # EOB (run of 1)
            bwr.write(code, ln)
            for bit in corr:
                bwr.write(bit, 1)
    bwr.flush()
    ac_refine = bytes(bwr.out)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # all-ones quant
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0]) + _STD_DC_LUMA[1])
    out += seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0]) + _STD_AC_LUMA[1])
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + dc_scan
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + ac_first
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + ac_refine
    out += b"\xff\xd9"

    w, h, got = decode_jpeg(bytes(out))
    assert (w, h) == (16, 8)
    # expected: direct IDCT of the planted coefficients (q = 1)
    A = _DCT_A
    exp = np.empty((8, 16))
    for bi, zz in enumerate(blocks):
        nat = np.zeros(64)
        nat[_ZIGZAG] = zz
        exp[:, bi * 8 : bi * 8 + 8] = A.T @ nat.reshape(8, 8) @ A + 128.0
    exp8 = np.clip(exp, 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], exp8)
    assert np.array_equal(got[:, :, 1], got[:, :, 0])  # gray replicated


# ---------------------------------------------------------------------------
# GIF — LZW decoder + literal-code fixture encoder
# ---------------------------------------------------------------------------

# a real 697-byte full-LZW GIF (libxslt documentation assets) —
# growing code widths + graphic-control extension, unlike the
# literal-code streams encode_gif emits
_REAL_GIF = base64.b64decode(
    "R0lGODlhLAApANUAAMwAAMsQCQAAAP///5kAAJgMBw0AAGYAALMAADMAAFkAAL8AAM/Pz3MA"
    "AKYAADMEAn8KBu/v70AAAM4fGN/f3yYAAL4PCIwAAD8FA2YIBQ0BARkCAaUNB+2ophAQEK+v"
    "r7+/v1kHBCAgIPXS0YAAAE0AAEwGAzAwMHBwcPLDwiYDAp+fnxoAANU9N1BQUPzw8OiWk99q"
    "ZdhMR7IOCI+Pj4CAgHxwcEBAQHIJBeJ5dbUdF8UPCIYgID0wMOWIhNIuKCH5BAAAAAAALAAA"
    "AAAsACkAAAb/QIBwSCwaj8ikcslsOp/QqFQZqFqv2Kx2ay1ytbOCuGD5ar3mAASjEbjfmxAn"
    "XUVzIZu3fv+Ym+1ZMw97bwYJCSx6GX9EWxxtbiULQg4EBAcHDQ16GGVbgFaPepNFBAYCDiV6"
    "D1ygARZ5bxUICReWkwgEuHshn41YJnsKCKduCkaqegVnv1YFhAcADgqkRhd7G8xDWBhuFZgH"
    "x0zFbxBZgBZuDUQCEg5LEnsY581qbkUkbgYSDQhHDQcq6KG3zUowASRKJSjkr5SQC8WWXQE0"
    "SICBd0WmJYqWZJMAHFgAqSh0AUkuJQTcLJpYjxA1KSkFrOxSb6QeDzZ4VGsST2bI1noV36wY"
    "MKDHgYZLFJT7WbBKiD00iFKgcKJCA4xGSCx8I5FmU3seXHz4IIIC0QERTrw5JEFCAoF7NBAU"
    "csXCWaIMUNwd8IEGiAggKDBgUIOQibkAsHTYy7jxgBuEunqle+WH4701PIhgQFQEnwA7mFK+"
    "4uPyXQZDB4AQ4IIzWh3aRl8ZYXpvWhQRzubw9dXKBNq1iaJwTbRDq3pXfgePYPas8eO9k8MI"
    "fvZFDEbRschIEbzDhDSutLSAwf3uiw4xvtMJb0ZGCzqI4cv/MqW+/fv48+u/HwQAOw=="
)


def test_gif_roundtrip_paletted_lossless():
    from jodie_spark.operators.codecs import decode_gif, encode_gif, sniff

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    for h, w in [(16, 12), (7, 5), (33, 21)]:
        img = pal[rng.integers(0, 200, (h, w))]
        for interlace in (False, True):
            b = encode_gif(img, interlace=interlace)
            assert sniff(b) == "gif"
            W, H, px = decode_gif(b)
            assert (W, H) == (w, h)
            assert (px == img).all()  # paletted GIF is lossless


def test_gif_two_color_and_routing():
    from jodie_spark.operators.codecs import decode_image, dhash, encode_bmp, encode_gif

    rng = np.random.default_rng(9)
    bw = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)[
        rng.integers(0, 2, (9, 9))
    ]
    W, H, px = decode_image(encode_gif(bw))
    assert (px == bw).all()
    # lossless cross-format: GIF clone of a BMP hashes identically
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (16, 12))]
    assert dhash(decode_image(encode_bmp(img))[2]) == dhash(
        decode_image(encode_gif(img))[2]
    )


def test_gif_decodes_real_full_lzw_stream():
    from jodie_spark.operators.codecs import decode_gif

    w, h, px = decode_gif(_REAL_GIF)
    assert (w, h) == (44, 41) and px.shape == (41, 44, 3)
    # a real logo: multiple colors, deterministic decode
    ncolors = len(np.unique(px.reshape(-1, 3), axis=0))
    assert ncolors > 16
    assert (decode_gif(_REAL_GIF)[2] == px).all()


# ---------------------------------------------------------------------------
# FLAC — lossless roundtrips, all subframe types and stereo modes
# ---------------------------------------------------------------------------


def test_flac_roundtrip_mono_signals():
    from jodie_spark.operators.codecs import decode_flac, encode_flac, sniff

    rng = np.random.default_rng(3)
    t = np.arange(10_000)
    sine = (3000 * np.sin(t / 20) + 200 * np.sin(t / 3)).astype(np.int16)
    cases = {
        "sine": sine,                                            # FIXED orders
        "noise": rng.integers(-32768, 32767, 10_000, np.int16),  # VERBATIM
        "const": np.full(5000, 7, np.int16),                     # CONSTANT
        "short": sine[:100],                                     # partial frame
        "multi_frame": sine,                                     # >1 frame
    }
    for name, sig in cases.items():
        bs = 1024 if name == "multi_frame" else 4096
        b = encode_flac(sig, 8000, block_size=bs)
        assert sniff(b) == "flac"
        r, c, n, s = decode_flac(b)
        assert (r, c, n) == (8000, 1, len(sig))
        assert np.array_equal(s[:, 0], sig.astype(np.int64)), name
    # compression actually happened on the predictable signal
    assert len(encode_flac(sine, 8000)) < 2 * len(sine) * 0.6


def test_flac_stereo_decorrelation_modes_and_lpc():
    from jodie_spark.operators.codecs import decode_flac, encode_flac

    t = np.arange(6_000)
    left = (3000 * np.sin(t / 17)).astype(np.int16)
    right = (0.7 * left + 100 * np.sin(t / 5)).astype(np.int16)
    stereo = np.stack([left, right], axis=1)
    sizes = {}
    for mode in ("independent", "left-side", "right-side", "mid-side"):
        b = encode_flac(stereo, 44100, channel_mode=mode)
        r, c, n, s = decode_flac(b)
        assert (r, c, n) == (44100, 2, 6_000)
        assert np.array_equal(s, stereo.astype(np.int64)), mode
        sizes[mode] = len(b)
    # correlated channels: side coding beats independent
    assert min(sizes["left-side"], sizes["mid-side"]) < sizes["independent"]
    # LPC subframe path decodes identically to its FIXED twin
    b = encode_flac(left, 8000, use_lpc=True)
    _, _, _, s = decode_flac(b)
    assert np.array_equal(s[:, 0], left.astype(np.int64))


def test_flac_corruption_detected_and_metadata_only():
    import pytest

    from jodie_spark.operators.codecs import decode_flac, encode_flac

    sig = (2000 * np.sin(np.arange(3000) / 9)).astype(np.int16)
    b = bytearray(encode_flac(sig, 16000))
    # header-only parse (with_samples=False) never touches frames
    r, c, n, s = decode_flac(bytes(b), with_samples=False)
    assert (r, c, n, s) == (16000, 1, 3000, None)
    # flip a byte inside the frame payload: CRC-16 must catch it
    b[-20] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(b))


def test_flac_decodes_to_same_pcm_as_wav():
    """A FLAC re-encode of the same PCM is lossless, so cross-format
    audio dedup collides at hamming 0 (the spark-side collision is
    covered by the audio_dedup oracle query's FLAC clone lane)."""
    from jodie_spark.operators.codecs import (
        decode_flac,
        decode_wav,
        encode_flac,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    sig = (rng.standard_normal(4000) * 6000).astype(np.int16)
    _, _, _, a = decode_wav(encode_wav(sig.reshape(-1, 1), 8000))
    _, _, _, b = decode_flac(encode_flac(sig, 8000))
    assert np.array_equal(a.astype(np.int64), b.astype(np.int64))


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF container probe
# ---------------------------------------------------------------------------


def test_mp4_probe_roundtrip_and_errors():
    from jodie_spark.operators.codecs import encode_mp4_stub, probe_mp4, sniff

    b = encode_mp4_stub(
        width=640, height=360, n_video_samples=120,
        audio_rate=48000, n_audio_samples=480, duration_ms=4000,
        payload=b"\x00" * 64,
    )
    assert sniff(b) == "mp4"
    info = probe_mp4(b)
    assert info["brand"] == "isom" and info["duration_ms"] == 4000
    vid = next(t for t in info["tracks"] if t["handler"] == "vide")
    aud = next(t for t in info["tracks"] if t["handler"] == "soun")
    assert (vid["width"], vid["height"], vid["codec"]) == (640, 360, "avc1")
    assert vid["n_samples"] == 120 and vid["media_bytes"] == 120 * 16
    assert (aud["channels"], aud["sample_rate"], aud["codec"]) == (2, 48000, "mp4a")
    # audio-only and video-only variants
    a_only = probe_mp4(encode_mp4_stub(audio_rate=8000, n_audio_samples=10))
    assert [t["handler"] for t in a_only["tracks"]] == ["soun"]
    v_only = probe_mp4(encode_mp4_stub(width=32, height=16, n_video_samples=3))
    assert [t["handler"] for t in v_only["tracks"]] == ["vide"]
    # non-mp4 refuses; a box whose size overruns the payload raises
    with pytest.raises(ValueError, match="not an MP4"):
        probe_mp4(b"RIFFxxxxWAVE")
    i = b.index(b"moov") - 4  # moov box size field
    with pytest.raises(ValueError, match="malformed"):
        probe_mp4(b[:i] + b"\x7f\xff\xff\xff" + b[i + 4:])


def test_probe_media_mixed_corpus(spark):
    from jodie_spark.operators.codecs import (
        encode_bmp,
        encode_flac,
        encode_mp4_stub,
        encode_wav,
    )
    from jodie_spark.operators.multimodal import probe_media

    sig = (np.arange(900) % 151 - 75).astype(np.int16)
    rows = [
        (0, bytearray(encode_mp4_stub(width=100, height=50, n_video_samples=9,
                                      duration_ms=700))),
        (1, bytearray(encode_wav(sig.reshape(-1, 1), 8000))),
        (2, bytearray(encode_flac(sig, 8000))),
        (3, bytearray(encode_bmp(np.zeros((4, 7, 3), np.uint8)))),
        (4, bytearray(b"\x01\x02garbage")),
    ]
    df = spark.createDataFrame(rows, "id int, data binary")
    got = {r["id"]: r for r in probe_media(df).collect()}
    assert got[0]["container"] == "mp4" and got[0]["video_codec"] == "avc1"
    assert (got[0]["width"], got[0]["height"], got[0]["duration_ms"]) == (100, 50, 700)
    assert got[1]["audio_codec"] == "pcm" and got[1]["n_audio_samples"] == 900
    assert got[2]["audio_codec"] == "flac" and got[2]["duration_ms"] == 900 * 1000 // 8000
    assert (got[3]["width"], got[3]["height"]) == (7, 4)
    assert got[4]["container"] == "unknown" and got[4]["width"] is None


def test_jpeg_progressive_restarts_in_every_scan():
    """Regression (round-9 advice): with DRI nonzero, T.81 requires
    RSTn markers in EVERY scan's entropy data — the encoder used to
    emit them only in the first DC scan, and the decoder's reactive
    RSTn handling corrupted refinement scans (pre-marker padding bits
    consumed as correction bits, blocks never rolled back). Pins: (a)
    each of the 5 scans carries restart markers, (b) the decode is
    bit-identical to baseline, (c) DRI parses positionally."""
    from jodie_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)  # 5x4 = 20 MCUs
    prog = encode_jpeg_progressive(px, quality=85, restart_interval=3)

    # split the stream at SOS segments; count RSTn in each entropy span
    sos_offsets = []
    i = 2
    while i < len(prog) - 1:
        if prog[i] == 0xFF and prog[i + 1] == 0xDA:
            sos_offsets.append(i)
            i += 2
        else:
            i += 1
    assert len(sos_offsets) == 5  # DC first, DC refine, 3 AC scans
    spans = [
        prog[a:b]
        for a, b in zip(sos_offsets, sos_offsets[1:] + [len(prog)])
    ]
    for s_i, span in enumerate(spans):
        n_rst = sum(
            1
            for j in range(len(span) - 1)
            if span[j] == 0xFF and 0xD0 <= span[j + 1] <= 0xD7
        )
        # 20 MCUs (or blocks, non-interleaved) / interval 3 -> 6 markers
        assert n_rst == 6, f"scan {s_i}: {n_rst} restart markers"

    wb, hb, pb = decode_jpeg(encode_jpeg(px, quality=85))
    wp, hp, pp = decode_jpeg(prog)
    assert (wp, hp) == (wb, hb)
    assert np.array_equal(pb, pp)

    # larger interval + smooth content (EOB runs interact with restarts)
    yy, xx = np.mgrid[0:48, 0:40]
    sm = np.stack([(yy + xx) % 256, (xx * 2) % 256, (yy * 3) % 256], axis=2).astype(
        np.uint8
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg(sm, 75))[2],
        decode_jpeg(encode_jpeg_progressive(sm, 75, restart_interval=5))[2],
    )


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=9000),
    ch=st.integers(min_value=1, max_value=2),
    mode=st.sampled_from(["independent", "left-side", "right-side", "mid-side"]),
    block=st.sampled_from([256, 1024, 4096]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_flac_property_roundtrip(n, ch, mode, block, seed):
    """Property: any int16 signal round-trips losslessly through
    encode_flac → decode_flac, across channel modes, block sizes and
    partial tail frames."""
    from jodie_spark.operators.codecs import decode_flac, encode_flac

    if ch == 1:
        mode = "independent"
    rng = np.random.default_rng(seed)
    # mix of smooth (predictor-friendly) and noisy (verbatim) content
    t = np.arange(n)
    smooth = 2000 * np.sin(t / max(1, seed % 37 + 3))
    noisy = rng.integers(-32768, 32767, n)
    sig = np.where(t % 2 == 0, smooth, noisy * (seed % 3 == 0)).astype(np.int16)
    if ch == 2:
        sig = np.stack([sig, (sig * 0.5).astype(np.int16)], axis=1)
    b = encode_flac(sig, 8000, block_size=block, channel_mode=mode)
    r, c, cnt, out = decode_flac(b)
    assert (r, c, cnt) == (8000, ch, n)
    ref = sig.reshape(n, ch) if ch == 2 else sig[:, None]
    assert np.array_equal(out, ref.astype(np.int64))


def test_flac_foreign_stream_features_decode():
    """Decoder paths OUR encoder never emits — a foreign (spec-shaped,
    hand-assembled per RFC 9639) stream exercising rice2 (method 1,
    5-bit params), partition order 2, an ESCAPE partition (verbatim
    raw residuals), wasted bits, FIXED order 4, and LPC order 4 — all
    rewritten in the round-11 vectorization, previously reachable only
    by foreign files. Expected output is the signal the residuals were
    derived from, so decode must invert every stage exactly."""
    from jodie_spark.operators.codecs import (
        _crc8,
        _crc16,
        _PlainBitWriter,
        _write_frame_utf8,
        decode_flac,
    )

    B = 64  # blocksize
    rng = np.random.default_rng(7)

    def streaminfo(total, rate=8000, channels=1, bps=16):
        si = _PlainBitWriter()
        si.write(B, 16)
        si.write(B, 16)
        si.write(0, 24)
        si.write(0, 24)
        si.write(rate, 20)
        si.write(channels - 1, 3)
        si.write(bps - 1, 5)
        si.write(total, 36)
        si.out += bytes(16)
        out = bytearray(b"fLaC")
        out.append(0x80)
        out += len(si.out).to_bytes(3, "big")
        out += si.out
        return out

    def frame_header(bw, frame_no):
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(7, 4)       # 16-bit blocksize follows
        bw.write(4, 4)       # 8000 Hz
        bw.write(0, 4)       # 1 channel
        bw.write(4, 3)       # 16 bps
        bw.write(0, 1)
        _write_frame_utf8(bw, frame_no)
        bw.write(B - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)

    def write_rice_partitioned(bw, res, order, method, po, escape_part, raw_bits):
        """residuals → method/po header + per-partition rice or escape."""
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        bw.write(method, 2)
        bw.write(po, 4)
        n_parts = 1 << po
        idx = 0
        for p in range(n_parts):
            count = B // n_parts - (order if p == 0 else 0)
            part = res[idx : idx + count]
            idx += count
            if p == escape_part:
                bw.write(escape, pbits)
                bw.write(raw_bits, 5)
                for r in part:
                    bw.write(int(r) & ((1 << raw_bits) - 1), raw_bits)
            else:
                param = 3
                bw.write(param, pbits)
                for r in part:
                    u = (abs(int(r)) << 1) - (1 if r < 0 else 0)
                    bw.write_unary(u >> param)
                    bw.write(u & ((1 << param) - 1), param)

    def finish_frame(b, bw):
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        b += bw.out

    # --- stream 1: FIXED order 4, rice2, po=2, partition 2 escaped ---
    t = np.arange(B)
    sig = (40 * np.sin(t / 5) + t).astype(np.int64)  # small Δ⁴
    res = np.diff(sig, 4)
    assert np.abs(res).max() < 200
    b = streaminfo(B)
    bw = _PlainBitWriter()
    frame_header(bw, 0)
    bw.write(0, 1)
    bw.write(8 + 4, 6)  # FIXED order 4
    bw.write(0, 1)      # no wasted bits
    for v in sig[:4]:
        bw.write(int(v) & 0xFFFF, 16)
    write_rice_partitioned(bw, res, 4, method=1, po=2, escape_part=2, raw_bits=9)
    finish_frame(b, bw)
    r, c, n, s = decode_flac(bytes(b))
    assert (r, c, n) == (8000, 1, B)
    assert np.array_equal(s[:, 0], sig), "FIXED-4 + rice2 + po2 + escape"

    # --- stream 2: wasted bits (signal = multiples of 8, coded >>3) ---
    base = (20 * np.sin(t / 7)).astype(np.int64)
    sig2 = base << 3
    res2 = np.diff(base, 1)  # order-1 FIXED over the shifted-down signal
    b = streaminfo(B)
    bw = _PlainBitWriter()
    frame_header(bw, 0)
    bw.write(0, 1)
    bw.write(8 + 1, 6)  # FIXED order 1
    bw.write(1, 1)      # wasted-bits flag
    bw.write_unary(2)   # 2 zeros + 1 → wasted = 3
    wbps = 16 - 3
    bw.write(int(base[0]) & ((1 << wbps) - 1), wbps)
    write_rice_partitioned(bw, res2, 1, method=0, po=0, escape_part=-1, raw_bits=0)
    finish_frame(b, bw)
    _, _, _, s = decode_flac(bytes(b))
    assert np.array_equal(s[:, 0], sig2), "wasted bits"

    # --- stream 3: LPC order 4 with a real shift ---
    coefs = [3, -2, 1, -1]
    shift = 2
    sig3 = list((30 * np.sin(t[:4] / 3)).astype(np.int64))
    rng_r = rng.integers(-20, 20, B - 4)
    for k in range(4, B):
        pred = sum(c * sig3[k - 1 - j] for j, c in enumerate(coefs)) >> shift
        sig3.append(pred + int(rng_r[k - 4]))
    sig3 = np.array(sig3, dtype=np.int64)
    res3 = np.array(
        [
            int(sig3[k])
            - (sum(c * int(sig3[k - 1 - j]) for j, c in enumerate(coefs)) >> shift)
            for k in range(4, B)
        ],
        dtype=np.int64,
    )
    b = streaminfo(B)
    bw = _PlainBitWriter()
    frame_header(bw, 0)
    bw.write(0, 1)
    bw.write(32 + 4 - 1, 6)  # LPC order 4
    bw.write(0, 1)
    for v in sig3[:4]:
        bw.write(int(v) & 0xFFFF, 16)
    bw.write(15 - 1, 4)  # precision 15
    bw.write(shift, 5)
    for cf in coefs:
        bw.write(cf & 0x7FFF, 15)
    write_rice_partitioned(bw, res3, 4, method=1, po=1, escape_part=-1, raw_bits=0)
    finish_frame(b, bw)
    _, _, _, s = decode_flac(bytes(b))
    assert np.array_equal(s[:, 0], sig3), "LPC order 4 + po1 rice2"


def test_jpeg_foreign_progressive_ac_successive_approximation():
    """AC successive approximation (Ah/Al on AC scans) — what REAL
    progressive JPEGs (libjpeg default scan script) use, and the one
    progressive decoder path (`ac_refine`) our own encoder never emits.
    Fabricate a spec-shaped foreign stream (T.81 G.1.2.3 encoding,
    transcribed from the public algorithm): DC scan, AC-first at Al=1,
    AC-refinement at Ah=1/Al=0 — plus a BASELINE twin carrying the
    same quantized coefficients. Both must decode to identical pixels."""
    import struct

    from jodie_spark.operators.codecs import (
        _enc_huff,
        _BitWriter,
        _STD_AC_LUMA,
        _STD_DC_LUMA,
        _ZIGZAG,
        decode_jpeg,
    )

    # hand-picked per-block zigzag coefficients: newly-nonzero (|v|=1),
    # history+correction (|v|>=2, both LSBs), long zero runs (ZRL in
    # both scan types), a correction bit covered by the refinement EOB,
    # an all-zero-AC block, and a dense alternating block
    blocks = [
        [5] + [0] * 63,
        [3, 3, -1, 0, 0, 2] + [0] * 24 + [1] + [0] * 32 + [-2],
        [-2] + [(-1) ** k for k in range(1, 17)] + [0] * 47,
        [0, 7, 0, -4, 0, 0, 0, -7] + [0] * 20 + [4] + [0] * 35,
    ]
    assert all(len(b) == 64 for b in blocks)
    bh = bw = 2  # 16x16, single component

    dc_tab = _enc_huff(*_STD_DC_LUMA)
    ac_tab = _enc_huff(*_STD_AC_LUMA)

    def cat(v):
        return abs(v).bit_length()

    def emit_signed(bwr, v, s):
        bwr.write(v if v >= 0 else v + (1 << s) - 1, s)

    def dc_scan():
        bwr = _BitWriter()
        pred = 0
        for zz in blocks:
            diff = zz[0] - pred
            pred = zz[0]
            s = cat(diff)
            code, ln = dc_tab[s]
            bwr.write(code, ln)
            if s:
                emit_signed(bwr, diff, s)
        bwr.flush()
        return bytes(bwr.out)

    def ac_first_al1():
        bwr = _BitWriter()
        for zz in blocks:
            t = [(abs(v) >> 1) * (1 if v > 0 else -1) for v in zz]
            last = 0
            for k in range(1, 64):
                if t[k]:
                    last = k
            run = 0
            for k in range(1, last + 1):
                if t[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]
                    bwr.write(code, ln)
                    run -= 16
                s = cat(t[k])
                code, ln = ac_tab[(run << 4) | s]
                bwr.write(code, ln)
                emit_signed(bwr, t[k], s)
                run = 0
            if last < 63:
                code, ln = ac_tab[0x00]
                bwr.write(code, ln)
        bwr.flush()
        return bytes(bwr.out)

    def ac_refine_ah1():
        bwr = _BitWriter()
        for zz in blocks:
            absv = [abs(v) for v in zz]
            eob = 0
            for k in range(1, 64):
                if absv[k] == 1:
                    eob = k
            r = 0
            br_bits: list[int] = []
            for k in range(1, 64):
                temp = absv[k]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    code, ln = ac_tab[0xF0]
                    bwr.write(code, ln)
                    r -= 16
                    for bit in br_bits:
                        bwr.write(bit, 1)
                    br_bits = []
                if temp > 1:  # nonzero history: buffer the correction bit
                    br_bits.append(temp & 1)
                    continue
                code, ln = ac_tab[(r << 4) | 1]  # newly nonzero, s=1
                bwr.write(code, ln)
                bwr.write(1 if zz[k] > 0 else 0, 1)
                for bit in br_bits:
                    bwr.write(bit, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:  # per-block EOB run of 1 + pending bits
                code, ln = ac_tab[0x00]
                bwr.write(code, ln)
                for bit in br_bits:
                    bwr.write(bit, 1)
        bwr.flush()
        return bytes(bwr.out)

    def baseline_scan():
        bwr = _BitWriter()
        pred = 0
        for zz in blocks:
            diff = zz[0] - pred
            pred = zz[0]
            s = cat(diff)
            code, ln = dc_tab[s]
            bwr.write(code, ln)
            if s:
                emit_signed(bwr, diff, s)
            last = 0
            for k in range(1, 64):
                if zz[k]:
                    last = k
            run = 0
            for k in range(1, last + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]
                    bwr.write(code, ln)
                    run -= 16
                s = cat(zz[k])
                code, ln = ac_tab[(run << 4) | s]
                bwr.write(code, ln)
                emit_signed(bwr, zz[k], s)
                run = 0
            if last < 63:
                code, ln = ac_tab[0x00]
                bwr.write(code, ln)
        bwr.flush()
        return bytes(bwr.out)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    common = bytearray()
    common += seg(0xDB, bytes([0]) + bytes([1] * 64))  # flat Q=1
    for (tc, th), (counts, symbols) in (
        ((0, 0), _STD_DC_LUMA), ((1, 0), _STD_AC_LUMA),
    ):
        common += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)
    sof_body = struct.pack(">BHHB", 8, 16, 16, 1) + struct.pack(">BBB", 1, 0x11, 0)

    prog = bytearray(b"\xff\xd8") + common + seg(0xC2, sof_body)
    prog += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + dc_scan()
    prog += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + ac_first_al1()
    prog += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + ac_refine_ah1()
    prog += b"\xff\xd9"

    base = bytearray(b"\xff\xd8") + common + seg(0xC0, sof_body)
    base += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + baseline_scan()
    base += b"\xff\xd9"

    wb, hb, pb = decode_jpeg(bytes(base))
    wp, hp, pp = decode_jpeg(bytes(prog))
    assert (wb, hb) == (wp, hp) == (16, 16)
    assert np.array_equal(pb, pp), "AC successive approximation diverged"
    # the refinement actually mattered: a two-scan-only decode (drop the
    # refinement scan) must NOT equal the full decode
    prog_norefine = bytearray(b"\xff\xd8") + common + seg(0xC2, sof_body)
    prog_norefine += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + dc_scan()
    prog_norefine += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + ac_first_al1()
    prog_norefine += b"\xff\xd9"
    _, _, partial = decode_jpeg(bytes(prog_norefine))
    assert not np.array_equal(partial, pb)


def test_png_foreign_features_decode():
    """Foreign-PNG envelope the in-repo encoder never writes: Adam7
    interlace (independently filtered passes, incl. empty passes on
    tiny images), 16-bit samples (high-byte reduce, filters over
    multi-byte pixels), and sub-byte gray/palette depths (MSB-first
    unpack, exact 255/(2^d-1) gray scaling). All fabricated
    spec-shaped (RFC 2083) with real chunk CRCs."""
    import struct
    import zlib

    from jodie_spark.operators.codecs import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    def png(w, h, depth, color, raw, palette=None, interlace=0):
        out = bytearray(b"\x89PNG\r\n\x1a\n")
        out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
        if palette is not None:
            out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        out += chunk(b"IDAT", zlib.compress(raw))
        out += chunk(b"IEND", b"")
        return bytes(out)

    def pack_subbyte(row_vals, depth):
        bits = ((row_vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(
            np.uint8
        )
        return np.packbits(bits.ravel()).tobytes()

    def adam7_raw(img, depth, channels, row_encoder):
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw += b"\x00" + row_encoder(row)
        return bytes(raw)

    rng = np.random.default_rng(9)

    # 1) Adam7 8-bit RGB, 9x9 (ragged pass sizes)
    img = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    raw = adam7_raw(img, 8, 3, lambda row: row.tobytes())
    w, h, px = decode_png(png(9, 9, 8, 2, raw, interlace=1))
    assert (w, h) == (9, 9) and np.array_equal(px, img)

    # 2) Adam7 on a 2x2 image: five of seven passes are EMPTY
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    raw = adam7_raw(img, 8, 3, lambda row: row.tobytes())
    _, _, px = decode_png(png(2, 2, 8, 2, raw, interlace=1))
    assert np.array_equal(px, img)

    # 3) 16-bit grayscale with an Up-filtered second row
    g16 = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 5000 + 123).astype(">u2")
    rows = [b"\x00" + g16[0].tobytes()]
    rows.append(
        b"\x02"
        + (
            (np.frombuffer(g16[1].tobytes(), np.uint8).astype(np.int32)
             - np.frombuffer(g16[0].tobytes(), np.uint8)) & 0xFF
        ).astype(np.uint8).tobytes()
    )
    rows.append(b"\x00" + g16[2].tobytes())
    _, _, px = decode_png(png(4, 3, 16, 0, b"".join(rows)))
    expect = (g16.view(np.uint8).reshape(3, 4, 2)[:, :, 0])  # big-endian high byte
    assert np.array_equal(px[:, :, 0], expect) and np.array_equal(px[:, :, 0], px[:, :, 2])

    # 4) 16-bit RGB with a Sub-filtered row (bpp = 6 byte lanes)
    c16 = rng.integers(0, 65536, (2, 3, 3), dtype=np.uint16).astype(">u2")
    row0 = c16[0].tobytes()
    row1 = c16[1].tobytes()
    b1 = np.frombuffer(row1, np.uint8).astype(np.int32)
    sub = b1.copy()
    sub[6:] = (b1[6:] - b1[:-6]) & 0xFF  # Sub against decoded == original bytes
    # note: Sub subtracts the RECONSTRUCTED left bytes, which equal the
    # original bytes, so the encoder-side diff above is exact
    raw = b"\x00" + row0 + b"\x01" + sub.astype(np.uint8).tobytes()
    _, _, px = decode_png(png(3, 2, 16, 2, raw))
    expect = c16.view(np.uint8).reshape(2, 3, 3, 2)[:, :, :, 0]
    assert np.array_equal(px, expect)

    # 5) sub-byte grayscale: 1-bit and 4-bit with exact scaling
    g1 = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1, 1], [0] * 10], dtype=np.uint8)
    raw = b"".join(b"\x00" + pack_subbyte(r, 1) for r in g1)
    _, _, px = decode_png(png(10, 2, 1, 0, raw))
    assert np.array_equal(px[:, :, 0], g1 * 255)
    g4 = rng.integers(0, 16, (3, 5), dtype=np.uint8)
    raw = b"".join(b"\x00" + pack_subbyte(r, 4) for r in g4)
    _, _, px = decode_png(png(5, 3, 4, 0, raw))
    assert np.array_equal(px[:, :, 0], g4 * 17)

    # 6) 2-bit palette, non-interlaced + 4-bit palette under Adam7
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (4, 7), dtype=np.uint8)
    raw = b"".join(b"\x00" + pack_subbyte(r, 2) for r in idx)
    _, _, px = decode_png(png(7, 4, 2, 3, raw, palette=pal))
    assert np.array_equal(px, pal[idx])
    idx = rng.integers(0, 16, (9, 5), dtype=np.uint8)
    raw = adam7_raw(idx, 4, 1, lambda row: pack_subbyte(row, 4))
    _, _, px = decode_png(png(5, 9, 4, 3, raw, palette=pal, interlace=1))
    assert np.array_equal(px, pal[idx])

    # invalid combinations still refuse with a reason
    import pytest as _pt

    with _pt.raises(ValueError, match="gray/palette"):
        decode_png(png(2, 2, 4, 2, b"\x00" + bytes(3)))
    with _pt.raises(ValueError, match="16-bit palette"):
        decode_png(png(2, 2, 16, 3, b"\x00" + bytes(4), palette=pal))


def test_wav_foreign_formats_decode():
    """Foreign WAV shapes our encoder never writes: 24-bit PCM (3-byte
    little-endian with sign extension), 32-bit PCM, IEEE float32
    (format 3), and WAVE_FORMAT_EXTENSIBLE wrapping PCM — all reduce to
    the int16 range so cross-depth fingerprints collide."""
    import struct

    from jodie_spark.operators.codecs import decode_wav

    def wav(fmt_code, ch, rate, bits, payload, extensible=False):
        if extensible:
            sub = struct.pack("<H", fmt_code) + bytes(14)  # SubFormat GUID
            fmt = struct.pack(
                "<HHIIHHH", 0xFFFE, ch, rate, rate * ch * bits // 8,
                ch * bits // 8, bits, 22,
            ) + struct.pack("<HI", bits, 0) + sub
        else:
            fmt = struct.pack(
                "<HHIIHH", fmt_code, ch, rate, rate * ch * bits // 8,
                ch * bits // 8, bits,
            )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    vals = np.array([0, 1, -1, 12345, -12345, 32767, -32768], dtype=np.int16)

    # 24-bit PCM: samples are int16 << 8 in the 24-bit domain
    tri = bytearray()
    for v in vals.astype(np.int32) << 8:
        tri += int(v & 0xFFFFFF).to_bytes(3, "little")
    r, c, n, s = decode_wav(wav(1, 1, 16000, 24, bytes(tri)))
    assert (r, c, n) == (16000, 1, len(vals))
    assert np.array_equal(s[:, 0], vals)

    # 32-bit PCM: int16 << 16
    p32 = (vals.astype(np.int64) << 16).astype("<i4").tobytes()
    _, _, _, s = decode_wav(wav(1, 1, 8000, 32, p32))
    assert np.array_equal(s[:, 0], vals)

    # float32 in [-1, 1]: v/32767 rounds back exactly
    f32 = (vals.astype(np.float64) / 32767.0).astype("<f4").tobytes()
    _, _, _, s = decode_wav(wav(3, 1, 44100, 32, f32))
    assert np.abs(s[:, 0].astype(int) - vals.astype(int)).max() <= 1
    # clipping: out-of-range floats saturate instead of wrapping
    loud = np.array([2.0, -2.0], dtype="<f4").tobytes()
    _, _, _, s = decode_wav(wav(3, 1, 8000, 32, loud))
    assert list(s[:, 0]) == [32767, -32768]

    # EXTENSIBLE wrapping 16-bit PCM, stereo
    st = np.stack([vals, (vals // 2).astype(np.int16)], axis=1)
    _, c, n, s = decode_wav(
        wav(1, 2, 22050, 16, st.astype("<i2").tobytes(), extensible=True)
    )
    assert (c, n) == (2, len(vals)) and np.array_equal(s, st)

    # EXTENSIBLE wrapping float32
    _, _, _, s = decode_wav(
        wav(3, 1, 8000, 32, f32, extensible=True)
    )
    assert np.abs(s[:, 0].astype(int) - vals.astype(int)).max() <= 1

    # unsupported codec ids still refuse with the id in the message
    with pytest.raises(ValueError, match="format 85"):
        decode_wav(wav(85, 1, 8000, 16, b"\x00\x00"))


def test_flac_foreign_bit_depths_decode():
    """8- and 24-bit FLAC frames (our encoder is 16-bit only): the
    frame-header bps code, warm-up width, VERBATIM field width, and
    the left/side decorrelation's bps+1 side channel must all follow
    the declared depth. Streams fabricated per RFC 9639 like
    test_flac_foreign_stream_features_decode."""
    from jodie_spark.operators.codecs import (
        _crc8,
        _crc16,
        _PlainBitWriter,
        _write_frame_utf8,
        decode_flac,
    )

    B = 32

    def streaminfo(total, channels, bps):
        si = _PlainBitWriter()
        si.write(B, 16)
        si.write(B, 16)
        si.write(0, 24)
        si.write(0, 24)
        si.write(8000, 20)
        si.write(channels - 1, 3)
        si.write(bps - 1, 5)
        si.write(total, 36)
        si.out += bytes(16)
        out = bytearray(b"fLaC")
        out.append(0x80)
        out += len(si.out).to_bytes(3, "big")
        out += si.out
        return out

    def frame_header(bw, ch_code, ss_code):
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(7, 4)
        bw.write(4, 4)  # 8000 Hz
        bw.write(ch_code, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _write_frame_utf8(bw, 0)
        bw.write(B - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)

    def verbatim_subframe(bw, sig, bps):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        mask = (1 << bps) - 1
        for v in sig:
            bw.write(int(v) & mask, bps)

    def finish(b, bw):
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        b += bw.out

    rng = np.random.default_rng(13)

    # 24-bit mono VERBATIM (full 24-bit range)
    sig = rng.integers(-(1 << 23), (1 << 23) - 1, B, dtype=np.int64)
    b = streaminfo(B, 1, 24)
    bw = _PlainBitWriter()
    frame_header(bw, 0, 6)  # ss_code 6 = 24 bps
    verbatim_subframe(bw, sig, 24)
    finish(b, bw)
    r, c, n, s = decode_flac(bytes(b))
    assert (r, c, n) == (8000, 1, B)
    assert np.array_equal(s[:, 0], sig), "24-bit verbatim"

    # 8-bit mono VERBATIM
    sig8 = rng.integers(-128, 127, B, dtype=np.int64)
    b = streaminfo(B, 1, 8)
    bw = _PlainBitWriter()
    frame_header(bw, 0, 1)  # ss_code 1 = 8 bps
    verbatim_subframe(bw, sig8, 8)
    finish(b, bw)
    _, _, _, s = decode_flac(bytes(b))
    assert np.array_equal(s[:, 0], sig8), "8-bit verbatim"

    # 24-bit LEFT/SIDE stereo: the side channel is coded at bps+1 = 25
    left = rng.integers(-(1 << 22), (1 << 22), B, dtype=np.int64)
    right = left - rng.integers(-(1 << 22), (1 << 22), B, dtype=np.int64)
    side = left - right  # fits 25 bits
    b = streaminfo(B, 2, 24)
    bw = _PlainBitWriter()
    frame_header(bw, 8, 6)  # ch_code 8 = left/side
    verbatim_subframe(bw, left, 24)
    verbatim_subframe(bw, side, 25)
    finish(b, bw)
    _, c, _, s = decode_flac(bytes(b))
    assert c == 2
    assert np.array_equal(s[:, 0], left) and np.array_equal(s[:, 1], right), (
        "24-bit left/side"
    )


def test_bmp_foreign_shapes_decode():
    """Foreign BMP shapes: 32-bit BGRX, 16-bit 5-5-5 (BI_RGB default),
    16-bit 5-6-5 via BI_BITFIELDS, 8-bit palette, and top-down rows —
    none of which encode_bmp writes. Field rescaling must be exact at
    the endpoints (mask full/empty -> 255/0)."""
    import struct

    from jodie_spark.operators.codecs import decode_bmp

    def bmp(w, h, bits, payload, compression=0, masks=None, palette=None,
            top_down=False):
        hdr_size = 40
        extra = b""
        if masks is not None:
            extra = struct.pack("<III", *masks)
        if palette is not None:
            extra += palette
        off = 14 + hdr_size + len(extra)
        head = struct.pack("<2sIHHI", b"BM", off + len(payload), 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", hdr_size, w, (-h if top_down else h), 1, bits,
            compression, len(payload), 2835, 2835,
            (len(palette) // 4 if palette else 0), 0,
        )
        return head + info + extra + payload

    # 32-bit BGRX bottom-up
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 4
    rows = bytearray()
    for y in (1, 0):  # bottom-up
        for x in range(3):
            r, g, bl = img[y, x]
            rows += bytes([bl, g, r, 0xAA])
    w, h, px = decode_bmp(bmp(3, 2, 32, bytes(rows)))
    assert (w, h) == (3, 2) and np.array_equal(px, img)

    # 16-bit 5-5-5 BI_RGB: endpoint values must rescale exactly
    vals = [(31, 0, 31), (0, 31, 0), (15, 15, 15)]  # 5-bit fields
    row = b"".join(
        struct.pack("<H", (r << 10) | (g << 5) | bl) for r, g, bl in vals
    ) + b"\x00\x00"  # pad to 8 bytes
    _, _, px = decode_bmp(bmp(3, 1, 16, row))
    exp = np.array(
        [[(255, 0, 255), (0, 255, 0), (123, 123, 123)]], dtype=np.uint8
    )
    assert np.array_equal(px, exp)

    # 16-bit 5-6-5 via BI_BITFIELDS
    row = struct.pack("<HH", (31 << 11) | (63 << 5) | 31, 0)
    _, _, px = decode_bmp(
        bmp(2, 1, 16, row, compression=3, masks=(0xF800, 0x07E0, 0x001F))
    )
    assert tuple(px[0, 0]) == (255, 255, 255) and tuple(px[0, 1]) == (0, 0, 0)

    # 8-bit palette, top-down
    pal = bytes([10, 20, 30, 0, 200, 150, 100, 0])  # two BGRX entries
    idx = bytes([0, 1, 0, 0]) + bytes([1, 0, 0, 0])  # 2x2, rows padded to 4
    _, _, px = decode_bmp(bmp(2, 2, 8, idx, palette=pal, top_down=True))
    exp = np.array(
        [[(30, 20, 10), (100, 150, 200)], [(100, 150, 200), (30, 20, 10)]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, exp)

    # RLE still refuses with the reason
    import pytest as _pt

    with _pt.raises(ValueError, match="external decoder"):
        decode_bmp(bmp(2, 2, 8, bytes(8), compression=1))
