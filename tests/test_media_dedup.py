"""Perceptual-hash image dedup: dHash kernel, cross-format collision,
banded hamming removal, plan contract."""

import numpy as np
import pytest

from jodie_spark.operators.codecs import (
    decode_image,
    dhash,
    encode_bmp,
    encode_png,
    encode_ppm,
)
from jodie_spark.operators.media_dedup import image_dedup, with_image_dhash


def _noise(seed, shape=(16, 12, 3)):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_dhash_is_format_independent():
    px = _noise(1)
    hashes = {
        dhash(decode_image(encode_bmp(px))[2]),
        dhash(decode_image(encode_ppm(px))[2]),
        dhash(decode_image(encode_png(px, filters=2))[2]),
    }
    assert len(hashes) == 1  # same pixels ⇒ same hash, any container


def test_dhash_tolerates_small_noise_but_separates_images():
    px = _noise(2).astype(np.int16)
    jitter = np.clip(px + np.random.default_rng(9).integers(-2, 3, px.shape), 0, 255)
    h0 = dhash(px.astype(np.uint8))
    h1 = dhash(jitter.astype(np.uint8))
    close = bin((h0 ^ h1) & (2**64 - 1)).count("1")
    far = bin((h0 ^ dhash(_noise(3))) & (2**64 - 1)).count("1")
    assert close <= 6 < far


def test_image_dedup_drops_cross_format_clones(spark):
    rows = []
    for i in range(20):
        px = _noise(i)
        rows.append((i, bytearray(encode_bmp(px) if i % 2 == 0 else encode_png(px, filters=i % 5))))
        if i % 5 == 0:  # clone in the other container
            rows.append((i + 1000, bytearray(encode_png(px) if i % 2 == 0 else encode_bmp(px))))
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = sorted(r["doc_id"] for r in image_dedup(df, max_hamming=2).collect())
    assert out == list(range(20))  # clones gone, min-id originals kept


def test_with_image_dhash_fake_mode_and_plan(spark):
    df = spark.createDataFrame(
        [(i, bytearray(b"blob-%d" % i)) for i in range(10)], "doc_id long, data binary"
    )
    hashed = with_image_dhash(df, mode="fake")
    vals = [r["image_hash"] for r in hashed.collect()]
    assert len(set(vals)) == 10  # deterministic, distinct
    q = image_dedup(df, mode="fake", max_hamming=0)
    plan = q._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "Window"):
        assert bad not in plan, plan
    assert q.count() == 10  # no collisions at hamming 0


def test_image_dedup_skips_null_and_undecodable_blobs(spark):
    """Real-mode job-survival contract: one NULL blob and one garbage
    blob must not abort the stage — they hash to NULL, never enter the
    banded join, and therefore survive the dedup untouched while the
    decodable clones still collapse."""
    px = _noise(7)
    rows = [
        (0, bytearray(encode_bmp(px))),
        (1, bytearray(encode_png(px))),      # clone of 0 → drops
        (2, None),                            # NULL payload
        (3, bytearray(b"\x89PNG\r\n\x1a\nnot really a png")),  # undecodable
        (4, bytearray(encode_bmp(_noise(8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = sorted(r["doc_id"] for r in image_dedup(df, max_hamming=2).collect())
    assert out == [0, 2, 3, 4]
    # the hash column itself reports NULL for the bad rows
    hashed = with_image_dhash(df)
    nulls = sorted(r["doc_id"] for r in hashed.collect() if r["image_hash"] is None)
    assert nulls == [2, 3]


def test_image_dedup_on_error_raise_still_fails_loudly(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, data binary")
    with pytest.raises(Exception, match="NULL media payload"):
        with_image_dhash(df, on_error="raise").collect()


def test_audio_and_video_dedup_skip_bad_blobs(spark):
    from jodie_spark.operators.media_dedup import audio_dedup, video_dedup

    bad = [(100, None), (101, bytearray(b"RIFFgarbage"))]
    adf = spark.createDataFrame(
        [(0, bytearray(_wav(1))), (1, bytearray(_wav(1)))] + bad,
        "doc_id long, data binary",
    )
    assert sorted(r["doc_id"] for r in audio_dedup(adf).collect()) == [0, 100, 101]
    from jodie_spark.operators.codecs import encode_frame_stream

    vdf = spark.createDataFrame(
        [
            (0, bytearray(encode_frame_stream(_frames(1)))),
            (1, bytearray(encode_frame_stream(_frames(1)))),
        ]
        + bad,
        "doc_id long, data binary",
    )
    assert sorted(r["doc_id"] for r in video_dedup(vdf).collect()) == [0, 100, 101]


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def _wav(seed, n=4000, rate=8000):
    from jodie_spark.operators.codecs import encode_wav

    rng = np.random.default_rng(seed)
    env = np.abs(rng.standard_normal(64)).repeat(n // 64 + 1)[:n]
    sig = (rng.standard_normal(n) * env * 8000).astype(np.int16).reshape(-1, 1)
    return encode_wav(sig, rate)


def test_audio_dedup_drops_exact_clones(spark):
    from jodie_spark.operators.media_dedup import audio_dedup

    rows = []
    for i in range(12):
        b = _wav(i)
        rows.append((i, bytearray(b)))
        if i % 4 == 0:
            rows.append((i + 1000, bytearray(b)))  # exact clone
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = sorted(r["doc_id"] for r in audio_dedup(df, max_hamming=2).collect())
    assert out == list(range(12))


def test_audio_hash_distinguishes_envelopes(spark):
    from jodie_spark.operators.media_dedup import with_audio_hash

    df = spark.createDataFrame(
        [(i, bytearray(_wav(i))) for i in range(15)], "doc_id long, data binary"
    )
    hashes = [r["audio_hash"] for r in with_audio_hash(df).collect()]
    assert len(set(hashes)) == 15


# ---------------------------------------------------------------------------
# video
# ---------------------------------------------------------------------------


def _frames(seed, n=6, shape=(12, 10, 3)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]


def test_video_dedup_drops_reordered_clones(spark):
    from jodie_spark.operators.codecs import encode_frame_stream
    from jodie_spark.operators.media_dedup import video_dedup

    rows = []
    for i in range(10):
        fs = _frames(i)
        rows.append((i, bytearray(encode_frame_stream(fs))))
        if i % 3 == 0:  # same footage, frames reversed (set-identical)
            rows.append((i + 1000, bytearray(encode_frame_stream(list(reversed(fs))))))
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = sorted(r["doc_id"] for r in video_dedup(df, threshold=0.8).collect())
    assert out == list(range(10))


def test_video_dedup_partial_overlap_respects_threshold(spark):
    """A cut sharing 5 of its 6 frames with the original (frame-set
    Jaccard 5/7 ≈ 0.71) survives at threshold 0.8 but drops at 0.5 —
    the exact array_intersect/array_union verify decides, not bucket
    luck (deterministic: fixed seeds ⇒ fixed hashes ⇒ fixed buckets)."""
    from jodie_spark.operators.codecs import encode_frame_stream
    from jodie_spark.operators.media_dedup import video_dedup

    base = _frames(42, n=6)
    partial = base[:5] + _frames(43, n=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_frame_stream(base))),
         (2, bytearray(encode_frame_stream(partial)))],
        "doc_id long, data binary",
    )
    assert sorted(r["doc_id"] for r in video_dedup(df, threshold=0.8).collect()) == [1, 2]
    assert sorted(r["doc_id"] for r in video_dedup(df, threshold=0.5).collect()) == [1]


def _fake_mp4(px: np.ndarray) -> bytes:
    """A blob that sniffs as 'mp4' (ftyp box) carrying raw pixels the
    test override knows how to recover: [4-byte size][ftyp][payload].
    (Driver-side fixture builder only — the override callables that
    ship to executors are defined INSIDE each test so cloudpickle
    serializes them by value; the test module is not importable on
    Python workers.)"""
    import struct

    h, w, _ = px.shape
    payload = struct.pack(">HH", h, w) + px.tobytes()
    return struct.pack(">I", 8) + b"ftypisom" + payload


def test_image_dedup_decoder_overrides_route_and_skip(spark):
    """Round-7 advice item: decoder_overrides routes formats the
    baseline codecs can't decode (here a stand-in 'mp4'-sniffed blob)
    through an injected external decoder — routed rows join the banded
    dedup exactly like baseline rows (a BMP clone of an mp4-carried
    image collides) — while unrouted undecodable rows skip cleanly
    under on_error='skip'."""
    def _mp4_override(b: bytes) -> np.ndarray:
        import struct

        import numpy as _np

        h, w = struct.unpack(">HH", b[12:16])
        return _np.frombuffer(b[16:], dtype=_np.uint8).reshape(h, w, 3)

    px0, px1 = _noise(0), _noise(1)
    rows = [
        (0, bytearray(encode_bmp(px0))),          # baseline
        (1000, bytearray(_fake_mp4(px0))),        # routed clone of 0
        (1, bytearray(_fake_mp4(px1))),           # routed original
        (2, bytearray(b"\x00\x00\x00\x08ftypXXXX-corrupt")),  # override raises -> skip
        (3, bytearray(b"not-a-known-format")),    # unrouted -> skip
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = sorted(
        r["doc_id"]
        for r in image_dedup(
            df, max_hamming=1, decoder_overrides={"mp4": _mp4_override}
        ).collect()
    )
    # 1000 dropped (dup of 0 across the override boundary); skipped
    # rows 2 and 3 survive untouched
    assert out == [0, 1, 2, 3]
    # without the override the mp4 rows are undecodable: nothing drops
    out2 = sorted(r["doc_id"] for r in image_dedup(df, max_hamming=1).collect())
    assert out2 == [0, 1, 2, 3, 1000]


def test_video_audio_decoder_overrides(spark):
    """Video override returns frame-pixel iterables; audio override
    returns (samples, rate). Routed rows dedup against baseline rows."""
    from jodie_spark.operators.codecs import encode_frame_stream, encode_wav
    from jodie_spark.operators.media_dedup import audio_dedup, video_dedup

    frames = [_noise(10), _noise(11), _noise(12)]
    vid_rows = [
        (0, bytearray(encode_frame_stream(frames))),  # baseline ppm stream
        (900, bytearray(_fake_mp4(frames[0]))),       # routed: same frames
        (1, bytearray(encode_frame_stream([_noise(20), _noise(21)]))),
    ]

    def video_override(b):
        # single-frame "mp4" whose frame set ⊂ the baseline clip: make
        # it the full set so Jaccard = 1.0 against row 0
        return frames

    vdf = spark.createDataFrame(vid_rows, "doc_id long, data binary")
    kept = sorted(
        r["doc_id"]
        for r in video_dedup(
            vdf, threshold=0.9, decoder_overrides={"mp4": video_override}
        ).collect()
    )
    assert kept == [0, 1]

    rng = np.random.default_rng(5)
    samples = (rng.standard_normal((8000, 1)) * 3000).astype(np.int16)
    def audio_override(b):
        return samples, 8000

    adf = spark.createDataFrame(
        [
            (0, bytearray(encode_wav(samples))),
            (800, bytearray(_fake_mp4(_noise(2)))),  # sniffs mp4; routed to audio samples
            (1, bytearray(encode_wav((rng.standard_normal((8000, 1)) * 3000).astype(np.int16)))),
        ],
        "doc_id long, data binary",
    )
    kept_a = sorted(
        r["doc_id"]
        for r in audio_dedup(
            adf, max_hamming=0, decoder_overrides={"mp4": audio_override}
        ).collect()
    )
    assert kept_a == [0, 1]
