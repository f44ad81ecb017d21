"""Multimodal binary operators: BMP and WAV are decoded/resampled for REAL
(dependency-free codecs); video/compressed formats stay behind the
deterministic FAKE seam. Schemas, batch shapes, and explode math are the
production distributed plan either way."""

import struct
import wave
import io

import pytest
import pyspark.sql.functions as F

from darkbo_spark.multimodal.binary_ops import (
    _decode_header,
    byte_histogram_features,
    decode_metadata,
    make_bmp_payload,
    make_fake_payload,
    make_wav_payload,
    resize_media,
    sample_frames,
    synth_media,
)


def test_decode_metadata_per_kind(spark):
    out = decode_metadata(synth_media(spark, 60)).collect()
    assert len(out) == 60
    for r in out:
        if r.kind == "image":  # real BMP
            assert r.width >= 16 and r.height >= 16 and r.n_frames == 1
            assert r.sample_rate is None and r.n_channels is None
        elif r.kind == "audio":  # real WAV
            assert r.width is None and r.height is None
            assert r.sample_rate >= 8000 and r.n_channels in (1, 2)
            assert r.n_frames >= 400
        else:  # FAKE video container
            assert r.width >= 16 and r.n_frames >= 4


def test_bmp_payload_is_a_real_bmp():
    p = make_bmp_payload(7)
    assert p[:2] == b"BM"
    assert struct.unpack_from("<I", p, 2)[0] == len(p)  # header size field
    meta = _decode_header(p)
    assert (meta["width"], meta["height"]) == (16 + 7 % 48, 16 + 49 % 32)


def test_wav_payload_opens_with_stdlib_wave():
    p = make_wav_payload(9)
    with wave.open(io.BytesIO(p), "rb") as wv:
        assert wv.getsampwidth() == 2
        assert wv.getnframes() == 400 + (9 % 37) * 8
        assert wv.getnchannels() == 1 + 9 % 2


def test_features_shape_and_norm(spark):
    rows = byte_histogram_features(synth_media(spark, 30)).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram


def test_image_features_match_local_pixel_histogram(spark):
    rows = {
        r.media_id: r.features
        for r in byte_histogram_features(synth_media(spark, 12))
        .filter(F.col("kind") == "image")
        .collect()
    }
    assert rows
    from darkbo_spark.multimodal.binary_ops import (
        _bmp_pixels,
        _png_pixels,
        make_png_payload,
    )

    for mid, feats in rows.items():
        bins = [0] * 16
        # synth_media alternates the two REAL image codecs by id parity
        pixels = (
            _bmp_pixels(make_bmp_payload(mid))
            if mid % 2 == 0
            else _png_pixels(make_png_payload(mid))
        )
        for _, _, b, g, r_ in pixels:
            bins[((b + g + r_) // 3) >> 4] += 1
        total = sum(bins)
        want = [round(c / total, 6) for c in bins]
        # the UDF returns array<float>: compare after float32 quantization
        assert all(abs(a - b) < 1e-6 for a, b in zip(feats, want))


def test_frame_sampling(spark):
    media = synth_media(spark, 60)
    frames = sample_frames(media, every_k=2)
    per = frames.groupBy("media_id").count().collect()
    decoded = {
        r.media_id: r.n_frames
        for r in decode_metadata(media.filter(F.col("kind") == "video")).collect()
    }
    assert len(per) == len(decoded)
    for r in per:
        expected = (decoded[r.media_id] + 1) // 2
        assert r["count"] == expected


def test_resize_real_bmp_resample(spark):
    media = synth_media(spark, 12)
    resized = decode_metadata(
        resize_media(media.filter(F.col("kind") != "audio"), 8, 8)
    ).collect()
    assert all(r.width == 8 and r.height == 8 for r in resized)
    # nearest-neighbor correctness on one image: corner pixel preserved
    p = make_bmp_payload(4)
    from darkbo_spark.multimodal.binary_ops import _bmp_pixels, _resize_bmp

    src = {(x, y): (b, g, r) for x, y, b, g, r in _bmp_pixels(p)}
    out = {(x, y): (b, g, r) for x, y, b, g, r in _bmp_pixels(_resize_bmp(p, 8, 8))}
    assert out[(0, 0)] == src[(0, 0)]


def test_real_codec_seam_raises():
    # JPEG magic — PNG is now decoded for real, JPEG still needs Pillow
    with pytest.raises(Exception, match="Pillow|pyav"):
        _decode_header(b"\xff\xd8\xff\xe0\x00\x10JFIF....")


def test_fake_payload_roundtrip():
    p = make_fake_payload("video", 7)
    meta = _decode_header(p)
    assert (meta["width"], meta["height"]) == (16 + 7 % 48, 16 + 49 % 32)
    assert meta["n_frames"] == 4 + 7 % 8


def test_truncated_payloads_raise_at_the_seam():
    """Truncated blobs must raise the documented seam error, not a raw
    struct.error/wave.Error that would fail the whole Arrow batch with an
    unrelated exception type."""
    for payload in [
        b"BM" + b"\x00" * 18,              # 20-byte blob starting with 'BM'
        make_bmp_payload(3)[:60],           # header ok, pixel array cut short
        b"FAKEV\x00\x01",                  # FAKE magic, truncated header
        b"RIFF\x00\x00\x00\x00WAVE",       # RIFF/WAVE with no fmt chunk
        make_wav_payload(3)[:30],           # WAV cut mid-header
    ]:
        with pytest.raises(NotImplementedError):
            _decode_header(payload)


# ---------------------------------------------------------------------------
# Real PNG codec (stdlib struct + zlib)
# ---------------------------------------------------------------------------


def test_png_payload_roundtrips_pixels():
    from darkbo_spark.multimodal.binary_ops import (
        _png_info,
        _png_pixels,
        make_png_payload,
    )

    p = make_png_payload(7)
    w, h, color = _png_info(p)
    assert (w, h, color) == (16 + 7 % 48, 16 + 49 % 32, 2)
    meta = _decode_header(p)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 1)
    px = {(x, y): (b, g, r) for x, y, b, g, r in _png_pixels(p)}
    assert len(px) == w * h
    # pixel formulas match the generator exactly (R,G,B by position)
    for (x, y) in [(0, 0), (w - 1, h - 1), (3, 5)]:
        b, g, r = px[(x, y)]
        assert r == (7 * 17 + x + y * 19) % 256
        assert g == (7 * 11 + x * 13 + y) % 256
        assert b == (7 * 5 + x * 3 + y * 7) % 256


def test_png_unfilter_inverts_all_five_filter_types():
    """Encode scanlines FORWARD with each PNG filter (the spec's filter
    functions) and assert the decoder's reconstruction recovers the exact
    raw bytes — covers Sub/Up/Average/Paeth, not just the filter-0 path
    our encoder emits."""
    import zlib as _zlib

    from darkbo_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _png_chunk,
        _png_scanlines,
    )

    w, h, ch = 5, 5, 3
    stride = w * ch
    rows = [
        bytes(((x * 37 + y * 91 + 7) % 256) for x in range(stride))
        for y in range(h)
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y, line in enumerate(rows):
        ft = y % 5  # one row per filter type
        raw.append(ft)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] - a) & 0xFF
            elif ft == 2:
                v = (line[i] - b) & 0xFF
            elif ft == 3:
                v = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                v = (line[i] - paeth(a, b, c)) & 0xFF
            raw.append(v)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    _, _, _, got = _png_scanlines(payload)
    assert got == rows


def test_png_resize_nearest_neighbor():
    from darkbo_spark.multimodal.binary_ops import (
        _png_pixels,
        _resize_png,
        make_png_payload,
    )

    p = make_png_payload(4)
    src = {(x, y): v for x, y, *v in ((x, y, b, g, r) for x, y, b, g, r in _png_pixels(p))}
    out = _resize_png(p, 8, 8)
    px = {(x, y): (b, g, r) for x, y, b, g, r in _png_pixels(out)}
    assert len(px) == 64
    assert px[(0, 0)] == tuple(src[(0, 0)])


def test_png_unsupported_variants_raise_at_the_seam():
    import zlib as _zlib

    from darkbo_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _png_chunk,
        _png_info,
    )

    # palette (color type 3) and 16-bit depth refuse cleanly
    for depth, color in [(8, 3), (16, 2)]:
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * 10))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            _png_info(payload)
    with pytest.raises(NotImplementedError):
        _png_info(_PNG_SIG + b"\x00\x00")  # truncated


def test_png_roundtrip_property():
    """Property: encode→decode is lossless for arbitrary RGB pixel
    matrices and dimensions (hypothesis-driven, tiny images for speed)."""
    from hypothesis import given, settings, strategies as st

    from darkbo_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _png_chunk,
        _png_pixels,
        _png_scanlines,
    )
    import zlib as _zlib

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        seed=st.integers(0, 2**31),
    )
    def roundtrip(w, h, seed):
        import random

        rng = random.Random(seed)
        rows = [bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)]
        raw = b"".join(b"\x00" + r for r in rows)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        gw, gh, ch, got = _png_scanlines(payload)
        assert (gw, gh, ch) == (w, h, 3) and got == rows
        assert sum(1 for _ in _png_pixels(payload)) == w * h

    roundtrip()
