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
    from darkbo_spark.multimodal.binary_ops import _bmp_pixels

    for mid, feats in rows.items():
        bins = [0] * 16
        for _, _, b, g, r_ in _bmp_pixels(make_bmp_payload(mid)):
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
    with pytest.raises(Exception, match="Pillow|pyav"):
        _decode_header(b"\x89PNG\r\n\x1a\n....")


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
