"""Multimodal binary plumbing: schemas, batch shapes, explode math are real;
codec seams are stubbed deterministically and raise on non-fake payloads."""

import pandas as pd
import pytest
import pyspark.sql.functions as F

from darkbo_spark.multimodal.binary_ops import (
    byte_histogram_features,
    decode_metadata,
    make_fake_payload,
    resize_stub,
    sample_frames,
    synth_media,
    _decode_header,
)


def test_decode_metadata(spark):
    out = decode_metadata(synth_media(spark, 50)).collect()
    assert len(out) == 50
    for r in out:
        assert r.width >= 16 and r.height >= 16 and r.n_frames >= 1
        assert (r.kind == "image") == (r.n_frames == 1)


def test_features_shape_and_norm(spark):
    rows = byte_histogram_features(synth_media(spark, 30)).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram


def test_frame_sampling(spark):
    media = synth_media(spark, 60)
    frames = sample_frames(media, every_k=2)
    per = (
        frames.groupBy("media_id").count().collect()
    )
    decoded = {r.media_id: r.n_frames for r in decode_metadata(media).collect()}
    for r in per:
        expected = (decoded[r.media_id] + 1) // 2
        assert r["count"] == expected


def test_resize_rewrites_header(spark):
    media = synth_media(spark, 10)
    resized = resize_stub(media, 8, 8)
    out = decode_metadata(resized).collect()
    assert all(r.width == 8 and r.height == 8 for r in out)


def test_real_codec_seam_raises():
    with pytest.raises(NotImplementedError):
        _decode_header(b"\x89PNG\r\n\x1a\n....")


def test_fake_payload_roundtrip():
    p = make_fake_payload("video", 7)
    w, h, fr = _decode_header(p)
    assert (w, h) == (16 + 7 % 48, 16 + 49 % 32) and fr == 4 + 7 % 8
