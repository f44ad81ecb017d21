"""Perceptual image hashes + image near-dup (multimodal/binary_ops.py):
hash shape/determinism, resize invariance of the grid math, planted
near-identical images at low hamming, banded pairs == brute force, and
cluster recovery of planted copies."""

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.multimodal.binary_ops import (
    _ahash_hex,
    _dhash_hex,
    _gray_grid,
    image_hashes,
    image_neardup_pairs,
    make_bmp_payload,
    make_png_payload,
    _resize_bmp,
)


def _hamming_hex(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def _media(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"])
    )


def _perturb_bmp(media_id: int, delta: int = 3) -> bytes:
    """The same BMP with one pixel's blue channel nudged — a true
    near-identical image, not a copy."""
    p = bytearray(make_bmp_payload(media_id))
    p[54] = (p[54] + delta) % 256  # first stored pixel, B channel
    return bytes(p)


def test_hash_shape_and_determinism():
    p = make_bmp_payload(7)
    a, d = _ahash_hex(_gray_grid(p, 8, 8)), _dhash_hex(_gray_grid(p, 9, 8))
    assert len(a) == 16 and len(d) == 16
    assert a == _ahash_hex(_gray_grid(p, 8, 8))
    int(a, 16), int(d, 16)  # valid hex


def test_png_and_bmp_decode_paths_both_hash():
    for p in (make_bmp_payload(3), make_png_payload(3)):
        assert len(_ahash_hex(_gray_grid(p, 8, 8))) == 16


def test_integer_upscale_preserves_hashes():
    """Nearest-neighbor 2× upscale composes exactly with the grid sample
    (floor(floor(2xw/8)/2) == floor(xw/8)) — hashes must be identical."""
    p = make_bmp_payload(11)
    import struct as _s

    w = _s.unpack_from("<i", p, 18)[0]
    h = _s.unpack_from("<i", p, 22)[0]
    big = _resize_bmp(p, 2 * w, 2 * h)
    assert _ahash_hex(_gray_grid(p, 8, 8)) == _ahash_hex(_gray_grid(big, 8, 8))
    assert _dhash_hex(_gray_grid(p, 9, 8)) == _dhash_hex(_gray_grid(big, 9, 8))


def test_near_identical_low_hamming_distinct_high():
    p, q = make_bmp_payload(5), _perturb_bmp(5)
    other = make_bmp_payload(17)
    d_near = _hamming_hex(
        _dhash_hex(_gray_grid(p, 9, 8)), _dhash_hex(_gray_grid(q, 9, 8))
    )
    d_far = _hamming_hex(
        _dhash_hex(_gray_grid(p, 9, 8)), _dhash_hex(_gray_grid(other, 9, 8))
    )
    assert d_near <= 3
    assert d_far > 10  # pseudorandom pixels → ~32 expected


def test_banded_pairs_equal_brute_force(spark):
    rows = [(i, make_bmp_payload(i)) for i in range(20)]
    rows += [(100 + i, _perturb_bmp(i)) for i in range(5)]
    hashes = image_hashes(_media(spark, rows))
    hd = {r.media_id: r.ahash for r in hashes.collect()}
    want = set()
    import itertools

    for a, b in itertools.combinations(sorted(hd), 2):
        if _hamming_hex(hd[a], hd[b]) <= 3:
            want.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(hashes, max_hamming=3, max_bucket=10_000).collect()
    }
    assert got == want
    assert all((i, 100 + i) in got for i in range(5))  # planted near-dups found


def test_clusters_group_planted_copies(spark):
    from darkbo_spark.operators.dedup import neardup_clusters

    rows = [(i, make_bmp_payload(i)) for i in range(10)]
    rows += [(1000 + i, make_bmp_payload(i)) for i in range(10)]  # exact copies
    hashes = image_hashes(_media(spark, rows))
    pairs = image_neardup_pairs(hashes, max_hamming=3, max_bucket=10_000)
    got = {
        r.doc_id: r.rep_id
        for r in neardup_clusters(
            hashes.select(F.col("media_id").alias("doc_id")),
            id_col="doc_id",
            pairs=pairs,
        ).collect()
    }
    for i in range(10):
        assert got[1000 + i] == got[i] == i


def test_undecodable_payload_raises_at_seam(spark):
    import pytest

    df = _media(spark, [(0, b"JFIF-not-really-a-supported-format")])
    with pytest.raises(Exception, match="(?i)perceptual|pillow|NotImplemented"):
        image_hashes(df).collect()
