"""Embedding encode (Arrow scalar-iterator UDF with its exploded
per-dim DuckDB twin) and multimodal binary-column operators (decode /
features / frame sampling over real BMP/WAV + the FAKE container).

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline:
money aggregates sum in DECIMAL, short array folds round to 6 dp on both
engines, every computed column is aliased identically in Spark and SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.queries.common import _q, _t


# ---------------------------------------------------------------------------
# Embedding + multimodal operators (rows-only — deterministic-stub codecs;
# plumbing verified in tests/test_multimodal.py and tests/test_embed.py)
# ---------------------------------------------------------------------------

def _embed_x_oracle() -> str:
    from darkbo_spark.kg.oracle_twin import enc_cte

    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
{enc_cte('d', 'doc_id', 'text', quantize=True).lstrip()}
SELECT key AS doc_id, dim, val FROM enc_cell
ORDER BY doc_id, dim
"""


@_q("embed_documents_x", _embed_x_oracle())
def embed_documents_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 driver-oracled: the REAL scalar-iterator Arrow encode UDF vs the
    ONE shared SQL replay of the md5 hash-projection encoder
    (kg/oracle_twin.enc_cte — bucket = first md5 byte % 64, sign =
    second-byte parity, L2 normalize, round 6, then float32 quantization
    exactly as the Spark float→double cast applies it). The array column
    is EXPLODED to (doc_id, dim, val) rows because the driver
    canonicalizer rejects arrays; with the quantization replayed the
    compared doubles are BIT-identical, no re-rounding needed."""
    from darkbo_spark.functions.embed import embed_udf

    emb = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", embed_udf(F.col("text")).alias("embedding"))
    )
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "doc_id",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("v").cast("double").alias("val"),
    )


@_q("embed_documents")
def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The raw array<float> column crashes the driver's pandas canonicalizer
    # (lists are unhashable), so the driver-facing query projects a stable
    # scalar fingerprint; pytest (tests/test_embed.py) covers the raw vectors.
    from darkbo_spark.functions.embed import embed_udf

    emb = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", embed_udf(F.col("text")).alias("embedding"))
    )
    return emb.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.md5(F.to_json(F.col("embedding"))).alias("embedding_fp"),
    )


@_q("media_decode")
def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.multimodal.binary_ops import decode_metadata, synth_media

    return decode_metadata(synth_media(spark, 200))


@_q("media_features")
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scalar fingerprint of the feature vector for the driver canonicalizer
    # (raw array<float> is unhashable in its pandas sort); pytest keeps the
    # raw-array assertions (tests/test_multimodal.py).
    from darkbo_spark.multimodal.binary_ops import byte_histogram_features, synth_media

    feats = byte_histogram_features(synth_media(spark, 200))
    return feats.select(
        "media_id",
        "kind",
        F.size("features").alias("dim"),
        F.md5(F.to_json(F.col("features"))).alias("features_fp"),
    )


@_q("media_frame_sample")
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.multimodal.binary_ops import sample_frames, synth_media

    return sample_frames(synth_media(spark, 200), every_k=2)


# ---------------------------------------------------------------------------
# Perceptual image hashes — the first HASH-ORACLED media query: the Spark
# side decodes REAL 24-bit BMP payloads (multimodal/binary_ops.py codec)
# and computes aHash/dHash; DuckDB re-derives the same hashes straight
# from the generator's per-pixel channel formulas. Any drift in encoder,
# decoder, grid sampling, orientation handling, or bit packing breaks the
# driver hash.
# ---------------------------------------------------------------------------

_PHASH_ID_LIMIT = 200


def _phash_oracle(id_limit: int = _PHASH_ID_LIMIT) -> str:
    # lum = (B+G+R)//3 of make_bmp_payload's channel formulas at (sx, fy);
    # fy converts the VISUAL grid row back to the generator's formula row
    # (BMP rows are stored bottom-up: visual y ↔ storage/formula h-1-y)
    def lum(sx: str, fy: str) -> str:
        return (
            f"((((media_id*5 + ({sx})*3 + ({fy})*7) % 256) + "
            f"((media_id*11 + ({sx})*13 + ({fy})) % 256) + "
            f"((media_id*17 + ({sx}) + ({fy})*19) % 256)) // 3)"
        )

    sx8 = "least(((i % 8) * w) // 8, w - 1)"
    fy8 = "h - 1 - least(((i // 8) * h) // 8, h - 1)"
    sx9 = "least(((i % 9) * w) // 9, w - 1)"
    fy9 = "h - 1 - least(((i // 9) * h) // 8, h - 1)"

    def abyte(y: int) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN l8[{y * 8 + x + 1}] * 64 > s8 THEN {1 << x} ELSE 0 END)"
            for x in range(8)
        ) + ")"

    def dbyte(y: int) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN l9[{y * 9 + x + 2}] > l9[{y * 9 + x + 1}] THEN {1 << x} ELSE 0 END)"
            for x in range(8)
        ) + ")"

    ahex = "concat(" + ", ".join(f"printf('%02x', {abyte(y)})" for y in range(8)) + ")"
    dhex = "concat(" + ", ".join(f"printf('%02x', {dbyte(y)})" for y in range(8)) + ")"
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, 16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 32 AS h
  FROM documents WHERE doc_id < {id_limit}
),
g AS (
  SELECT media_id,
         list_transform(range(0, 64), i -> {lum(sx8, fy8)}) AS l8,
         list_transform(range(0, 72), i -> {lum(sx9, fy9)}) AS l9
  FROM m
),
gs AS (SELECT media_id, l8, l9, list_sum(l8) AS s8 FROM g)
SELECT media_id, {ahex} AS ahash, {dhex} AS dhash
FROM gs ORDER BY media_id
"""


@_q("image_phash_x", _phash_oracle())
def image_phash_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hashes hash-oracled end to end THROUGH the real codec:
    Spark encodes deterministic BMPs (one per documents row), decodes them
    with the struct-only BMP decoder, nearest-neighbor-samples the 8×8 /
    9×8 grayscale grids in visual orientation, and packs aHash/dHash hex;
    DuckDB computes the identical hashes directly from the pixel formulas
    — converting the media family's rows-only class to a hash-exact one."""
    import pandas as pd

    from darkbo_spark.multimodal.binary_ops import image_hashes, make_bmp_payload

    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PHASH_ID_LIMIT)
        .select(F.col("doc_id").alias("media_id"))
    )

    def gen(batches):
        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "payload": [make_bmp_payload(int(i)) for i in b["media_id"]],
                }
            )

    media = ids.mapInPandas(gen, schema="media_id long, payload binary")
    return image_hashes(media)


@_q("image_neardup_clusters")  # rows-only: planted-copy recovery in pytest
def image_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup END TO END as a dedup-family member: perceptual
    hashes over real BMP/PNG payloads → pigeonhole-banded candidate pairs
    → the SAME transitive clustering text dedup uses
    (operators.dedup.neardup_clusters with pairs=...). Planted exact
    copies (media_id+10000, identical payload) must land in their
    original's cluster; binary payloads have no SQL analog, so this entry
    is rows-only — its hash machinery is driver-oracled via image_phash_x
    and the codec via pixel-parity pytest."""
    from darkbo_spark.multimodal.binary_ops import (
        image_hashes,
        image_neardup_pairs,
        synth_media,
    )
    from darkbo_spark.operators.dedup import neardup_clusters

    imgs = synth_media(spark, 120).filter(F.col("kind") == "image")
    copies = imgs.withColumn("media_id", F.col("media_id") + 10000)
    hashes = image_hashes(imgs.unionByName(copies))
    pairs = image_neardup_pairs(hashes, hash_col="ahash", max_hamming=3)
    return neardup_clusters(
        hashes.select(F.col("media_id").alias("doc_id")),
        id_col="doc_id",
        pairs=pairs,
    ).select(F.col("doc_id").alias("media_id"), "rep_id")
