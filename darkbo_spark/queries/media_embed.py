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
