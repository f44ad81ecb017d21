"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / resize / frame-sample implemented
as Arrow-batched operators over `mapInPandas`.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The codec calls themselves are STUBBED behind
a deterministic fake format (no image/audio libraries ship in this
container): payloads beginning with the magic ``FAKE{KIND}`` carry a tiny
parseable header; anything else raises NotImplementedError at the exact
seam where Pillow / torchaudio / pyav would plug in. Swapping in a real
decoder changes ONLY `_decode_header` / `_decode_pixels` — the distributed
plan is already the production one (reference analog: binary attachments
stored and served opaque, api/storage.py:133-142).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("source_url", StringType()),
    ]
)

_MAGIC = b"FAKE"


def make_fake_payload(kind: str, media_id: int) -> bytes:
    """Deterministic fake media blob: magic + header + pseudo-content."""
    w, h = 16 + (media_id % 48), 16 + ((media_id * 7) % 32)
    frames = 1 if kind == "image" else 4 + media_id % 8
    header = struct.pack(">III", w, h, frames)
    body = bytes((media_id * (i + 13)) % 256 for i in range(w * h))
    return _MAGIC + kind.encode()[:1].upper() + header + body


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table (distributed generation, per-row seeded)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                kind = kinds[(i + seed) % 3]
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": make_fake_payload(kind, i),
                        "source_url": f"https://media.example.com/{kind}/{i}",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n, numPartitions=max(8, n // 10000)).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _decode_header(payload: bytes) -> tuple[int, int, int]:
    """THE decode seam. Real formats (JPEG/PNG/WAV/MP4) plug in here."""
    if payload is None or not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real media decoding requires Pillow/pyav — not available in "
            "this container; only the deterministic FAKE format is decoded"
        )
    w, h, frames = struct.unpack(">III", payload[5:17])
    return w, h, frames


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched decode of typed metadata from binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples():
                w, h, fr = _decode_header(bytes(r.payload))
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "width": w,
                        "height": h,
                        "n_frames": fr,
                        "n_bytes": len(r.payload),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


_FEAT_DIM = 16


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """Feature extraction: 16-bin normalized byte histogram of the content
    region — the stand-in for a real CNN/audio embedding; batch shape and
    schema identical to the production operator."""

    @F.pandas_udf(ArrayType(FloatType()))
    def feat(payload: pd.Series) -> pd.Series:
        def one(p: bytes | None):
            if p is None or not p.startswith(_MAGIC):
                raise NotImplementedError("real feature extraction stubbed")
            body = p[17:]
            bins = [0] * _FEAT_DIM
            for byte in body:
                bins[byte >> 4] += 1
            total = max(len(body), 1)
            return [round(c / total, 6) for c in bins]

        return payload.map(one)

    return media.select("media_id", "kind", feat(F.col("payload")).alias("features"))


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video rows: explode frame indices 0..n_frames-1,
    keep every k-th. Frame decode itself is the stubbed seam; index math
    and explode are the real distributed plan."""
    decoded = decode_metadata(media.filter(F.col("kind") == "video"))
    frames = decoded.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
    return frames.filter(F.pmod(F.col("frame_idx"), F.lit(every_k)) == 0)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the Arrow batch path and
    rewrites the header dims (real pixel resample is the stubbed seam)."""

    @F.pandas_udf(BinaryType())
    def resize(payload: pd.Series) -> pd.Series:
        def one(p: bytes | None):
            if p is None or not p.startswith(_MAGIC):
                raise NotImplementedError("real resize stubbed")
            _, _, frames = struct.unpack(">III", p[5:17])
            return p[:5] + struct.pack(">III", width, height, frames) + p[17:]

        return payload.map(one)

    return media.withColumn("payload", resize(F.col("payload")))
