"""A7 — embedding encode as a scalar-iterator pandas UDF.

The reference encodes the whole corpus with a sentence-transformer and
L2-normalizes float32 vectors (behavior: api/index_versioning.py:396-406,
query side ai_worker.py:179-181). The Spark restatement is the
scalar-ITERATOR pandas UDF so the model loads ONCE per executor python
worker and every batch reuses it — the canonical pattern for model
inference in Spark.

No model ships in this container, so `_load_model` returns a deterministic
hash-projection encoder (stable across runs/parallelism, unit-normalized,
fixed dim). Swapping in the real sentence-transformer changes only
`_load_model`; the UDF shape, Arrow batching, and normalization are the
production path.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64


class _HashEncoder:
    """Deterministic stand-in encoder: token hash → bucket += weight, then
    L2 normalize. Same text → same vector, everywhere."""

    def encode(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            vec = [0.0] * EMBED_DIM
            for tok in (t or "").lower().split():
                h = hashlib.md5(tok.encode()).digest()
                idx = h[0] % EMBED_DIM
                sign = 1.0 if h[1] % 2 == 0 else -1.0
                vec[idx] += sign
            norm = math.sqrt(sum(x * x for x in vec)) or 1.0
            out.append([round(x / norm, 6) for x in vec])
        return out


def _load_model():
    """The model seam: return the real sentence-transformer here in
    production; the deterministic hash encoder in this container."""
    return _HashEncoder()


@pandas_udf(ArrayType(FloatType()))
def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _load_model()  # once per python worker, reused across batches
    for s in it:
        yield pd.Series(model.encode(s.fillna("").tolist()))
