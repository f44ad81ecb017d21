"""A7 — embedding encode as a scalar-iterator pandas UDF.

The reference encodes the whole corpus with a sentence-transformer and
L2-normalizes float32 vectors (behavior: api/index_versioning.py:396-406,
query side ai_worker.py:179-181). The Spark restatement is the
scalar-ITERATOR pandas UDF so the model loads ONCE per executor python
worker and every batch reuses it — the canonical pattern for model
inference in Spark.

No model ships in this container, so `_load_model` defaults to a
deterministic hash-projection encoder (stable across runs/parallelism,
unit-normalized, fixed dim). The real-model seam is EXECUTABLE, not a
comment: set ``DARKBO_REAL_EMBED=1`` (and optionally
``DARKBO_EMBED_MODEL``, default all-MiniLM-L6-v2 — the reference's model,
api/index_versioning.py:396-406) and `_load_model` loads the
sentence-transformer through the `_ModelEncoder` adapter, which applies
the SAME L2 normalization contract as the stub. The UDF shape, Arrow
batching, once-per-worker load, and normalization are identical either
way — tests/test_embed.py proves the adapter contract with a fake model
and auto-skips the real-library test when it isn't installed. (Local
mode shares the driver's environment with workers; on a cluster, ship
the env var via spark.executorEnv.)
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64
REAL_EMBED_ENV = "DARKBO_REAL_EMBED"
EMBED_MODEL_ENV = "DARKBO_EMBED_MODEL"
DEFAULT_REAL_MODEL = "all-MiniLM-L6-v2"


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


class _ModelEncoder:
    """Adapter giving any `model.encode(list[str]) -> vectors` object (the
    sentence-transformers interface) the SAME output contract as the stub:
    plain float lists, L2-normalized (the reference normalizes before
    indexing), zero-vector-safe."""

    def __init__(self, model):
        self._model = model

    def encode(self, texts: list[str]) -> list[list[float]]:
        out = []
        for v in self._model.encode(list(texts)):
            v = [float(x) for x in v]
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / norm for x in v])
        return out


def _load_model():
    """The model seam. DARKBO_REAL_EMBED=1 → the real sentence-transformer
    (fail LOUDLY if the library is missing rather than silently serving
    stub vectors); default → the deterministic hash encoder."""
    if os.environ.get(REAL_EMBED_ENV) == "1":
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise RuntimeError(
                f"{REAL_EMBED_ENV}=1 but sentence-transformers is not "
                "installed — install it or unset the flag (falling back "
                "silently would mix stub and real vectors in one index)"
            ) from e
        name = os.environ.get(EMBED_MODEL_ENV, DEFAULT_REAL_MODEL)
        return _ModelEncoder(SentenceTransformer(name))
    return _HashEncoder()


@pandas_udf(ArrayType(FloatType()))
def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _load_model()  # once per python worker, reused across batches
    for s in it:
        yield pd.Series(model.encode(s.fillna("").tolist()))
