"""The real-model seams are tested CONTRACTS, not comments: the embed and
tokenizer flags route `_load_model` / `_load_counter` to real libraries
when set (failing loudly when the library is absent), the adapter applies
the same normalization contract as the stub, and the real-library tests
auto-skip in containers that don't ship the models."""

import math

import pytest


# ---------------------------------------------------------------------------
# Embedding seam (functions/embed.py)
# ---------------------------------------------------------------------------


class _FakeST:
    """Duck-typed sentence-transformer: fixed un-normalized vectors."""

    def encode(self, texts):
        return [[float(len(t)), 3.0, 4.0] for t in texts]


def test_model_encoder_adapter_normalizes_like_the_stub():
    from darkbo_spark.functions.embed import _ModelEncoder

    out = _ModelEncoder(_FakeST()).encode(["ab", ""])
    assert len(out) == 2 and all(isinstance(x, float) for v in out for x in v)
    for v in out:
        assert math.isclose(math.sqrt(sum(x * x for x in v)), 1.0, rel_tol=1e-9)
    # direction preserved: [2,3,4] / |..|
    n = math.sqrt(4 + 9 + 16)
    assert out[0] == pytest.approx([2 / n, 3 / n, 4 / n])


def test_real_embed_flag_fails_loudly_without_library(monkeypatch):
    import builtins

    from darkbo_spark.functions import embed

    monkeypatch.setenv(embed.REAL_EMBED_ENV, "1")
    real_import = builtins.__import__

    def block(name, *a, **k):
        if name.startswith("sentence_transformers"):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block)
    with pytest.raises(RuntimeError, match="sentence-transformers"):
        embed._load_model()


def test_flag_off_loads_the_hash_stub(monkeypatch):
    from darkbo_spark.functions import embed

    monkeypatch.delenv(embed.REAL_EMBED_ENV, raising=False)
    assert isinstance(embed._load_model(), embed._HashEncoder)


def test_real_embed_end_to_end_when_installed(monkeypatch):
    st = pytest.importorskip("sentence_transformers")
    from darkbo_spark.functions import embed

    monkeypatch.setenv(embed.REAL_EMBED_ENV, "1")
    model = embed._load_model()
    assert isinstance(model, embed._ModelEncoder)
    vecs = model.encode(["hello world"])
    assert len(vecs) == 1 and math.isclose(
        math.sqrt(sum(x * x for x in vecs[0])), 1.0, rel_tol=1e-6
    )
    assert st is not None


# ---------------------------------------------------------------------------
# Tokenizer seam (functions/bpe.py)
# ---------------------------------------------------------------------------


def test_real_tokenizer_flag_fails_loudly_without_library(monkeypatch):
    import builtins

    from darkbo_spark.functions import bpe

    monkeypatch.setenv(bpe.REAL_TOKENIZER_ENV, "1")
    real_import = builtins.__import__

    def block(name, *a, **k):
        if name.startswith("tiktoken"):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block)
    with pytest.raises(RuntimeError, match="tiktoken"):
        bpe._load_counter()


def test_tokenizer_flag_off_counts_with_vendored_merges(monkeypatch):
    from darkbo_spark.functions import bpe

    monkeypatch.delenv(bpe.REAL_TOKENIZER_ENV, raising=False)
    count = bpe._load_counter()
    assert count is bpe.bpe_token_count_py
    assert count("the cat sat") == len(bpe.bpe_tokens("the cat sat"))


def test_real_tokenizer_end_to_end_when_installed(monkeypatch):
    pytest.importorskip("tiktoken")
    from darkbo_spark.functions import bpe

    monkeypatch.setenv(bpe.REAL_TOKENIZER_ENV, "1")
    count = bpe._load_counter()
    assert count("hello world") > 0 and count("") == 0
