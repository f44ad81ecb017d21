"""Trained quality classifier (functions/quality_model.py): weight
determinism, separability on a held-out planted set, UDF-vs-native parity,
and the fastText seam contract (fake adapter + loud failure + auto-skip)."""

import math

import pandas as pd
import pytest
import pyspark.sql.functions as F


def test_training_is_deterministic():
    from darkbo_spark.functions.quality_model import WEIGHTS, _train_logistic

    assert _train_logistic() == WEIGHTS  # bit-for-bit reproducible


def test_separates_held_out_good_from_junk(spark):
    """Docs NOT in the training set: prose must classify 1, junk 0."""
    from darkbo_spark.functions.quality_model import quality_label

    good = [
        "the streaming job reads the new files and merges the counts into "
        "the running state before the next trigger fires",
        "every partition writes its own sorted block and the merge step "
        "combines them into the final output table for the day",
    ]
    junk = [
        ("limited offer " * 25).strip(),      # stuffing, held out
        "??? !!! ;;; ??? !!! ;;; ??? !!! ;;; ??? !!! ;;;",  # punct noise
        "no",                                  # too short
        "mmmmmmmmmmmmmmmmmmmmmmmmmmmmmmmmmmmm" * 3,  # gibberish run
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)]
    rows += [(100 + i, t, 0) for i, t in enumerate(junk)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "want"]))
    out = df.select("want", quality_label(F.col("text")).alias("got")).collect()
    assert all(r.got == r.want for r in out)


def test_udf_matches_native_logit(spark):
    """sigmoid(native logit) and the Arrow-UDF linear scorer are the same
    model — agreement to float tolerance (feature rounding happens in
    Python vs JVM)."""
    from darkbo_spark.functions.quality_model import quality_logit, quality_prob_udf

    texts = [
        "the quick brown fox jumps over the lazy dog and the query runs",
        ("spam " * 40).strip(),
        "ok",
        "a fast table scan with a window aggregate is faster than a slow scan",
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = df.select(
        "doc_id",
        quality_logit(F.col("text")).alias("z"),
        quality_prob_udf(F.col("text")).alias("p"),
    ).collect()
    for r in got:
        assert abs(1.0 / (1.0 + math.exp(-r.z)) - r.p) < 5e-6


class _FakeFastText:
    def predict(self, texts):
        labels = [("__label__keep",) if "good" in t else ("__label__junk",) for t in texts]
        probs = [(0.9,)] * len(texts)
        return labels, probs


def test_fasttext_adapter_contract():
    from darkbo_spark.functions.quality_model import _FastTextScorer

    out = _FastTextScorer(_FakeFastText()).predict_proba(["good text", "bad text"])
    assert out[0] == pytest.approx(0.9)       # positive label passes through
    assert out[1] == pytest.approx(0.1)       # negative label complements


def test_real_quality_flag_fails_loudly_without_library(monkeypatch):
    import builtins

    from darkbo_spark.functions import quality_model as qm

    monkeypatch.setenv(qm.REAL_QUALITY_ENV, "1")
    real_import = builtins.__import__

    def block(name, *a, **k):
        if name.startswith("fasttext"):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", block)
    with pytest.raises(RuntimeError, match="fasttext"):
        qm._load_scorer()


def test_flag_off_loads_the_trained_linear_model(monkeypatch):
    from darkbo_spark.functions import quality_model as qm

    monkeypatch.delenv(qm.REAL_QUALITY_ENV, raising=False)
    assert isinstance(qm._load_scorer(), qm._LinearScorer)


def test_real_fasttext_end_to_end_when_installed(monkeypatch, tmp_path):
    pytest.importorskip("fasttext")
    from darkbo_spark.functions import quality_model as qm

    # train a two-line supervised model so load_model has a real file
    import fasttext

    data = tmp_path / "train.txt"
    data.write_text(
        "__label__keep the quick brown fox jumps over the lazy dog\n"
        "__label__junk buy now buy now buy now buy now\n" * 5
    )
    model = fasttext.train_supervised(str(data), epoch=5)
    path = tmp_path / "m.bin"
    model.save_model(str(path))
    monkeypatch.setenv(qm.REAL_QUALITY_ENV, "1")
    monkeypatch.setenv(qm.QUALITY_MODEL_ENV, str(path))
    scorer = qm._load_scorer()
    assert isinstance(scorer, qm._FastTextScorer)
    out = scorer.predict_proba(["the quick brown fox"])
    assert 0.0 <= out[0] <= 1.0
