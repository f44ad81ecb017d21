"""Distributed BPE training (operators/bpe_train.py)."""

import pandas as pd
import pytest

from darkbo_spark.functions.bpe import _BPE_RE, train_merges
from darkbo_spark.operators.bpe_train import train_merges_distributed, word_freqs

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs, 42 of them!",
    "the lazy dog naps; the quick fox runs. runs and runs",
    "",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)),
                                               "text": texts}))


def test_word_freqs_match_python_counter(spark):
    from collections import Counter

    want = Counter()
    for t in TEXTS:
        want.update(_BPE_RE.findall(t))
    got = {r.word: r.freq for r in word_freqs(_docs(spark)).collect()}
    assert got == dict(want)


def test_distributed_equals_single_string_trainer(spark):
    merges, stats = train_merges_distributed(_docs(spark), n_merges=40)
    # the same word MULTISET: per-doc findall summed == findall of the
    # concatenation with a separator that contributes identical boundaries
    want = train_merges("\n".join(TEXTS), 40)
    assert merges == want
    assert stats["truncated"] is False and stats["vocab_size"] > 0


def test_partitioning_invariance(spark):
    a, _ = train_merges_distributed(_docs(spark), n_merges=30)
    b, _ = train_merges_distributed(_docs(spark).repartition(7), n_merges=30)
    assert a == b


def test_truncation_is_loud(spark):
    with pytest.raises(ValueError, match="max_vocab"):
        train_merges_distributed(_docs(spark), n_merges=5, max_vocab=3)
    merges, stats = train_merges_distributed(
        _docs(spark), n_merges=5, max_vocab=3, allow_truncation=True
    )
    assert stats["truncated"] and stats["dropped_words"] > 0
    assert stats["dropped_freq"] > 0 and len(merges) == 5
