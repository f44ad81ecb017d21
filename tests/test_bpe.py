"""Real merge-table BPE: algorithm correctness, determinism, and the
Spark Arrow-UDF path agreeing exactly with the plain-Python encoder."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from darkbo_spark.functions.bpe import (
    _TRAIN_CORPUS,
    MERGES,
    N_MERGES,
    RANKS,
    _encode_word,
    _merge_word,
    bpe_token_count_py,
    bpe_token_count_udf,
    bpe_tokens,
    train_merges,
)


def test_merge_word_merges_all_occurrences():
    assert _merge_word(tuple("abab"), ("a", "b")) == ("ab", "ab")
    assert _merge_word(tuple("aab"), ("a", "a")) == ("aa", "b")
    # overlapping pairs merge left-to-right, no re-scan within the pass
    assert _merge_word(tuple("aaa"), ("a", "a")) == ("aa", "a")


def test_training_deterministic_and_bounded():
    again = train_merges(_TRAIN_CORPUS, N_MERGES)
    assert again == MERGES
    assert len(MERGES) == N_MERGES
    assert len(set(MERGES)) == len(MERGES)  # no duplicate merge rules


def test_encode_applies_merges_in_rank_order():
    # tiny corpus: ('a','b') is the most frequent pair (5 words carry it,
    # vs 4 for (' ','a')) so it must be learned FIRST
    merges = train_merges("ab ab ab abc abc", 4)
    assert merges[0] == ("a", "b")
    # concatenating the encoded pieces always reproduces the word
    for w in ["abc", "abab", "xyz"]:
        assert "".join(_encode_word(w)) == w


def test_tokens_reconstruct_and_bound():
    texts = [
        "the quick brown fox",
        "a fast table scan with a window aggregate",
        "punctuation!!! and... numbers 12345",
        "",
        "unseenwordzzz",
    ]
    for t in texts:
        toks = bpe_tokens(t)
        # lossless: concatenation reproduces the pre-token stream
        assert "".join(toks) == "".join(
            __import__("darkbo_spark.functions.bpe", fromlist=["_BPE_RE"])._BPE_RE.findall(t)
        )
        # every token is either a single char or built from table merges
        for tok in toks:
            assert len(tok) >= 1
    # frequent corpus words compress to single tokens
    assert bpe_tokens("the the the") == ["the", " the", " the"]


def test_count_bounds():
    t = "counting tokens matters for training data pipelines"
    n_pre = len(
        __import__("darkbo_spark.functions.bpe", fromlist=["_BPE_RE"])._BPE_RE.findall(t)
    )
    n = bpe_token_count_py(t)
    assert n_pre <= n <= len(t)


def test_ranks_consistent():
    for i, p in enumerate(MERGES):
        assert RANKS[p] == i


def test_udf_matches_python_twin(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a fast table scan, with punctuation... and numbers 12345!",
        "",
        "short",
        "the the the the the",
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    count = bpe_token_count_udf()
    got = {
        r.doc_id: r.n
        for r in df.select("doc_id", count(F.col("text")).alias("n")).collect()
    }
    want = {i: bpe_token_count_py(t) for i, t in enumerate(texts)}
    assert got == want


def test_driver_query_invariant(spark, sf_dir=None):
    import os

    sf = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("no testdata")
    from darkbo_spark.entry_queries import QUERIES

    out = QUERIES["bpe_real_token_counts"](spark, sf)
    rows = out.limit(5).collect()
    assert rows, "query returned nothing"
    # every pre-token encodes to >= 1 subword → real count >= pre count;
    # nulls would break the comparison, so assert both ways
    bad = out.filter(
        F.col("bpe_tokens_real").isNull()
        | (F.col("bpe_tokens_real") < F.col("pre_tokens"))
    )
    assert bad.count() == 0


def test_bpe_oracle_replay_on_adversarial_words():
    """Regression for the review-caught merge-encoding bug: a bare
    chr(1)-joined symbol string lets `replace()` fuse a pair whose left
    symbol merely ENDS with pa (e.g. 'rlaneandd' at the ('a','n') step,
    where ('a','nd') neighbours the match) and drops every second merge
    in chained runs ('aaaa'). The cell-delimited encoding must track the
    Python encoder exactly on such inputs."""
    import random

    import duckdb

    from darkbo_spark.entry_queries import _bpe_oracle
    from darkbo_spark.functions.bpe import bpe_token_count_py

    words = ["rlaneandd", "aaaa", "thethethe", "andandand", "eeee", "eeeeeeee"]
    rng = random.Random(7)
    alpha = "theandingscorplw"
    words += [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 14)))
        for _ in range(200)
    ]
    texts = [" ".join(words[i::5]) for i in range(5)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = [(a, int(b)) for a, b in con.execute(_bpe_oracle(5)).fetchall()]
    want = [(i, bpe_token_count_py(t)) for i, t in enumerate(texts)]
    assert got == want
