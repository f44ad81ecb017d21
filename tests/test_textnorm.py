"""Byte-identical text normalization + chunking: Spark UDF output must equal
the plain-Python oracle byte-for-byte on every input (north-rule invariant).
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from darkbo_spark import reference_impl as ref
from darkbo_spark.functions.textnorm import clean_text_udf, create_chunks_udf
from darkbo_spark.kg.pages import synth_pages


MESSY = [
    "",
    "   ",
    "plain sentence.",
    "Multiple   spaces\tand\ttabs\nnewlines\r\n everywhere.",
    "Weird chars: ™ © • § ¶ emoji 😀 end.",
    "Dots...... and dashes--------- galore.",
    "space before punct , and ; here !",
    "!!??!! stacked punctuation ,,,, here",
    "ab",  # too short → dropped
    "a.b!",  # >3 chars with alpha → kept
    "x" * 5000 + ". tail",
]


def test_clean_text_udf_matches_oracle(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": MESSY}))
    got = [r.c for r in df.select(clean_text_udf("text").alias("c")).collect()]
    want = [ref.clean_text(t) for t in MESSY]
    assert got == want


def test_clean_text_on_synth_corpus(spark):
    pdf = synth_pages(spark, 60, seed=7).select("url", "text").toPandas()
    df = spark.createDataFrame(pdf)
    got = {
        r.url: r.c
        for r in df.select("url", clean_text_udf("text").alias("c")).collect()
    }
    for r in pdf.itertuples():
        assert got[r.url] == ref.clean_text(r.text), r.url


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_clean_text_pure_properties(t):
    out = ref.clean_text(t)
    assert out == out.strip()
    assert "\n" not in out  # whitespace collapse runs before the line filter
    assert "\t" not in out
    # charset restriction: only word chars, space, and the allowed puncts
    import re

    assert re.search(r"[^\w\s.,;:!?\-()\[\]\"'/]", out) is None


def test_chunks_udf_matches_oracle(spark):
    texts = [
        "",
        "short text.",
        ("Sentence one is here. " * 120),  # > 2 chunks, snap applies
        ("nowhitespaceorpunct" * 300),  # no sentence boundary at all
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r.c for r in df.select(create_chunks_udf("text").alias("c")).collect()]
    want = [ref.create_chunks(t) for t in texts]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=" .!?abcdefgh", min_size=0, max_size=4000))
def test_chunk_properties(t):
    chunks = ref.create_chunks(t)
    if len(t) <= ref.CHUNK_SIZE:
        # short-text fast path returns the text as-is (reference-exact: the
        # single-chunk branch does NOT strip)
        assert chunks == ([t] if t else [])
    else:
        for c in chunks:
            assert len(c) <= ref.CHUNK_SIZE
            assert c == c.strip()
