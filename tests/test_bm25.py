"""BM25 sparse channel (Whoosh-parity math, ai_worker.py:208-226 behavior)
+ raw-query-string parsing (QueryParser AND semantics)."""

import math

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.operators.queryparse import parse_query, search_text
from darkbo_spark.operators.tfidf import bm25_score_query, build_bm25_postings

DOCS = [
    (0, "spark shuffles data between stages"),
    (1, "spark spark spark tuning guide for shuffle heavy jobs"),
    (2, "a totally unrelated document about gardening and soil"),
    (3, "short doc"),
    (4, "data pipelines move data data data every day in spark clusters"),
]


def _df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def _bm25_oracle(query_terms, k1=1.2, b=0.75):
    """Plain-Python BM25 over DOCS with the exact formula of the operator."""
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, ts in toks.items():
        s = 0.0
        for q in set(query_terms):
            tf = ts.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            tf_norm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
            s += round(idf * tf_norm, 6)
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_python_oracle(spark):
    postings = build_bm25_postings(_df(spark), "text", "doc_id")
    got = {
        r.doc_id: round(r.score, 6)
        for r in bm25_score_query(postings, ["spark", "data"], top_k=10).collect()
    }
    assert got == _bm25_oracle(["spark", "data"])


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc → higher score (the property tf·idf lacks)."""
    rows = [(0, "apple pie"), (1, "apple " + "filler " * 30)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    postings = build_bm25_postings(df, "text", "doc_id")
    got = {r.doc_id: r.score for r in bm25_score_query(postings, ["apple"]).collect()}
    assert got[0] > got[1]


def test_postings_build_launches_no_jobs(spark):
    """The corpus count is folded into the plan — constructing tf·idf OR
    BM25 postings triggers no separate count() action."""
    from darkbo_spark.operators.tfidf import build_postings

    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    p1 = build_postings(_df(spark), "text", "doc_id")
    p2 = build_bm25_postings(_df(spark), "text", "doc_id")
    mid = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert mid == before, "plan construction must launch zero jobs"
    assert p1.count() > 0 and p2.count() > 0


def test_parse_query_and_semantics():
    pq = parse_query('How do I tune "shuffle heavy" Spark jobs?')
    assert pq.phrases == ["shuffle heavy"]
    # 'how' is in the shared STOP_WORDS list, 'i' dropped by minsize=2;
    # lowercased; order kept; dedup
    assert pq.terms == ["do", "tune", "spark", "jobs"]


def test_parse_query_empty_and_stopwords_only():
    assert parse_query("").terms == []
    assert parse_query("the a an").terms == []


def test_search_text_and_filter(spark):
    # AND semantics: both 'spark' and 'data' must appear
    res = search_text(_df(spark), "spark data", top_k=10).collect()
    ids = {r.doc_id for r in res}
    assert ids == {0, 4}
    # scores = BM25 of the matched docs, ranked desc
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)


def test_search_text_phrase(spark):
    res = search_text(_df(spark), '"shuffle heavy" jobs', top_k=10).collect()
    assert [r.doc_id for r in res] == [1]


# ---------------------------------------------------------------------------
# property tests (pure-Python side; the Spark twin is pinned by the tests
# above and the driver oracle)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from darkbo_spark.reference_impl import STOP_WORDS


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet='abc "xy the', max_size=60))
def test_parse_query_invariants(q):
    pq = parse_query(q)
    for t in pq.terms:
        assert t == t.lower()
        assert len(t) >= 2
        assert t not in STOP_WORDS
    assert len(pq.terms) == len(set(pq.terms))  # deduped, order-preserved
    for p in pq.phrases:
        assert '"' not in p and p == p.lower() and p.strip() == p


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["apple", "pie", "stream", "zz"]), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_bm25_spark_matches_python_on_random_corpora(spark, docs_tokens):
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs_tokens)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    postings = build_bm25_postings(df, "text", "doc_id", persist=False)
    got = {
        r.doc_id: round(r.score, 6)
        for r in bm25_score_query(postings, ["apple", "stream"], top_k=100).collect()
    }
    # plain-Python oracle over the same corpus
    n = len(rows)
    toks = {i: ts for i, ts in enumerate(docs_tokens)}
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {}
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, ts in toks.items():
        s = 0.0
        for q in {"apple", "stream"}:
            tf = ts.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            tf_norm = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
            s += round(idf * tf_norm, 6)
        if s > 0:
            want[i] = round(s, 6)
    assert got == want


def test_bm25_empty_query_terms(spark):
    postings = build_bm25_postings(_df(spark), "text", "doc_id", persist=False)
    assert bm25_score_query(postings, []).count() == 0


def test_search_text_phrase_respects_word_boundaries(spark):
    """'profitable scandal' contains 'table scan' as a raw substring but NOT
    as an analyzed phrase — positional semantics must reject it."""
    import pandas as pd

    rows = [(0, "a profitable scandal emerged"), (1, "run a table scan now"),
            (2, "table, scan")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r.doc_id for r in search_text(df, '"table scan"', top_k=10).collect()}
    # doc 2 matches too: analyzed phrases tokenize away punctuation
    # (Whoosh positional adjacency over \w+ tokens)
    assert got == {1, 2}
