"""TF-IDF postings + query scoring vs a plain-Python oracle."""

import math
from collections import Counter

import pandas as pd

from darkbo_spark.operators.tfidf import build_postings, score_query

DOCS = [
    (0, "spark table scan fast table"),
    (1, "window agg over table"),
    (2, "nothing relevant here"),
    (3, "scan scan scan"),
]


def _oracle_scores(terms):
    n = len(DOCS)
    tf = {i: Counter(t.split()) for i, t in DOCS}
    df = Counter()
    for i, c in tf.items():
        for tok in c:
            df[tok] += 1
    idf = {t: math.log((n + 1) / (df[t] + 1)) + 1 for t in df}
    out = {}
    for i, c in tf.items():
        s = sum(c[t] * idf[t] for t in terms if t in c)
        if s:
            out[i] = round(s, 6)
    return out


def test_postings_and_scores_match_oracle(spark):
    docs = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    postings = build_postings(docs)
    got_tf = {
        (r.doc_id, r.token): (r.tf, round(r.idf, 6))
        for r in postings.collect()
    }
    assert got_tf[(0, "table")][0] == 2
    assert got_tf[(3, "scan")][0] == 3

    scored = score_query(postings, ["table", "scan"], top_k=4).collect()
    got = {r.doc_id: r.score for r in scored}
    want = _oracle_scores(["table", "scan"])
    assert got == want
    # ranking: doc0 (2×table + scan) above doc3 (3×scan, rarer? same idf)
    order = [r.doc_id for r in scored]
    assert order == sorted(want, key=lambda i: (-want[i], i))
