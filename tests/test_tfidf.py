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


def test_incremental_tf_index_equals_full_rebuild(spark):
    """merge_tf_delta (upsert + integer stat deltas) must reproduce the
    full rebuild EXACTLY — rows and stats — including the replace path
    (docs re-ingested with changed text), and the query-time weights must
    equal build_bm25_postings' for the same terms."""
    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.operators.tfidf import (
        bm25_weights_for_terms,
        build_bm25_postings,
        build_tf_index,
        merge_tf_delta,
    )

    rows = [(i, f"tok{i % 5} shared word number{i}") for i in range(30)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    # stale initial state: every 4th doc carries old text
    stale = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.lit("obsolete body"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    tf0, st0 = build_tf_index(stale)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    tf1, st1 = merge_tf_delta(tf0, st0, delta)

    tf_full, st_full = build_tf_index(docs)
    assert {tuple(r) for r in tf1.collect()} == {tuple(r) for r in tf_full.collect()}
    assert st1.collect() == st_full.collect()

    terms = ["shared", "tok1", "word"]
    w_inc = {(r.token, r.doc_id): r.w for r in bm25_weights_for_terms(tf1, st1, terms).collect()}
    w_full = {
        (r.token, r.doc_id): r.w
        for r in build_bm25_postings(docs, persist=False)
        .filter(F.col("token").isin(terms))
        .collect()
    }
    assert w_inc == w_full and len(w_inc) > 0


def test_tf_index_counts_empty_docs(spark):
    """An empty/whitespace-only document has no postings but must still
    count toward n_docs (and avgdl's denominator) exactly like
    build_bm25_postings' _corpus_n — and a delta replacing an empty doc
    with text (or text with empty) must keep incremental ≡ full rebuild."""
    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.operators.tfidf import (
        bm25_weights_for_terms,
        build_bm25_postings,
        build_tf_index,
        merge_tf_delta,
    )

    rows = [(0, "alpha beta"), (1, ""), (2, "   "), (3, "beta gamma beta")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    tf, st = build_tf_index(docs)
    stats = st.collect()[0]
    assert stats.n_docs == 4 and stats.sum_dl == 5
    # empty docs appear as null-token sentinel rows (complete doc roster)
    sentinels = {r.doc_id for r in tf.filter(F.col("token").isNull()).collect()}
    assert sentinels == {1, 2}

    # query-time weights must equal the full build (whose avgdl also
    # divides by ALL docs) — the empty docs shift avgdl for every weight
    terms = ["beta", "alpha"]
    w_inc = {(r.token, r.doc_id): r.w for r in bm25_weights_for_terms(tf, st, terms).collect()}
    w_full = {
        (r.token, r.doc_id): r.w
        for r in build_bm25_postings(docs, persist=False)
        .filter(F.col("token").isin(terms))
        .collect()
    }
    assert w_inc == w_full and len(w_inc) > 0

    # replace empty→text and text→empty in one delta; must equal rebuild
    delta = spark.createDataFrame(
        pd.DataFrame([(1, "delta epsilon"), (3, "")], columns=["doc_id", "text"])
    )
    tf1, st1 = merge_tf_delta(tf, st, delta)
    final = [(0, "alpha beta"), (1, "delta epsilon"), (2, "   "), (3, "")]
    tf_full, st_full = build_tf_index(
        spark.createDataFrame(pd.DataFrame(final, columns=["doc_id", "text"]))
    )
    assert {tuple(r) for r in tf1.collect()} == {tuple(r) for r in tf_full.collect()}
    assert st1.collect() == st_full.collect()


def test_incremental_merge_property_fuzz(spark):
    """Hypothesis fuzz: for random corpora and random overlapping deltas,
    merge_tf_delta(initial, delta) must reproduce build_tf_index over the
    final corpus exactly — rows and stats."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from darkbo_spark.operators.tfidf import build_tf_index, merge_tf_delta

    word = st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"])
    # min_size=0 → empty docs appear in the fuzz (the n_docs-from-dl-rows
    # bug class this fuzz previously could not reach)
    text = st.lists(word, min_size=0, max_size=6).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(
        initial=st.dictionaries(st.integers(0, 9), text, min_size=1, max_size=6),
        delta=st.dictionaries(st.integers(0, 9), text, min_size=1, max_size=4),
    )
    def check(initial, delta):
        def df(d):
            return spark.createDataFrame(
                pd.DataFrame(sorted(d.items()), columns=["doc_id", "text"])
            )

        tf0, st0 = build_tf_index(df(initial))
        tf1, st1 = merge_tf_delta(tf0, st0, df(delta))
        final = dict(initial)
        final.update(delta)
        tf_full, st_full = build_tf_index(df(final))
        assert {tuple(r) for r in tf1.collect()} == {
            tuple(r) for r in tf_full.collect()
        }
        assert st1.collect() == st_full.collect()

    check()
