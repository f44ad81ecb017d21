"""Boolean query syntax (operators/queryparse.py OR/NOT extension)."""

import pandas as pd

from darkbo_spark.operators.queryparse import parse_boolean_query, search_boolean


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


CORPUS = [
    (1, "fast table scan with window agg"),
    (2, "batch job over the vector index"),
    (3, "batch merge pipeline"),
    (4, "window agg inside a batch"),
    (5, "nothing relevant here"),
]


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_or_union_and_not_exclusion(spark):
    docs = _docs(spark, CORPUS)
    # clause1: phrase "window agg" → {1,4}; clause2: batch NOT vector → {3,4}
    got = _ids(search_boolean(docs, '"window agg" OR batch NOT vector'))
    assert got == [1, 3, 4]  # union, dedup (4 matches both clauses once)


def test_not_filters_but_never_scores(spark):
    docs = _docs(spark, CORPUS)
    rows = search_boolean(docs, "batch NOT vector").collect()
    assert sorted(r.doc_id for r in rows) == [3, 4]
    # doc 2 (contains 'vector') excluded even though it has 'batch'


def test_pure_not_matches_complement(spark):
    docs = _docs(spark, CORPUS)
    got = _ids(search_boolean(docs, "NOT batch"))
    assert got == [1, 5]


def test_negated_phrase(spark):
    docs = _docs(spark, CORPUS)
    got = _ids(search_boolean(docs, 'batch NOT "vector index"'))
    assert got == [3, 4]


def test_explicit_and_is_default_group(spark):
    docs = _docs(spark, CORPUS)
    a = _ids(search_boolean(docs, "window AND agg"))
    b = _ids(search_boolean(docs, "window agg"))
    assert a == b == [1, 4]


def test_analyzer_applies_to_negation():
    bq = parse_boolean_query("batch NOT the")  # negated stopword vanishes
    assert bq.clauses[0].terms == ["batch"]
    assert bq.clauses[0].not_terms == []


def test_fielded_terms(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["batch run", "batch run", "batch run", "scanner"],
        "lang": ["en", "de", "en", "en"],
        "src": ["a", "a", "b", "a"],
    }))
    got = _ids(search_boolean(docs, "lang:en batch NOT src:b",
                              fields=("lang", "src")))
    assert got == [1]  # doc2 wrong lang, doc3 excluded src, doc4 no 'batch'
    # unknown field falls back to plain-term analysis of the token
    fallback = _ids(search_boolean(docs, "missing:x batch", fields=()))
    assert fallback == []  # 'missing'/'x' become required terms nobody has


def test_stored_postings_serving_equals_inline(spark):
    # stored serving path: search against an externally-built postings
    # frame pruned to the query's token buckets must equal the inline
    # build — boolean_query_tokens is the pruning key set
    from darkbo_spark.operators.queryparse import boolean_query_tokens
    from darkbo_spark.operators.tfidf import build_bm25_postings
    from pyspark.sql import functions as F
    from darkbo_spark.operators.dedup import portable_hash60

    docs = _docs(spark, CORPUS)
    q = '"window agg" OR batch NOT vector'
    toks = boolean_query_tokens(parse_boolean_query(q))
    assert toks == {"window", "agg", "batch", "vector"}
    buckets = 8
    full = build_bm25_postings(docs).withColumn(
        "tok_bucket", F.pmod(portable_hash60(F.col("token")), F.lit(buckets)).cast("int")
    )
    import hashlib

    need = {int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % buckets for t in toks}
    pruned = full.filter(F.col("tok_bucket").isin(sorted(need)))
    inline = {(r.doc_id, round(r.score, 9)) for r in search_boolean(docs, q).collect()}
    stored = {
        (r.doc_id, round(r.score, 9))
        for r in search_boolean(docs, q, postings=pruned).collect()
    }
    assert inline == stored and inline


# ---------------------------------------------------------------------------
# Parenthesized grouping (r6 ask #7)
# ---------------------------------------------------------------------------


def test_grouped_or_distributes_over_and():
    from darkbo_spark.operators.queryparse import parse_boolean_query

    bq = parse_boolean_query("(alpha OR beta) AND gamma")
    assert [(c.terms, c.not_terms) for c in bq.clauses] == [
        (["alpha", "gamma"], []),
        (["beta", "gamma"], []),
    ]
    # grouping really changes the parse: ungrouped binds AND tighter
    flat = parse_boolean_query("alpha OR beta AND gamma")
    assert [(c.terms, c.not_terms) for c in flat.clauses] == [
        (["alpha"], []),
        (["beta", "gamma"], []),
    ]


def test_grouped_not_applies_de_morgan():
    from darkbo_spark.operators.queryparse import parse_boolean_query

    # NOT (a OR b) = NOT a AND NOT b — folds into the enclosing clause
    bq = parse_boolean_query("gamma NOT (alpha OR beta)")
    assert [(c.terms, c.not_terms) for c in bq.clauses] == [
        (["gamma"], ["alpha", "beta"])
    ]
    # NOT (a AND b) = NOT a OR NOT b — distributes into one clause each
    bq2 = parse_boolean_query("gamma NOT (alpha beta)")
    assert [(c.terms, c.not_terms) for c in bq2.clauses] == [
        (["gamma"], ["alpha"]),
        (["gamma"], ["beta"]),
    ]


def test_nested_groups_and_mixed_factors():
    from darkbo_spark.operators.queryparse import parse_boolean_query

    bq = parse_boolean_query('((alpha OR beta) (gamma OR delta))')
    assert [c.terms for c in bq.clauses] == [
        ["alpha", "gamma"], ["alpha", "delta"],
        ["beta", "gamma"], ["beta", "delta"],
    ]
    # phrases and fielded factors distribute like terms
    bq2 = parse_boolean_query(
        '("window agg" OR lang:en) scan', fields=("lang",)
    )
    assert [
        (c.terms, c.phrases, c.fielded) for c in bq2.clauses
    ] == [
        (["scan"], ["window agg"], []),
        (["scan"], [], [("lang", "en", False)]),
    ]


def test_grouped_parse_edge_cases_stay_flat_compatible():
    from darkbo_spark.operators.queryparse import parse_boolean_query

    # unbalanced parens degrade to noise, never raise
    assert [c.terms for c in parse_boolean_query("(alpha OR beta").clauses] == [
        ["alpha"], ["beta"]
    ]
    assert [c.terms for c in parse_boolean_query("alpha) beta").clauses] == [
        ["alpha", "beta"]
    ]
    # flat-parser pins: repeated NOT doesn't toggle; stray NOT ignored;
    # explicit AND is a no-op separator
    assert [
        (c.terms, c.not_terms)
        for c in parse_boolean_query("alpha NOT NOT beta").clauses
    ] == [(["alpha"], ["beta"])]
    assert [
        (c.terms, c.not_terms) for c in parse_boolean_query("alpha NOT").clauses
    ] == [(["alpha"], [])]
    assert [
        c.terms for c in parse_boolean_query("alpha AND beta").clauses
    ] == [["alpha", "beta"]]


def test_grouped_search_matches_hand_computed(spark):
    """End-to-end matcher over a grouped query vs hand-computed doc set:
    (cat OR dog) NOT "red fox" — union of the two term matches minus
    phrase matches."""
    import pandas as pd

    from darkbo_spark.operators.queryparse import search_boolean

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": [
                    "the cat sat quietly",          # cat -> match
                    "a dog barked at dawn",         # dog -> match
                    "the cat saw a red fox today",  # cat but phrase -> out
                    "a red fox and a dog ran",      # dog but phrase -> out
                    "red fox only here",            # no positive -> out
                    "nothing relevant at all",      # no positive -> out
                ],
            }
        )
    )
    got = {
        r.doc_id
        for r in search_boolean(
            docs, '(cat OR dog) NOT "red fox"', "text", "doc_id", top_k=10
        ).collect()
    }
    assert got == {1, 2}


def test_parse_boolean_query_total_on_arbitrary_input():
    """The grouped parser is TOTAL: any string (unbalanced parens, stray
    operators, unicode, quotes) parses without raising, and every emitted
    clause is non-vacuous (has a positive factor or a negation). Grouping
    identities hold: redundant parens are no-ops."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from darkbo_spark.operators.queryparse import parse_boolean_query

    tokens = st.sampled_from(
        ["alpha", "beta", "NOT", "AND", "OR", "(", ")", '"a b"', '"', "x:y",
         "the", "a", "π", "don't"]
    )

    @given(st.lists(tokens, max_size=12).map(" ".join))
    @settings(max_examples=300, deadline=None)
    def run(q):
        bq = parse_boolean_query(q, fields=("x",))
        for c in bq.clauses:
            # every surviving clause is satisfiable-shaped: some positive
            # factor, a negated term/phrase, or a (possibly pure-negated)
            # fielded factor — pure-negated fielded clauses are kept since
            # the De Morgan fix (they match the field complement)
            assert (
                c.has_positive() or c.not_terms or c.not_phrases or c.fielded
            )

    run()

    @given(st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def run_text(q):
        parse_boolean_query(q)  # never raises

    run_text()

    def shape(bq):
        return [
            (c.terms, c.phrases, c.not_terms, c.not_phrases, c.fielded)
            for c in bq.clauses
        ]

    for plain, grouped in [
        ("alpha", "(alpha)"),
        ("alpha beta", "((alpha beta))"),
        ("alpha OR beta", "(alpha OR beta)"),
        ("alpha NOT beta", "(alpha NOT beta)"),
    ]:
        assert shape(parse_boolean_query(plain)) == shape(
            parse_boolean_query(grouped)
        ), (plain, grouped)


def test_declared_query_shapes_pinned():
    """Shape pins for the driver-declared boolean/grouped queries (moved
    from import-time asserts in queries/boolean_queries.py — an
    import-time AssertionError would break the whole queries package and
    vanish under `python -O`)."""
    from darkbo_spark.queries.boolean_queries import _BQ, _GQ

    assert [c.phrases for c in _BQ.clauses] == [["window agg"], []]
    assert _BQ.clauses[1].terms == ["batch"]
    assert _BQ.clauses[1].not_terms == ["vector"]
    assert [(c.terms, c.not_phrases) for c in _GQ.clauses] == [
        (["scan"], ["window agg"]),
        (["batch"], ["window agg"]),
    ]


def test_pure_negated_fielded_clause_survives():
    """NOT (lang:en AND scan) distributes to [NOT lang:en] OR [NOT scan];
    the pure-negated-fielded clause must stay in the DNF (it is
    satisfiable) instead of being silently dropped."""
    from darkbo_spark.operators.queryparse import parse_boolean_query

    bq = parse_boolean_query("NOT (lang:en AND scan)", fields=("lang",))
    assert len(bq.clauses) == 2
    neg_fielded = [c for c in bq.clauses if c.fielded]
    assert neg_fielded and neg_fielded[0].fielded == [("lang", "en", True)]
    neg_term = [c for c in bq.clauses if c.not_terms]
    assert neg_term and neg_term[0].not_terms == ["scan"]
