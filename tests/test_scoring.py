"""A1 relevance scoring: the native column expression must equal the
plain-Python oracle (reference math, ai_worker.py:337-411 behavior) on
every document."""

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import example, given, settings, strategies as st

from darkbo_spark import reference_impl as ref
from darkbo_spark.operators.scoring import relevance_score_col

QUERIES = [
    "fast table scan with window agg",
    "what is the quick answer",
    "zzz nothing matches here",
    "the a an is",  # all stopwords
    "table",
]

DOCS = [
    ("fast table scan is a common pattern for window agg work", "src a"),
    ("slow row store", "fast table scan with window agg inside source"),
    ("the answer is quick", ""),
    ("", ""),
]


def test_native_scoring_matches_oracle(spark):
    pdf = pd.DataFrame(DOCS, columns=["primary", "secondary"])
    df = spark.createDataFrame(pdf)
    for q in QUERIES:
        got = [
            r.s
            for r in df.select(
                relevance_score_col(q, F.col("primary"), F.col("secondary")).alias("s")
            ).collect()
        ]
        want = [ref.relevance_score(q.lower(), p, s) for p, s in DOCS]
        assert got == want, q


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abc table scan", min_size=1, max_size=30),
    st.text(alphabet="abc table scan xyz", max_size=60),
)
@example(q="a a b", doc="a").via("discovered failure")
def test_scoring_oracle_properties(q, doc):
    # NOT all increments are multiples of 0.5: the content-ratio bonus adds
    # ratio*1.0 and the coverage bonus adds total/len(words) — both can be
    # fractions like 2/3 (e.g. q='a a b', doc='a' → 5.6667). Cross-engine
    # hash parity holds because Spark and DuckDB evaluate the identical
    # double expression in the identical order, not because sums are exact.
    s = ref.relevance_score(q.lower(), doc.lower(), "")
    assert s >= 0.0
    assert s == ref.relevance_score(q.lower(), doc.lower(), "")  # deterministic
    # The fixed-increment part IS half-integral: strip the two ratio bonuses
    # and what remains must be a multiple of 0.5.
    words = ref._WORD.findall(q.lower())
    content = [w for w in words if w not in ref.STOP_WORDS]
    d = doc.lower()
    hits = sum(1 for w in words if w in d)
    c_hits = sum(1 for w in content if w in d)
    frac = 0.0
    if content and 0.5 <= c_hits / len(content) < 1.0:
        frac += c_hits / len(content)
    if words and hits / len(words) >= 0.5:
        frac += hits / len(words)
    fixed = s - frac
    assert abs(fixed * 2 - round(fixed * 2)) < 1e-9
