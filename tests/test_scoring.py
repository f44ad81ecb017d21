"""A1 relevance scoring: the native column expression must equal the
plain-Python oracle (reference math, ai_worker.py:337-411 behavior) on
every document."""

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

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
def test_scoring_oracle_properties(q, doc):
    s = ref.relevance_score(q.lower(), doc.lower(), "")
    assert s >= 0.0
    assert s * 2 == int(s * 2)  # all increments are multiples of 0.5
