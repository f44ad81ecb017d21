"""Boolean query-syntax twin: the Whoosh QueryParser OR / NOT extension
(operators/queryparse.py parse_boolean_query / search_boolean),
driver-oracled. Closes the last reference-parser breadth gap: the
reference's own flows only exercise the default AND group (the oracled
parsed_search family), but Whoosh accepts OR/NOT and a drop-in engine
should too.

The raw query exercises every operator path at once: a phrase-only OR
clause, a term clause with a NOT exclusion — matching is the union of
clause matches, negation filters candidates (never scores), and ranking
is BM25 over all positive analyzed words, replayed in SQL over the shared
BM25 CTEs.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from darkbo_spark.operators.queryparse import parse_boolean_query, phrase_regex
from darkbo_spark.queries.common import _q, _t
from darkbo_spark.queries.retrieval import _BM25_CTES, _BM25_W

_BOOL_QUERY = '"window agg" OR batch NOT vector'

_BQ = parse_boolean_query(_BOOL_QUERY)
# parsed-shape pins for _BQ/_GQ live in tests/test_boolean_search.py
# (an import-time assert would vanish under `python -O` and, when it did
# fire, break importing the whole queries package)

_RANK = sorted({"window", "agg", "batch"})

_BOOLEAN_ORACLE = f"""
WITH {_BM25_CTES},
c1 AS (
  SELECT doc_id FROM documents
  WHERE regexp_matches(lower(text), '{phrase_regex("window agg")}')
),
negv AS (SELECT DISTINCT doc_id FROM tf WHERE token = 'vector'),
c2 AS (
  SELECT DISTINCT doc_id FROM tf
  WHERE token = 'batch' AND doc_id NOT IN (SELECT doc_id FROM negv)
),
matched AS (SELECT doc_id FROM c1 UNION SELECT doc_id FROM c2)
SELECT tf.doc_id,
       CAST(SUM(CAST({_BM25_W} AS DECIMAL(18,6))) AS DOUBLE) AS score
FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
WHERE token IN ({", ".join(repr(t) for t in _RANK)})
  AND tf.doc_id IN (SELECT doc_id FROM matched)
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


@_q("parsed_search_boolean_x", _BOOLEAN_ORACLE)
def parsed_search_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.operators.queryparse import search_boolean

    docs = _t(spark, sf_dir, "documents")
    return search_boolean(docs, _BOOL_QUERY, "text", "doc_id", top_k=10)


# fielded syntax: field:value factors over real metadata columns — the
# last Whoosh-parser breadth gap (fields analyzed as exact lowercase
# matches, negatable, composing with terms/OR exactly like Whoosh)
_FIELDED_QUERY = "lang:en batch NOT source:src3 OR scan"

_FIELDED_ORACLE = f"""
WITH {_BM25_CTES},
c1 AS (
  SELECT DISTINCT tf.doc_id FROM tf
  JOIN documents d USING (doc_id)
  WHERE token = 'batch'
    AND lower(d.lang) = 'en' AND NOT lower(d.source) = 'src3'
),
c2 AS (SELECT DISTINCT doc_id FROM tf WHERE token = 'scan'),
matched AS (SELECT doc_id FROM c1 UNION SELECT doc_id FROM c2)
SELECT tf.doc_id,
       CAST(SUM(CAST({_BM25_W} AS DECIMAL(18,6))) AS DOUBLE) AS score
FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
WHERE token IN ('batch', 'scan')
  AND tf.doc_id IN (SELECT doc_id FROM matched)
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


@_q("parsed_search_fielded_x", _FIELDED_ORACLE)
def parsed_search_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.operators.queryparse import search_boolean

    docs = _t(spark, sf_dir, "documents")
    return search_boolean(
        docs, _FIELDED_QUERY, "text", "doc_id", top_k=10,
        fields=("lang", "source"),
    )


# ---------------------------------------------------------------------------
# STORED serving for boolean + fielded syntax — same published
# bucket-partitioned postings SnapshotTable as parsed_search_stored
# (build once, serve EVERY query flavor from the store; the inline forms
# above rebuild postings per query, which is the self-contained twin, not
# the production path — ref behavior: ai_worker.py:154-158 opens a stored
# Whoosh index and never rebuilds). The serve scans only the token
# buckets the query touches (PartitionFilters), so OR/NOT/fielded cost
# the same handful of partitions the default-AND path pays.
# ---------------------------------------------------------------------------


@_q("parsed_search_boolean_stored", _BOOLEAN_ORACLE)
def parsed_search_boolean_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean OR/NOT search served from the STORED sparse index: the
    query's full postings token set (positive + negated + phrase rank
    words) prunes the scan to its hash buckets; same oracle as the inline
    form — store+serve+prune must lose nothing."""
    from darkbo_spark.operators.queryparse import boolean_query_tokens, search_boolean
    from darkbo_spark.queries.retrieval import stored_postings_for_tokens

    docs = _t(spark, sf_dir, "documents")
    stored = stored_postings_for_tokens(spark, sf_dir, boolean_query_tokens(_BQ))
    return search_boolean(
        docs, _BOOL_QUERY, "text", "doc_id", top_k=10, postings=stored
    )


_FQ = parse_boolean_query(_FIELDED_QUERY, fields=("lang", "source"))


@_q("parsed_search_fielded_stored", _FIELDED_ORACLE)
def parsed_search_fielded_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fielded search served from the STORED sparse index — fielded
    factors filter the docs side (pushdown-able column predicates), the
    postings scan prunes to the term buckets; hash-equal to the inline
    fielded form."""
    from darkbo_spark.operators.queryparse import boolean_query_tokens, search_boolean
    from darkbo_spark.queries.retrieval import stored_postings_for_tokens

    docs = _t(spark, sf_dir, "documents")
    stored = stored_postings_for_tokens(spark, sf_dir, boolean_query_tokens(_FQ))
    return search_boolean(
        docs, _FIELDED_QUERY, "text", "doc_id", top_k=10,
        postings=stored, fields=("lang", "source"),
    )


# ---------------------------------------------------------------------------
# Parenthesized grouping (r6 ask #7): `(scan OR batch) NOT "window agg"`
# — the group distributes over the NOT'd phrase into two DNF clauses
# (scan minus phrase, batch minus phrase), exercising group-parse,
# distribution, and phrase negation in one oracled query. Matching is
# the clause union; ranking stays BM25 over the positive words (the
# negated phrase never scores).
# ---------------------------------------------------------------------------

_GROUPED_QUERY = '(scan OR batch) NOT "window agg"'

_GQ = parse_boolean_query(_GROUPED_QUERY)

_GROUPED_ORACLE = f"""
WITH {_BM25_CTES},
ph AS (
  SELECT doc_id FROM documents
  WHERE regexp_matches(lower(text), '{phrase_regex("window agg")}')
),
c1 AS (
  SELECT DISTINCT doc_id FROM tf
  WHERE token = 'scan' AND doc_id NOT IN (SELECT doc_id FROM ph)
),
c2 AS (
  SELECT DISTINCT doc_id FROM tf
  WHERE token = 'batch' AND doc_id NOT IN (SELECT doc_id FROM ph)
),
matched AS (SELECT doc_id FROM c1 UNION SELECT doc_id FROM c2)
SELECT tf.doc_id,
       CAST(SUM(CAST({_BM25_W} AS DECIMAL(18,6))) AS DOUBLE) AS score
FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
WHERE token IN ('batch', 'scan')
  AND tf.doc_id IN (SELECT doc_id FROM matched)
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


@_q("parsed_search_grouped_x", _GROUPED_ORACLE)
def parsed_search_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.operators.queryparse import search_boolean

    docs = _t(spark, sf_dir, "documents")
    return search_boolean(docs, _GROUPED_QUERY, "text", "doc_id", top_k=10)


@_q("parsed_search_grouped_stored", _GROUPED_ORACLE)
def parsed_search_grouped_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped syntax served from the STORED sparse index — the DNF's
    full postings token set prunes the scan to its hash buckets exactly
    like the flat boolean/fielded flavors; same oracle as the inline
    grouped form (store+serve+prune must lose nothing)."""
    from darkbo_spark.operators.queryparse import (
        boolean_query_tokens,
        search_boolean,
    )
    from darkbo_spark.queries.retrieval import stored_postings_for_tokens

    docs = _t(spark, sf_dir, "documents")
    stored = stored_postings_for_tokens(spark, sf_dir, boolean_query_tokens(_GQ))
    return search_boolean(
        docs, _GROUPED_QUERY, "text", "doc_id", top_k=10, postings=stored
    )
