"""Span-level (substring) dedup twins: the cross-document duplicate-span
operator (operators/spans.py) and its trim, driver-oracled end to end in
portable hash mode — DuckDB replays windowing → fingerprint family group →
first-occurrence exemption → adjacent-window merge → token-range trim.

The corpus plants real boilerplate: every 7th document (doc_id < 300) is
prefixed with the first 12 tokens of doc 1 (a SQL-visible derivation, so
both engines build the identical corpus) — the license-header shape that
document-level dedup cannot see.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.queries.common import _q, _t

_SPAN_N = 8
_SPAN_ID_LIMIT = 300
_SPAN_FP_CAP = 100  # degenerate-fingerprint guard, exercised in the oracle

# the portable 60-bit hash in DuckDB dialect (shared with dedup_queries)
_PH60 = "CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"


def _span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _SPAN_ID_LIMIT)
        .select("doc_id", "text")
    )
    boiler = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 1)
        .select(
            F.array_join(
                F.slice(F.array_remove(F.split(F.lower(F.col("text")), " +"), ""), 1, 12),
                " ",
            ).alias("_boiler")
        )
    )
    return docs.crossJoin(F.broadcast(boiler)).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat_ws(" ", F.col("_boiler"), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


# dialect-neutral SQL rendering of the SAME corpus
_SPAN_CORPUS_SQL = f"""
(SELECT d.doc_id,
        CASE WHEN d.doc_id % 7 = 0 THEN b.boiler || ' ' || d.text ELSE d.text END AS text
 FROM (SELECT doc_id, text FROM documents WHERE doc_id < {_SPAN_ID_LIMIT}) d,
      (SELECT array_to_string(list_slice(list_filter(
                string_split_regex(lower(text), ' +'), x -> x <> ''), 1, 12), ' ') AS boiler
       FROM documents WHERE doc_id = 1) b)
"""


def _span_ctes(keep_first: bool) -> str:
    """CTE block ending in `spans` — shared by the spans oracle and the
    trim oracle so span derivation can never diverge between them. Mirrors
    operators/spans.py stage for stage: window fingerprints (md5-60 over
    the window string), family group with the doc-count band and MIN-of-
    struct first occurrence, optional first-occurrence exemption, and the
    lag/flag/running-sum merge of adjacent windows."""
    n = _SPAN_N
    keep_sql = (
        "\n    AND NOT (w.doc_id = struct_extract(fam.first_occ, 'd')"
        " AND w.pos = struct_extract(fam.first_occ, 'p'))"
        if keep_first
        else ""
    )
    return f"""corpus AS (SELECT doc_id, text FROM {_SPAN_CORPUS_SQL} c),
dtoks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'), x -> x <> '') AS toks
  FROM corpus
),
wf AS (
  SELECT doc_id, generate_subscripts(fps, 1) - 1 AS pos, unnest(fps) AS fp
  FROM (
    SELECT doc_id,
           list_transform(range(0, len(toks) - {n} + 1),
             i -> {_PH60.format(s=f"array_to_string(list_slice(toks, i + 1, i + {n}), ' ')")}) AS fps
    FROM dtoks WHERE len(toks) >= {n}
  )
),
fam AS (
  SELECT fp, COUNT(DISTINCT doc_id) AS nd,
         MIN({{'d': doc_id, 'p': pos}}) AS first_occ
  FROM wf GROUP BY fp
),
marked AS (
  SELECT w.doc_id, w.pos
  FROM wf w JOIN fam USING (fp)
  WHERE fam.nd >= 2 AND fam.nd <= {_SPAN_FP_CAP}{keep_sql}
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {n}
              THEN 0 ELSE 1 END AS new_flag
  FROM marked
),
grp AS (
  SELECT doc_id, pos,
         SUM(new_flag) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
),
spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {n} AS span_end,
         CAST(COUNT(*) AS BIGINT) AS n_windows
  FROM grp GROUP BY doc_id, g
)"""


_SPANS_ORACLE = f"""
WITH {_span_ctes(keep_first=False)}
SELECT doc_id, span_start, span_end, n_windows FROM spans
ORDER BY doc_id, span_start
"""

_TRIM_ORACLE = f"""
WITH {_span_ctes(keep_first=True)},
tokpos AS (
  SELECT doc_id, unnest(toks) AS token, generate_subscripts(toks, 1) - 1 AS pos
  FROM dtoks
),
kept AS (
  SELECT t.doc_id, t.token, t.pos
  FROM tokpos t
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = t.doc_id
                      AND t.pos >= s.span_start AND t.pos < s.span_end)
)
SELECT c.doc_id, COALESCE(k.txt, '') AS text
FROM corpus c LEFT JOIN (
  SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS txt FROM kept GROUP BY doc_id
) k USING (doc_id)
ORDER BY c.doc_id
"""


@_q("dup_spans_x", _SPANS_ORACLE)
def dup_spans_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-SPAN detection hash-oracled end to end:
    planted 12-token boilerplate prefixes (and any natural 8-gram overlap)
    must surface as identical maximal (doc_id, span_start, span_end)
    ranges in both engines — window fingerprints grouped BY FINGERPRINT
    across the corpus (one shuffle, no all-pairs join), degenerate
    fingerprints capped, adjacent windows merged."""
    from darkbo_spark.operators.spans import duplicate_spans

    corpus = _span_corpus(spark, sf_dir)
    return duplicate_spans(
        corpus,
        n=_SPAN_N,
        min_docs=2,
        max_docs_per_fp=_SPAN_FP_CAP,
        hash_mode="portable",
    ).select(
        "doc_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        "n_windows",
    )


@_q("dup_span_trim_x", _TRIM_ORACLE)
def dup_span_trim_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL operator hash-oracled: spans derived with
    keep_first=True (the corpus-wide first occurrence of each duplicated
    window is exempt), every covered token trimmed — duplicated content
    survives exactly once corpus-wide, and DuckDB reconstructs the
    identical trimmed text for all {_SPAN_ID_LIMIT} documents."""
    from darkbo_spark.operators.spans import duplicate_spans, trim_duplicate_spans

    corpus = _span_corpus(spark, sf_dir)
    spans = duplicate_spans(
        corpus,
        n=_SPAN_N,
        min_docs=2,
        max_docs_per_fp=_SPAN_FP_CAP,
        keep_first=True,
        hash_mode="portable",
    )
    return trim_duplicate_spans(corpus, spans)
