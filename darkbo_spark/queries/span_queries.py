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


def _span_ctes(
    keep_first: bool,
    corpus_sql: str = None,  # defaults to _SPAN_CORPUS_SQL below
    tokenizer: str = "space",
) -> str:
    """CTE block ending in `spans` — shared by the spans oracle and the
    trim oracle so span derivation can never diverge between them. Mirrors
    operators/spans.py stage for stage: window fingerprints (md5-60 over
    the window string), family group with the doc-count band and MIN-of-
    struct first occurrence, optional first-occurrence exemption, and the
    lag/flag/running-sum merge of adjacent windows."""
    n = _SPAN_N
    corpus_sql = corpus_sql or _SPAN_CORPUS_SQL
    keep_sql = (
        "\n    AND NOT (w.doc_id = struct_extract(fam.first_occ, 'd')"
        " AND w.pos = struct_extract(fam.first_occ, 'p'))"
        if keep_first
        else ""
    )
    if tokenizer == "space":
        toks_expr = "list_filter(string_split_regex(lower(text), ' +'), x -> x <> '')"
    elif tokenizer == "ws":
        # byte-faithful family: positions index \S+ runs of the ORIGINAL
        # text; lowercasing happens only inside the fingerprint string
        toks_expr = r"list_transform(regexp_extract_all(text, '\S+'), t -> lower(t))"
    else:  # pragma: no cover - registration-time constant
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return f"""corpus AS (SELECT doc_id, text FROM {corpus_sql} c),
dtoks AS (
  SELECT doc_id, {toks_expr} AS toks
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


# ---------------------------------------------------------------------------
# byte-faithful trim (trim_spans_exact over tokenizer="ws" spans)
# ---------------------------------------------------------------------------
# The parquet documents are single-spaced lowercase ASCII, which would make
# a byte-fidelity oracle vacuous — so both engines derive the SAME "messy"
# corpus first (deterministic replaces injecting case, tabs, newlines,
# double spaces, and leading whitespace), then plant the case-preserving
# boilerplate prefix. Byte fidelity is then load-bearing: the normalized
# trim would hash-mismatch on every untouched document.


def _span_corpus_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _SPAN_ID_LIMIT)
        .select("doc_id", "text")
    )
    messy = F.replace(F.col("text"), F.lit(" the "), F.lit("\tThe  "))
    messy = F.replace(messy, F.lit(" and "), F.lit("\n And "))
    messy = F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("  "), messy)).otherwise(
        messy
    )
    base = docs.select("doc_id", messy.alias("text"))
    boiler = (
        base.filter(F.col("doc_id") == 1)
        .select(
            F.array_join(
                F.slice(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0), 1, 12),
                " ",
            ).alias("_boiler")
        )
    )
    return base.crossJoin(F.broadcast(boiler)).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat_ws(" ", F.col("_boiler"), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


_BYTES_MESSY_SQL = (
    "(CASE WHEN doc_id % 5 = 0 THEN '  ' ELSE '' END || "
    "replace(replace(text, ' the ', chr(9) || 'The  '), "
    "' and ', chr(10) || ' And '))"
)

_BYTES_CORPUS_SQL = f"""
(WITH messy AS (
   SELECT doc_id, {_BYTES_MESSY_SQL} AS text
   FROM documents WHERE doc_id < {_SPAN_ID_LIMIT}
 )
 SELECT m.doc_id,
        CASE WHEN m.doc_id % 7 = 0 THEN b.boiler || ' ' || m.text ELSE m.text END AS text
 FROM messy m,
      (SELECT array_to_string(list_slice(
                regexp_extract_all(text, '\\S+'), 1, 12), ' ') AS boiler
       FROM messy WHERE doc_id = 1) b)
"""

# covered(i): does any of this doc's spans contain token i (NULL-safe —
# docs without spans carry a NULL list)
def _covered(i: str) -> str:
    return (
        f"coalesce(len(list_filter(_sarr, "
        f"r -> {i} >= r.span_start AND {i} < r.span_end)) > 0, FALSE)"
    )


_TRIM_BYTES_ORACLE = f"""
WITH {_span_ctes(keep_first=True, corpus_sql=_BYTES_CORPUS_SQL, tokenizer="ws")},
sp AS (
  SELECT doc_id, list({{'span_start': span_start, 'span_end': span_end}}) AS sarr
  FROM spans GROUP BY doc_id
),
parts AS (
  SELECT c.doc_id,
         regexp_extract_all(c.text, '\\S+') AS _toks,
         regexp_extract_all(c.text, '\\s+') AS _seps,
         coalesce(regexp_extract(c.text, '^\\s*'), '') AS _lead,
         s.sarr AS _sarr
  FROM corpus c LEFT JOIN sp s USING (doc_id)
)
SELECT doc_id,
  _lead || array_to_string(
    list_transform(range(0, len(_toks)), i ->
      (CASE WHEN NOT {_covered("i")} THEN _toks[i + 1] ELSE '' END)
      ||
      (CASE WHEN NOT ({_covered("i")} AND {_covered("(i + 1)")})
            THEN coalesce(_seps[i + 1 + (CASE WHEN len(_lead) > 0 THEN 1 ELSE 0 END)], '')
            ELSE '' END)
    ), '') AS text
FROM parts
ORDER BY doc_id
"""


@_q("dup_span_trim_bytes_x", _TRIM_BYTES_ORACLE)
def dup_span_trim_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-FAITHFUL span trim hash-oracled end to end: spans derived over
    \\S+ token positions of the original (messy) text, excised as exact
    byte ranges via the lead/tok/sep decomposition — untouched documents
    come back byte-identical (casing, tabs, runs of spaces all preserved),
    and DuckDB reproduces every trimmed byte. Complements dup_span_trim_x
    (the dedup family's normalized form)."""
    from darkbo_spark.operators.spans import duplicate_spans, trim_spans_exact

    corpus = _span_corpus_bytes(spark, sf_dir)
    spans = duplicate_spans(
        corpus,
        n=_SPAN_N,
        min_docs=2,
        max_docs_per_fp=_SPAN_FP_CAP,
        keep_first=True,
        hash_mode="portable",
        tokenizer="ws",
    )
    return trim_spans_exact(corpus, spans)
