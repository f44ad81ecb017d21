"""Line-level boilerplate dedup twins (operators/lines.py), driver-oracled.

The documents table has no newlines, so both engines construct the SAME
lined corpus from it: tokens grouped 10 per line, joined with \\n; then
boilerplate is PLANTED as SQL-visible derivations — every doc_id%5==0
document is prefixed with doc 2's first line, every doc_id%3==0 document
is suffixed with doc 2's second line — the nav-bar/footer shape that
document- and span-level dedup are the wrong granularity for.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.queries.common import _q, _t

_LINE_TOKS = 10
_LINE_MIN_DOCS = 2


def _line_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.array_remove(F.split(F.lower(F.col("text")), " +"), "")
    n_lines = F.ceil(F.size(toks) / F.lit(_LINE_TOKS)).cast("int")
    lines = F.when(F.size(toks) > 0, F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.array_join(
            F.slice(toks, (i - F.lit(1)) * _LINE_TOKS + F.lit(1), _LINE_TOKS), " "
        ),
    )).otherwise(F.array().cast("array<string>"))
    lined = docs.select("doc_id", lines.alias("ls"))
    boiler = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 2)
        .select(
            F.array_join(
                F.slice(F.array_remove(F.split(F.lower(F.col("text")), " +"), ""), 1, _LINE_TOKS), " "
            ).alias("_ba"),
            F.array_join(
                F.slice(F.array_remove(F.split(F.lower(F.col("text")), " +"), ""), _LINE_TOKS + 1, _LINE_TOKS), " "
            ).alias("_bb"),
        )
    )
    with_a = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.array(F.col("_ba")), F.col("ls"))
    ).otherwise(F.col("ls"))
    return (
        lined.crossJoin(F.broadcast(boiler))
        .select(
            "doc_id",
            F.array_join(
                F.when(F.col("doc_id") % 3 == 0, F.concat(with_a, F.array(F.col("_bb"))))
                .otherwise(with_a),
                "\n",
            ).alias("text"),
        )
    )


# the SAME corpus as DuckDB CTEs, ending in `corpus(doc_id, ls)` where ls
# is the line LIST (text = array_to_string(ls, \n) — lines contain no \n,
# so operating on ls directly is exactly the split of the joined text)
_LINE_CORPUS_CTES = f"""base AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
lined AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(toks) / {_LINE_TOKS}.0) AS BIGINT)),
           i -> array_to_string(list_slice(toks, i * {_LINE_TOKS} + 1, i * {_LINE_TOKS} + {_LINE_TOKS}), ' ')) AS ls
  FROM base
),
boiler AS (
  SELECT array_to_string(list_slice(toks, 1, {_LINE_TOKS}), ' ') AS ba,
         array_to_string(list_slice(toks, {_LINE_TOKS} + 1, {_LINE_TOKS} + {_LINE_TOKS}), ' ') AS bb
  FROM base WHERE doc_id = 2
),
corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 3 = 0
              THEN list_append(CASE WHEN d.doc_id % 5 = 0 THEN list_prepend(b.ba, d.ls) ELSE d.ls END, b.bb)
              ELSE CASE WHEN d.doc_id % 5 = 0 THEN list_prepend(b.ba, d.ls) ELSE d.ls END END AS ls
  FROM lined d, boiler b
),
lns AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS line_no, unnest(ls) AS line
  FROM corpus
)"""

_LINE_COUNTS_ORACLE = f"""
WITH {_LINE_CORPUS_CTES}
SELECT md5(line) AS line_fp,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM lns
WHERE trim(line) <> ''
GROUP BY line
HAVING COUNT(DISTINCT doc_id) >= {_LINE_MIN_DOCS}
"""


@_q("line_dedup_counts_x", _LINE_COUNTS_ORACLE)
def line_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line duplication profile: every line repeated across
    >= {min} docs, with its doc- and occurrence-counts — the boilerplate
    classifier's input, hash-verified against a serial DuckDB replay."""
    from darkbo_spark.operators.lines import line_stats

    corpus = _line_corpus(spark, sf_dir)
    return (
        line_stats(corpus)
        .filter(F.col("n_docs") >= _LINE_MIN_DOCS)
        .select(
            F.md5(F.col("line")).alias("line_fp"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_occ").cast("bigint").alias("n_occ"),
        )
    )


_LINE_TRIM_ORACLE = f"""
WITH {_LINE_CORPUS_CTES},
boiler_lines AS (
  SELECT line FROM lns WHERE trim(line) <> ''
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {_LINE_MIN_DOCS}
),
kept AS (
  SELECT l.doc_id, l.line_no, l.line
  FROM lns l LEFT JOIN boiler_lines b USING (line)
  WHERE b.line IS NULL
),
rebuilt AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY line_no), chr(10)) AS text,
         CAST(COUNT(*) AS BIGINT) AS n_lines_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total FROM lns GROUP BY doc_id)
SELECT t.doc_id,
       md5(COALESCE(r.text, '')) AS clean_fp,
       COALESCE(r.n_lines_kept, 0) AS n_lines_kept,
       t.n_total - COALESCE(r.n_lines_kept, 0) AS n_lines_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


@_q("line_dedup_trim_x", _LINE_TRIM_ORACLE)
def line_dedup_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal end-to-end: documents rebuilt from surviving
    lines in original order (md5 over the rebuilt text hash-matches the
    DuckDB replay, so ordering and joining are byte-faithful), plus
    kept/removed accounting per document."""
    from darkbo_spark.operators.lines import dedup_lines

    corpus = _line_corpus(spark, sf_dir)
    return dedup_lines(corpus, min_docs=_LINE_MIN_DOCS).select(
        "doc_id",
        F.md5(F.col("text")).alias("clean_fp"),
        "n_lines_kept",
        "n_lines_removed",
    )
