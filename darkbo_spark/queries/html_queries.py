"""HTML extraction parity twin: the pages-table ingest path (html:binary →
tag-stripped text → byte-identical clean_text, kg/extract.py with
re_extract_html=True) hash-verified by the driver, not just pytest.

Both engines construct the SAME html document around each documents-table
row (title, a style block, a script block containing a bare '<' — the
case a naive tag regex mangles, a body paragraph, a footer div). The
Spark side runs the REAL production UDFs (functions/textnorm.py
html_to_text_udf ∘ clean_text_udf) over utf-8 bytes; DuckDB replays the
strip in RE2 — script/style removed in separate passes because RE2 has
no backreferences (the Python side's (?is)<(script|style)...</\\1> is
equivalent on non-interleaved html) — then the clean_text chain (same
CTE structure as textops._CLEAN_ORACLE, which documents the \\s/\\x0B
dialect notes).

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.queries.common import _q, _t

# dialect-neutral html template (ASCII; no quotes that need escaping)
_HTML_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title>'"
    " || '<style>p {margin: 0; color: red}</style>'"
    " || '<script>var x = 1 < 2; doc(' || CAST(doc_id AS STRING) || ');</script>'"
    " || '</head><body><p>' || text || '</p>'"
    " || '<div class=\"footer\">generated footer</div></body></html>'"
)

_HTML_ORACLE = rf"""
WITH h AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents),
s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
s2 AS (SELECT doc_id, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]+>', ' ', 'g') AS t FROM s2),
c1 AS (SELECT doc_id, regexp_replace(t, '[ \t\n\r\f\x0B]+', ' ', 'g') AS t FROM s3),
c2 AS (SELECT doc_id, regexp_replace(t, '[^\w \t\n\r\f\x0B.,;:!?\-()\[\]"''/]', ' ', 'g') AS t FROM c1),
c3 AS (SELECT doc_id, regexp_replace(t, '\.{{3,}}', '...', 'g') AS t FROM c2),
c4 AS (SELECT doc_id, regexp_replace(t, '-{{3,}}', '---', 'g') AS t FROM c3),
c5 AS (SELECT doc_id, regexp_replace(t, '[ \t\n\r\f\x0B]+([,.;:!?])', '\1', 'g') AS t FROM c4),
c6 AS (SELECT doc_id, regexp_replace(t, '([,.;:!?])[ \t\n\r\f\x0B]*([,.;:!?])', '\1 \2', 'g') AS t FROM c5),
c7 AS (SELECT doc_id, trim(t) AS line FROM c6)
SELECT doc_id,
       md5(CASE WHEN length(line) > 10 OR (length(line) > 3 AND regexp_matches(line, '[A-Za-z]'))
                THEN line ELSE '' END) AS extract_fp
FROM c7
"""


@_q("html_extract_parity", _HTML_ORACLE)
def html_extract_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule adjacency made driver-visible: the exact production
    UDF chain for html recovery (tag strip over BYTES, then the
    byte-identical clean_text) hash-matches an independent RE2 replay."""
    from darkbo_spark.functions.textnorm import clean_text_udf, html_to_text_udf

    d = _t(spark, sf_dir, "documents")
    html_bytes = F.encode(F.expr(_HTML_SQL), "utf-8")
    return d.select(
        "doc_id",
        F.md5(clean_text_udf(html_to_text_udf(html_bytes))).alias("extract_fp"),
    )
