"""Anchor-text entity-evidence twin (operators/anchors.py), driver-oracled.

Both engines build the SAME html around each documents row via one shared
SQL expression string (Spark evaluates it with F.expr, DuckDB verbatim —
the linkgraph-twin pattern): an entity anchor whose link text is a
dictionary surface form (cycling canonical / ' Inc' / 'The … Company' so
the leading-'the ' norm strip is under the driver hash), a junk anchor
('click here') that must NOT link, a relative link and a mailto: whose
texts ARE entity surface forms but which the extractor must ignore, and
an absolute link with whitespace-only text that the trim filter drops.
The Spark side runs the production decode → fragment regexp → href/text
extraction → broadcast dictionary join → two-level rollup over utf-8
BYTES; DuckDB replays every step including the dictionary
(kg/oracle_twin._dict_sql — sha256 eids reproduce natively).

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.kg.oracle_twin import ADJ, NOUN, _dict_sql, _pick
from darkbo_spark.operators.domains import sql_host_of
from darkbo_spark.queries.common import _q, _t

# entity index e = doc_id % 24 covers all 6×4 company canonicals
_COMP_SQL = (
    f"{_pick(ADJ, '(doc_id % 24) % 6')} || ' ' || "
    f"{_pick(NOUN, 'CAST(((doc_id % 24) - (doc_id % 24) % 6) / 6 AS INT)')}"
)

# alias variant cycles the three dictionary surface forms
_ATEXT_SQL = (
    f"(CASE doc_id % 3 WHEN 0 THEN {_COMP_SQL} "
    f"WHEN 1 THEN {_COMP_SQL} || ' Inc' "
    f"ELSE 'The ' || {_COMP_SQL} || ' Company' END)"
)

_SRC_URL_SQL = "'https://www.s' || CAST(doc_id % 23 AS STRING) || '.com/p/' || CAST(doc_id AS STRING)"
_DST_SQL = "'https://brand' || CAST((doc_id * 7 + 1) % 13 AS STRING) || '.com'"

_HTML_SQL = (
    "'<html><body>'"
    f" || '<a href=\"' || {_DST_SQL} || '/x\">' || {_ATEXT_SQL} || '</a>'"
    " || '<a href=\"https://other' || CAST(doc_id % 7 AS STRING) ||"
    " '.net/y\">click here</a>'"
    " || '<a href=\"/nav\">Acme Systems</a>'"
    " || '<a href=\"mailto:a@b.c\">Quantum Labs</a>'"
    " || '<a href=\"https://empty.example/z\">  </a>'"
    " || '</body></html>'"
)

_NORM = "regexp_replace(lower(trim({c})), '^the ', '')"

_ANCHOR_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_SRC_URL_SQL} AS url, {_HTML_SQL} AS html FROM documents
),
frag AS (
  SELECT {sql_host_of('url')} AS src_host,
         unnest(regexp_extract_all(html, '<a href="[^"]*"[^>]*>[^<]*</a>', 0)) AS frag
  FROM h
),
ax AS (
  SELECT src_host,
         regexp_extract(frag, 'href="([^"]+)"', 1) AS href,
         trim(regexp_extract(frag, '>([^<]*)</a>', 1)) AS anchor_text
  FROM frag
),
a AS (
  SELECT src_host, {sql_host_of('href')} AS dst_host, anchor_text
  FROM ax
  WHERE regexp_matches(href, '^(?i)https?://') AND anchor_text <> ''
),
a2 AS (SELECT * FROM a WHERE dst_host <> '' AND src_host <> ''),
{_dict_sql().lstrip()},
m AS (
  SELECT a2.dst_host, d.eid, a2.src_host
  FROM a2 JOIN dict_norm d ON {_NORM.format(c='a2.anchor_text')} = d.alias_norm
),
per_src AS (
  SELECT dst_host, eid, src_host, COUNT(*) AS n FROM m GROUP BY 1, 2, 3
)
SELECT dst_host, eid,
       CAST(SUM(n) AS BIGINT) AS n_mentions,
       CAST(COUNT(*) AS BIGINT) AS n_src_hosts
FROM per_src
GROUP BY dst_host, eid
"""


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        F.expr(_SRC_URL_SQL).alias("url"),
        F.encode(F.expr(_HTML_SQL), "utf-8").alias("html"),
    )


@_q("anchor_entity_links_x", _ANCHOR_ORACLE)
def anchor_entity_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text entity evidence under the driver hash: fragment
    extraction from html BYTES, href/text split, scheme + emptiness
    filters, kg.link._norm normalization, broadcast dictionary join with
    the min-eid tie rule, and the two-level (mentions, distinct-source)
    rollup — every step replayed independently in DuckDB."""
    from darkbo_spark.kg.oracle_twin import twin_entity_dict
    from darkbo_spark.operators.anchors import (
        anchor_entity_evidence,
        extract_anchor_texts,
    )

    anchors = extract_anchor_texts(_pages(spark, sf_dir))
    return anchor_entity_evidence(anchors, twin_entity_dict(spark)).select(
        "dst_host", "eid", "n_mentions", "n_src_hosts"
    )
