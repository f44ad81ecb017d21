"""Host link-graph twins (operators/linkgraph.py), driver-oracled: href
extraction from html payloads → weighted host→host edges → host PageRank.

Both engines build the SAME html around each documents-table row: two
absolute links whose targets are arithmetic on doc_id (so some links are
intra-site — exercising the self-edge drop — and targets span the same
host space as sources), plus a relative link and a mailto: that the
extractor must ignore. The Spark side runs over utf-8 BYTES through the
production decode → regexp_extract_all → host_of chain; DuckDB replays
with its own regexp_extract_all. PageRank reuses the shared unrolled
power-method CTEs (kg/oracle_twin.pagerank_rounds_ctes) — one float
discipline for every graph oracle.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.kg.oracle_twin import pagerank_rounds_ctes
from darkbo_spark.operators.domains import sql_host_of
from darkbo_spark.queries.common import _q, _t


def _sfx(expr: str) -> str:
    return (
        f"(CASE ({expr}) % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'"
        f" WHEN 2 THEN '.org' ELSE '.com.au' END)"
    )


def _site(expr: str) -> str:
    return f"'https://www.site' || CAST(({expr}) % 23 AS STRING) || {_sfx(f'({expr}) % 23')}"


_SRC_URL_SQL = f"{_site('doc_id')} || '/p/' || CAST(doc_id AS STRING)"

_LINK1 = f"'<a href=\"' || {_site('doc_id * 7 + 1')} || '/page/1\">a</a>'"
_LINK2 = f"'<a href=\"' || {_site('doc_id * 11 + 5')} || '/page/2\">b</a>'"

_HTML_SQL = (
    "'<html><body><p>corpus page</p>' || "
    f"{_LINK1} || {_LINK2} || "
    "'<a href=\"/relative/nav\">nav</a>"
    "<a href=\"mailto:x@example.com\">mail</a></body></html>'"
)

# shared CTE chain ending in the filtered absolute-link rows a(src_host,
# dst_host) — one occurrence per href, multiplicity preserved
_LINKS_CTES = f"""h AS (
  SELECT doc_id, {_SRC_URL_SQL} AS url, {_HTML_SQL} AS html FROM documents
),
l AS (
  SELECT {sql_host_of('url')} AS src_host,
         unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS href
  FROM h
),
a AS (
  SELECT src_host, {sql_host_of('href')} AS dst_host
  FROM l
  WHERE regexp_matches(href, '^(?i)https?://')
)"""

_LINKGRAPH_ORACLE = f"""
WITH {_LINKS_CTES}
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM a
WHERE src_host <> dst_host AND src_host <> '' AND dst_host <> ''
GROUP BY src_host, dst_host
"""


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        F.expr(_SRC_URL_SQL).alias("url"),
        F.encode(F.expr(_HTML_SQL), "utf-8").alias("html"),
    )


@_q("host_linkgraph_x", _LINKGRAPH_ORACLE)
def host_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted host→host link graph from raw html bytes — relative and
    non-http links ignored, intra-site edges dropped, multiplicity kept;
    every rule hash-verified against the RE2 replay."""
    from darkbo_spark.operators.linkgraph import extract_links, host_edges

    links = extract_links(_pages(spark, sf_dir))
    return host_edges(links).select(
        "src_host", "dst_host", F.col("n_links").cast("bigint").alias("n_links")
    )


_HOST_PR_ITERS = 5

_HOST_PR_ORACLE = f"""
WITH {_LINKS_CTES},
e AS (
  SELECT DISTINCT src_host AS src, dst_host AS dst
  FROM a
  WHERE src_host <> dst_host AND src_host <> '' AND dst_host <> ''
),
nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
{pagerank_rounds_ctes(_HOST_PR_ITERS, 0.85)}
SELECT node AS host, rank FROM r{_HOST_PR_ITERS}
ORDER BY node
"""


@_q("host_pagerank_x", _HOST_PR_ORACLE)
def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host authority: fixed-iteration PageRank over the distinct host
    graph (the crawl-prioritization signal) — extraction and five power
    rounds are one driver hash via the shared unrolled oracle."""
    from darkbo_spark.operators.graph import pagerank
    from darkbo_spark.operators.linkgraph import extract_links, host_edges

    edges = host_edges(extract_links(_pages(spark, sf_dir))).select(
        "src_host", "dst_host"
    )
    return pagerank(
        edges, src="src_host", dst="dst_host", damping=0.85, iters=_HOST_PR_ITERS
    ).select(F.col("node").alias("host"), "rank")


# web-graph connected components: the distributed large-star/small-star
# loop (operators/components.py — the same machinery that canonicalizes
# KG aliases) over the host graph, vs a DuckDB RECURSIVE-CTE fixpoint —
# the "which sites form one connected web neighborhood" rollup that
# complements degrees/PageRank.
_HOST_CC_ORACLE = f"""
WITH RECURSIVE {_LINKS_CTES},
ed AS (
  SELECT DISTINCT src_host AS src, dst_host AS dst
  FROM a
  WHERE src_host <> dst_host AND src_host <> '' AND dst_host <> ''
),
und AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
reach(node, lbl) AS (
  SELECT src, src FROM und
  UNION
  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.node
)
SELECT node AS host, min(lbl) AS component
FROM reach GROUP BY node
ORDER BY host
"""


@_q("host_components_x", _HOST_CC_ORACLE)
def host_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, component) with component = min reachable host — the
    distributed star-contraction loop hash-equals the serial recursive
    fixpoint."""
    from darkbo_spark.operators.components import connected_components
    from darkbo_spark.operators.linkgraph import extract_links, host_edges

    edges = host_edges(extract_links(_pages(spark, sf_dir))).select(
        "src_host", "dst_host"
    )
    return connected_components(edges, "src_host", "dst_host").select(
        F.col("node").alias("host"), F.col("comp").alias("component")
    )
