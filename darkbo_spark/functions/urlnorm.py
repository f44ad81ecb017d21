"""URL canonicalization — the first dedup step of every web-crawl pipeline
(the same page is fetched as `HTTP://Host.com:80/a/?b=2&a=1#x` and
`http://host.com/a?a=1&b=2`): lowercase scheme+host, drop the fragment,
drop scheme-default ports, strip one trailing slash from a non-root path,
sort query parameters. All native column expressions (regexp_extract /
split / array_sort / concat — zero UDFs, whole-stage codegen), with an
exact ANSI-SQL twin so the driver hash-verifies every rule.

Rules (deliberately conservative — nothing lossy beyond the fragment):
1. scheme and host lowercase; path/query case preserved.
2. fragment (#…) removed.
3. port removed when it is the scheme default (http:80, https:443);
   any other explicit port is kept.
4. ONE trailing '/' stripped from the path unless the path is exactly '/'.
5. query parameters sorted lexicographically (stable across engines for
   ASCII); an empty query ('?') is dropped entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe patterns shared verbatim by the DuckDB twin
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AFTER_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)"
_HOSTPORT_RE = "^([^/?]*)"
_PATH_RE = "^[^/?]*(/[^?]*)?"
_QUERY_RE = "\\?(.*)$"
_HOST_RE = "^([^:]*)"
_PORT_RE = ":([0-9]+)$"


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_extract(url, _AFTER_SCHEME_RE, 1)  # fragment gone here
    hostport = F.lower(F.regexp_extract(rest, _HOSTPORT_RE, 1))
    host = F.regexp_extract(hostport, _HOST_RE, 1)
    port = F.regexp_extract(hostport, _PORT_RE, 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(rest, _PATH_RE, 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, _QUERY_RE, 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def sql_canonical_url(url: str) -> str:
    """DuckDB twin — the identical rule chain over the identical regexes."""
    scheme = f"lower(regexp_extract({url}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_extract({url}, '{_AFTER_SCHEME_RE}', 1)"
    hostport = f"lower(regexp_extract({rest}, '{_HOSTPORT_RE}', 1))"
    host = f"regexp_extract({hostport}, '{_HOST_RE}', 1)"
    port = f"regexp_extract({hostport}, '{_PORT_RE}', 1)"
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    raw_path = f"regexp_extract({rest}, '{_PATH_RE}', 1)"
    path = (
        f"(CASE WHEN length({raw_path}) > 1 AND {raw_path} LIKE '%/' "
        f"THEN substr({raw_path}, 1, length({raw_path}) - 1) "
        f"ELSE {raw_path} END)"
    )
    query = f"regexp_extract({rest}, '{_QUERY_RE}', 1)"
    sorted_q = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    return (
        f"({scheme} || '://' || {host} || "
        f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || {path} || "
        f"(CASE WHEN {query} <> '' THEN '?' || {sorted_q} ELSE '' END))"
    )
