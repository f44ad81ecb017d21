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


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL — the
    key real CDX servers index on (OpenWayback/pywb behavior): the
    CANONICAL url (same rule chain as canonical_url: lowercase scheme+
    host, fragment dropped, default port dropped, trailing slash
    stripped, query params sorted) with the scheme removed and the host
    labels REVERSED and comma-joined, closed by ')':

        https://www.example.com:8080/a/b?y=2&x=1
          → com,example,www:8080)/a/b?x=1&y=2

    Reversed-host ordering makes every domain a PREFIX of its subdomain
    keys, so 'all captures under example.com' is one range/prefix scan
    instead of a host-set join — the property prefix lookup rides on.
    All native column expressions, zero UDF."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_extract(url, _AFTER_SCHEME_RE, 1)
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
    rev_host = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    return F.concat(
        rev_host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def surt_domain_prefix(domain: str) -> str:
    """The SURT key prefix of a registered domain: 'example.com' →
    'com,example'. A capture belongs to the domain iff its url_key
    continues with ')' (the apex host), ',' (a subdomain label), or ':'
    (an explicit port) — see surt_prefix_filter."""
    return ",".join(reversed(domain.lower().split(".")))


def surt_prefix_filter(url_key: Column, domain: str) -> Column:
    """Predicate: url_key is a capture of `domain` or any subdomain.
    Plain startswith on the raw prefix would also match sibling hosts
    sharing the character prefix ('example.com' must not match
    'exampleco.com'), so the next char is pinned to )/,/: explicitly."""
    p = surt_domain_prefix(domain)
    return (
        url_key.startswith(p + ")")
        | url_key.startswith(p + ",")
        | url_key.startswith(p + ":")
    )


def sql_surt_key(url: str) -> str:
    """DuckDB twin of surt_key — identical rule chain, identical regexes."""
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
    rev_host = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    return (
        f"({rev_host} || "
        f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || ')' || {path} || "
        f"(CASE WHEN {query} <> '' THEN '?' || {sorted_q} ELSE '' END))"
    )


def sql_surt_prefix_filter(url_key: str, domain: str) -> str:
    """DuckDB twin of surt_prefix_filter.

    A domain containing '_' or '%' (both legal in real hostnames' DNS
    labels, and LIKE wildcards) would make the unescaped pattern match
    sibling keys the Spark startswith side rejects — escape ONLY then, so
    the generated SQL for ordinary domains stays byte-identical (the
    driver fingerprints oracle text)."""
    p = surt_domain_prefix(domain)
    if "_" in p or "%" in p:
        e = p.replace("\\", "\\\\").replace("_", "\\_").replace("%", "\\%")
        return (
            f"({url_key} LIKE '{e})%' ESCAPE '\\' "
            f"OR {url_key} LIKE '{e},%' ESCAPE '\\' "
            f"OR {url_key} LIKE '{e}:%' ESCAPE '\\')"
        )
    return (
        f"({url_key} LIKE '{p})%' OR {url_key} LIKE '{p},%' "
        f"OR {url_key} LIKE '{p}:%')"
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


def surt_key_py(url: str) -> str:
    """Pure-Python twin of surt_key — a serving layer needs it driver-side
    to turn probe URLs into index keys without a Spark job. Mirrors the
    column expression rule for rule over the SAME regexes (pytest pins
    byte-equality across a url product grid); like regexp_extract, a
    non-matching extract contributes the empty string."""
    import re as _re

    m = _re.match(_SCHEME_RE, url)
    scheme = m.group(1).lower() if m else ""
    m = _re.match(_AFTER_SCHEME_RE, url)
    rest = m.group(1) if m else ""
    m = _re.match(_HOSTPORT_RE, rest)
    hostport = (m.group(1) if m else "").lower()
    m = _re.match(_HOST_RE, hostport)
    host = m.group(1) if m else ""
    m = _re.search(_PORT_RE, hostport)
    port = m.group(1) if m else ""
    keep_port = (
        port != ""
        and not (scheme == "http" and port == "80")
        and not (scheme == "https" and port == "443")
    )
    m = _re.match(_PATH_RE, rest)
    path = (m.group(1) or "") if m else ""
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    m = _re.search(_QUERY_RE, rest)
    query = m.group(1) if m else ""
    sorted_q = "&".join(sorted(query.split("&"))) if query else ""
    rev_host = ",".join(reversed(host.split(".")))
    return (
        rev_host
        + (f":{port}" if keep_port else "")
        + ")"
        + path
        + (f"?{sorted_q}" if query != "" else "")
    )
