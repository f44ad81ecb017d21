"""Per-domain document caps — the training-mix guard that stops a single
site from dominating a web corpus (the C4/Gopher "top-k docs per
registered domain" rule), plus the domain extraction it rides on.

Registered-domain extraction is a native column chain (split + slice —
zero UDF): last two host labels, or three when the 2-label tail is a
well-known multi-part public suffix (co.uk, com.au, …). The tiny suffix
list is deliberately explicit — production swaps in the full public
suffix list through the same expression seam.

The cap itself is exact top-k per domain. A single `row_number() over
(partition by domain)` is the textbook form but sorts EVERY document of a
head domain on one reducer — the same skew the link join salts against.
`cap_per_domain` therefore runs two phases: phase 1 ranks within
(domain, salt) and keeps k per salt bucket (spreads a head domain over
`salt` reducers; top-k is a selection, so the global top-k survives some
bucket's local top-k); phase 2 ranks the ≤ salt·k survivors per domain —
a frame that is k·salt rows per domain MAX, immune to corpus skew. The
result is bit-identical to the single-window form (pytest + driver
oracle); the cost is one extra exchange over an already-k·salt-bounded
frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# multi-part public suffixes the naive last-2 rule would mangle
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.nz", "co.in", "com.br", "com.mx",
    "com.cn", "com.sg",
)


def host_of(url: Column) -> Column:
    """Lowercased host (no port) of a URL column."""
    rest = F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)", 1)
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    return F.regexp_extract(hostport, "^([^:]*)", 1)


def sql_host_of(url: str) -> str:
    """DuckDB twin of host_of over a URL expression."""
    rest = f"regexp_extract({url}, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1)"
    hostport = f"lower(regexp_extract({rest}, '^([^/?]*)', 1))"
    return f"regexp_extract({hostport}, '^([^:]*)', 1)"


def registered_domain(host: Column) -> Column:
    """Registered domain of a lowercase host: last 2 labels, or last 3
    when the 2-label tail is a known multi-part suffix."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    is_multi = last2.isin(*_MULTI_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def sql_registered_domain(host: str) -> str:
    """DuckDB twin of registered_domain over a lowercase-host expression."""
    labels = f"string_split({host}, '.')"
    n = f"len({labels})"
    last2 = f"array_to_string(list_slice({labels}, {n} - 1, {n}), '.')"
    last3 = f"array_to_string(list_slice({labels}, {n} - 2, {n}), '.')"
    in_list = ", ".join(f"'{s}'" for s in _MULTI_SUFFIXES)
    return (
        f"(CASE WHEN {n} <= 2 THEN {host} "
        f"WHEN {last2} IN ({in_list}) AND {n} >= 3 THEN {last3} "
        f"ELSE {last2} END)"
    )


def cap_per_domain(
    docs: DataFrame,
    k: int,
    domain_col: str = "domain",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    salt: int = 16,
) -> DataFrame:
    """Keep the top-k documents per domain under a TOTAL deterministic
    order (order_by then id_col as the unique tiebreak), with the
    skew-safe two-phase ranking described in the module doc. Output rows
    carry `rk` (1-based final rank within the domain)."""
    order = list(order_by or []) + [F.col(id_col).asc()]
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).cast("int")
    )
    w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order)
    phase1 = (
        salted.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_rk1", "_salt")
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        phase1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
