"""WARC source twin: the real byte-level record parser (sources/warc.py)
driver-oracled. Both engines construct the SAME single-record WARC bytes
around each documents row (headers + CRLF framing + the text as payload);
the Spark side runs the REAL parser over the bytes (Arrow UDF), DuckDB
re-derives url / declared length / payload md5 from the byte layout with
regexp + substring arithmetic — so header parsing, CRLFCRLF framing, and
Content-Length slicing are all under the driver hash. Multi-record
streams, HTTP envelope stripping, and torn-tail tolerance are pinned in
tests/test_warc.py (byte fixtures a SQL engine can't express).

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.queries.common import _q, _t

_CRLF = "chr(13) || chr(10)"

# one WARC record per documents row, dialect-neutral


def _warc_rec_sql(uri_sql: str) -> str:
    return (
        f"'WARC/1.0' || {_CRLF}"
        f" || 'WARC-Type: response' || {_CRLF}"
        f" || 'WARC-Target-URI: ' || {uri_sql} || {_CRLF}"
        f" || 'WARC-Date: 2024-01-01T00:00:00Z' || {_CRLF}"
        f" || 'Content-Length: ' || CAST(length(text) AS STRING) || {_CRLF} || {_CRLF}"
        f" || text"
    )


_WARC_REC_SQL = _warc_rec_sql("'https://w.test/' || CAST(doc_id AS STRING)")

_WARC_ORACLE = f"""
WITH r AS (SELECT doc_id, {_WARC_REC_SQL} AS rec FROM documents WHERE doc_id < 400)
SELECT doc_id,
       regexp_extract(rec, 'WARC-Target-URI: ([^\r\n]+)', 1) AS url,
       CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT) AS content_length,
       md5(substr(rec, strpos(rec, {_CRLF} || {_CRLF}) + 4,
                  CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT))) AS payload_md5
FROM r
"""


@_q("warc_parse_x", _WARC_ORACLE)
def warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-exact WARC record parse under the driver hash: url from
    the header block, declared Content-Length, md5 over the SLICED
    payload (framing arithmetic, not string luck)."""
    import hashlib

    from darkbo_spark.sources.warc import parse_warc_bytes

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["rec"]):
                rec = next(parse_warc_bytes(bytes(b)), None)
                if rec is None:
                    rows.append((doc_id, None, None, None))
                else:
                    rows.append(
                        (
                            doc_id,
                            rec["url"],
                            rec["content_length"],
                            hashlib.md5(rec["payload"]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "content_length", "payload_md5"]
            )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    rec_df = d.select("doc_id", F.encode(F.expr(_WARC_REC_SQL), "utf-8").alias("rec"))
    return rec_df.mapInPandas(
        parse, "doc_id bigint, url string, content_length bigint, payload_md5 string"
    )


# CDX index oracle: both engines lay the SAME records into per-bucket
# member streams (records concatenated in doc_id order, CRLFCRLF-framed);
# Spark runs the REAL byte-walking indexer (sources/warc.py cdx_records)
# over the assembled stream, DuckDB re-derives every record's seek
# coordinates arithmetically — offset = running sum of preceding record
# spans (+4 for the inter-record separator), length = header+payload byte
# count — so the indexer's offset bookkeeping is under the driver hash.
# Compressed-member (.warc.gz) offsets are zlib-dependent and not
# SQL-expressible; those are pinned by the fetch-by-offset round-trip in
# tests/test_warc.py.
_CDX_ORACLE = f"""
WITH r AS (
  SELECT doc_id, doc_id % 8 AS bucket, {_WARC_REC_SQL} AS rec, text
  FROM documents WHERE doc_id < 400
)
SELECT bucket,
       'https://w.test/' || CAST(doc_id AS STRING) AS url,
       CAST(COALESCE(SUM(strlen(rec) + 4) OVER (
            PARTITION BY bucket ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS rec_offset,
       CAST(strlen(rec) AS BIGINT) AS rec_length,
       md5(text) AS payload_md5
FROM r
"""


def _cdx_rows_from(
    spark: SparkSession, d: DataFrame, rec_sql: str = _WARC_REC_SQL
) -> DataFrame:
    """CDX rows over a documents-shaped frame (doc_id, text): 8 member
    streams (bucket = file), each walked ONCE by the real indexer."""
    import hashlib

    from darkbo_spark.sources.warc import cdx_records

    def index_bucket(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        stream = b"".join(bytes(b) + b"\r\n\r\n" for b in pdf["rec"])
        bucket = int(pdf["bucket"].iloc[0])
        rows = [
            (
                bucket,
                r["url"],
                r["offset"],
                r["length"],
                hashlib.md5(r["payload"]).hexdigest(),
            )
            for r in cdx_records(stream)
        ]
        return pd.DataFrame(
            rows, columns=["bucket", "url", "rec_offset", "rec_length", "payload_md5"]
        )

    rec_df = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("bucket"),
        F.encode(F.expr(rec_sql), "utf-8").alias("rec"),
    )
    return rec_df.groupBy("bucket").applyInPandas(
        index_bucket,
        "bucket bigint, url string, rec_offset bigint, rec_length bigint,"
        " payload_md5 string",
    )


def _cdx_rows(
    spark: SparkSession, sf_dir: str, rec_sql: str = _WARC_REC_SQL
) -> DataFrame:
    """The assembled-stream CDX rows both the inline query and the stored
    build share."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return _cdx_rows_from(spark, d, rec_sql)


@_q("warc_cdx_x", _CDX_ORACLE)
def warc_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style record index under the driver hash: one shuffle on the
    file key into the per-file indexing pass — exactly the index build a
    100 TB dump needs (there binaryFile supplies real files and even that
    shuffle disappears)."""
    return _cdx_rows(spark, sf_dir)


# ---------------------------------------------------------------------------
# Stored CDX serving: the index is only useful if lookups DON'T rescan
# the dump — publish it once as a SnapshotTable partitioned by url-hash
# bucket, then serve a url probe set from ONLY the partitions the probes
# hash into (PartitionFilters, gated in docs/PLANS.md). Same record
# coordinates as the inline build, driver-hashed through store+prune+join.
# ---------------------------------------------------------------------------

_CDX_URL_BUCKETS = 16
_CDX_PROBE_IDS = (3, 57, 101, 164, 222, 255, 303, 342, 371, 398)


def _url_bucket_py(url: str) -> int:
    import hashlib

    return int(hashlib.md5(url.encode()).hexdigest()[:15], 16) % _CDX_URL_BUCKETS


_CDX_LOOKUP_ORACLE = (
    f"SELECT * FROM ({_CDX_ORACLE.rstrip()}) WHERE url IN ("
    + ", ".join(f"'https://w.test/{i}'" for i in _CDX_PROBE_IDS)
    + ")"
)


@_q("warc_cdx_lookup_x", _CDX_LOOKUP_ORACLE)
def warc_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once/serve-many for the CDX index: publish the index
    partitioned by url-hash bucket, then resolve 10 url probes by
    scanning ONLY their buckets (PartitionFilters) and broadcast-joining
    the probe set — a lookup touches ~1/16th of the index and ZERO dump
    bytes, the shape that stays O(probes) at crawl scale."""
    import pandas as pd

    from darkbo_spark.operators.dedup import portable_hash60
    from darkbo_spark.queries.common import _stored_table

    table = _stored_table(
        sf_dir,
        "warc_cdx",
        "documents",
        lambda: _cdx_rows(spark, sf_dir)
        .withColumn(
            "url_bucket",
            F.pmod(portable_hash60(F.col("url")), F.lit(_CDX_URL_BUCKETS)).cast("int"),
        )
        .repartition("url_bucket"),
        partition_by=["url_bucket"],
        tag=f"url_bucket{_CDX_URL_BUCKETS}",
    )
    probes = [f"https://w.test/{i}" for i in _CDX_PROBE_IDS]
    need = sorted({_url_bucket_py(u) for u in probes})
    probe_df = spark.createDataFrame(pd.DataFrame({"url": probes}))
    return (
        table.read(spark)
        .filter(F.col("url_bucket").isin(need))
        .join(F.broadcast(probe_df), "url")
        .select("bucket", "url", "rec_offset", "rec_length", "payload_md5")
    )


# ---------------------------------------------------------------------------
# Revisit resolution oracle: every doc whose id hits the dangling rule
# becomes a revisit of a digest no response carries (must stay visible as
# unresolved); every doc_id%3==2 with an in-bucket predecessor becomes a
# revisit of doc_id-8's payload (same bucket, earlier stream position);
# everything else is a response carrying its own digest. Spark assembles
# real WARC bytes per bucket, runs the REAL parser + resolver; DuckDB
# replays the outcome arithmetically (the byte-level parse itself is
# already pinned by warc_parse_x / warc_cdx_x).
# ---------------------------------------------------------------------------

_REVISIT_ORACLE = """
WITH d AS (
  SELECT doc_id, doc_id % 8 AS bucket, text FROM documents WHERE doc_id < 400
),
r AS (
  SELECT d.doc_id, d.bucket, d.text, p.text AS ref_text
  FROM d LEFT JOIN d p ON p.doc_id = d.doc_id - 8
)
SELECT 'https://w.test/' || CAST(doc_id AS STRING) AS url,
       CASE WHEN doc_id % 31 = 5 THEN 'revisit'
            WHEN doc_id % 3 = 2 AND doc_id >= 8 THEN 'revisit'
            ELSE 'response' END AS rec_type,
       -- a revisit resolves only if its referent is itself a RESPONSE;
       -- a referent that hit the dangling rule became a revisit, so its
       -- digest has no response and the chain stays visibly unresolved
       CASE WHEN doc_id % 31 = 5 THEN NULL
            WHEN doc_id % 3 = 2 AND doc_id >= 8
                 THEN CASE WHEN (doc_id - 8) % 31 = 5 THEN NULL
                           ELSE md5(ref_text) END
            ELSE md5(text) END AS payload_md5,
       CASE WHEN doc_id % 31 = 5 THEN CAST(0 AS BIGINT)
            WHEN doc_id % 3 = 2 AND doc_id >= 8 AND (doc_id - 8) % 31 = 5
                 THEN CAST(0 AS BIGINT)
            ELSE CAST(1 AS BIGINT) END AS resolved
FROM r
"""


@_q("warc_revisit_resolve_x", _REVISIT_ORACLE)
def warc_revisit_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revisit records through the REAL byte path: digest-carrying
    response/revisit records are serialized into 8 member streams,
    parsed back, and resolve_revisits re-attaches bodies by digest join
    — dangling digests surface as resolved=0 with a null md5."""
    import hashlib

    from pyspark.sql.window import Window

    from darkbo_spark.sources.warc import parse_warc_bytes_indexed, resolve_revisits

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    w = Window.partitionBy(F.col("doc_id") % 8).orderBy("doc_id")
    ref_md5 = F.md5(F.encode(F.lag("text").over(w), "utf-8"))
    own_md5 = F.md5(F.encode(F.col("text"), "utf-8"))
    dangling = F.col("doc_id") % 31 == 5
    is_rev = dangling | ((F.col("doc_id") % 3 == 2) & (F.col("doc_id") >= 8))
    digest = F.concat(
        F.lit("md5:"),
        F.when(dangling, F.lit("DANGLING"))
        .when(is_rev, ref_md5)
        .otherwise(own_md5),
    )
    body = F.when(is_rev, F.lit("")).otherwise(F.col("text"))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: "),
        F.when(is_rev, F.lit("revisit")).otherwise(F.lit("response")),
        F.lit("\r\nWARC-Target-URI: https://w.test/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Payload-Digest: "),
        digest,
        F.lit("\r\nContent-Length: "),
        F.length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
    )
    rec_df = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("bucket"),
        F.encode(rec, "utf-8").alias("rec"),
    )

    def parse_bucket(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        stream = b"".join(bytes(b) + b"\r\n\r\n" for b in pdf["rec"])
        rows = [
            (r["url"], r["rec_type"], r["payload"], r["payload_digest"])
            for r in parse_warc_bytes_indexed(stream)
        ]
        return pd.DataFrame(
            rows, columns=["url", "rec_type", "payload", "payload_digest"]
        )

    records = rec_df.groupBy("bucket").applyInPandas(
        parse_bucket,
        "url string, rec_type string, payload binary, payload_digest string",
    )
    md5_hex = F.pandas_udf(
        lambda s: s.map(
            lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
        ),
        "string",
    )
    return resolve_revisits(records).select(
        "url",
        "rec_type",
        md5_hex(F.col("payload")).alias("payload_md5"),
        "resolved",
    )


# ---------------------------------------------------------------------------
# SURT-keyed CDX serving (r6 ask #5): real CDX servers key on the
# Sort-friendly URI Reordering Transform of the CANONICAL url
# ('https://www.Example.com:443/a?b=2&a=1' → 'com,example,www)/a?a=1&b=2')
# and serve DOMAIN-PREFIX queries — reversed-host ordering makes every
# domain a prefix of all its subdomain keys, so "all captures under
# example.com" is one prefix scan, never a host-set join. The stored
# index is partitioned by registered-domain hash bucket
# (operators/domains.registered_domain — PSL semantics), so a domain
# probe prunes to ONE partition (PartitionFilters) before the prefix
# match runs; canonicalization + SURT + prefix semantics are all under
# the driver hash via functions/urlnorm's exact DuckDB twins.
# ---------------------------------------------------------------------------

from darkbo_spark.functions.urlnorm import (  # noqa: E402
    sql_surt_key,
    sql_surt_prefix_filter,
    surt_key,
    surt_prefix_filter,
)

# varied hosts/ports/queries: apex vs subdomain, scheme-default port
# (dropped), explicit non-default port (kept → ':' branch of the prefix
# filter), unsorted query params (sorted by canonicalization)
_SURT_URI_SQL = (
    "'https://' || (CASE WHEN doc_id % 5 = 0 THEN '' "
    "ELSE 'sub' || CAST(doc_id % 5 AS STRING) || '.' END) "
    "|| 'site' || CAST(doc_id % 23 AS STRING) || '.com' "
    "|| (CASE WHEN doc_id % 7 = 0 THEN ':443' "
    "WHEN doc_id % 11 = 0 THEN ':8443' ELSE '' END) "
    "|| '/p/' || CAST(doc_id AS STRING) "
    "|| (CASE WHEN doc_id % 4 = 0 THEN '?b=2&a=1' ELSE '' END)"
)

_SURT_PROBE_DOMAIN = "site3.com"
_SURT_DOMAIN_BUCKETS = 8

_CDX_SURT_ORACLE = f"""
WITH r AS (
  SELECT doc_id, doc_id % 8 AS bucket, {_warc_rec_sql(_SURT_URI_SQL)} AS rec,
         text, {_SURT_URI_SQL} AS uri
  FROM documents WHERE doc_id < 400
),
c AS (
  SELECT uri AS url,
         CAST(COALESCE(SUM(strlen(rec) + 4) OVER (
              PARTITION BY bucket ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS rec_offset,
         CAST(strlen(rec) AS BIGINT) AS rec_length,
         md5(text) AS payload_md5
  FROM r
),
k AS (
  SELECT {sql_surt_key('url')} AS url_key, url, rec_offset, rec_length,
         payload_md5
  FROM c
)
SELECT url_key, url, rec_offset, rec_length, payload_md5
FROM k WHERE {sql_surt_prefix_filter('url_key', _SURT_PROBE_DOMAIN)}
"""


def _domain_bucket_py(domain: str) -> int:
    import hashlib

    return int(hashlib.md5(domain.encode()).hexdigest()[:15], 16) % _SURT_DOMAIN_BUCKETS


@_q("warc_cdx_surt_lookup_x", _CDX_SURT_ORACLE)
def warc_cdx_surt_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-prefix lookup against the SURT-keyed stored CDX index:
    publish once partitioned by registered-domain bucket, then answer
    'all captures under site3.com' by pruning to the probe domain's
    bucket and prefix-matching the SURT key — subdomains, apex, and
    explicit-port hosts all resolve; sibling domains sharing a character
    prefix never match."""
    from darkbo_spark.operators.dedup import portable_hash60
    from darkbo_spark.operators.domains import host_of, registered_domain
    from darkbo_spark.queries.common import _stored_table

    table = _stored_table(
        sf_dir,
        "warc_cdx_surt",
        "documents",
        lambda: _cdx_rows(spark, sf_dir, rec_sql=_warc_rec_sql(_SURT_URI_SQL))
        .withColumn("url_key", surt_key(F.col("url")))
        .withColumn(
            "domain_bucket",
            F.pmod(
                portable_hash60(registered_domain(host_of(F.col("url")))),
                F.lit(_SURT_DOMAIN_BUCKETS),
            ).cast("int"),
        )
        .repartition("domain_bucket"),
        partition_by=["domain_bucket"],
        tag=f"surt_dom{_SURT_DOMAIN_BUCKETS}_v1",
    )
    return (
        table.read(spark)
        .filter(F.col("domain_bucket") == _domain_bucket_py(_SURT_PROBE_DOMAIN))
        .filter(surt_prefix_filter(F.col("url_key"), _SURT_PROBE_DOMAIN))
        .select("url_key", "url", "rec_offset", "rec_length", "payload_md5")
    )


@_q("warc_cdx_incremental_x", _CDX_ORACLE)
def warc_cdx_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL CDX maintenance, driver-proven equal to a full
    rebuild: index rows are per-FILE seek coordinates, so a re-crawled
    segment replaces exactly its file's rows (sources/warc.py
    merge_cdx_delta — left-anti on the file key + union, offsets
    untouched). The initial build deliberately indexes STALE streams for
    every third member file (wrong text → wrong lengths → wrong offsets,
    exercising the replace path, not just append); the delta re-indexes
    those files from true bytes; the merged index hash-matches the same
    full-build oracle as warc_cdx_x."""
    from darkbo_spark.sources.warc import merge_cdx_delta

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    stale_bucket = (F.col("doc_id") % 8) % 3 == 0
    stale_docs = d.withColumn(
        "text",
        F.when(stale_bucket, F.lit("stale earlier fetch")).otherwise(
            F.col("text")
        ),
    )
    idx0 = _cdx_rows_from(spark, stale_docs)
    delta = _cdx_rows_from(spark, d.filter(stale_bucket))
    return merge_cdx_delta(idx0, delta, key="bucket")


# ---------------------------------------------------------------------------
# url-prefix matchType (pywb's `matchType=prefix`): all captures whose
# SURT key starts with the SURT of a probe url-prefix — "everything under
# https://sub1.site3.com/p/2". The probe key is built DRIVER-SIDE by the
# pure-Python twins (functions/urlnorm.surt_key_py +
# operators/domains.registered_domain_py for the partition bucket), the
# way a serving layer would — no Spark job to form the probe; the scan
# stays one pruned partition + a pushed StringStartsWith.
# ---------------------------------------------------------------------------

_SURT_URL_PREFIX_PROBE = "https://sub1.site3.com/p/2"


def _surt_url_prefix_oracle() -> str:
    from darkbo_spark.functions.urlnorm import surt_key_py

    key_prefix = surt_key_py(_SURT_URL_PREFIX_PROBE)
    return f"""
WITH r AS (
  SELECT doc_id, doc_id % 8 AS bucket, {_warc_rec_sql(_SURT_URI_SQL)} AS rec,
         text, {_SURT_URI_SQL} AS uri
  FROM documents WHERE doc_id < 400
),
c AS (
  SELECT uri AS url,
         CAST(COALESCE(SUM(strlen(rec) + 4) OVER (
              PARTITION BY bucket ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS rec_offset,
         CAST(strlen(rec) AS BIGINT) AS rec_length,
         md5(text) AS payload_md5
  FROM r
),
k AS (
  SELECT {sql_surt_key('url')} AS url_key, url, rec_offset, rec_length,
         payload_md5
  FROM c
)
SELECT url_key, url, rec_offset, rec_length, payload_md5
FROM k WHERE url_key LIKE '{key_prefix}%'
"""


@_q("warc_cdx_url_prefix_lookup_x", _surt_url_prefix_oracle())
def warc_cdx_url_prefix_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pywb matchType=prefix against the SURT-keyed stored index: probe
    key and partition bucket computed by the driver-side Python twins
    (pytest-pinned byte-equal to the column expressions); one pruned
    partition, StringStartsWith pushed to the scan. Hosts with explicit
    ports correctly DON'T match the port-less probe (the SURT puts the
    port before ')')."""
    from darkbo_spark.functions.urlnorm import surt_key, surt_key_py
    from darkbo_spark.operators.dedup import portable_hash60
    from darkbo_spark.operators.domains import (
        host_of,
        registered_domain,
        registered_domain_py,
    )
    from darkbo_spark.queries.common import _stored_table

    # same published table as warc_cdx_surt_lookup_x (one index, every
    # matchType served from it)
    table = _stored_table(
        sf_dir,
        "warc_cdx_surt",
        "documents",
        lambda: _cdx_rows(spark, sf_dir, rec_sql=_warc_rec_sql(_SURT_URI_SQL))
        .withColumn("url_key", surt_key(F.col("url")))
        .withColumn(
            "domain_bucket",
            F.pmod(
                portable_hash60(registered_domain(host_of(F.col("url")))),
                F.lit(_SURT_DOMAIN_BUCKETS),
            ).cast("int"),
        )
        .repartition("domain_bucket"),
        partition_by=["domain_bucket"],
        tag=f"surt_dom{_SURT_DOMAIN_BUCKETS}_v1",
    )
    key_prefix = surt_key_py(_SURT_URL_PREFIX_PROBE)
    probe_host = _SURT_URL_PREFIX_PROBE.split("://", 1)[1].split("/", 1)[0]
    probe_domain = registered_domain_py(probe_host.lower())
    return (
        table.read(spark)
        .filter(F.col("domain_bucket") == _domain_bucket_py(probe_domain))
        .filter(F.col("url_key").startswith(key_prefix))
        .select("url_key", "url", "rec_offset", "rec_length", "payload_md5")
    )


# ---------------------------------------------------------------------------
# Fetch dedup by canonical url (sources/warc.dedup_fetches): three raw
# variants per page — mixed-case host + default port + fragment +
# unsorted query / plain / trailing slash — must collapse to ONE row per
# canonical page with the latest fetch winning and ties breaking to the
# max raw url. The whole canonicalization rule chain sits under the
# driver hash via sql_canonical_url.
# ---------------------------------------------------------------------------

from darkbo_spark.functions.urlnorm import sql_canonical_url  # noqa: E402

_FETCH_URL_SQL = (
    "(CASE CAST(doc_id % 3 AS INT)"
    " WHEN 0 THEN 'https://Site' || CAST(doc_id - doc_id % 3 AS STRING)"
    " || '.com:443/p/' || CAST(doc_id - doc_id % 3 AS STRING) || '?b=2&a=1#x'"
    " WHEN 1 THEN 'https://site' || CAST(doc_id - doc_id % 3 AS STRING)"
    " || '.com/p/' || CAST(doc_id - doc_id % 3 AS STRING) || '?a=1&b=2'"
    " ELSE 'https://site' || CAST(doc_id - doc_id % 3 AS STRING)"
    " || '.com/p/' || CAST(doc_id - doc_id % 3 AS STRING) || '/?b=2&a=1'"
    " END)"
)

_FETCH_DEDUP_ORACLE = f"""
WITH p AS (
  SELECT doc_id, {_FETCH_URL_SQL} AS url,
         DATE '2024-01-01' + CAST(doc_id % 5 AS INTEGER) AS warc_ts
  FROM documents WHERE doc_id < 400
),
c AS (SELECT doc_id, url, warc_ts, {sql_canonical_url('url')} AS canon_url FROM p),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY canon_url
                               ORDER BY warc_ts DESC, url DESC) AS rk
  FROM c
)
SELECT doc_id, url, canon_url, strftime(warc_ts, '%Y-%m-%d') AS fetch_date
FROM r WHERE rk = 1
ORDER BY canon_url
"""


@_q("warc_fetch_dedup_x", _FETCH_DEDUP_ORACLE)
def warc_fetch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-url fetch dedup under the driver hash: 400 fetches in
    groups of three raw variants collapse to one latest-wins row per
    canonical page; lowercasing, default-port drop, fragment drop,
    trailing-slash strip, and query sort are all load-bearing for the
    group to even form."""
    from darkbo_spark.sources.warc import dedup_fetches

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    pages = d.select(
        "doc_id",
        F.expr(_FETCH_URL_SQL).alias("url"),
        F.date_add(
            F.to_date(F.lit("2024-01-01")), (F.col("doc_id") % 5).cast("int")
        ).alias("warc_ts"),
    )
    return dedup_fetches(pages).select(
        "doc_id",
        "url",
        "canon_url",
        F.date_format("warc_ts", "yyyy-MM-dd").alias("fetch_date"),
    )
