"""Text-analysis operators over the documents corpus: corpus stats,
checksums, regex extraction, language id, quality and repetition signals,
unigram-LM scoring, PII redaction, token counting (whitespace / BPE-regex /
real merge-table BPE), fingerprints, URL canonicalization, routing,
chunking, title derivation, and byte-identical clean_text parity.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline:
money aggregates sum in DECIMAL, short array folds round to 6 dp on both
engines, every computed column is aliased identically in Spark and SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.functions import text_analysis as ta
from darkbo_spark.functions.ids import sha256_id_col

from darkbo_spark.queries.common import _q, _t


# ---------------------------------------------------------------------------
# Corpus stats (A3)
# ---------------------------------------------------------------------------

@_q(
    "corpus_stats",
    """
SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
FROM documents GROUP BY lang
""",
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*").cast("double")).alias("avg_chars"),
        )
    )

# ---------------------------------------------------------------------------
# Hash-agg checksum (A4)
# ---------------------------------------------------------------------------

@_q(
    "source_checksums",
    """
SELECT source, sha256(string_agg(sha256(text), '' ORDER BY sha256(text))) AS checksum
FROM documents GROUP BY source
""",
)
def source_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sha2(
            F.concat_ws("", F.array_sort(F.collect_list(F.sha2(F.col("text"), 256)))), 256
        ).alias("checksum")
    )

# ---------------------------------------------------------------------------
# Regex argument extraction (P5 archetype)
# ---------------------------------------------------------------------------

@_q(
    "regex_extract_snippets",
    """
SELECT doc_id, regexp_extract(text, 'table ([a-z]+)', 1) AS snippet
FROM documents WHERE regexp_extract(text, 'table ([a-z]+)', 1) <> ''
""",
)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    snip = F.regexp_extract("text", r"table ([a-z]+)", 1)
    return docs.select("doc_id", snip.alias("snippet")).filter(F.col("snippet") != "")

# ---------------------------------------------------------------------------
# Text analysis: lang-id, quality, token counts, fingerprints
# ---------------------------------------------------------------------------

@_q(
    "lang_id",
    f"SELECT doc_id, {ta.sql_lang_id('text')} AS lang_guess FROM documents",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", ta.lang_id_heuristic(F.col("text")).alias("lang_guess")
    )


@_q(
    "quality_scores",
    f"SELECT doc_id, {ta.sql_quality_score('text')} AS quality FROM documents",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", ta.quality_score(F.col("text")).alias("quality")
    )


@_q(
    "token_counts_by_lang",
    f"""
SELECT lang, COUNT(*) AS docs, CAST(SUM({ta.sql_token_count('text')}) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang
""",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(ta.token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
    )


@_q(
    "doc_fingerprints",
    f"SELECT doc_id, {ta.sql_doc_fingerprint('text')} AS fp FROM documents",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", ta.doc_fingerprint(F.col("text")).alias("fp")
    )


@_q("rolling_fingerprints")  # rows-only: order-sensitivity props in pytest
def rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", ta.rolling_fingerprint(F.col("text")).alias("rfp")
    )


@_q(
    "rolling_fingerprints_x",
    f"SELECT doc_id, {ta.sql_rolling_fingerprint('text')} AS rfp FROM documents",
)
def rolling_fingerprints_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-hash twin: the SAME Rabin-Karp fold with the md5-60
    token hash, replayed value-for-value by the DuckDB oracle (xxhash64
    form above stays the production path)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", ta.rolling_fingerprint_portable(F.col("text")).alias("rfp")
    )


@_q(
    "bpe_token_counts",
    f"""
SELECT doc_id, {ta.sql_token_count('text')} AS ws_tokens,
       {ta.sql_bpe_token_count('text')} AS bpe_tokens
FROM documents
""",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # whitespace vs BPE-ish regex token counts side by side — the
    # LLM-pipeline token estimator (punctuation-heavy text undercounts
    # under whitespace splitting)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        ta.token_count(F.col("text")).alias("ws_tokens"),
        ta.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


@_q("bpe_real_token_counts")  # rows-only: invariants in pytest; hash gate below
def bpe_real_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL merge-table BPE counts (Arrow UDF) next to the native regex
    pre-token count. Invariant carried in the output and asserted in
    pytest: pre_tokens ≤ bpe_tokens_real ≤ length(text) — every pre-token
    encodes to between 1 and len(word) subwords."""
    from darkbo_spark.functions.bpe import bpe_token_count_udf

    count = bpe_token_count_udf()
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        ta.bpe_token_count(F.col("text")).alias("pre_tokens"),
        count(F.col("text")).alias("bpe_tokens_real"),
    )


def _bpe_oracle(id_limit: int) -> str:
    """The ACTUAL BPE merge loop replayed in DuckDB — a recursive CTE over
    the per-word symbol state. Key encodings:

    * a word's symbol list is a STRING of chr(2)||sym||chr(3) cells, so
      "merge every occurrence of the best pair, left to right, no rescan
      of the merged token" is exactly SQL
      `replace(s, ␂pa␃␂pb␃, ␂papb␃)`: the needle spans two WHOLE cells
      (a symbol merely ending in pa / starting in pb cannot match — the
      markers intervene) and adjacent occurrences share no characters,
      so plain non-overlapping left-to-right replace IS _merge_word.
      (A bare chr(1)-joined encoding fails BOTH ways: `a\\x01b` matches
      inside ('xa','by') neighbours, and chained occurrences share their
      delimiter so replace drops every second merge — caught by fuzzing
      against the Python encoder.)
    * the vendored merge table ships as a constant list of
      'pa'||chr(4)||'pb' strings; a pair's rank is its list_position
      (1-based, 0 = absent), and min over adjacent-pair positions is the
      GPT-2 lowest-rank-first rule;
    * recursion stops when no adjacent pair is in the table; each merge
      shrinks the string by exactly two marker bytes, so the shortest
      state per word IS the fixpoint;
    * the DISTINCT-words inner loop mirrors the UDF's per-word LRU cache;
    * documents containing the marker bytes \\x02-\\x04 are EXCLUDED BY
      BOTH ENGINES (identical regex filter): such bytes would forge cell
      boundaries in this oracle's encoding. The exclusion is part of the
      query contract, not a silent assumption.
    """
    from darkbo_spark.functions.bpe import MERGES

    pairs_lit = (
        "["
        + ", ".join("'" + (a + "\x04" + b).replace("'", "''") + "'" for a, b in MERGES)
        + "]"
    )
    pre_pat = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]+"
    pa = f"string_split({pairs_lit}[br], chr(4))[1]"
    pb = f"string_split({pairs_lit}[br], chr(4))[2]"
    # symbol list from the cell string: strip the outer markers, split on
    # the inter-cell boundary chr(3)||chr(2)
    syms = "string_split(trim(s, chr(2) || chr(3)), chr(3) || chr(2))"
    return f"""
WITH RECURSIVE
d AS (SELECT doc_id, text FROM documents
      WHERE doc_id < {id_limit}
        AND NOT regexp_matches(text, '[\\x02-\\x04]')),
pretoks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{pre_pat}')) AS w FROM d
),
words AS (SELECT DISTINCT w FROM pretoks),
enc(w, s) AS (
  SELECT w, array_to_string(list_transform(string_split(w, ''),
                            c -> chr(2) || c || chr(3)), '')
  FROM words
  UNION ALL
  SELECT w, replace(s,
                    chr(2) || {pa} || chr(3) || chr(2) || {pb} || chr(3),
                    chr(2) || {pa} || {pb} || chr(3))
  FROM (
    SELECT w, s,
      list_min(list_filter(
        list_transform(range(1, len({syms})),
          i -> list_position({pairs_lit},
                 {syms}[i] || chr(4) || {syms}[i+1])),
        x -> x > 0)) AS br
    FROM enc
  )
  WHERE br IS NOT NULL
),
final AS (
  SELECT w, s FROM (
    SELECT w, s, ROW_NUMBER() OVER (PARTITION BY w ORDER BY length(s) ASC) AS rn
    FROM enc
  ) WHERE rn = 1
),
counts AS (SELECT w, len({syms}) AS n FROM final)
SELECT p.doc_id, CAST(SUM(c.n) AS BIGINT) AS bpe_tokens_real
FROM pretoks p JOIN counts c USING (w)
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


@_q("bpe_real_token_counts_x", _bpe_oracle(300))
def bpe_real_tokens_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE driver-oracled: the Arrow encode UDF (vendored merge table,
    GPT-2 lowest-rank-first application) hash-verified against the
    recursive-CTE merge-loop replay in _bpe_oracle."""
    from darkbo_spark.functions.bpe import bpe_token_count_udf

    count = bpe_token_count_udf()
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        # mirror of the oracle's marker-byte exclusion (see _bpe_oracle)
        .filter(~F.col("text").rlike("[\\x02-\\x04]"))
        .select(
            "doc_id", count(F.col("text")).cast("bigint").alias("bpe_tokens_real")
        )
    )

# ---------------------------------------------------------------------------
# Cross-engine deterministic ids
# ---------------------------------------------------------------------------

@_q(
    "content_ids",
    "SELECT doc_id, substr(sha256('doc:' || CAST(doc_id AS VARCHAR)), 1, 32) AS content_id FROM documents",
)
def content_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        "doc_id", sha256_id_col("doc", F.col("doc_id").cast("string")).alias("content_id")
    )

@_q(
    "repetition_signals",
    f"""
SELECT doc_id, {ta.sql_dup_token_fraction('text')} AS dup_token_frac,
       {ta.sql_top_bigram_fraction('text')} AS top_bigram_frac
FROM documents WHERE doc_id < 300
ORDER BY doc_id
""",
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (duplicate-token fraction and the
    most-frequent-bigram share) — the looping/boilerplate detectors every
    training-data pipeline runs next to quality_scores. Native per-row
    array expressions, no shuffle, both hash-oracled."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        ta.dup_token_fraction(F.col("text")).alias("dup_token_frac"),
        ta.top_bigram_fraction(F.col("text")).alias("top_bigram_frac"),
    )


@_q(
    "unigram_logprob_scores",
    f"""
SELECT doc_id, {ta.sql_unigram_logprob('text')} AS mean_logprob
FROM documents WHERE doc_id < 300
ORDER BY doc_id
""",
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-based quality filter: mean token ln-probability under the
    deterministic add-one unigram LM (trained at import on the embedded
    corpus — the seam where a real KenLM/LLM scorer plugs in). Vocab and
    log tables inline as constants in BOTH engines, the fold runs in token
    order, so the driver hash covers the whole scoring chain."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id", ta.unigram_logprob(F.col("text")).alias("mean_logprob")
    )


# dialect-neutral PII-bearing suffix planted onto document text (the word
# salad contains no emails/phones of its own)
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id % 50 AS STRING) || '@Mail' "
    "|| CAST(doc_id % 7 AS STRING) || '.example.com or call ' "
    "|| (CASE doc_id % 3 WHEN 0 THEN '(555)-12' WHEN 1 THEN '555.12' "
    "ELSE '555 12' END) || CAST(doc_id % 10 AS STRING) || '-4567 today'"
)


@_q(
    "redact_pii_docs",
    f"""
SELECT doc_id, {ta.sql_redact_pii(f"text || {_PII_SUFFIX_SQL}")} AS redacted
FROM documents WHERE doc_id < 300
ORDER BY doc_id
""",
)
def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass driver-verified byte-for-byte: emails and phone
    numbers (several spellings) planted into the text and replaced with
    typed placeholders by the identical regex chain in both engines."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    dirty = F.concat(F.col("text"), F.expr(_PII_SUFFIX_SQL))
    return d.select("doc_id", ta.redact_pii(dirty).alias("redacted"))

# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup (web-pipeline staple) — messy
# URLs constructed dialect-neutrally from order keys; the canonicalizer is
# functions/urlnorm.py (native, zero UDF) with its exact DuckDB twin
# ---------------------------------------------------------------------------

from darkbo_spark.functions.urlnorm import canonical_url, sql_canonical_url  # noqa: E402

# mixed-case schemes, default and explicit ports, trailing slashes, unsorted
# query params, fragments — every canonicalization rule gets exercised
_RAW_URL_SQL = (
    "(CASE o_orderkey % 4 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'"
    " WHEN 2 THEN 'HtTp' ELSE 'HTTP' END)"
    " || '://WWW.Site' || CAST(o_orderkey % 7 AS STRING) || '.COM'"
    " || (CASE o_orderkey % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'"
    " WHEN 2 THEN ':8080' ELSE '' END)"
    " || (CASE WHEN o_orderkey % 11 = 0 THEN ''"
    " ELSE '/Dir' || CAST(o_orderkey % 5 AS STRING)"
    " || (CASE o_orderkey % 3 WHEN 0 THEN '/' ELSE '' END) END)"
    " || (CASE o_orderkey % 2 WHEN 0 THEN"
    " '?zz=' || CAST(o_orderkey % 3 AS STRING)"
    " || '&aa=' || CAST(o_orderkey % 4 AS STRING) ELSE '' END)"
    " || (CASE o_orderkey % 3 WHEN 0 THEN '#Sec'"
    " || CAST(o_orderkey % 2 AS STRING) ELSE '' END)"
)

_URL_LIMIT = 5000


@_q(
    "url_canonicalize",
    f"""
SELECT o_orderkey, {_RAW_URL_SQL} AS url,
       {sql_canonical_url(_RAW_URL_SQL)} AS canon
FROM orders WHERE o_orderkey < {_URL_LIMIT}
ORDER BY o_orderkey
""",
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every rule driver-verified: lowercase scheme/host, fragment strip,
    default-port drop (http:80/https:443) with non-default ports kept,
    single trailing-slash strip, lexicographic query-param sort."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < _URL_LIMIT)
    url = F.expr(_RAW_URL_SQL)
    return o.select("o_orderkey", url.alias("url"), canonical_url(url).alias("canon"))


@_q(
    "url_dedup_counts",
    f"""
SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_variants
FROM (SELECT {sql_canonical_url(_RAW_URL_SQL)} AS canon
      FROM orders WHERE o_orderkey < {_URL_LIMIT})
GROUP BY canon
HAVING COUNT(*) > 1
ORDER BY canon
""",
)
def url_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: distinct raw spellings collapsing onto one
    canonical form — the hash-groupBy that removes refetch duplicates at
    crawl scale (exact dedup's URL-keyed sibling)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < _URL_LIMIT)
    canon = canonical_url(F.expr(_RAW_URL_SQL))
    return (
        o.select(canon.alias("canon"))
        .groupBy("canon")
        .agg(F.count("*").alias("n_variants"))
        .filter(F.col("n_variants") > 1)
    )

# ---------------------------------------------------------------------------
# Keyword routing predicate (P4) — pseudo-questions built from part names
# ---------------------------------------------------------------------------

from darkbo_spark.operators.routing import route_query, route_query_sql  # noqa: E402

_ROUTE_Q = "concat('what is the latest ', p_type, ' available today')"


@_q(
    "route_queries",
    f"""
SELECT p_partkey, {route_query_sql(_ROUTE_Q)} AS route
FROM part
""",
)
def route_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    question = F.concat(
        F.lit("what is the latest "), F.col("p_type"), F.lit(" available today")
    )
    return p.select("p_partkey", route_query(question).alias("route"))

# ---------------------------------------------------------------------------
# Chunking (P2) — rows-only (byte-exact python chunker; pytest-verified)
# ---------------------------------------------------------------------------

@_q("chunk_documents")
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.functions.textnorm import create_chunks_udf

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(create_chunks_udf(F.col("text"))).alias("chunk_index", "chunk"),
    )


def _chunks_oracle(id_limit: int, reps: int) -> str:
    """DuckDB replay of reference_impl.create_chunks (1000-char windows,
    100 overlap, end snapped to the LAST sentence boundary in the trailing
    200 chars): a RECURSIVE CTE carries the chunk `start` cursor; the
    last-boundary offset is the length of the greedy '(?s)^.*[.!?]\\s+'
    match over the 200-char snap window (greedy ^.* pins the match to the
    final boundary, exactly finditer()[-1].end()). Python strip() is
    replayed as a whitespace-regex trim (DuckDB trim() drops spaces only).
    The word-salad documents rows are short and unpunctuated, so the input
    is `repeat(text || '. ', reps)` — long enough to chunk, with real
    sentence boundaries to snap to — built by the same dialect-neutral
    expression on the Spark side."""
    snap = (
        "length(regexp_extract(substr(text, start + 801, 200),"
        " '(?s)^.*[.!?]\\s+', 0))"
    )
    end_snapped = (
        f"CASE WHEN start + 1000 < n THEN"
        f" CASE WHEN {snap} > 0 THEN start + 800 + {snap}"
        f" ELSE start + 1000 END"
        f" ELSE {{tail}} END"
    )
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, repeat(text || '. ', {reps}) AS text
  FROM documents WHERE doc_id < {id_limit}
),
d AS (SELECT doc_id, text, length(text) AS n FROM docs),
rec(doc_id, text, n, start) AS (
  SELECT doc_id, text, n, 0 FROM d WHERE n > 1000 AND text <> ''
  UNION ALL
  SELECT doc_id, text, n, greatest(start + 900, end_)
  FROM (
    SELECT doc_id, text, n, start,
           ({end_snapped.format(tail="start + 1000")}) AS end_
    FROM rec
  )
  WHERE greatest(start + 900, end_) < n
),
long_pieces AS (
  SELECT doc_id, start,
         regexp_replace(substr(text, start + 1,
           ({end_snapped.format(tail="n")}) - start),
           '^\\s+|\\s+$', '', 'g') AS piece
  FROM rec
),
short_pieces AS (
  SELECT doc_id, 0 AS start, text AS piece FROM d WHERE n <= 1000 AND text <> ''
),
all_pieces AS (
  SELECT doc_id, start, piece FROM long_pieces WHERE piece <> ''
  UNION ALL SELECT doc_id, start, piece FROM short_pieces
)
SELECT doc_id,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS chunk_index,
       piece AS chunk
FROM all_pieces
ORDER BY doc_id, chunk_index
"""


@_q("chunk_documents_x", _chunks_oracle(150, 7))
def chunk_documents_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 driver-oracled: the REAL Arrow chunker UDF (byte-exact
    reference_impl.create_chunks) over sentence-punctuated long text, vs
    the recursive-CTE DuckDB replay — multi-chunk windows, overlap and
    boundary snapping all hash-verified (the plain `chunk_documents` query
    keeps the raw short rows, where chunking is the identity)."""
    from darkbo_spark.functions.textnorm import create_chunks_udf

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    long = docs.select(
        "doc_id", F.expr("repeat(text || '. ', 7)").alias("text")
    )
    return long.select(
        "doc_id",
        F.posexplode(create_chunks_udf(F.col("text"))).alias("chunk_index", "chunk"),
    ).withColumn("chunk_index", F.col("chunk_index").cast("bigint"))

# ---------------------------------------------------------------------------
# Title derivation (P8)
# ---------------------------------------------------------------------------

@_q(
    "title_derivation",
    """
SELECT p_partkey,
       array_to_string(
         list_transform(string_split(replace(replace(p_name, '_', ' '), '-', ' '), ' '),
                        w -> upper(substring(w, 1, 1)) || lower(substring(w, 2))),
         ' ') AS title
FROM part
""",
)
def title_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    base = F.translate(F.col("p_name"), "_-", "  ")
    return p.select("p_partkey", F.initcap(base).alias("title"))

# ---------------------------------------------------------------------------
# Byte-identical clean_text parity (P1) — UDF vs DuckDB RE2 chain (ASCII corpus)
# ---------------------------------------------------------------------------

# \s is spelled as an explicit class: Python/Java \s includes \x0B, RE2's
# does not (ASCII corpus assumption for \w stands, as documented)
_CLEAN_ORACLE = r"""
WITH c1 AS (SELECT doc_id, regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g') AS t FROM documents),
c2 AS (SELECT doc_id, regexp_replace(t, '[^\w \t\n\r\f\x0B.,;:!?\-()\[\]"''/]', ' ', 'g') AS t FROM c1),
c3 AS (SELECT doc_id, regexp_replace(t, '\.{3,}', '...', 'g') AS t FROM c2),
c4 AS (SELECT doc_id, regexp_replace(t, '-{3,}', '---', 'g') AS t FROM c3),
c5 AS (SELECT doc_id, regexp_replace(t, '[ \t\n\r\f\x0B]+([,.;:!?])', '\1', 'g') AS t FROM c4),
c6 AS (SELECT doc_id, regexp_replace(t, '([,.;:!?])[ \t\n\r\f\x0B]*([,.;:!?])', '\1 \2', 'g') AS t FROM c5),
c7 AS (SELECT doc_id, trim(t) AS line FROM c6)
SELECT doc_id,
       md5(CASE WHEN length(line) > 10 OR (length(line) > 3 AND regexp_matches(line, '[A-Za-z]'))
                THEN line ELSE '' END) AS clean_fp
FROM c7
"""


@_q("clean_text_parity", _CLEAN_ORACLE)
def clean_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.functions.textnorm import clean_text_udf

    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(clean_text_udf(F.col("text"))).alias("clean_fp")
    )


# ---------------------------------------------------------------------------
# Token-budget shard packing (training-data output step): documents in
# stable doc_id order packed into ~2000-token shards. The Spark side runs
# the DISTRIBUTED prefix sum (range partition → per-partition window →
# broadcast offsets — no SinglePartition exchange, gated in PLANS.md);
# DuckDB replays the global running sum directly. shard_id uses the
# exact-multiple division form on both engines.
# ---------------------------------------------------------------------------

_SHARD_BUDGET = 2000

_SHARD_ORACLE = f"""
WITH d AS (
  SELECT doc_id, CAST({ta.sql_token_count('text')} AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens
  FROM d
)
SELECT doc_id, n_tokens, cum_tokens,
       CAST(((cum_tokens - n_tokens) - (cum_tokens - n_tokens) % {_SHARD_BUDGET})
            / {_SHARD_BUDGET} AS BIGINT) AS shard_id
FROM c
ORDER BY doc_id
"""


@_q("shard_pack_x", _SHARD_ORACLE)
def shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed prefix-sum shard packing, driver-oracled: every doc's
    global cumulative token count and shard assignment hash-match a
    serial DuckDB running sum — while the Spark plan provably avoids the
    single-partition window funnel."""
    from darkbo_spark.operators.sharding import pack_shards

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", ta.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return pack_shards(docs, budget=_SHARD_BUDGET).select(
        "doc_id", "n_tokens", "cum_tokens", "shard_id"
    )
