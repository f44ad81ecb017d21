"""Free-text query parsing for the sparse/hybrid channel.

The reference parses raw user queries through Whoosh's QueryParser before
searching (behavior: /root/reference/ai_worker.py:208-213 —
``QueryParser("content", schema).parse(query)`` with the default AND group
over StandardAnalyzer tokens: \\w+ tokenize → lowercase → drop stopwords
and single-char tokens). This module reproduces those default semantics so
a raw question string — not a pre-tokenized term list — drives the
postings join:

* ``"quoted phrases"`` are kept whole and must appear verbatim (substring
  containment on the document text).
* remaining text → lowercase \\w+ terms, minus stopwords and len<2 tokens
  (Whoosh StopFilter defaults: minsize=2).
* AND semantics: a document matches only if it contains EVERY term (and
  every phrase); ranking over the matched set is BM25 — same shape as
  Whoosh's searcher.search(parsed_query).

Parsing runs driver-side on the literal query string (exactly where the
reference runs it); the distributed part is the postings semi-join +
HAVING-count match, which is one broadcast join + one aggregate at any
corpus size.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from darkbo_spark.operators.tfidf import bm25_score_query, build_bm25_postings
from darkbo_spark.reference_impl import STOP_WORDS

_PHRASE = re.compile(r'"([^"]*)"')
_WORD = re.compile(r"\w+")


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)  # AND-required terms
    phrases: list[str] = field(default_factory=list)  # verbatim substrings


def parse_query(text: str) -> ParsedQuery:
    """Whoosh-default parse: quoted phrases + AND-grouped analyzed terms."""
    phrases = [p.strip().lower() for p in _PHRASE.findall(text or "") if p.strip()]
    rest = _PHRASE.sub(" ", text or "")
    seen: set[str] = set()
    terms: list[str] = []
    for w in _WORD.findall(rest.lower()):
        if len(w) < 2 or w in STOP_WORDS or w in seen:
            continue
        seen.add(w)
        terms.append(w)
    return ParsedQuery(terms=terms, phrases=phrases)


_NW = "[^0-9a-z_]"  # non-word class, spelled explicitly (identical in Java
# regex and RE2/DuckDB; text is lowercased before matching)


def phrase_regex(phrase: str) -> str | None:
    """Analyzed-phrase pattern: the phrase's \\w+ words in order, separated
    by runs of non-word chars, anchored on word boundaries. None when the
    phrase has no word tokens."""
    words = _WORD.findall(phrase.lower())
    if not words:
        return None
    body = f"{_NW}+".join(words)
    return f"(^|{_NW}){body}({_NW}|$)"


def search_text(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    postings: DataFrame | None = None,
) -> DataFrame:
    """End-to-end sparse search from a RAW query string: parse → AND-match →
    BM25 rank → top-k. Returns (doc_id, score).

    `postings` may be a pre-materialized BM25 postings table (the S13 sparse
    index published as a SnapshotTable) — the production serving path, where
    the index is built once and every query reads the stored table. When
    None, postings are built inline from `docs` (self-contained form)."""
    pq = parse_query(query)
    if postings is None:
        postings = build_bm25_postings(docs, text_col, id_col)
    if pq.terms:
        spark = docs.sparkSession
        import pandas as pd

        q = spark.createDataFrame(pd.DataFrame({"token": sorted(set(pq.terms))}))
        # AND semantics: keep docs whose matched-term count equals |terms|
        matched = (
            postings.join(F.broadcast(q), "token")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_nt"))
            .filter(F.col("_nt") == len(set(pq.terms)))
            .select("doc_id")
        )
    else:
        matched = docs.select(F.col(id_col).alias("doc_id"))
    patterns = [p for p in (phrase_regex(ph) for ph in pq.phrases) if p is not None]
    if patterns:
        # positional phrase semantics (Whoosh analyzed-phrase): the phrase
        # WORDS in order, separated by non-word chars, on word boundaries —
        # raw substring containment would match 'profi[table scan]dal'.
        # CANDIDATES-FIRST: semi-join docs down to the AND-matched set
        # before running any regex — the AND match prunes hard, so the
        # rlike scans a handful of rows instead of the full corpus, and all
        # phrases verify in ONE narrow pass (not one corpus scan per phrase)
        cand_docs = docs.select(
            F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_lt")
        ).join(matched, "doc_id", "left_semi")
        cond = F.col("_lt").rlike(patterns[0])
        for pat in patterns[1:]:
            cond = cond & F.col("_lt").rlike(pat)
        matched = cand_docs.filter(cond).select("doc_id")
    candidates = postings.join(matched, "doc_id", "left_semi")
    # ranking terms include the analyzed words of phrases (Whoosh scores
    # phrase queries by their word weights too)
    rank_terms = list(pq.terms)
    for ph in pq.phrases:
        rank_terms.extend(
            w for w in _WORD.findall(ph) if len(w) >= 2 and w not in STOP_WORDS
        )
    if not rank_terms:
        return candidates.select("doc_id").distinct().select(
            "doc_id", F.lit(0.0).alias("score")
        ).orderBy(F.asc("doc_id")).limit(top_k)
    return bm25_score_query(candidates, rank_terms, top_k=top_k)
