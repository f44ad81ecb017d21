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

from darkbo_spark.operators.tfidf import (
    bm25_postings_for_query,
    bm25_score_query,
    build_bm25_postings,
)
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
    # ranking terms include the analyzed words of phrases (Whoosh scores
    # phrase queries by their word weights too)
    rank_terms = sorted(
        set(pq.terms)
        | {
            w
            for ph in pq.phrases
            for w in _WORD.findall(ph)
            if len(w) >= 2 and w not in STOP_WORDS
        }
    )
    if not rank_terms:
        # zero-score listing shape (no analyzable words): needs the full
        # postings roster — keep the unfused path for this rare edge
        if postings is None:
            postings = build_bm25_postings(docs, text_col, id_col)
        matched = docs.select(F.col(id_col).alias("doc_id"))
        patterns = [p for p in (phrase_regex(ph) for ph in pq.phrases) if p]
        if patterns:
            cand_docs = docs.select(
                F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_lt")
            ).join(matched, "doc_id", "left_semi")
            cond = F.col("_lt").rlike(patterns[0])
            for pat in patterns[1:]:
                cond = cond & F.col("_lt").rlike(pat)
            matched = cand_docs.filter(cond).select("doc_id")
        return (
            postings.join(matched, "doc_id", "left_semi")
            .select("doc_id")
            .distinct()
            .select("doc_id", F.lit(0.0).alias("score"))
            .orderBy(F.asc("doc_id"))
            .limit(top_k)
        )
    # FUSED match+rank: one aggregate over the query's token rows computes
    # the AND-match count and the BM25 score together — the old
    # matched-agg → candidates-semi-join → score-agg chain collapsed to a
    # single exchange (identical rows/values: a doc scores iff it has ≥1
    # rank-token row, which the inner scoring join enforced before).
    # Token restriction is a literal isin (pushes to the scan as
    # PushedFilters on the stored path — a tiny-frame broadcast join
    # cannot), and weights for the inline path are built only for the
    # query's tokens (bm25_postings_for_query, arithmetic-identical).
    needed = sorted(set(pq.terms) | set(rank_terms))
    if postings is None:
        postings = bm25_postings_for_query(docs, needed, text_col, id_col)
    sub = postings.filter(F.col("token").isin(needed))
    aggs = [
        F.sum(
            F.when(
                F.col("token").isin(rank_terms), F.col("w").cast("decimal(18,6)")
            )
        ).alias("_score")
    ]
    match_terms = sorted(set(pq.terms))
    if match_terms:
        aggs.append(
            F.count(F.when(F.col("token").isin(match_terms), F.lit(1))).alias("_nt")
        )
    agg = sub.groupBy("doc_id").agg(*aggs)
    if match_terms:
        # AND semantics: keep docs whose matched-term count equals |terms|
        agg = agg.filter(F.col("_nt") == len(match_terms))
    patterns = [p for p in (phrase_regex(ph) for ph in pq.phrases) if p is not None]
    if patterns:
        # positional phrase semantics (Whoosh analyzed-phrase): the phrase
        # WORDS in order, separated by runs of non-word chars, on word
        # boundaries. CANDIDATES-FIRST: semi-join docs down to the matched
        # set before running any regex, all phrases verified in ONE pass.
        cand_docs = docs.select(
            F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_lt")
        ).join(agg.select("doc_id"), "doc_id", "left_semi")
        cond = F.col("_lt").rlike(patterns[0])
        for pat in patterns[1:]:
            cond = cond & F.col("_lt").rlike(pat)
        agg = agg.join(cand_docs.filter(cond).select("doc_id"), "doc_id", "left_semi")
    return (
        agg.filter(F.col("_score").isNotNull())
        .select("doc_id", F.col("_score").cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# Boolean extension — Whoosh QueryParser's OR / NOT operators and
# parenthesized grouping (uppercase keywords, Whoosh precedence
# NOT > AND > OR, parens override; AND is the default group so an
# explicit AND is a no-op separator). The recursive-descent parse
# flattens to DNF — an OR of AND-clauses, each with positive and negated
# factors — because that is exactly the shape the matcher executes
# (union of clause matches, negation as candidate anti-join). A negated
# GROUP applies De Morgan: NOT (a OR b) folds both negations into the
# enclosing clause; NOT (a AND b) distributes into one clause per
# negated factor. DNF distribution is worst-case exponential in nesting
# depth, which is irrelevant at user-query sizes (Whoosh normalizes the
# same way).
# ---------------------------------------------------------------------------

_BOOL_TOKEN = re.compile(r'"[^"]*"|\(|\)|[^\s()]+')


@dataclass
class BoolClause:
    terms: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    not_terms: list[str] = field(default_factory=list)
    not_phrases: list[str] = field(default_factory=list)
    # Whoosh fielded terms (field:value): (field, value, negated)
    fielded: list[tuple[str, str, bool]] = field(default_factory=list)

    def has_positive(self) -> bool:
        return bool(self.terms or self.phrases or any(not n for _, _, n in self.fielded))


@dataclass
class BoolQuery:
    clauses: list[BoolClause] = field(default_factory=list)  # OR of clauses


_FIELDED = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(\S+)$")


# a literal is (kind, payload, negated): kind "term" (analyzed word),
# "phrase" (verbatim), or "fielded" ((field, value)); a DNF is a list of
# clauses, each a list of literals
_Lit = tuple


def _analyze_factor(raw: str, fields: tuple[str, ...]) -> list[tuple]:
    """One non-operator token → its positive literals (a multi-word token
    contributes one term literal per analyzed word, like the flat
    parser)."""
    fm = _FIELDED.match(raw)
    if fm and fm.group(1).lower() in fields:
        return [("fielded", (fm.group(1).lower(), fm.group(2).lower()))]
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        ph = raw[1:-1].strip().lower()
        return [("phrase", ph)] if ph else []
    return [
        ("term", w)
        for w in _WORD.findall(raw.lower())
        if len(w) >= 2 and w not in STOP_WORDS
    ]


def _dnf_and(a: list[list[_Lit]], b: list[list[_Lit]]) -> list[list[_Lit]]:
    return [ca + cb for ca in a for cb in b]


def _dnf_neg(dnf: list[list[_Lit]]) -> list[list[_Lit]]:
    """De Morgan over a DNF: NOT (OR of clauses) = AND over each clause's
    negation; NOT (AND of literals) = OR of the flipped literals."""
    out: list[list[_Lit]] = [[]]
    for clause in dnf:
        if not clause:
            return []  # NOT(match-all) matches nothing
        flipped = [[(k, v, not n)] for (k, v, n) in clause]
        out = _dnf_and(out, flipped)
    return out


class _TokStream:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str | None:
        t = self.peek()
        self.i += 1
        return t


def _parse_or(p: _TokStream, fields, depth: int = 0) -> list[list[_Lit]]:
    dnf = _parse_and(p, fields, depth)
    while p.peek() == "OR":
        p.next()
        dnf = dnf + _parse_and(p, fields, depth)
    return dnf


def _parse_and(p: _TokStream, fields, depth: int) -> list[list[_Lit]]:
    dnf: list[list[_Lit]] | None = None
    while True:
        t = p.peek()
        if t is None or t == "OR":
            break
        if t == ")":
            if depth > 0:
                break  # closes the enclosing group
            p.next()  # unbalanced close at top level — noise, skip
            continue
        if t == "AND":
            p.next()
            continue
        u = _parse_unary(p, fields, depth)
        if u is None:
            continue
        dnf = u if dnf is None else _dnf_and(dnf, u)
    return dnf if dnf is not None else [[]]


def _parse_unary(p: _TokStream, fields, depth: int) -> list[list[_Lit]] | None:
    t = p.peek()
    if t == "NOT":
        # consume NOT plus any no-op separators / repeated NOTs after it
        # (the flat parser's `negate = True` never toggled back)
        while p.peek() in ("NOT", "AND"):
            p.next()
        nxt = p.peek()
        if nxt is None or nxt in ("OR", ")"):
            return None  # stray trailing NOT — ignored, like the flat parser
        if nxt == "(":
            inner = _parse_primary(p, fields, depth)
            return _dnf_neg(inner) if inner is not None else None
        p.next()
        # plain token: every analyzed word negated WITHIN one clause
        # (flat-parser behavior for multi-word tokens under NOT)
        lits = _analyze_factor(nxt, fields)
        return [[(k, v, True) for k, v in lits]] if lits else None
    return _parse_primary(p, fields, depth)


def _parse_primary(p: _TokStream, fields, depth: int) -> list[list[_Lit]] | None:
    t = p.next()
    if t == "(":
        inner = _parse_or(p, fields, depth + 1)
        if p.peek() == ")":
            p.next()
        return inner
    lits = _analyze_factor(t, fields)
    return [[(k, v, False) for k, v in lits]] if lits else None


def parse_boolean_query(
    text: str, fields: tuple[str, ...] = ()
) -> BoolQuery:
    """OR-of-AND-clauses with NOT'd factors and parenthesized grouping
    (`(a OR b) AND c` distributes to `a c OR b c`). Factors are analyzed
    exactly like parse_query (lowercase \\w+, stopwords and len<2 dropped
    — a negated stopword therefore vanishes, matching Whoosh's
    analyzer-first behavior); quoted phrases are factors too. A
    `field:value` token whose field is in `fields` becomes a fielded
    exact-match factor (Whoosh fielded syntax); unknown-field tokens fall
    back to plain term analysis of the whole token, like Whoosh's
    default-field behavior. Ungrouped queries parse to the identical
    BoolQuery the round-5 flat parser produced (pinned in tests)."""
    dnf = _parse_or(_TokStream(_BOOL_TOKEN.findall(text or "")), fields)
    clauses: list[BoolClause] = []
    for lits in dnf:
        c = BoolClause()
        for kind, payload, neg in lits:
            if kind == "term":
                dst = c.not_terms if neg else c.terms
                if payload not in dst:
                    dst.append(payload)
            elif kind == "phrase":
                (c.not_phrases if neg else c.phrases).append(payload)
            else:
                c.fielded.append((payload[0], payload[1], neg))
        clauses.append(c)
    return BoolQuery(
        clauses=[
            c
            for c in clauses
            # a clause whose only factors are NEGATED fielded literals is
            # still satisfiable (NOT (lang:en AND scan) distributes to
            # [NOT lang:en] OR [NOT scan]) — dropping it would lose the
            # not-lang:en docs from the union; the matcher evaluates
            # negated fielded factors as docs-side predicates already
            if c.has_positive() or c.not_terms or c.not_phrases or c.fielded
        ]
    )


def boolean_query_tokens(bq: BoolQuery) -> set[str]:
    """Every token a boolean search touches in the POSTINGS table —
    positive terms (AND match), negated terms (the has-negative anti-join
    probe), and the analyzed words of positive phrases (BM25 ranking).
    Phrases match via docs-side regex and fielded factors via docs
    columns, so neither adds postings tokens beyond ranking words. This
    is the partition-pruning key set for stored serving: a stored-index
    scan can drop every token bucket outside this set."""
    toks: set[str] = set()
    for c in bq.clauses:
        toks.update(c.terms)
        toks.update(c.not_terms)
        for ph in c.phrases:
            toks.update(
                w for w in _WORD.findall(ph) if len(w) >= 2 and w not in STOP_WORDS
            )
    return toks


def _clause_matches(docs, postings, clause, text_col, id_col):
    """doc_id frame matching one clause: AND over positive factors, then
    negated factors removed FROM THE CANDIDATES (negation never scans the
    corpus when the clause has positive factors). Fielded factors are
    exact lowercase matches on their column — pure pushdown-able filters
    applied to the docs side before anything else."""
    spark = docs.sparkSession
    import pandas as pd

    if clause.fielded:
        cond = F.lit(True)
        for fld, val, neg in clause.fielded:
            eq = F.lower(F.col(fld).cast("string")) == val
            cond = cond & (~eq if neg else eq)
        docs = docs.filter(cond)
    if clause.terms:
        q = spark.createDataFrame(pd.DataFrame({"token": sorted(set(clause.terms))}))
        matched = (
            postings.join(F.broadcast(q), "token")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_nt"))
            .filter(F.col("_nt") == len(set(clause.terms)))
            .select("doc_id")
        )
        if clause.fielded:
            matched = matched.join(
                docs.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
            )
    else:
        matched = docs.select(F.col(id_col).alias("doc_id"))
    pos_pats = [p for p in (phrase_regex(ph) for ph in clause.phrases) if p]
    neg_pats = [p for p in (phrase_regex(ph) for ph in clause.not_phrases) if p]
    if pos_pats or neg_pats:
        cand = docs.select(
            F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_lt")
        ).join(matched, "doc_id", "left_semi")
        cond = F.lit(True)
        for pat in pos_pats:
            cond = cond & F.col("_lt").rlike(pat)
        for pat in neg_pats:
            cond = cond & ~F.col("_lt").rlike(pat)
        matched = cand.filter(cond).select("doc_id")
    if clause.not_terms:
        nq = spark.createDataFrame(
            pd.DataFrame({"token": sorted(set(clause.not_terms))})
        )
        has_neg = (
            postings.join(F.broadcast(nq), "token").select("doc_id").distinct()
        )
        matched = matched.join(has_neg, "doc_id", "left_anti")
    return matched


def search_boolean(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    postings: DataFrame | None = None,
    fields: tuple[str, ...] = (),
) -> DataFrame:
    """Boolean sparse search: OR/NOT extension of search_text. Matching is
    the union of clause matches; ranking is BM25 over every POSITIVE
    analyzed term/phrase-word in the query (Whoosh's scoring shape — NOT
    factors filter, they never score). Returns (doc_id, score)."""
    bq = parse_boolean_query(query, fields=fields)
    if not bq.clauses:
        return docs.select(
            F.col(id_col).alias("doc_id"), F.lit(0.0).alias("score")
        ).limit(0)
    rank_terms: list[str] = []
    for c in bq.clauses:
        rank_terms.extend(c.terms)
        for ph in c.phrases:
            rank_terms.extend(
                w for w in _WORD.findall(ph) if len(w) >= 2 and w not in STOP_WORDS
            )
    rank_terms = sorted(set(rank_terms))
    if not rank_terms:
        # zero-score listing shape (pure-negation / fielded-only query):
        # ranges over docs with ANY token — keep the unfused path and the
        # full postings roster for this rare edge
        if postings is None:
            postings = build_bm25_postings(docs, text_col, id_col)
        matched = _clause_matches(docs, postings, bq.clauses[0], text_col, id_col)
        for clause in bq.clauses[1:]:
            matched = matched.union(
                _clause_matches(docs, postings, clause, text_col, id_col)
            )
        matched = matched.distinct()
        candidates = postings.join(matched, "doc_id", "left_semi")
        return candidates.select("doc_id").distinct().select(
            "doc_id", F.lit(0.0).alias("score")
        ).orderBy(F.asc("doc_id")).limit(top_k)
    # FUSED clause-match + rank: ONE aggregate over the query's token rows
    # computes every clause's positive-term count, negated-term count and
    # the BM25 score together; docs-side factors (fielded equality,
    # phrase regexes) are verified candidates-first in one narrow docs
    # pass. Identical results to the per-clause union form: a doc reaches
    # the output iff it matches ≥1 clause AND has ≥1 rank-token row (the
    # inner scoring join enforced the latter before; the _score-notnull
    # filter does now), and clause membership is a per-doc predicate, so
    # OR-ing predicates ≡ unioning matched sets. Token restriction is a
    # literal isin (PushedFilters on the stored path); inline weights are
    # built only for the query's tokens (bm25_postings_for_query).
    needed = sorted(boolean_query_tokens(bq))
    if postings is None:
        postings = bm25_postings_for_query(docs, needed, text_col, id_col)
    sub = postings.filter(F.col("token").isin(needed))
    aggs = [
        F.sum(
            F.when(
                F.col("token").isin(rank_terms), F.col("w").cast("decimal(18,6)")
            )
        ).alias("_score")
    ]
    for i, c in enumerate(bq.clauses):
        if c.terms:
            aggs.append(
                F.count(
                    F.when(F.col("token").isin(sorted(set(c.terms))), F.lit(1))
                ).alias(f"_nt{i}")
            )
        if c.not_terms:
            aggs.append(
                F.count(
                    F.when(F.col("token").isin(sorted(set(c.not_terms))), F.lit(1))
                ).alias(f"_nn{i}")
            )
    agg = sub.groupBy("doc_id").agg(*aggs)
    # docs-side clause factors: fielded exact matches and positional
    # phrase regexes, evaluated once per candidate doc (semi-join first —
    # the regex never scans the full corpus)
    doc_conds: dict[int, F.Column] = {}
    lt = F.lower(F.col(text_col))
    for i, c in enumerate(bq.clauses):
        cond = None
        for fld, val, neg in c.fielded:
            eq = F.lower(F.col(fld).cast("string")) == val
            eq = ~eq if neg else eq
            cond = eq if cond is None else cond & eq
        for pat in (p for p in (phrase_regex(ph) for ph in c.phrases) if p):
            e = lt.rlike(pat)
            cond = e if cond is None else cond & e
        for pat in (p for p in (phrase_regex(ph) for ph in c.not_phrases) if p):
            e = ~lt.rlike(pat)
            cond = e if cond is None else cond & e
        if cond is not None:
            doc_conds[i] = cond
    if doc_conds:
        cand_docs = (
            docs if id_col == "doc_id" else docs.withColumnRenamed(id_col, "doc_id")
        ).join(agg.select("doc_id"), "doc_id", "left_semi")
        flags = cand_docs.select(
            "doc_id", *[doc_conds[i].alias(f"_pf{i}") for i in sorted(doc_conds)]
        )
        agg = agg.join(flags, "doc_id")
    match = None
    for i, c in enumerate(bq.clauses):
        cc = F.lit(True)
        if c.terms:
            cc = cc & (F.col(f"_nt{i}") == len(set(c.terms)))
        if c.not_terms:
            cc = cc & (F.col(f"_nn{i}") == 0)
        if i in doc_conds:
            cc = cc & F.col(f"_pf{i}")
        match = cc if match is None else match | cc
    return (
        agg.filter(match)
        .filter(F.col("_score").isNotNull())
        .select("doc_id", F.col("_score").cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )
