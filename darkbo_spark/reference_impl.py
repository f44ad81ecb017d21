"""Plain-Python semantic core — the single source of truth for every
byte-sensitive transformation in the engine.

These functions define WHAT the pipeline computes. They are used in two
places so that parity is exact *by construction*:

1. inside the vectorized Arrow UDFs (``darkbo_spark.functions``) that run
   on executors, and
2. as the pytest oracle that golden tests compare Spark output against.

Semantics preserved from the reference (muneebakhter/DARKBO, read-only at
/root/reference — behavior studied, code NOT copied):

* ``clean_text``      — the normalization invariant of
  ``api/document_processor.py:130-157`` (whitespace collapse, charset
  restriction, ellipsis/dash folding, punctuation spacing, short-line drop).
  The north rule requires byte-identical extracted text per url, which is
  why this runs as Python ``re`` inside an Arrow UDF rather than being
  re-expressed with JVM ``regexp_replace`` (Java and Python ``\\w``/unicode
  semantics differ).
* ``create_chunks``   — the 1000/100 overlap chunker with sentence-boundary
  snap of ``api/document_processor.py:159-197``.
* ``relevance_score`` — the hand-tuned lexical scorer of
  ``ai_worker.py:337-411`` (primary/secondary weights, stopword bonuses,
  phrase + coverage bonuses).
* ``uuid5_id``        — deterministic content-addressed ids in the style of
  ``api/models.py:26-29,84-88`` (uuid5 over a namespaced key string).

New definitions owned by this rebuild (no reference analog — the reference
has no sentence segmenter or triple extractor; nearest analogs are the
chunk-boundary regex ``document_processor.py:179`` and the phone-regex
argument extractor ``ai_worker.py:554``):

* ``split_sentences``  — segmentation over *cleaned* text.
* ``extract_triples``  — rule-based OpenIE-style (subj, pred, obj) patterns.
"""

from __future__ import annotations

import hashlib
import re
import uuid
from typing import List, Tuple

# ---------------------------------------------------------------------------
# Text normalization (byte-identical invariant)
# ---------------------------------------------------------------------------

_WS = re.compile(r"\s+")
_CHARSET = re.compile(r"[^\w\s\.\,\;\:\!\?\-\(\)\[\]\"\'\/]")
_ELLIPSIS = re.compile(r"\.{3,}")
_DASHES = re.compile(r"-{3,}")
_SPACE_BEFORE_PUNCT = re.compile(r"\s+([,.;:!?])")
_PUNCT_PAIR = re.compile(r"([,.;:!?])\s*([,.;:!?])")


def clean_text(text: str) -> str:
    """Normalize raw page text. Byte-identical to the reference invariant
    (api/document_processor.py:130-157)."""
    if not text:
        return ""
    text = _WS.sub(" ", text)
    text = _CHARSET.sub(" ", text)
    text = _ELLIPSIS.sub("...", text)
    text = _DASHES.sub("---", text)
    text = _SPACE_BEFORE_PUNCT.sub(r"\1", text)
    text = _PUNCT_PAIR.sub(r"\1 \2", text)
    kept = []
    for line in text.split("\n"):
        line = line.strip()
        if len(line) > 10 or (len(line) > 3 and any(c.isalpha() for c in line)):
            kept.append(line)
    return "\n".join(kept).strip()


# ---------------------------------------------------------------------------
# Chunking (1000-char windows, 100 overlap, sentence-boundary snap)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 1000  # api/document_processor.py:33
CHUNK_OVERLAP = 100  # api/document_processor.py:34
_SNAP_WINDOW = 200  # api/document_processor.py:179
_SENT_END = re.compile(r"[.!?]\s+")


def create_chunks(text: str) -> List[str]:
    """Overlapping chunks with end snapped to the last sentence boundary in
    the trailing 200 chars (api/document_processor.py:159-197)."""
    if not text:
        return []
    n = len(text)
    if n <= CHUNK_SIZE:
        return [text]
    chunks: List[str] = []
    start = 0
    while start < n:
        end = start + CHUNK_SIZE
        if end < n:
            window = text[start:end]
            endings = [m.end() for m in _SENT_END.finditer(window[-_SNAP_WINDOW:])]
            if endings:
                end = start + len(window) - _SNAP_WINDOW + endings[-1]
        piece = text[start:end].strip()
        if piece:
            chunks.append(piece)
        start = max(start + CHUNK_SIZE - CHUNK_OVERLAP, end)
        if start >= n:
            break
    return chunks


# ---------------------------------------------------------------------------
# Sentence segmentation (rebuild-owned; operates on clean_text output where
# punctuation spacing is already normalized to "X. Y")
# ---------------------------------------------------------------------------

_SENT_SPLIT = re.compile(r"(?<=[.!?]) +")


def split_sentences(text: str) -> List[str]:
    """Split normalized text into sentences. Deterministic, whitespace-exact."""
    if not text:
        return []
    return [s for s in (p.strip() for p in _SENT_SPLIT.split(text)) if s]


# ---------------------------------------------------------------------------
# Lexical relevance scoring (ai_worker.py:337-411 math, exactly)
# ---------------------------------------------------------------------------

STOP_WORDS = frozenset(
    {"what", "is", "the", "a", "an", "are", "was", "were", "how", "when", "where", "why"}
)  # ai_worker.py:377

_WORD = re.compile(r"\w+")


def relevance_score(query_lower: str, primary_text: str, secondary_text: str) -> float:
    """Lexical relevance of (primary, secondary) doc fields to a query.

    Reproduces the reference scorer's arithmetic exactly
    (ai_worker.py:337-411): +2.0/+1.0 per word hit in primary/secondary,
    +0.5*n multi-match bonus, +1.0/+0.5 content-word bonus, +2.0 (or ratio)
    full-content-coverage bonus, +3.0/+1.5 exact-phrase bonus, and a
    coverage-ratio bonus when at least half the query words match.
    NOTE: the ratio/coverage bonuses are fractional (e.g. 2/3), so scores
    are NOT half-integral in general; cross-engine parity holds because the
    Spark column expression evaluates the identical IEEE-double operations
    in the identical order as this oracle, not because sums are exact.
    """
    words = _WORD.findall(query_lower)
    if not words:
        return 0.0
    score = 0.0
    primary_hits = 0
    secondary_hits = 0
    for w in words:
        if w in primary_text:
            score += 2.0
            primary_hits += 1
        elif w in secondary_text:
            score += 1.0
            secondary_hits += 1
    total = primary_hits + secondary_hits
    if total > 1:
        score += total * 0.5
    content_in_primary = 0
    for w in words:
        if w not in STOP_WORDS:
            if w in primary_text:
                content_in_primary += 1
                score += 1.0
            elif w in secondary_text:
                score += 0.5
    content_words = [w for w in words if w not in STOP_WORDS]
    if content_words:
        ratio = content_in_primary / len(content_words)
        if ratio == 1.0:
            score += 2.0
        elif ratio >= 0.5:
            score += ratio * 1.0
    phrase = " ".join(words)
    if phrase in primary_text:
        score += 3.0
    elif phrase in secondary_text:
        score += 1.5
    coverage = total / len(words)
    if coverage >= 0.5:
        score += coverage * 1.0
    return score


# ---------------------------------------------------------------------------
# Deterministic ids (uuid5 content addressing, api/models.py:26-29,84-88 style)
# ---------------------------------------------------------------------------


def uuid5_id(kind: str, *parts: str) -> str:
    """Deterministic id: uuid5(NAMESPACE_URL, "{kind}:{p1}:{p2}:...")."""
    return str(uuid.uuid5(uuid.NAMESPACE_URL, ":".join((kind,) + parts)))


def sha256_id(kind: str, *parts: str) -> str:
    """SHA-256 based deterministic id (cross-engine: Spark sha2 / DuckDB
    sha256 compute the identical hex), used where the driver's DuckDB oracle
    must reproduce the id natively."""
    return hashlib.sha256((":".join((kind,) + parts)).encode("utf-8")).hexdigest()[:32]


# ---------------------------------------------------------------------------
# Rule-based OpenIE-style triple extraction (rebuild-owned)
# ---------------------------------------------------------------------------

# An entity mention: capitalized token run, allowing inner '&', '-' and
# digits after the first char. E.g. "Acme Corp", "B2B Labs". '.' is
# deliberately excluded so sentence-final periods never leak into mentions.
_ENT = r"[A-Z][\w&\-]*(?: [A-Z][\w&\-]*)*"
_YEAR = r"(?:1[89]\d\d|20\d\d)"
_CITY = _ENT

# Ordered relation patterns. Order matters: first match wins per sentence
# per pattern; all patterns are attempted so one sentence may yield several
# triples. Each pattern maps a sentence to (subj, predicate, obj).
TRIPLE_PATTERNS: List[Tuple[str, re.Pattern]] = [
    ("founded_by", re.compile(rf"\b(?P<s>{_ENT}) was founded by (?P<o>{_ENT})")),
    ("founded_in", re.compile(rf"\b(?P<s>{_ENT}) was founded in (?P<o>{_YEAR})")),
    ("based_in", re.compile(rf"\b(?P<s>{_ENT}) is (?:based|headquartered) in (?P<o>{_CITY})")),
    ("ceo_of", re.compile(rf"\b(?P<s>{_ENT}) is the CEO of (?P<o>{_ENT})")),
    ("works_at", re.compile(rf"\b(?P<s>{_ENT}) works (?:at|for) (?P<o>{_ENT})")),
    ("born_in", re.compile(rf"\b(?P<s>{_ENT}) was born in (?P<o>{_CITY})")),
    ("acquired", re.compile(rf"\b(?P<s>{_ENT}) acquired (?P<o>{_ENT})")),
    ("subsidiary_of", re.compile(rf"\b(?P<s>{_ENT}) is a subsidiary of (?P<o>{_ENT})")),
    ("partnered_with", re.compile(rf"\b(?P<s>{_ENT}) partnered with (?P<o>{_ENT})")),
    ("launched", re.compile(rf"\b(?P<s>{_ENT}) launched (?P<o>{_ENT})")),
    ("located_in", re.compile(rf"\b(?P<s>{_ENT}) is located in (?P<o>{_CITY})")),
    ("is_a", re.compile(rf"\b(?P<s>{_ENT}) is an? (?P<o>[a-z][\w\- ]*?(?:company|organization|startup|firm|university|agency))\b")),
]


# fast pre-filter: a sentence can only match a pattern if it contains one of
# these anchor words; one scan instead of twelve (pure optimization — skips
# only sentences that can never match, so output is unchanged)
_QUICK = re.compile(
    r"founded|based|headquartered|CEO|works|born|acquired|subsidiary|"
    r"partnered|launched|located|is an? "
)


def extract_triples(sentence: str) -> List[Tuple[str, str, str]]:
    """All (subj, pred, obj) matches of the ordered rule patterns against one
    sentence. Deterministic: patterns applied in fixed order, leftmost match
    each."""
    if not _QUICK.search(sentence):
        return []
    out: List[Tuple[str, str, str]] = []
    for pred, pat in TRIPLE_PATTERNS:
        m = pat.search(sentence)
        if m:
            out.append((m.group("s").strip(), pred, m.group("o").strip()))
    return out


def extract_doc_triples(url: str, text: str) -> List[dict]:
    """End-to-end per-document reference path: clean → segment → extract,
    with deterministic triple ids. This is the pytest oracle for the whole
    Spark E→S→T pipeline."""
    cleaned = clean_text(text)
    rows = []
    for sent_idx, sent in enumerate(split_sentences(cleaned)):
        for subj, pred, obj in extract_triples(sent):
            rows.append(
                {
                    "url": url,
                    "sent_idx": sent_idx,
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "triple_id": uuid5_id("triple", url, str(sent_idx), subj, pred, obj),
                }
            )
    return rows
