"""Real merge-table BPE token counting (beyond-reference LLM-pipeline op).

`bpe_token_counts` in text_analysis.py is a regex PRE-tokenizer count —
useful as a cheap native estimate, but real training pipelines count real
BPE tokens. This module implements the actual algorithm (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units",
GPT-2-style byte-pair application: merge ALL occurrences of the
lowest-rank pair until no merge applies):

* a FIXED merge table, trained deterministically at import time from an
  embedded corpus (count-then-lexicographic tie-break → bit-reproducible
  across runs, machines, and Python hash seeds). Production would load a
  released tokenizer's merge file; the training code doubles as the
  loader's documented format.
* `bpe_tokens(text)` — the plain-Python encoder (pre-tokenize with the
  same cross-engine regex as text_analysis.BPE_PATTERN, then merge loop).
* `bpe_token_count_udf` — an Arrow-batched pandas UDF applying the SAME
  function (exact-by-construction parity, the clean_text pattern), with a
  per-word LRU cache: web text repeats words heavily, so the merge loop
  runs once per distinct pre-token per batch, not once per occurrence.

Scale notes: the merge table is a broadcast-sized constant baked into the
UDF closure (GPT-2's full table is ~50k pairs ≈ 1 MB — trivially
shippable). The UDF is the only Python in the path and it is Arrow-batched;
everything around it (explode-free, per-row scalar out) stays columnar.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

# Same pre-tokenization as text_analysis.BPE_PATTERN: word / number / punct
# runs with leading-space attachment, whitespace spelled as an explicit
# class (Java/RE2/Python read it identically).
_BPE_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0B]+")

# Deterministic training corpus: generic English covering the function-word
# and morpheme distribution the synthetic documents use. Self-contained —
# no external file, no downloaded vocabulary.
_TRAIN_CORPUS = (
    "the quick brown fox jumps over the lazy dog while the query planner "
    "scans the table and the window aggregate runs over the sorted rows. "
    "a fast table scan with a window aggregate is faster than a slow scan "
    "when the filter is pushed down to the parquet reader and the columns "
    "are pruned. the scheduler assigns tasks to executors and the shuffle "
    "writes sorted blocks that the reducers fetch and merge into batches. "
    "documents with repeated tokens compress well because the byte pairs "
    "that appear most often merge first into longer and longer subwords. "
    "counting tokens matters for training data pipelines since the budget "
    "is measured in tokens and not in characters or in documents. 12345 "
    "numbers, punctuation... and other symbols! are split into their own "
    "runs; each run is encoded independently of the words around it."
)

N_MERGES = 256


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge ALL occurrences of `pair` in one pass (left-to-right)."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_merges(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    """Learn a merge table: repeatedly merge the most frequent adjacent
    symbol pair (ties broken lexicographically — fully deterministic)."""
    words: Counter[tuple[str, ...]] = Counter(
        tuple(w) for w in _BPE_RE.findall(corpus)
    )
    return train_from_word_freqs(words, n_merges)


def train_from_word_freqs(
    words: "Counter[tuple[str, ...]]", n_merges: int
) -> list[tuple[str, str]]:
    """The merge loop over a word-frequency table — shared by the
    single-string trainer above and the distributed trainer
    (operators/bpe_train.py), so the two can never diverge on tie-break
    or rekey semantics."""
    words = Counter(words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, freq in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        rekeyed: Counter[tuple[str, ...]] = Counter()
        for sym, freq in words.items():
            rekeyed[_merge_word(sym, best)] += freq
        words = rekeyed
    return merges


MERGES: list[tuple[str, str]] = train_merges(_TRAIN_CORPUS, N_MERGES)
RANKS: dict[tuple[str, str], int] = {p: i for i, p in enumerate(MERGES)}


@lru_cache(maxsize=65536)
def _encode_word(word: str) -> tuple[str, ...]:
    """GPT-2-style application: repeatedly merge the lowest-rank adjacent
    pair present in the word until none of its pairs is in the table."""
    sym = tuple(word)
    while len(sym) > 1:
        ranked = [
            (RANKS[p], p)
            for p in set(zip(sym, sym[1:]))
            if p in RANKS
        ]
        if not ranked:
            break
        _, best = min(ranked)
        sym = _merge_word(sym, best)
    return sym


def bpe_tokens(text: str) -> list[str]:
    """Encode text → BPE token list (pre-tokenize, then per-word merges)."""
    out: list[str] = []
    for w in _BPE_RE.findall(text or ""):
        out.extend(_encode_word(w))
    return out


def bpe_token_count_py(text: str) -> int:
    return len(bpe_tokens(text))


REAL_TOKENIZER_ENV = "DARKBO_REAL_TOKENIZER"
TOKENIZER_NAME_ENV = "DARKBO_TOKENIZER_NAME"


def _load_counter():
    """The tokenizer seam, executable: DARKBO_REAL_TOKENIZER=1 loads a
    released tokenizer (tiktoken, encoding from DARKBO_TOKENIZER_NAME,
    default gpt2) and counts ITS tokens; default is the vendored
    merge-table encoder. Missing library fails loudly — a silent fallback
    would mix token accountings across a corpus."""
    if os.environ.get(REAL_TOKENIZER_ENV) == "1":
        try:
            import tiktoken
        except ImportError as e:
            raise RuntimeError(
                f"{REAL_TOKENIZER_ENV}=1 but tiktoken is not installed — "
                "install it or unset the flag"
            ) from e
        enc = tiktoken.get_encoding(os.environ.get(TOKENIZER_NAME_ENV, "gpt2"))
        return lambda t: len(enc.encode(t or ""))
    return bpe_token_count_py


@pandas_udf(IntegerType())
def bpe_token_count_real(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched scalar-iterator UDF: real BPE token count per row.
    The counter loads ONCE per python worker (the tokenizer seam —
    `_load_counter`); the default path is the same `bpe_tokens` function
    as the Python twin, parity by construction."""
    count = _load_counter()
    for texts in it:
        yield texts.map(count).astype("int32")


def bpe_token_count_udf():
    return bpe_token_count_real
