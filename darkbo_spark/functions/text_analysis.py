"""Text-analysis operators for training-data pipelines — all native column
expressions (JVM, codegen'd): language-ID heuristic, quality scoring, token
counting, document fingerprinting. Each has an exact ANSI-SQL twin used by
the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "an", "is", "are", "of", "and", "to", "in"]


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), " +"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop = F.filter(toks, lambda t: t.isin(EN_STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0))


def lang_id_heuristic(text: Column) -> Column:
    """'en_like' when English stopwords make up ≥2% of tokens, else 'other'.
    An n-gram/stopword heuristic — deterministic, SQL-expressible."""
    return F.when(stopword_ratio(text) >= 0.02, F.lit("en_like")).otherwise(F.lit("other"))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^.,;:!?]", "")
    return F.when(
        F.length(text) > 0, F.length(stripped).cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality: length band + low punctuation noise +
    reasonable mean token length. Mirrors standard web-corpus filters."""
    n_tok = token_count(text)
    mean_tok_len = F.when(n_tok > 0, F.length(text).cast("double") / n_tok).otherwise(F.lit(0.0))
    length_ok = F.when((F.length(text) >= 50) & (F.length(text) <= 20000), 0.4).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.1, 0.3).otherwise(0.0)
    tok_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 0.3).otherwise(0.0)
    return F.round(length_ok + punct_ok + tok_ok, 6)


# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct splits with
# leading-space attachment), restricted to constructs RE2 (DuckDB) and Java
# regex (Spark) evaluate identically: no lookarounds, and whitespace spelled
# as an EXPLICIT class — Java's \s includes vertical tab (\x0B), RE2's does
# not, so \s would diverge on \x0B-bearing text
_WS = " \\t\\n\\r\\f\\x0B"
BPE_PATTERN = f" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{_WS}]+"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenization — the
    LLM-pipeline estimate (whitespace counting undercounts punctuation-heavy
    text). Native regexp_extract_all, codegen'd."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def sql_bpe_token_count(text: str) -> str:
    return (
        f"len(regexp_extract_all({text},"
        f" ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{_WS}]+'))"
    )


def doc_fingerprint(text: Column) -> Column:
    """Stable content fingerprint of whitespace-normalized lowercase text.
    Whitespace spelled as the explicit class (see BPE_PATTERN): Java \\s
    includes \\x0B, RE2's does not — the oracle must agree byte-for-byte."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), f"[{_WS}]+", " "))


# Rabin-Karp-style rolling fingerprint constants: base/modulus sized so the
# ANSI-mode accumulator never overflows int64 (acc < P ≈ 2^31, acc·B + h <
# 2^31·2^20 + 2^31 < 2^52)
_ROLL_B = 1 << 20
_ROLL_P = (1 << 31) - 1


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash of the token stream (Rabin-Karp
    polynomial: h = Σ tok_i·B^(n-i) mod P) — unlike the md5 fingerprint,
    sensitive to token ORDER with O(1) state per token; the incremental
    form is what a streaming/windowed fingerprinter maintains. All native:
    transform(xxhash64) + aggregate, no UDF."""
    tok_hashes = F.transform(
        tokens(text), lambda t: F.pmod(F.xxhash64(t), F.lit(_ROLL_P))
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: F.pmod(acc * _ROLL_B + h, F.lit(_ROLL_P)),
    )


def rolling_fingerprint_portable(text: Column) -> Column:
    """Cross-engine twin of rolling_fingerprint: same Rabin-Karp fold, the
    token hash swapped xxhash64 → md5-60 (operators.dedup.portable_hash60)
    so DuckDB replays the identical polynomial (sql_rolling_fingerprint).
    Same overflow discipline: acc < P ≈ 2^31, acc·B + h < 2^52."""
    from darkbo_spark.operators.dedup import portable_hash60

    tok_hashes = F.transform(
        tokens(text), lambda t: F.pmod(portable_hash60(t), F.lit(_ROLL_P))
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: F.pmod(acc * _ROLL_B + h, F.lit(_ROLL_P)),
    )


# ---- ANSI-SQL twins (DuckDB) ----------------------------------------------

def sql_token_count(text: str) -> str:
    return f"len(list_filter(string_split_regex(lower({text}), ' +'), x -> x <> ''))"


def sql_stopword_ratio(text: str) -> str:
    toks = f"list_filter(string_split_regex(lower({text}), ' +'), x -> x <> '')"
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        f"(case when len({toks}) > 0 then "
        f"len(list_filter({toks}, x -> x in ({stops}))) * 1.0 / len({toks}) "
        f"else 0.0 end)"
    )


def sql_lang_id(text: str) -> str:
    return f"(case when {sql_stopword_ratio(text)} >= 0.02 then 'en_like' else 'other' end)"


def sql_punct_ratio(text: str) -> str:
    return (
        f"(case when length({text}) > 0 then "
        f"length(regexp_replace({text}, '[^.,;:!?]', '', 'g')) * 1.0 / length({text}) "
        f"else 0.0 end)"
    )


def sql_quality_score(text: str) -> str:
    n_tok = sql_token_count(text)
    mean_len = f"(case when {n_tok} > 0 then length({text}) * 1.0 / {n_tok} else 0.0 end)"
    return (
        "round("
        f"(case when length({text}) between 50 and 20000 then 0.4 else 0.0 end) + "
        f"(case when {sql_punct_ratio(text)} <= 0.1 then 0.3 else 0.0 end) + "
        f"(case when {mean_len} between 2.0 and 12.0 then 0.3 else 0.0 end)"
        ", 6)"
    )


def sql_doc_fingerprint(text: str) -> str:
    return f"md5(regexp_replace(lower(trim({text})), '[{_WS}]+', ' ', 'g'))"


def sql_rolling_fingerprint(text: str) -> str:
    """DuckDB replay of rolling_fingerprint_portable: identical Rabin-Karp
    fold (list_reduce seeded via a prepended 0) over md5-60 token hashes."""
    ph = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
    toks = f"list_filter(string_split_regex(lower({text}), ' +'), x -> x <> '')"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> {ph} % {_ROLL_P})), "
        f"(acc, h) -> (acc * {_ROLL_B} + h) % {_ROLL_P})"
    )


# ---- repetition quality signals (Gopher-style filters) ---------------------

def dup_token_fraction(text: Column) -> Column:
    """1 − distinct/total tokens — the repetition signal that catches
    keyword-stuffed and boilerplate pages (Gopher's duplicate-fraction
    family adapted to single-line text). Native array ops only."""
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.round(
            1.0
            - F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def top_bigram_fraction(text: Column) -> Column:
    """Share of all token bigrams taken by the single most frequent bigram
    — high values mean looping/templated text. Implementation: slide to
    bigrams, SORT the array, then one aggregate pass tracking the longest
    equal-adjacent run (struct accumulator). O(n log n) per row — the
    obvious count-per-distinct-bigram form re-evaluates the bigram array
    inside a nested lambda for every distinct element (no CSE inside
    Spark HOFs, interpreted eval) and measured ~30 s for 300 rows; this
    form runs in well under a second."""
    toks = tokens(text)
    n = F.size(toks)
    bigrams = F.sort_array(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        )
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _step,
        lambda acc: acc["best"],
    )
    return F.when(
        n >= 2, F.round(top.cast("double") / (n - 1).cast("double"), 6)
    ).otherwise(F.lit(0.0))


def sql_dup_token_fraction(text: str) -> str:
    toks = f"list_filter(string_split_regex(lower({text}), ' +'), x -> x <> '')"
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"round(1.0 - len(list_distinct({toks})) * 1.0 / len({toks}), 6) "
        f"ELSE 0.0 END)"
    )


def sql_top_bigram_fraction(text: str) -> str:
    toks = f"list_filter(string_split_regex(lower({text}), ' +'), x -> x <> '')"
    bigrams = (
        f"list_transform(range(1, len({toks})), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1])"
    )
    top = (
        f"list_max(list_transform(list_distinct({bigrams}), "
        f"bg -> len(list_filter({bigrams}, x -> x = bg))))"
    )
    return (
        f"(CASE WHEN len({toks}) >= 2 THEN "
        f"round({top} * 1.0 / (len({toks}) - 1), 6) ELSE 0.0 END)"
    )


# ---- PII redaction (training-data scrubbing) -------------------------------

# RE2-safe AND Java-safe patterns (no lookarounds, explicit classes)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"


def redact_pii(text: Column) -> Column:
    """Replace emails then phone numbers with typed placeholders — the
    standard scrub pass before text enters a training corpus. Native
    regexp_replace (global in Spark), order fixed: emails first so a
    digit-bearing address never half-matches the phone pattern."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def sql_redact_pii(text: str) -> str:
    return (
        f"regexp_replace(regexp_replace({text}, '{EMAIL_RE}', '[EMAIL]', 'g'), "
        f"'{PHONE_RE}', '[PHONE]', 'g')"
    )


# ---- unigram language-model quality score ----------------------------------
# The model-based member of the quality-filter family: mean token
# log-probability under a deterministic add-one-smoothed unigram LM trained
# at import time on the embedded corpus (functions/bpe._TRAIN_CORPUS — the
# same no-external-data discipline as the BPE merge table). Production swaps
# in a real KenLM/llm scorer at this seam; the distributed shape (pure
# per-row expression over a broadcast-sized vocab) is identical.

def _train_unigram() -> tuple[list[str], list[float], float]:
    import math
    from collections import Counter

    from darkbo_spark.functions.bpe import _TRAIN_CORPUS

    counts = Counter(_TRAIN_CORPUS.lower().split())
    total = sum(counts.values())
    v = len(counts)
    vocab = sorted(counts)
    logs = [math.log((counts[w] + 1) / (total + v + 1)) for w in vocab]
    oov = math.log(1.0 / (total + v + 1))
    return vocab, logs, oov


UNIGRAM_VOCAB, UNIGRAM_LOGS, UNIGRAM_OOV = _train_unigram()


def unigram_logprob(text: Column) -> Column:
    """Mean ln P(token) over whitespace tokens (0.0 for empty text). The
    vocab/log tables inline as ONE parsed SQL array literal each (the
    py4j-per-element trap); the fold runs in token order so the oracle's
    list_reduce computes bit-identical double sums."""
    vocab_lit = "array(" + ", ".join(f"'{w}'" for w in UNIGRAM_VOCAB) + ")"
    logs_lit = "array(" + ", ".join(repr(x) + "D" for x in UNIGRAM_LOGS) + ")"
    toks = tokens(text)

    def _lp(t):
        pos = F.array_position(F.expr(vocab_lit), t).cast("int")
        # array_position yields 0 for OOV and element_at RAISES on index 0
        # under ANSI — guard, don't coalesce
        return F.when(pos > 0, F.element_at(F.expr(logs_lit), pos)).otherwise(
            F.lit(UNIGRAM_OOV)
        )

    lp = F.transform(toks, _lp)
    total = F.aggregate(lp, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(
        F.size(toks) > 0, F.round(total / F.size(toks).cast("double"), 6)
    ).otherwise(F.lit(0.0))


def sql_unigram_logprob(text: str) -> str:
    # bare decimal literals parse as DECIMAL in DuckDB (and -10.91… fails
    # the inferred DECIMAL(17,16)) — every constant is cast to DOUBLE so
    # both engines fold the identical IEEE doubles
    vocab_lit = "[" + ", ".join(f"'{w}'" for w in UNIGRAM_VOCAB) + "]"
    logs_lit = (
        "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in UNIGRAM_LOGS) + "]"
    )
    toks = f"list_filter(string_split_regex(lower({text}), ' +'), x -> x <> '')"
    lp = (
        f"list_transform({toks}, t -> CASE "
        f"WHEN list_position({vocab_lit}, t) > 0 "
        f"THEN {logs_lit}[list_position({vocab_lit}, t)] "
        f"ELSE CAST({UNIGRAM_OOV!r} AS DOUBLE) END)"
    )
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"round(list_reduce(list_prepend(0.0, {lp}), (a, b) -> a + b)"
        f" / len({toks}), 6) ELSE 0.0 END)"
    )
