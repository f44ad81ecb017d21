"""A1 — lexical relevance scoring as native Spark columns.

Reproduces the reference scorer's arithmetic exactly (behavior:
ai_worker.py:337-411 — see reference_impl.relevance_score, the pytest
oracle) but as a pure JVM column expression: the query is a driver-side
literal, so tokenization happens once in Python and the per-document math
compiles into whole-stage-codegen'd `contains`/`when` chains — no UDF, no
shuffle; scoring a 100 TB corpus is a narrow map.

`relevance_score_sql` emits the equivalent ANSI SQL from the SAME
tokenization, so driver-oracle (DuckDB) comparisons are exact: both
engines evaluate the identical IEEE-double expression in the identical
order (the ratio/coverage bonuses are fractional — e.g. 2/3 — so the
parity is order-of-evaluation, not half-integral-sum, exactness).
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F

from darkbo_spark.reference_impl import STOP_WORDS

_WORD = re.compile(r"\w+")


def _tokens(query: str) -> List[str]:
    return _WORD.findall(query.lower())


def relevance_score_col(query: str, primary: Column, secondary: Column) -> Column:
    """Score column for a literal query against (primary, secondary) text
    columns (caller lowercases the columns or passes lower(col))."""
    words = _tokens(query)
    if not words:
        return F.lit(0.0)
    in_p = [primary.contains(F.lit(w)) for w in words]
    in_s = [secondary.contains(F.lit(w)) for w in words]
    base = sum(
        (F.when(p, F.lit(2.0)).when(s, F.lit(1.0)).otherwise(F.lit(0.0)))
        for p, s in zip(in_p, in_s)
    )
    total = sum(
        (F.when(p | s, F.lit(1)).otherwise(F.lit(0))) for p, s in zip(in_p, in_s)
    )
    score = base + F.when(total > 1, total.cast("double") * 0.5).otherwise(0.0)

    content_words = [w for w in words if w not in STOP_WORDS]
    cw_p = F.lit(0)
    for w, p, s in zip(words, in_p, in_s):
        if w in STOP_WORDS:
            continue
        score = score + F.when(p, F.lit(1.0)).when(s, F.lit(0.5)).otherwise(F.lit(0.0))
        cw_p = cw_p + F.when(p, F.lit(1)).otherwise(F.lit(0))
    if content_words:
        ratio = cw_p.cast("double") / F.lit(float(len(content_words)))
        score = score + (
            F.when(ratio == 1.0, F.lit(2.0))
            .when(ratio >= 0.5, ratio)
            .otherwise(F.lit(0.0))
        )
    phrase = " ".join(words)
    score = score + (
        F.when(primary.contains(F.lit(phrase)), F.lit(3.0))
        .when(secondary.contains(F.lit(phrase)), F.lit(1.5))
        .otherwise(F.lit(0.0))
    )
    coverage = total.cast("double") / F.lit(float(len(words)))
    score = score + F.when(coverage >= 0.5, coverage).otherwise(F.lit(0.0))
    return score


def relevance_score_sql(query: str, primary: str, secondary: str) -> str:
    """ANSI-SQL expression computing the identical score; `primary` /
    `secondary` are SQL expressions for the lowercased text fields."""
    words = _tokens(query)
    if not words:
        return "0.0"

    def q(w: str) -> str:
        return w.replace("'", "''")

    inp = {w: f"(position('{q(w)}' in {primary}) > 0)" for w in words}
    ins = {w: f"(position('{q(w)}' in {secondary}) > 0)" for w in words}
    base = " + ".join(
        f"(case when {inp[w]} then 2.0 when {ins[w]} then 1.0 else 0.0 end)"
        for w in words
    )
    total = " + ".join(
        f"(case when {inp[w]} or {ins[w]} then 1 else 0 end)" for w in words
    )
    content_words = [w for w in words if w not in STOP_WORDS]
    parts = [f"({base})", f"(case when ({total}) > 1 then ({total}) * 0.5 else 0.0 end)"]
    if content_words:
        cw_bonus = " + ".join(
            f"(case when {inp[w]} then 1.0 when {ins[w]} then 0.5 else 0.0 end)"
            for w in content_words
        )
        cw_p = " + ".join(f"(case when {inp[w]} then 1 else 0 end)" for w in content_words)
        ratio = f"(({cw_p}) * 1.0 / {len(content_words)})"
        parts.append(f"({cw_bonus})")
        parts.append(
            f"(case when {ratio} = 1.0 then 2.0 when {ratio} >= 0.5 then {ratio} else 0.0 end)"
        )
    phrase = q(" ".join(words))
    parts.append(
        f"(case when position('{phrase}' in {primary}) > 0 then 3.0 "
        f"when position('{phrase}' in {secondary}) > 0 then 1.5 else 0.0 end)"
    )
    cov = f"(({total}) * 1.0 / {len(words)})"
    parts.append(f"(case when {cov} >= 0.5 then {cov} else 0.0 end)")
    return " + ".join(parts)
