"""P4 — keyword routing predicate: classify an incoming question into a
handler channel. Reference behavior (ai_worker.py:766-770 +
tools/manager.py:70-108): datetime keywords route to the datetime tool and
SUPPRESS web search; web-search keywords or question-prefixes route to web
search; everything else goes to KB retrieval. Here it is a pure codegen'd
`when/otherwise` column — a routing column on a DataFrame of questions, not
control flow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATETIME_KEYWORDS = [
    "time", "date", "today", "now", "current time", "what day",
]
WEB_KEYWORDS = [
    "latest", "news", "recent", "current events", "weather", "stock",
]
QUESTION_PREFIXES = ["who is", "what is happening", "when did"]


def _contains_any(col: Column, words: list[str]) -> Column:
    out = F.lit(False)
    for w in words:
        out = out | col.contains(F.lit(w))
    return out


def route_query(question: Column) -> Column:
    """→ 'datetime' | 'web_search' | 'kb'. Datetime wins and suppresses web
    (reference suppression rule, tools/manager.py:102-104)."""
    q = F.lower(question)
    is_dt = _contains_any(q, DATETIME_KEYWORDS)
    starts_web = F.lit(False)
    for p in QUESTION_PREFIXES:
        starts_web = starts_web | q.startswith(F.lit(p))
    is_web = _contains_any(q, WEB_KEYWORDS) | starts_web
    return (
        F.when(is_dt, F.lit("datetime"))
        .when(is_web, F.lit("web_search"))
        .otherwise(F.lit("kb"))
    )


def route_query_sql(question: str) -> str:
    """ANSI-SQL twin for the DuckDB oracle."""
    q = f"lower({question})"
    dt = " OR ".join(f"position('{w}' in {q}) > 0" for w in DATETIME_KEYWORDS)
    webkw = " OR ".join(f"position('{w}' in {q}) > 0" for w in WEB_KEYWORDS)
    pref = " OR ".join(f"{q} LIKE '{p}%'" for p in QUESTION_PREFIXES)
    return (
        f"(CASE WHEN ({dt}) THEN 'datetime' "
        f"WHEN (({webkw}) OR ({pref})) THEN 'web_search' "
        f"ELSE 'kb' END)"
    )
