"""Stage E — byte-identical text extraction.

pages(url, warc_ts, html, text, lang) → docs(url, warc_ts, lang, text).

The normalization runs as a single Arrow-batched pandas UDF (the identical
Python `re` chain the pytest oracle uses — north-rule invariant: byte-equal
per url vs the reference semantics, api/document_processor.py:130-157).
When `text` is null, text is recovered from `html` first (deterministic tag
strip), still inside the same vectorized path.

Scale notes: this stage is embarrassingly parallel — a pure narrow map, no
shuffle. At 100 TB the cost is the parquet/Iceberg scan + one Arrow
round-trip; column pruning drops `html` from the scan entirely when `text`
is present (Catalyst prunes because the coalesce is applied per-row only
when needed via when/otherwise on a null check, keeping `html` referenced
only under the branch — at CC scale you'd split the rare null-text pages
into their own pass to avoid reading `html` at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from darkbo_spark.functions.textnorm import clean_text_udf, html_to_text_udf


def extract_docs(pages: DataFrame, re_extract_html: bool = False) -> DataFrame:
    """Normalize page text. If `re_extract_html`, null/empty `text` rows are
    recovered from the raw `html` bytes before cleaning."""
    if re_extract_html:
        raw = F.when(
            F.col("text").isNull() | (F.length("text") == 0),
            html_to_text_udf(F.col("html")),
        ).otherwise(F.col("text"))
    else:
        raw = F.col("text")
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        clean_text_udf(raw).alias("text"),
    )
