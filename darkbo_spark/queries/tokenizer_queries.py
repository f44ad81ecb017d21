"""Tokenizer-training twins (operators/bpe_train.py): the distributed
word-frequency stage hash-oracled (the BPE pre-tokenization regex is
RE2-identical, so DuckDB replays the findall + count exactly), and the
trained merge table as a rows-only entry (the merge loop's choices are
data-dependent — no static SQL can replay them — but distributed ≡ the
in-memory reference trainer is pinned exactly in tests/test_bpe_train.py,
and the loop code is literally shared between the two).

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.queries.common import _q, _t

# the exact pattern from functions/bpe._BPE_RE, spelled for a SQL string
_BPE_PAT_SQL = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0B]+"

_WORD_FREQS_ORACLE = f"""
WITH w AS (
  SELECT unnest(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS word
  FROM documents WHERE doc_id < 400
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
FROM w GROUP BY word
"""


@_q("bpe_word_freqs_x", _WORD_FREQS_ORACLE)
def bpe_word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale stage of tokenizer training under the driver
    hash: in-worker partial Counters → one hash aggregate, equal to
    DuckDB's direct findall+count over the identical RE2 pattern."""
    from darkbo_spark.operators.bpe_train import word_freqs

    return word_freqs(_t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400))


@_q("bpe_trained_merges")  # rows-only: loop is data-dependent; exact-equality pytest
def bpe_trained_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained merge table itself (rank, left, right) from the
    distributed trainer over the documents corpus — deterministic given
    the corpus; distributed ≡ in-memory trainer in tests/test_bpe_train.py."""
    import pandas as pd

    from darkbo_spark.operators.bpe_train import train_merges_distributed

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    merges, _stats = train_merges_distributed(docs, n_merges=64)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "rank": range(len(merges)),
                "left": [a for a, _ in merges],
                "right": [b for _, b in merges],
            }
        )
    )
