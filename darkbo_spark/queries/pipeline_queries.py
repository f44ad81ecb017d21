"""The COMPOSED training-data pipeline under ONE driver hash: language
gate → quality gate → exact dedup (first wins) → per-domain cap →
deterministic sample → token-budget shard packing. Each stage is already
individually oracled (training_data_filter, exact_dedup_docs,
domain_caps_x, training_mix_sample_x, shard_pack_x); this twin proves the
stages COMPOSE without semantic drift — the hash covers every filter
decision, the cap's total order, the sampler's member set, and the global
prefix sum, end to end.

Spark side: the real operators chained exactly as a corpus pipeline runs
them (one job, no materialization between stages — Catalyst fuses the
gates into the scan, the only shuffles are the dedup window, the cap's
two bounded windows, and the pack's range partition). DuckDB: the staged
CTE replay.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.functions import text_analysis as ta
from darkbo_spark.queries.common import _q, _t
from darkbo_spark.queries.domain_queries import _DOC_URL_SQL, _SQL_DOMAIN

_PIPE_K = 5          # per-domain cap
_PIPE_FRACTION = 0.8  # deterministic sample keep rate
_PIPE_SALT = "pipe1"
_PIPE_BUDGET = 2000   # tokens per shard

_PIPELINE_ORACLE = f"""
WITH gated AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  WHERE {ta.sql_lang_id('text')} = 'en_like' AND {ta.sql_quality_score('text')} >= 0.7
),
dedup_keys AS (
  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
),
dd AS (SELECT g.* FROM gated g JOIN dedup_keys USING (doc_id)),
capped AS (
  SELECT doc_id, domain FROM (
    SELECT doc_id, {_SQL_DOMAIN} AS domain,
           ROW_NUMBER() OVER (PARTITION BY {_SQL_DOMAIN}
                              ORDER BY n_chars DESC, doc_id) AS rk
    FROM dd
  ) WHERE rk <= {_PIPE_K}
),
sampled AS (
  SELECT doc_id, domain FROM capped
  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS STRING) || ':{_PIPE_SALT}'), 1, 15)) AS BIGINT)
        % 1000000 < {round(_PIPE_FRACTION * 1000000)}
),
toks AS (
  SELECT s.doc_id, s.domain, CAST({ta.sql_token_count('d.text')} AS BIGINT) AS n_tokens
  FROM sampled s JOIN documents d USING (doc_id)
),
packed AS (
  SELECT doc_id, domain, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens
  FROM toks
)
SELECT doc_id, domain, n_tokens, cum_tokens,
       CAST(((cum_tokens - n_tokens) - (cum_tokens - n_tokens) % {_PIPE_BUDGET})
            / {_PIPE_BUDGET} AS BIGINT) AS shard_id
FROM packed
ORDER BY doc_id
"""


@_q("training_pipeline_x", _PIPELINE_ORACLE)
def training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.operators.dedup import exact_dedup
    from darkbo_spark.operators.domains import (
        cap_per_domain,
        host_of,
        with_registered_domain,
    )
    from darkbo_spark.operators.sampling import deterministic_sample
    from darkbo_spark.operators.sharding import pack_shards

    docs = _t(spark, sf_dir, "documents")
    gated = docs.filter(
        (ta.lang_id_heuristic(F.col("text")) == "en_like")
        & (ta.quality_score(F.col("text")) >= 0.7)
    )
    dd = exact_dedup(gated, "text", "doc_id")
    with_domain = with_registered_domain(
        dd, host_of(F.expr(_DOC_URL_SQL)), "domain"
    )
    capped = cap_per_domain(with_domain, k=_PIPE_K, order_by=[F.col("n_chars").desc()])
    sampled = deterministic_sample(capped, _PIPE_FRACTION, salt=_PIPE_SALT)
    toks = sampled.select(
        "doc_id", "domain", ta.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return pack_shards(toks, budget=_PIPE_BUDGET).select(
        "doc_id", "domain", "n_tokens", "cum_tokens", "shard_id"
    )
