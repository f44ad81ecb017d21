"""Hybrid retrieval — the reference's core query path as one DataFrame plan.

Behavior restated from the reference's hybrid merge (ai_worker.py:233-261):
dense and sparse result lists are unioned, deduplicated by id with DENSE
taking precedence at equal ids (order-sensitive — NOT dropDuplicates), then
sorted by score desc and truncated to top-k. The lexical fallback scorer
(search_basic, ai_worker.py:263-314) joins the union as the lowest-priority
channel.

Plan shape at scale: each channel is a narrow scan/scoring pass (dense =
broadcast dot product; sparse = postings join vs a tiny broadcast query
term set; basic = codegen'd contains-math), the union is bag-union, and the
precedence dedup is one window over id — a single shuffle on id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CHANNEL_PRIORITY = {"dense": 0, "sparse": 1, "basic": 2}


def hybrid_merge(channels: dict[str, DataFrame], top_k: int = 5) -> DataFrame:
    """channels: name -> DataFrame(id, score). Returns (id, score,
    search_type) — one row per id (highest-priority channel wins), top-k by
    that winning score with deterministic tie-break."""
    parts = []
    for name, df in channels.items():
        parts.append(
            df.select(
                F.col("id"),
                F.col("score").cast("double").alias("score"),
                F.lit(name).alias("search_type"),
                F.lit(CHANNEL_PRIORITY[name]).alias("_pri"),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    w = Window.partitionBy("id").orderBy(F.asc("_pri"), F.desc("score"))
    deduped = (
        unioned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_pri")
    )
    return deduped.orderBy(F.desc("score"), F.asc("id")).limit(top_k)
