"""Dynamic quality thresholding twin: keep documents at or above a
corpus-derived quality PERCENTILE (CCNet-style relative filtering — a
fixed threshold misfires when corpus quality drifts; a percentile
self-calibrates per crawl snapshot).

Cross-engine discipline: the quality signal is the already-oracled exact
score (functions/text_analysis.quality_score), the threshold is an exact
interpolated percentile (Spark `percentile` ≡ DuckDB `quantile_cont`,
the parity the value_percentiles twin has pinned since round 1), and
both the score and threshold are rounded to 6 dp before the comparison
so the boundary decision is identical in both engines.

Scale shape: one aggregate for the threshold (partial-aggregable
percentile), broadcast of the one-row result, one codegen'd filter pass
— no shuffle of the corpus.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.functions import text_analysis as ta
from darkbo_spark.queries.common import _q, _t

_QP_FRAC = 0.25

_QP_ORACLE = f"""
WITH q AS (SELECT doc_id, {ta.sql_quality_score('text')} AS q FROM documents),
thr AS (SELECT quantile_cont(q, {_QP_FRAC}) AS thr FROM q)
SELECT doc_id, ROUND(q, 6) AS quality, ROUND((SELECT thr FROM thr), 6) AS p25
FROM q
WHERE ROUND(q, 6) >= ROUND((SELECT thr FROM thr), 6)
"""


@_q("quality_percentile_filter_x", _QP_ORACLE)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ta.quality_score(F.col("text")).alias("q")
    )
    thr = d.agg(F.expr(f"percentile(q, {_QP_FRAC})").alias("thr"))
    return (
        d.crossJoin(F.broadcast(thr))
        .filter(F.round(F.col("q"), 6) >= F.round(F.col("thr"), 6))
        .select(
            "doc_id",
            F.round(F.col("q"), 6).alias("quality"),
            F.round(F.col("thr"), 6).alias("p25"),
        )
    )
