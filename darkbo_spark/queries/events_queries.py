"""Event-stream operators: priority dedup, running totals, sessionize,
JSON prop aggregation, window functions, exact and sketch percentiles /
distinct counts / heavy hitters, cube / grouping sets / pivot, the range
join, and the as-of join.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline:
money aggregates sum in DECIMAL, short array folds round to 6 dp on both
engines, every computed column is aliased identically in Spark and SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from darkbo_spark.operators.events import (
    dedup_by_priority,
    json_prop,
    running_totals,
    sessionize,
)

from darkbo_spark.queries.common import _q, _t


# ---------------------------------------------------------------------------
# Precedence dedup (A5)
# ---------------------------------------------------------------------------

_PRIORITY_SQL = (
    "CASE event_type WHEN 'purchase' THEN 0 WHEN 'signup' THEN 1 "
    "WHEN 'click' THEN 2 WHEN 'view' THEN 3 WHEN 'error' THEN 4 ELSE 99 END"
)


@_q(
    "dedup_first_wins",
    f"""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY {_PRIORITY_SQL} ASC, ts ASC, event_id ASC) AS rk
  FROM events
) WHERE rk = 1
""",
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_by_priority(_t(spark, sf_dir, "events")).select(
        "user_id", "event_id", "event_type"
    )

# ---------------------------------------------------------------------------
# Window / sessionization / JSON ops over events
# ---------------------------------------------------------------------------

@_q(
    "running_totals",
    """
SELECT user_id, event_id, ts,
       ROW_NUMBER() OVER w AS seq,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value
FROM events WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return running_totals(ev)


@_q(
    "sessionize_events",
    """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id < 50
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_id, ts,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS session_seq
FROM gaps
""",
)
def sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return sessionize(ev, gap_minutes=30)


@_q(
    "json_props_agg",
    """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return json_prop(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Window-function family (rank/lag/lead over event streams)
# ---------------------------------------------------------------------------

@_q(
    "window_rank_lag",
    """
SELECT user_id, event_id,
       RANK() OVER w AS rnk,
       LAG(event_id) OVER w AS prev_event,
       LEAD(event_id) OVER w AS next_event
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(w).alias("rnk"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (continuous interpolation — identical in both engines)
# ---------------------------------------------------------------------------

@_q(
    "value_percentiles",
    """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY event_type
""",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


# ---------------------------------------------------------------------------
# CUBE + pivot-style conditional aggregation over events
# ---------------------------------------------------------------------------

@_q(
    "cube_event_stats",
    """
SELECT event_type, CAST(user_id % 4 AS BIGINT) AS user_band, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, CAST(user_id % 4 AS BIGINT))
""",
)
def cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_band", (F.col("user_id") % 4).cast("bigint")
    )
    return ev.cube("event_type", "user_band").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@_q(
    "pivot_event_counts",
    """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS clicks,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS views,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchases,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signups,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS errors
FROM events WHERE user_id < 100 GROUP BY user_id
""",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot re-expressed as conditional aggregation (identical plan shape to
    # df.groupBy().pivot() with a known value set, but portable to ANSI SQL)
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(name)
        for t, name in [
            ("click", "clicks"), ("view", "views"), ("purchase", "purchases"),
            ("signup", "signups"), ("error", "errors"),
        ]
    ]
    return ev.groupBy("user_id").agg(*aggs)


# ---------------------------------------------------------------------------
# Sketches — the 100 TB forms of quantiles and distinct counts. The exact
# twins are oracled; the sketch variants are rows-only with accuracy-vs-
# exact assertions in pytest (sketch internals aren't cross-engine).
# ---------------------------------------------------------------------------

@_q(
    "user_counts_exact",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def user_counts_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count("*").alias("n"),
        )
    )


@_q("user_counts_sketch")  # rows-only: HLL error bound asserted in pytest
def user_counts_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # approx_count_distinct (HyperLogLog++) — the scale path: one pass, no
    # per-key distinct shuffle explosion, mergeable partial sketches
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("users_approx"))
    )


@_q(
    "heavy_hitters_exact",
    """
SELECT user_id, COUNT(*) AS n
FROM events GROUP BY user_id
ORDER BY n DESC, user_id ASC
LIMIT 10
""",
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the exact twin of the frequent-items sketch: head-entity detection is
    # the input to skew defenses (salting keys, bucket caps) at 100 TB
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@_q("heavy_hitters_sketch")  # rows-only: superset-of-true-HH asserted in pytest
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Karp-Papadimitriou-Shenker via
    df.stat.freqItems) — one pass, mergeable, bounded memory: the 100 TB
    form of "which keys are skewed enough to salt". Guarantee: every item
    with frequency ≥ support is returned (false positives possible, false
    negatives not) — that superset property is what a skew defense needs
    and is asserted against exact counts in pytest."""
    hh = _t(spark, sf_dir, "events").stat.freqItems(["user_id"], support=0.005)
    return (
        hh.select(F.explode("user_id_freqItems").alias("user_id"))
        .orderBy(F.asc("user_id"))
    )


@_q("value_percentiles_sketch")  # rows-only: error vs exact asserted in pytest
def value_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # approx_percentile (Greenwald-Khanna style sketch) — mergeable,
    # bounded-memory; the exact twin is the oracled value_percentiles
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 6).alias("p50_approx"),
            F.round(F.expr("approx_percentile(value, 0.95, 10000)"), 6).alias("p95_approx"),
        )
    )


@_q(
    "grouping_sets_events",
    """
SELECT event_type, CAST(user_id % 4 AS BIGINT) AS user_band, COUNT(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 4 AS BIGINT)), ())
""",
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit GROUPING SETS (the general form behind cube/rollup) — SQL is
    # the idiomatic Spark surface for it
    _t(spark, sf_dir, "events").withColumn(
        "user_band", (F.col("user_id") % 4).cast("bigint")
    ).createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, user_band, COUNT(*) AS n
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (user_band), ())
        """
    )


# ---------------------------------------------------------------------------
# Range join: events inside each user's first-3-day window (equality on user
# + ts-range predicate — the equality key carries the shuffle, the range is
# a post-join filter, so the plan stays a hash join, not a theta product)
# ---------------------------------------------------------------------------

@_q(
    "events_in_first_window",
    """
WITH w AS (
  SELECT user_id, MIN(ts) AS w_start FROM events WHERE user_id < 50 GROUP BY user_id
)
SELECT w.user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM w
JOIN events e
  ON e.user_id = w.user_id
 AND e.ts >= w.w_start
 AND e.ts < w.w_start + INTERVAL 3 DAY
GROUP BY w.user_id
""",
)
def events_in_first_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        e.filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.min("ts").alias("w_start"))
    )
    joined = e.alias("e").join(
        w.alias("w"),
        (F.col("e.user_id") == F.col("w.user_id"))
        & (F.col("e.ts") >= F.col("w.w_start"))
        & (F.col("e.ts") < F.col("w.w_start") + F.expr("INTERVAL 3 DAY")),
    )
    return joined.groupBy(F.col("w.user_id").alias("user_id")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("e.value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )

# ---------------------------------------------------------------------------
# As-of join (beyond-reference; merge form — no row blow-up)
# ---------------------------------------------------------------------------

@_q(
    "asof_events_orders",
    """
WITH cand AS (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  WHERE e.user_id < 30
)
SELECT event_id, user_id, o_orderkey AS asof_o_orderkey FROM cand WHERE rk = 1
""",
)
def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from darkbo_spark.operators.asof import as_of_join

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30).select(
        "event_id", "user_id", "ts"
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30).select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    return as_of_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_payload="o_orderkey", how="inner",
    ).select("event_id", "user_id", "asof_o_orderkey")
