"""Star-schema relational operators: TPC-H-shaped scans, aggregates,
join chains, top-k, point lookups, semi/anti joins, MERGE upserts, rollup.

Part of the driver-contract query corpus (see darkbo_spark/entry_queries.py
for the registry, driver-window ordering, and the shared float discipline:
money aggregates sum in DECIMAL, short array folds round to 6 dp on both
engines, every computed column is aliased identically in Spark and SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.operators.merge import split_created_updated, upsert

from darkbo_spark.queries.common import _q, _t


@_q(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,4)")
    dp = F.col("l_extendedprice").cast("decimal(18,4)")
    dd = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dq).cast("double").alias("sum_qty"),
            F.sum(dp).cast("double").alias("sum_base_price"),
            # scale-8 decimal sums exceed 2^53 when integer-scaled, and
            # DuckDB's decimal→double conversion double-rounds there
            # (int→double, then ÷10^8) while Spark's BigDecimal converts
            # once — round the exact decimal back to scale 4 first so both
            # engines make a single sub-2^53 conversion (caught at sf0.1)
            F.round(F.sum(dp * (F.lit(1) - dd)), 4).cast("double").alias("sum_disc_price"),
            (F.sum(dq).cast("double") / F.count("*").cast("double")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )

# ---------------------------------------------------------------------------
# Top-k (T1)
# ---------------------------------------------------------------------------

@_q(
    "top5_orders",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5",
)
def top5_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
    )

# ---------------------------------------------------------------------------
# Upsert / MERGE (J2)
# ---------------------------------------------------------------------------

_UPSERT_ORACLE = """
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
), updates AS (
  SELECT c_custkey, 'updated-' || CAST(c_custkey AS VARCHAR) AS c_name, 0.0 AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
), unioned AS (
  SELECT *, 1 AS pri FROM target
  UNION ALL
  SELECT *, 0 AS pri FROM updates
)
SELECT c_custkey, c_name, c_acctbal FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY pri ASC) AS rk FROM unioned
) WHERE rk = 1
"""


def _merge_inputs(spark: SparkSession, sf_dir: str):
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    target = c.filter(F.col("c_custkey") % 3 != 0)
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.lit("updated-"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    return target, updates


@_q("merge_upsert", _UPSERT_ORACLE)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    target, updates = _merge_inputs(spark, sf_dir)
    return upsert(target, updates, "c_custkey")


@_q(
    "upsert_created_updated",
    """
WITH target AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0
), updates AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, 'created' AS op FROM updates WHERE c_custkey NOT IN (SELECT c_custkey FROM target)
UNION ALL
SELECT c_custkey, 'updated' AS op FROM updates WHERE c_custkey IN (SELECT c_custkey FROM target)
""",
)
def upsert_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    target, updates = _merge_inputs(spark, sf_dir)
    return split_created_updated(target, updates, "c_custkey")

# ---------------------------------------------------------------------------
# Point lookup (J1): equi-probe by key — the reference scans whole JSON files
# for one id (ai_worker.py:482-508 behavior); here it's a pushed-down filter
# ---------------------------------------------------------------------------

@_q(
    "point_lookup",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 4242",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 4242)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )

# ---------------------------------------------------------------------------
# Semi/anti joins (resume-filter shape)
# ---------------------------------------------------------------------------

@_q(
    "customers_without_recent_orders",
    """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01')
""",
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@_q(
    "customers_with_orders",
    "SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")

# ---------------------------------------------------------------------------
# TPC-H Q5-shaped 5-table join chain (dims broadcast, facts shuffle once)
# ---------------------------------------------------------------------------

@_q(
    "q5_local_supplier_volume",
    """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )

# ---------------------------------------------------------------------------
# Join chains (broadcast dims) + grouped rollup
# ---------------------------------------------------------------------------

@_q(
    "region_rollup",
    """
SELECT r.r_name, COUNT(DISTINCT n.n_nationkey) AS nations, COUNT(*) AS customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY r.r_name
""",
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").alias("nations"),
            F.count("*").alias("customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("total_acctbal"),
        )
    )


@_q(
    "q3_top_unshipped",
    """
SELECT o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )

# ---------------------------------------------------------------------------
# Rollup (beyond-reference grouping sets)
# ---------------------------------------------------------------------------

@_q(
    "rollup_lineitem",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )
