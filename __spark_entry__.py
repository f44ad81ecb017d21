"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship retrieval query (the reference's core
query path: lexical relevance scoring + top-k, ai_worker.py:263-411
behavior) on /root/testdata/sf0.001. ``queries()``/``oracle_sql()`` map
SURVEY.md §2 operators onto the driver's parquet star schema with DuckDB
oracles; non-SQL-expressible ops return rows-only entries (no oracle key).

Float discipline: aggregates that sum doubles are cast to DECIMAL before
summing (exact, associative) or rounded where both engines compute in the
identical order — so value-hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from darkbo_spark.entry_queries import QUERIES, ORACLE_SQL, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
