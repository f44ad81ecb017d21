"""J2 — upsert / MERGE INTO semantics (last-writer-wins by key) plus the
created-vs-updated split.

The reference upserts by id into a dict then rewrites the whole collection
(behavior: api/storage.py:91-131). Spark restatement: in production this is
an Iceberg `MERGE INTO`; engine-level it is `unionByName` + one-row-per-key
window dedup where the UPDATE side outranks the target, and the
created/updated classification is a left-anti / left-semi join pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of `updates` replace same-key rows of `target`; new keys append.
    Deterministic regardless of partitioning."""
    t = target.withColumn("_pri", F.lit(1))
    u = updates.withColumn("_pri", F.lit(0))
    w = Window.partitionBy(key).orderBy(F.asc("_pri"))
    return (
        t.unionByName(u)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_pri", "_rk")
    )


def split_created_updated(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """(key, op) with op ∈ {created, updated} — anti join = created, semi
    join = updated (reference returns these two id lists)."""
    created = updates.join(target, key, "left_anti").select(key).withColumn(
        "op", F.lit("created")
    )
    updated = updates.join(target, key, "left_semi").select(key).withColumn(
        "op", F.lit("updated")
    )
    return created.unionByName(updated)
