"""As-of join — "latest right row at or before the left row's timestamp,
per key". Absent from the reference (SURVEY.md §2.3 notes the gap); a
first-class operator for event/dimension alignment in training-data
pipelines.

Implementation is the SCALABLE merge form, not the naive theta-join:

    naive:   left ⋈ right ON key AND r.ts <= l.ts  → row blow-up
             (every left row pairs with its whole right history), then
             row_number to pick one. O(|L|·avg history|) intermediate.
    here:    union both sides tagged, ONE shuffle on (key), sort by
             (ts, side), carry the right payload forward with
             last(..., ignorenulls=True) over rows-unbounded-preceding —
             each row processed once, intermediate = |L| + |R|.

Tie semantics: a right row AT the left timestamp matches (<=); among equal
right timestamps the largest right key wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: str,
    how: str = "inner",
) -> DataFrame:
    """→ left columns + `asof_<right_payload>` (latest right value at or
    before left_ts per key). how='left' keeps unmatched left rows with null.
    """
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts → <=
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(right.schema[right_payload].dataType).alias("_rv"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_payload).alias("_rv"),
    )
    merged = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc("_rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"), F.col("_asof").alias(f"asof_{right_payload}")
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{right_payload}").isNotNull())
    return out
