"""J3 — dense retrieval / similarity search over embedding columns.

The reference's dense path is an exact inner-product top-k over L2
normalized vectors (behavior: build api/index_versioning.py:385-433, query
ai_worker.py:172-200). Spark restatement:

* brute-force exact top-k — broadcast the (few) query vectors, dot product
  via `aggregate(zip_with(...))` (JVM higher-order functions, no UDF),
  rank per query with a window. Correct baseline at any scale where
  queries are few: one narrow pass over the corpus.
* LSH-bucketed ANN (random signed projections) — the scale path when the
  query side is also huge: both sides hash to sign-pattern buckets; only
  intra-bucket pairs are scored. Recall measured against brute force in
  tests, not assumed.

Normalization and dot products run in the array element order on both
engines, so DuckDB oracle floats match bit-for-bit (rounded to 6 dp in both
for belt-and-braces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: crossJoin(broadcast(queries)) — zero
    shuffle of the corpus; TakeOrdered per query via window rank."""
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("doc_id"),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id from signs of dot products with fixed random hyperplanes."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(
            dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose sign-projection
    bucket equals the query's. One shuffle on bucket instead of a full
    cross product — the 100 TB plan when queries are many."""
    planes = random_planes(dim, n_planes, seed)
    c = corpus.withColumn("_bucket", _sign_bucket(F.col(vec_col), planes))
    q = queries.withColumn("_bucket", _sign_bucket(F.col(qvec_col), planes))
    joined = c.join(q, "_bucket")
    scored = joined.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("doc_id"),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk_multi(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Multi-table, multi-probe sign-LSH top-k — the recall upgrade over
    single-probe `lsh_topk` (whose recall sags as dim grows).

    * `n_tables` independent hyperplane sets: a pair is a candidate if it
      collides in ANY table → corpus index grows ×L (the standard LSH
      space-for-recall trade), join stays one shuffle on (table, bucket).
    * `multiprobe`: the QUERY side additionally probes every bucket at
      Hamming distance 1 (each single sign flip) — ×(1+n_planes) rows on
      the tiny query side only, nothing extra on the corpus side.
    * candidates dedup on (qid, doc_id) before scoring so each pair is
      scored once regardless of how many tables it collided in.
    """
    tables = [random_planes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)]
    c_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                _sign_bucket(F.col(vec_col), planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    c = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_cvec"),
        F.explode(c_entries).alias("tb"),
    ).select("doc_id", "_cvec", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))

    def probes(bucket: Column) -> Column:
        if not multiprobe:
            return F.array(bucket)
        flips = [bucket] + [
            bucket.bitwiseXOR(F.shiftleft(F.lit(1).cast("bigint"), i))
            for i in range(n_planes)
        ]
        return F.array(*flips)

    q_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                probes(_sign_bucket(F.col(qvec_col), planes)).alias("buckets"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    q = (
        queries.select(
            F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qvec"),
            F.explode(q_entries).alias("tb"),
        )
        .select("qid", "_qvec", F.col("tb.t").alias("t"), F.explode("tb.buckets").alias("bucket"))
        .distinct()
    )
    cand = (
        c.join(q, ["t", "bucket"])
        .select("qid", "doc_id", "_qvec", "_cvec")
        .dropDuplicates(["qid", "doc_id"])
    )
    scored = cand.select(
        "qid", "doc_id", F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
