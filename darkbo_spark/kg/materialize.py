"""Stage M — materialize the knowledge graph.

linked triples → kg_triples, partitioned EXPLICITLY on subject-entity hash
buckets (`pmod(xxhash64(coalesce(subj_eid, subj)), n_buckets)`): downstream
per-entity queries prune to one bucket, and co-partitioning kg_triples with
kg_entities on the same bucket function makes entity⋈triple joins
shuffle-free. Head-entity skew inside a bucket is absorbed by the
repartition over (bucket, salt) before the write so no single output task
owns a whole head entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def bucketize_triples(
    linked: DataFrame, n_buckets: int = DEFAULT_BUCKETS, write_salt: int = 4
) -> DataFrame:
    """Add subj_bucket and spread writes over (bucket, salt) tasks."""
    out = linked.withColumn(
        "subj_bucket",
        F.pmod(F.xxhash64(F.coalesce("subj_eid", "subj")), F.lit(n_buckets)).cast("int"),
    )
    # salt only the physical write distribution, not the schema
    return out.repartition(
        n_buckets * write_salt,
        F.col("subj_bucket"),
        F.pmod(F.xxhash64("triple_id"), F.lit(write_salt)),
    )
