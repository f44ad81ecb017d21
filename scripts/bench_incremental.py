"""Controlled A/B measurements for the round-4 index-serving claims:

1. Stored BM25 serve with vs without token-bucket partition pruning
   (same warm stored table, same query — only the bucket filter differs).
2. Incremental index maintenance vs full rebuild for a small delta
   (merge_tf_delta cost should scale with the delta, not the corpus).

Run: python scripts/bench_incremental.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = 3


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _best(fn) -> float:
    walls = []
    for _ in range(TRIALS):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return round(min(walls), 3)


def main() -> int:
    from pyspark.sql import functions as F

    from darkbo_spark.session import get_spark
    from darkbo_spark.operators.queryparse import search_text
    from darkbo_spark.operators.tfidf import (
        build_tf_index,
        merge_tf_delta,
    )
    from darkbo_spark.queries.retrieval import (
        _PARSED,
        _POSTINGS_BUCKETS,
        _RANK_TERMS,
        _RAW_QUERY,
        _tok_bucket_col,
        _tok_bucket_py,
        parsed_search_stored,
    )

    spark = get_spark("bench-incr", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # BENCH_SYNTH_DOCS=N swaps in the deterministic synthetic corpus at a
    # size where the asymptotic story is visible (sf0.1's 5k docs are
    # fixed-cost-bound); the serving A/B keeps using the sf corpus, whose
    # stored index the driver also exercises
    synth_n = int(os.environ.get("BENCH_SYNTH_DOCS", "0"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out: dict = {"sf_dir": SF_DIR, "trials": TRIALS}

    # -- 1. bucket pruning A/B over the same WARM stored table --------------
    parsed_search_stored(spark, SF_DIR)  # ensures the table is published
    from darkbo_spark.operators.tfidf import build_bm25_postings
    from darkbo_spark.queries.common import _stored_table

    # real builder + the shared bucket-count tag: if the corpus fingerprint
    # shifted since the warm-up (mtime change, concurrent republish) this
    # rebuilds instead of crashing on a None builder
    table = _stored_table(
        SF_DIR,
        "bm25_postings",
        "documents",
        lambda: build_bm25_postings(docs)
        .withColumn("tok_bucket", _tok_bucket_col(F.col("token")))
        .repartition("tok_bucket"),
        partition_by=["tok_bucket"],
        tag=f"tok_bucket{_POSTINGS_BUCKETS}",
    )
    need = sorted({_tok_bucket_py(t) for t in set(_PARSED.terms) | set(_RANK_TERMS)})

    def serve(pruned: bool):
        stored = table.read(spark)
        if pruned:
            stored = stored.filter(F.col("tok_bucket").isin(need))
        _noop(search_text(docs, _RAW_QUERY, "text", "doc_id", top_k=10, postings=stored))

    out["stored_serve_full_scan_s"] = _best(lambda: serve(False))
    out["stored_serve_bucket_pruned_s"] = _best(lambda: serve(True))
    out["buckets_scanned"] = f"{len(need)}/32"

    # -- 2. incremental merge vs full rebuild for a 1% delta ----------------
    if synth_n:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_spill import synth_docs

        docs = synth_docs(spark, synth_n, parts=64).localCheckpoint(eager=True)
    n = docs.count()
    docs = docs.select("doc_id", "text")
    delta = docs.filter(F.col("doc_id") % 100 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" refreshed")).alias("text")
    )
    tf0, st0 = build_tf_index(docs)
    tf0 = tf0.localCheckpoint(eager=True)  # the stored index stand-in
    st0 = st0.localCheckpoint(eager=True)

    def full_rebuild():
        updated = docs.join(
            delta.select("doc_id"), "doc_id", "left_anti"
        ).unionByName(delta)
        tf, st = build_tf_index(updated)
        _noop(tf.join(F.broadcast(st)))

    def incremental():
        tf, st = merge_tf_delta(tf0, st0, delta)
        _noop(tf.join(F.broadcast(st)))

    out["docs"] = n
    out["delta_docs"] = delta.count()
    out["full_rebuild_s"] = _best(full_rebuild)
    out["incremental_merge_s"] = _best(incremental)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
