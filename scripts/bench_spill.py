"""Spill/robustness stress for the heavy aggregate family (VERDICT r3 #6):
run SimHash signatures (the 60-conditional-sum aggregate, dedup.py) and the
MinHash banding pipeline over a synthetic 1M-doc corpus under a
deliberately SMALL heap, and record complete-vs-OOM plus spill metrics.

The interesting question is the memory SHAPE: both pipelines are hash
aggregates over an exploded (doc, token) stream — partial aggregation and
shuffle spill should degrade them gracefully to disk, not OOM.

One (docs, heap) point per process (driver memory is fixed at JVM start):

    python scripts/bench_spill.py --docs 1000000 --heap 2g

Prints one JSON line: wall seconds per operator, rows out, and the
executor spill counters scraped from the Spark status API. Aggregated
results are recorded in docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VOCAB_SIZE = 5000
TOKENS_PER_DOC = 50


def synth_docs(spark, n_docs: int, parts: int):
    """Deterministic 1M-doc word-salad corpus, generated DISTRIBUTED and
    entirely JVM-side: token j of doc i is vocab[xxhash64(i, j) % V] — no
    Python in the loop, no driver materialization."""
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(f"w{i:04d}") for i in range(VOCAB_SIZE)])
    # every 10th doc is a near-copy of its predecessor (one appended token),
    # so the banding self-join has REAL matching buckets, not only singletons
    base = F.when(F.col("id") % 10 == 0, F.col("id") - 1).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(base, j), F.lit(VOCAB_SIZE)) + 1).cast("int"),
        ),
    )
    text = F.concat(
        F.array_join(toks, " "),
        F.when(F.col("id") % 10 == 0, F.lit(" extra")).otherwise(F.lit("")),
    )
    return spark.range(0, n_docs, numPartitions=parts).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def _spill_metrics(spark) -> dict:
    """Sum spill across all stages via the UI REST API (the stable public
    surface for the stage table's spill columns)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return {"memory_spilled_mb": round(mem / 2**20, 1),
            "disk_spilled_mb": round(disk / 2**20, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--heap", default="2g")
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("spill-stress")
        .config("spark.driver.memory", args.heap)
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from darkbo_spark.operators.dedup import minhash_lsh_pairs, simhash

    docs = synth_docs(spark, args.docs, parts=4 * args.cores)
    out: dict = {"docs": args.docs, "heap": args.heap, "cores": args.cores}

    t0 = time.time()
    sims = simhash(docs, "text", "doc_id")
    n_sim = sims.count()
    out["simhash"] = {"wall_s": round(time.time() - t0, 1), "rows": n_sim}

    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", k=16, bands=4, persist=False)
    n_pairs = pairs.count()
    out["minhash_lsh"] = {"wall_s": round(time.time() - t0, 1), "rows": n_pairs}

    out.update(_spill_metrics(spark))
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
