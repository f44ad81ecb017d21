"""Streaming-ingest throughput: the per-page KG path (extract → segment →
triples → entity link) running as Structured Streaming micro-batches over
landed parquet page files, timed end to end and compared with the same
transforms as one batch job over the identical files.

    python scripts/bench_streaming.py [--pages 200000] [--files 20]

Prints ONE JSON line:
    {"streaming_docs_per_sec": ..., "batch_docs_per_sec": ...,
     "micro_batches": ..., "rows": ..., "pages": ...}

What the ratio means: the streaming path pays per-micro-batch fixed costs
(offset commit, sink overwrite, job scheduling) that the one-shot batch
job amortizes away — the gap IS the price of incremental processing, and
it shrinks as maxFilesPerTrigger (batch size) grows. Rows are asserted
identical between the two paths before any number is printed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--trigger-files", type=int, default=4)
    args = ap.parse_args()

    from darkbo_spark.session import get_spark

    spark = get_spark(
        "bench-streaming",
        master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from darkbo_spark.kg.extract import extract_docs
    from darkbo_spark.kg.link import link_entities
    from darkbo_spark.kg.pages import entity_dictionary_df, synth_pages
    from darkbo_spark.kg.triples import extract_doc_triples_df
    from darkbo_spark.streaming.ingest import stream_pages_to_linked_triples

    base = tempfile.mkdtemp(prefix="bench_stream_")
    inp, outp, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))

    # land the page files (NOT timed — this is the upstream producer)
    per_file = args.pages // args.files
    pages = synth_pages(
        spark, args.pages, seed=42, columns=["url", "warc_ts", "html", "text", "lang"]
    ).repartition(args.files)
    pages.write.mode("overwrite").parquet(inp)

    d = entity_dictionary_df(spark)

    # warm-up python workers (excluded, same policy as run_kg)
    from darkbo_spark.functions.textnorm import clean_text_udf

    spark.range(0, 10000, numPartitions=args.cores).select(
        clean_text_udf(F.lit("warm up text.")).alias("t")
    ).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    q = stream_pages_to_linked_triples(
        spark, inp, outp, ckpt, d, max_files_per_trigger=args.trigger_files
    )
    q.awaitTermination()
    stream_wall = time.time() - t0
    stream_rows = spark.read.parquet(outp).count()
    n_batches = len(
        [f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")]
    )

    # identical transforms, one batch job over the same landed files
    batch_out = os.path.join(base, "batch_out")
    t0 = time.time()
    linked = link_entities(
        extract_doc_triples_df(extract_docs(spark.read.parquet(inp))), d
    )
    linked.write.mode("overwrite").parquet(batch_out)
    batch_wall = time.time() - t0
    batch_rows = spark.read.parquet(batch_out).count()

    assert stream_rows == batch_rows, (stream_rows, batch_rows)

    print(
        json.dumps(
            {
                "pages": args.pages,
                "files": args.files,
                "trigger_files": args.trigger_files,
                "per_file": per_file,
                "micro_batches": n_batches,
                "rows": stream_rows,
                "streaming_wall_s": round(stream_wall, 2),
                "streaming_docs_per_sec": round(args.pages / stream_wall, 1),
                "batch_wall_s": round(batch_wall, 2),
                "batch_docs_per_sec": round(args.pages / batch_wall, 1),
                "streaming_over_batch": round(batch_wall / stream_wall, 3),
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
