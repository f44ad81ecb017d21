"""Per-query isolation probe (guide §1): for each named query, time
construction (driver-side work incl. any actions the body runs), analysis
+ optimization (explain), and 3 noop-sink executions. Prints one JSON line
per query. NOT the driver bench — bench.py stays frozen; this exists to
attribute wall time to plan vs execute before optimizing.

Usage: python scripts/bench_probe.py q1 q2 ...   (default: the top-cost set)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

TOP = [
    "ann_multiprobe_topk",
    "parsed_search_incremental_x",
    "training_pipeline_x",
    "simhash_neardup_pairs_x",
    "parsed_search_boolean_x",
    "decontaminate_x",
    "parsed_search_grouped_x",
    "simhash_neardup_pairs",
    "parsed_search_fielded_x",
    "parsed_search_topk",
    "semantic_dedup_x",
    "neardup_clusters_x",
    "kg_entity_pagerank_x",
    "hybrid_search_bm25",
    "dedup_keep_best_x",
    "kg_dict_growth_x",
    "kg_entity_cooccurrence_x",
    "line_dedup_trim_x",
]


def main() -> int:
    names = sys.argv[1:] or TOP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from darkbo_spark.session import get_spark
    import __spark_entry__ as entry_mod

    threads = max(2, cpus // 2)
    spark = get_spark("darkbo-probe", master=f"local[{threads}]",
                      shuffle_partitions=2 * threads)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="probe_ckpt_"))

    from darkbo_spark.functions.textnorm import clean_text_udf
    from pyspark.sql import functions as F

    spark.range(0, 10000, numPartitions=threads).select(
        clean_text_udf(F.lit("warm up text.")).alias("t")
    ).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "events", "orders", "lineitem",
              "customer", "part", "region", "nation", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    qs = entry_mod.queries()
    for warm in ("flagship_relevance_topk", "tfidf_topk"):
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df._jdf.queryExecution().executedPlan()  # force analysis+optimization
        t_plan = time.time() - t0
        runs = []
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        # re-run the full body once more (bench methodology: build+write)
        t0 = time.time()
        df2 = fn(spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t_full2 = round(time.time() - t0, 3)
        row = {
            "q": name,
            "build_s": round(t_build, 3),
            "plan_s": round(t_plan, 3),
            "exec_s": runs,
            "rerun_full_s": t_full2,
        }
        out[name] = row
        print(json.dumps(row), flush=True)
    spark.sparkContext.setJobDescription(None)
    with open("/tmp/bench_probe_out.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
