"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] plus the KG pipeline on a synthetic pages table,
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed to full materialization via the noop sink (uniformly —
no driver transfer in any timing). The KG pipeline runs against a fresh
output dir (no checkpoint skip) and reports docs/sec alongside.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


# Task threads are capped at half the CPU budget: every Arrow-UDF task
# occupies a JVM task thread AND a pipelined python worker, so local[cpus]
# runs 2×cpus busy threads and thrashes (measured 3.2k docs/s at local[32]
# vs 11.5k at local[16] on a 32-vCPU box for the same job).
def _master_threads(cpus: int) -> int:
    return max(2, cpus // 2)


HEADLINE = [
    "flagship_relevance_topk",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "region_rollup",
    "tfidf_topk",
    "bm25_topk",
    "parsed_search_topk",
    "parsed_search_incremental_x",
    "dense_topk",
    "ann_multiprobe_topk",
    "ann_ivf_topk",
    "ann_ivf_full_probe",
    "ann_multiprobe_exact",
    "cosine_neardup_pairs",
    "bpe_token_counts",
    "bpe_real_token_counts",
    "q5_local_supplier_volume",
    "cube_event_stats",
    "grouping_sets_events",
    "pivot_event_counts",
    "events_in_first_window",
    "token_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_x",
    "neardup_clusters_x",
    "dedup_keep_best_x",
    "decontaminate_x",
    "training_mix_sample_x",
    "shard_pack_x",
    "simhash_docs",
    "simhash_neardup_pairs",
    "simhash_neardup_pairs_x",
    "dedup_first_wins",
    "running_totals",
    "sessionize_events",
    "exact_dedup_docs",
    "training_data_filter",
    "quality_scores",
    "clean_text_parity",
    "merge_upsert",
    "source_checksums",
    "hybrid_search",
    "hybrid_search_bm25",
    "asof_events_orders",
    "rollup_lineitem",
    "window_rank_lag",
    "value_percentiles",
    "heavy_hitters_exact",
    "heavy_hitters_sketch",
    "route_queries",
    "prebuild_query_hybrid",
    "kg_triples_x",
    "kg_linked_x",
    "kg_entity_pagerank_x",
    "url_canonicalize",
    "url_dedup_counts",
    "repetition_signals",
    "redact_pii_docs",
    "unigram_logprob_scores",
    # round 5 additions
    "dup_spans_x",
    "dup_span_trim_x",
    "image_phash_x",
    "quality_classifier_x",
    "line_dedup_counts_x",
    "line_dedup_trim_x",
    "domain_stats_x",
    "domain_caps_x",
    "html_extract_parity",
    "host_linkgraph_x",
    "host_pagerank_x",
    "kg_incremental_x",
    "semantic_dedup_x",
    "training_pipeline_x",
    "warc_parse_x",
    "parsed_search_boolean_x",
    "parsed_search_fielded_x",
    "bpe_word_freqs_x",
    "host_components_x",
    # round 6 additions
    "dup_span_trim_bytes_x",
    "anchor_entity_links_x",
    "kg_entity_cooccurrence_x",
    "warc_cdx_x",
    "warc_revisit_resolve_x",
    "kg_facts_asof_x",
    "kg_fact_conflicts_x",
    "kg_entity_types_x",
    "kg_fact_support_x",
    "kg_entity_profiles_x",
    "kg_fact_history_x",
    "kg_nil_candidates_x",
    # round 7 additions
    "parsed_search_grouped_x",
    "kg_dict_growth_x",
    "kg_nil_candidates_both_x",
    "warc_cdx_incremental_x",
    "warc_fetch_dedup_x",
    "kg_fact_changes_x",
    "kg_facts_incremental_x",
]

KG_PAGES = int(os.environ.get("BENCH_KG_PAGES", "100000"))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re as _re

    m = _re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from darkbo_spark.session import get_spark
    import __spark_entry__ as entry_mod

    threads = _master_threads(cpus)
    spark = get_spark("darkbo-bench", master=f"local[{threads}]",
                      shuffle_partitions=2 * threads)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="bench_ckpt_"))

    # warm-up: JVM task threads + python/Arrow workers (startup is not
    # query throughput)
    from darkbo_spark.functions.textnorm import clean_text_udf
    from pyspark.sql import functions as F

    spark.range(0, 10000, numPartitions=threads).select(
        clean_text_udf(F.lit("warm up text.")).alias("t")
    ).write.format("noop").mode("overwrite").save()
    # file-index + footer warm-up for every input table (listing and schema
    # inference are session fixed costs, not per-query throughput)
    for t in ("documents", "embeddings", "events", "orders", "lineitem",
              "customer", "part", "region", "nation", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    qs = entry_mod.queries()
    # full-query warm-up, UNTIMED: the first timed slot must not absorb
    # residual JVM/codegen/py-worker spin-up (round-3 lesson — flagship sat
    # first and its +25% "regression" was warm-up jitter). One
    # representative query per engine path: codegen scan (flagship) and an
    # Arrow-UDF + shuffle pipeline (tfidf).
    for warm in ("flagship_relevance_topk", "tfidf_topk"):
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # full materialization without driver-transfer bias
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # stored-index paths, split into cold BUILD (drop the published table
    # first, so the one timed run provably publishes) and warm SERVE
    # (median of 3 on the hot index) — "materialize once, serve many" is
    # the design claim, so the two costs are reported separately instead
    # of fused into one misleading number.
    from darkbo_spark.queries.common import drop_stored_table

    for name, stored_name in (
        ("parsed_search_stored", "bm25_postings"),
        ("ann_ivf_stored", "ivf_index"),
        ("warc_cdx_lookup_x", "warc_cdx"),
        ("warc_cdx_surt_lookup_x", "warc_cdx_surt"),
        ("kg_facts_stored_lookup_x", "kg_facts_state"),
    ):
        fn = qs[name]
        drop_stored_table(stored_name)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[f"{name}_build"] = round(time.time() - t0, 3)
        serves = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            serves.append(time.time() - t0)
        timings[f"{name}_serve"] = round(sorted(serves)[1], 3)

    # boolean/fielded stored flavors serve from the SAME published
    # bm25_postings table the loop above just built cold — their build
    # cost IS parsed_search_stored_build, so only warm serves are timed;
    # likewise the url-prefix matchType serves the published SURT index
    for name in ("parsed_search_boolean_stored", "parsed_search_fielded_stored",
                 "parsed_search_grouped_stored", "warc_cdx_url_prefix_lookup_x"):
        fn = qs[name]
        serves = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            serves.append(time.time() - t0)
        timings[f"{name}_serve"] = round(sorted(serves)[1], 3)

    # KG pipeline end-to-end (fresh dir -> no fingerprint skip)
    from darkbo_spark.kg.pipeline import run_pipeline

    out = tempfile.mkdtemp(prefix="bench_kg_")
    t0 = time.time()
    res = run_pipeline(spark, out, n_pages=KG_PAGES, seed=42)
    kg_wall = time.time() - t0
    timings["kg_pipeline"] = round(kg_wall, 3)

    # temporal fusion delta cost: the 5 core stages just published, so a
    # facts_asof rerun skips them all and times ONLY the kg_facts +
    # kg_conflicts stages — the marginal cost of "give me the fact state
    # as of date X" on an already-built KG
    t0 = time.time()
    run_pipeline(spark, out, n_pages=KG_PAGES, seed=42, facts_asof="2024-01-02")
    timings["kg_facts_stages"] = round(time.time() - t0, 3)

    # maintenance: compact-then-expire on a DELIBERATELY fragmented copy
    # of the real KG output (2000 sliver files — the shape months of
    # incremental ingest deltas leave behind), full-scan read timed
    # before and after (median of 3 each). Compaction targets one file
    # per core — NOT one file total: a single small file is one input
    # split, which would trade file-open overhead for lost read
    # parallelism and measure the wrong thing (at cluster scale the
    # analog is Iceberg's size-targeted rewrite, many ~512 MB files).
    from darkbo_spark.storage.snapshots import SnapshotTable, maintain

    frag_base = tempfile.mkdtemp(prefix="bench_maint_")
    frag = SnapshotTable(frag_base, "kg_triples_frag")
    frag.publish(res.tables["kg_triples"].read(spark).repartition(2000), "frag")

    def _scan(tbl):
        reads = []
        for _ in range(3):
            t0 = time.time()
            tbl.read(spark).write.format("noop").mode("overwrite").save()
            reads.append(time.time() - t0)
        return round(sorted(reads)[1], 3)

    timings["kg_read_fragmented"] = _scan(frag)
    maint_row = maintain(spark, frag, target_files=threads)
    timings["kg_maintain"] = maint_row["wall_s"]
    timings["kg_read_compacted"] = _scan(frag)
    shutil.rmtree(frag_base, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_pages": KG_PAGES,
        "kg_docs_per_sec": round(KG_PAGES / kg_wall, 2),
        "kg_maintenance": maint_row,
        "cpus": cpus,
    }
    # Per-query detail goes to a file and an EARLIER stdout line; the LAST
    # line is a compact headline object. The driver parses a bounded tail of
    # stdout, so the final line must stay small (round-5 lesson: the full
    # ~80-query detail line outgrew the tail window and the round's headline
    # number was lost).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run.json"
    )
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))
    compact = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": {"kg_pipeline": timings["kg_pipeline"]},
        "n_queries": len(timings),
        "kg_pages": KG_PAGES,
        "kg_docs_per_sec": detail["kg_docs_per_sec"],
        "cpus": cpus,
        "detail_file": "BENCH/last_run.json",
    }
    print(json.dumps(compact))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
