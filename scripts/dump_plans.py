"""Dump .explain("formatted") for the key queries into docs/PLANS.md and
grep-verify the plan properties that matter at 100 TB:

* parquet scans carry PushedFilters / pruned ReadSchema
* dimension joins are BroadcastHashJoin (no shuffle of the big side)
* scoring/text ops sit inside WholeStageCodegen spans
* the KG link stage shows broadcast exchanges, not sort-merge joins

Run: python scripts/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

CHECKS = {
    # note: with AQE the pre-execution formatted plan carries no codegen ids;
    # the static properties below are the load-bearing ones (pushdown, map-
    # side partial aggregation before the exchange, broadcast joins, top-k).
    # A leading "!" means the plan must NOT contain the marker (e.g. no
    # cartesian product anywhere in a bucketed candidate join).
    "q1_pricing_summary": ["PushedFilters", "HashAggregate"],
    "q3_top_unshipped": ["BroadcastHashJoin", "PushedFilters"],
    "region_rollup": ["BroadcastHashJoin"],
    "q5_local_supplier_volume": ["BroadcastHashJoin", "PushedFilters"],
    "flagship_relevance_topk": ["TakeOrderedAndProject"],
    "top5_orders": ["TakeOrderedAndProject"],
    "tfidf_topk": ["BroadcastHashJoin"],
    "bm25_topk": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "parsed_search_topk": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "dense_topk": ["BroadcastNestedLoopJoin"],
    "customers_without_recent_orders": ["BroadcastHashJoin", "LeftAnti"],
    # --- ANN family: candidates via ONE shuffle on the bucket/cell key,
    # never a cross product of corpus × queries ------------------------------
    "ann_multiprobe_topk": [
        "hashpartitioning", "bucket", "!CartesianProduct", "!BroadcastNestedLoopJoin",
    ],
    "ann_ivf_topk": [
        "hashpartitioning", "cell", "!CartesianProduct", "!BroadcastNestedLoopJoin",
    ],
    # --- banded near-dup: bucket self-join with map-side partial aggregation
    # for the size cap; no cross product --------------------------------------
    "minhash_lsh_pairs": ["HashAggregate", "hashpartitioning", "!CartesianProduct"],
    "simhash_neardup_pairs": ["HashAggregate", "hashpartitioning", "!CartesianProduct"],
    # --- multi-set aggregates lower to ONE Expand + hash aggregate, not one
    # scan per grouping set ----------------------------------------------------
    "grouping_sets_events": ["Expand", "HashAggregate"],
    "cube_event_stats": ["Expand", "HashAggregate"],
    "pivot_event_counts": ["HashAggregate"],
    # --- sketches: the 100 TB forms — partial-aggregable HLL / quantile
    # sketches inside a standard two-phase HashAggregate/SortAggregate --------
    "user_counts_sketch": ["approx_count_distinct"],
    "value_percentiles_sketch": ["approx_percentile"],
    # --- stored-index serving paths: broadcast query-term join over the
    # published postings scan; literal probe-cell PARTITION pruning on the
    # cell-partitioned IVF index scan ------------------------------------------
    "parsed_search_stored": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "PartitionFilters: [tok_bucket",
    ],
    "ann_ivf_stored": ["PartitionFilters: [cell", "!CartesianProduct"],
    # boolean/fielded syntax served from the SAME stored postings table:
    # the scan prunes to the query's token buckets (positive + negated +
    # phrase rank words), never a postings rebuild
    "parsed_search_boolean_stored": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "PartitionFilters: [tok_bucket",
    ],
    "parsed_search_fielded_stored": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "PartitionFilters: [tok_bucket",
    ],
    "parsed_search_grouped_stored": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "PartitionFilters: [tok_bucket",
    ],
    # --- incremental sparse index: query-time weights are broadcast-term
    # joins over the raw-stats index; upsert = anti-join + union, never a
    # cross product or a corpus-wide sort-merge of the term sets
    "parsed_search_incremental_x": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # --- KG oracle twins: the real pipeline shapes — column-pruned parquet
    # scan into the Arrow UDF stages (narrow maps, no shuffle before the
    # explode), and both link lookups as broadcast joins of the triples side
    "kg_triples_x": [
        # the only exchange is the deliberate small-input round-robin
        # spread (queries/common._t); no KEY shuffle before the UDF maps
        "ArrowEvalPython", "ReadSchema: struct<doc_id:bigint>",
        "!hashpartitioning", "!rangepartitioning",
    ],
    "kg_linked_x": ["BroadcastHashJoin", "!SortMergeJoin", "!CartesianProduct"],
    # --- prebuild stored-serve: every channel reads the PUBLISHED snapshot
    # tables; sparse is a broadcast term join, the merge ends in one top-k —
    # and nothing in the three-channel union degenerates to a cross product
    # (the dense channel's broadcast single-query crossJoin is a
    # BroadcastNestedLoopJoin over ONE row, which is the intended shape)
    "prebuild_query_hybrid_x": [
        # the sparse term restriction is a literal isin filter now (no
        # tiny-frame broadcast join); top-k + no-product still gated
        "TakeOrderedAndProject", "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- embedding link fallback: Arrow encoder feeds a sign-LSH bucket
    # EQUI-join (never an all-pairs surface × alias product)
    "embed_link_candidates_x": [
        "ArrowEvalPython", "_bucket", "!CartesianProduct",
    ],
    # --- decontamination: corpus shingles probe a BROADCAST benchmark —
    # the corpus is never shuffled and nothing degenerates to a product
    "decontaminate_x": [
        "BroadcastHashJoin", "HashAggregate", "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- deterministic sampling: a pure codegen'd hash-threshold filter —
    # ZERO exchanges (rand()-free, stateless, partition-layout-invariant)
    "training_mix_sample_x": ["!hashpartitioning", "!rangepartitioning", "!CartesianProduct"],
    # --- shard packing: distributed prefix sum — per-range window +
    # broadcast offsets; the corpus must NEVER funnel through the
    # SinglePartition global-window exchange
    "shard_pack_x": ["!SinglePartition", "BroadcastHashJoin", "!CartesianProduct"],
    # --- line-level boilerplate dedup: classification is ONE aggregate
    # over the exploded line set (map-side partial combine collapses
    # duplicated lines before the exchange), removal is an anti-join —
    # never a pair join, never a product
    "line_dedup_trim_x": ["LeftAnti", "HashAggregate", "!CartesianProduct"],
    # --- per-domain cap: the skew-safe two-phase rank — BOTH window
    # stages hash-partition (domain,salt)/(domain); the corpus never
    # funnels through a single-partition global sort
    "domain_caps_x": ["Window", "hashpartitioning", "!SinglePartition", "!CartesianProduct"],
    # --- host link graph: href extraction + host parse are pure codegen
    # column expressions (ZERO python in the hot path) into one partially-
    # aggregated rollup
    "host_linkgraph_x": ["HashAggregate", "!ArrowEvalPython", "!CartesianProduct"],
    # --- html ingest parity: the bytes → tag-strip → clean chain is one
    # fused Arrow crossing over a narrow map — no shuffle at all
    "html_extract_parity": ["ArrowEvalPython", "!hashpartitioning", "!rangepartitioning"],
    # --- incremental KG upsert: delta re-link is broadcast joins, the
    # url retirement is a broadcast anti-join — the kept triples are
    # never shuffled, nothing degenerates to sort-merge or a product
    "kg_incremental_x": ["BroadcastHashJoin", "LeftAnti", "!SortMergeJoin", "!CartesianProduct"],
    # --- SemDeDup: the in-cell pair scan is an EQUI-join on the cell id
    # (the quadratic is bounded per cell, never a corpus cross product)
    "semantic_dedup_x": ["hashpartitioning", "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # --- composed training pipeline: the final explain starts at the
    # prefix-sum localCheckpoint (Scan ExistingRDD — the upstream
    # gate/dedup/cap windows are gated in their own entries above), so the
    # observable claims are the broadcast shard offsets and the absence of
    # any SinglePartition funnel or product in the packing tail
    "training_pipeline_x": ["BroadcastHashJoin", "!SinglePartition", "!CartesianProduct"],
    # --- WARC parse: record construction + byte parse is ONE narrow map
    # over the scan — zero shuffles end to end
    "warc_parse_x": ["MapInPandas", "!hashpartitioning", "!rangepartitioning"],
    # --- CDX index: one hash exchange on the file key into the per-file
    # indexing pass (FlatMapGroupsInPandas) — never a single-partition
    # funnel (on a real dump binaryFile supplies the files and even that
    # one exchange disappears)
    "warc_cdx_x": ["FlatMapGroupsInPandas", "hashpartitioning", "!SinglePartition"],
    # --- stored CDX lookup: the probe serve must scan ONLY the buckets
    # the probe urls hash into (partition pruning at the stored scan) and
    # join the probe set broadcast — never a product or a full-index scan
    "warc_cdx_lookup_x": [
        "PartitionFilters: [url_bucket", "BroadcastHashJoin",
        "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- fetch dedup: ONE window on the near-unique canonical-url key
    # (hash-partitioned, no global funnel) over pure-codegen
    # canonicalization — never a self-join or product
    "warc_fetch_dedup_x": [
        "Window", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- incremental CDX merge: file-keyed replace is one BROADCAST
    # left-anti + union over per-file Arrow index passes — no global
    # recompute, no product
    "warc_cdx_incremental_x": [
        "BroadcastHashJoin", "LeftAnti", "Union",
        "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- SURT domain-prefix lookup: the probe domain's bucket prunes at
    # the stored scan (one partition of the index), the prefix match is a
    # codegen StartsWith filter — no join at all, no product, no rescan
    # of the dump
    "warc_cdx_surt_lookup_x": [
        "PartitionFilters: [", "domain_bucket",
        "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- url-prefix matchType: probe key built driver-side (python
    # twins), one pruned partition + pushed StartsWith — no join at all
    "warc_cdx_url_prefix_lookup_x": [
        "PartitionFilters: [", "StringStartsWith",
        "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- grouped boolean search: clause matches are broadcast postings
    # joins unioned, ranking a top-k — grouping adds parse-time DNF
    # clauses, never a plan product
    "parsed_search_grouped_x": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # --- dictionary-growth round trip: two link passes (broadcast dict
    # joins) + per-surface aggregates — no product anywhere; the
    # before/after combine keys on the fine-grained surface norm
    "kg_dict_growth_x": [
        "BroadcastHashJoin", "HashAggregate", "!CartesianProduct",
        "!BroadcastNestedLoopJoin",
    ],
    # --- revisit resolution: the body re-attach is an equi-join on the
    # content digest (near-unique key) — never a product; responses pass
    # through without a shuffle of their payloads
    "warc_revisit_resolve_x": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # --- boolean search: clause matches are broadcast term joins, the
    # final rank one top-k — no product anywhere in the OR/NOT machinery
    "parsed_search_boolean_x": ["BroadcastHashJoin", "TakeOrderedAndProject", "!CartesianProduct"],
    "parsed_search_fielded_x": ["BroadcastHashJoin", "TakeOrderedAndProject", "!CartesianProduct"],
    # --- anchor evidence: zero-UDF regexp extraction, the dictionary join
    # a broadcast, the rollup map-side-combinable hash aggregates — never
    # a sort-merge of the anchor stream against the dictionary
    "anchor_entity_links_x": [
        "BroadcastHashJoin", "HashAggregate", "!SortMergeJoin", "!CartesianProduct",
    ],
    # --- co-occurrence PMI: pair generation is an EQUI self-join on the
    # doc key (bounded per-doc quadratic), marginals broadcast into the
    # final projection — no product, no sort-merge against the marginals
    "kg_entity_cooccurrence_x": [
        "BroadcastHashJoin", "HashAggregate", "!CartesianProduct",
        "!BroadcastNestedLoopJoin",
    ],
    # --- temporal fact resolution: ONE window over the fine-grained
    # (subj_eid, pred) fact key — hash-partitioned, never a global sort
    # funnel; the page-date join is a broadcast
    "kg_facts_asof_x": [
        "Window", "hashpartitioning", "BroadcastHashJoin",
        "!SinglePartition", "!CartesianProduct",
    ],
    # --- entity typing: one count aggregate + one window, both on the
    # entity key — hash-partitioned, no funnel, no product
    "kg_entity_types_x": [
        "Window", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- fact support: the window's exchange moves the collapsed fact
    # table, never the mention stream; no funnel, no product
    "kg_fact_support_x": [
        "Window", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- fact history: ONE map-side-combinable aggregate on the fact key
    "kg_fact_history_x": [
        "HashAggregate", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- NIL mining: unlinked-subject rollup on the normalized surface
    # (string min forces the sort-based partial-agg form) — no funnel
    "kg_nil_candidates_x": [
        "SortAggregate", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- both-position NIL mining: the subj/obj streams UNION before the
    # same surface-key rollup — still one aggregate, no funnel/product
    "kg_nil_candidates_both_x": [
        "Union", "SortAggregate", "hashpartitioning",
        "!SinglePartition", "!CartesianProduct",
    ],
    # --- incremental fact state: delta merge is ONE map-side-combinable
    # aggregate over the envelope union; winner selection one window on
    # the collapsed state — no historical-mention re-read, no funnel
    "kg_facts_incremental_x": [
        "HashAggregate", "Union", "Window", "hashpartitioning",
        "!SinglePartition", "!CartesianProduct",
    ],
    # --- stored fact-state lookup: the probe set's buckets prune the
    # partitioned scan before the broadcast eid join — never an inline
    # re-resolution, no product
    "kg_facts_stored_lookup_x": [
        "PartitionFilters: [", "fact_bucket", "BroadcastHashJoin",
        "!CartesianProduct", "!SortMergeJoin",
    ],
    # --- crawl-cycle fact diff: one conditional-envelope aggregate +
    # two windows on the collapsed fact table — never two passes over
    # mentions, no funnel, no product
    "kg_fact_changes_x": [
        "Window", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- entity profile capstone: aggregates + modal-type window + the
    # final entity-key joins — everything keys on eid, no funnel/product
    "kg_entity_profiles_x": [
        "Window", "hashpartitioning", "!SinglePartition", "!CartesianProduct",
    ],
    # --- conflict inventory: partial-then-final aggregates on the same
    # fact key (SortAggregate — the string min/max buffers are var-length,
    # so Spark picks the sort-based form; still map-side combined before
    # the exchange) — no product, no sort-merge against the page dates
    "kg_fact_conflicts_x": [
        "SortAggregate", "BroadcastHashJoin",
        "!SortMergeJoin", "!CartesianProduct",
    ],
}


def main() -> int:
    from darkbo_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out = ["# Physical plans — evidence for the scale-design claims\n"]
    failures = []
    for name, want in CHECKS.items():
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        missing = [
            w
            for w in want
            if ((w[1:] in plan) if w.startswith("!") else (w not in plan))
        ]
        status = "OK" if not missing else f"MISSING {missing}"
        print(f"{name}: {status}")
        if missing:
            failures.append((name, missing))
        out.append(f"## {name}\n\nExpect: {', '.join(want)} → **{status}**\n")
        out.append("```\n" + plan[:4000] + "\n```\n")

    # KG link stage plan
    from darkbo_spark.kg.extract import extract_docs
    from darkbo_spark.kg.link import link_entities
    from darkbo_spark.kg.pages import entity_dictionary_df, synth_pages
    from darkbo_spark.kg.triples import extract_doc_triples_df

    pages = synth_pages(spark, 1000, columns=["page_id", "url", "warc_ts", "text", "lang"])
    linked = link_entities(
        extract_doc_triples_df(extract_docs(pages)), entity_dictionary_df(spark)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        linked.explain("formatted")
    plan = buf.getvalue()
    ok = "BroadcastHashJoin" in plan
    print(f"kg_link_stage: {'OK' if ok else 'MISSING BroadcastHashJoin'}")
    if not ok:
        failures.append(("kg_link_stage", ["BroadcastHashJoin"]))
    out.append(f"## kg_link_stage\n\nExpect: BroadcastHashJoin → **{'OK' if ok else 'MISSING'}**\n")
    out.append("```\n" + plan[:4000] + "\n```\n")

    # stream-static link micro-batch plan: foreachBatch hands the transform a
    # plain BATCH DataFrame backed by the trigger's files, so the per-batch
    # plan IS this plan — built here over the same pages schema to assert the
    # dictionary joins by BROADCAST inside every micro-batch (the
    # stream-static join must not sort-merge a tiny slowly-changing dim)
    linked_mb = link_entities(
        extract_doc_triples_df(extract_docs(synth_pages(spark, 1000))),
        entity_dictionary_df(spark),
        strategy="broadcast",
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        linked_mb.explain("formatted")
    plan = buf.getvalue()
    want = ["BroadcastHashJoin", "!SortMergeJoin", "!CartesianProduct"]
    missing = [
        w for w in want
        if ((w[1:] in plan) if w.startswith("!") else (w not in plan))
    ]
    status = "OK" if not missing else f"MISSING {missing}"
    print(f"stream_static_link_microbatch: {status}")
    if missing:
        failures.append(("stream_static_link_microbatch", missing))
    out.append(
        f"## stream_static_link_microbatch\n\n"
        f"foreachBatch micro-batch transform of stream_pages_to_linked_triples "
        f"(streaming/ingest.py) — the batch plan each trigger executes.\n\n"
        f"Expect: {', '.join(want)} → **{status}**\n"
    )
    out.append("```\n" + plan[:4000] + "\n```\n")

    os.makedirs("docs", exist_ok=True)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo_root, "docs", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print(f"\nwrote docs/PLANS.md; {len(failures)} check failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
