"""Capture .explain("formatted") for the round-8 touched queries into
plans/r08/<query>_<suffix>.txt.

Usage: python scripts/dump_r08_plans.py <repo_root> <suffix> [out_dir]
  repo_root: tree whose darkbo_spark/__spark_entry__ to import
             (round-start worktree for "before", this repo for "after")
  suffix:    "before" | "after"
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

QUERIES = [
    "parsed_search_topk",
    "parsed_search_boolean_x",
    "parsed_search_fielded_x",
    "parsed_search_grouped_x",
    "parsed_search_incremental_x",
    "bm25_topk",
    "tfidf_topk",
    "hybrid_search",
    "hybrid_search_bm25",
    "decontaminate_x",
    "simhash_docs",
    "simhash_neardup_pairs_x",
    "ann_multiprobe_topk",
    "ann_multiprobe_exact",
    "ann_ivf_topk",
    "semantic_dedup_x",
    "dense_topk",
    "line_dedup_trim_x",
    "kg_triples_x",
    "kg_linked_x",
    "kg_facts_asof_x",
    "kg_facts_incremental_x",
    "kg_entity_profiles_x",
    "kg_entity_cooccurrence_x",
    "kg_dict_growth_x",
    # second optimization pass (persist + CC count-gate + plan memo)
    "neardup_clusters_x",
    "dedup_keep_best_x",
    "minhash_lsh_pairs_x",
    "host_components_x",
]


def main() -> int:
    repo = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"
    )
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from darkbo_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plans-r08", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in QUERIES:
        if name not in qs:
            print(f"skip {name} (not registered)")
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # capture failures visibly, don't abort the dump
            txt = f"ERROR building plan: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
