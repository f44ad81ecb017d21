"""spark-submit entry point for the per-project retrieval prebuild — the
reference's `python prebuild_kb.py` analog (behavior: prebuild_kb.py:108-199
— discover, per-project checksum-gated build, per-project success/skip
summary, non-zero exit on any failure).

Usage:
    spark-submit --master local[8] --py-files darkbo_spark.zip \
        scripts/run_prebuild.py --data DIR --out DIR [--query "..." --project ID]

Prints ONE JSON line: per-project {version|skipped|error}, plus the hybrid
top-k when --query is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="data dir holding project subdirs")
    ap.add_argument("--out", required=True, help="output dir for versioned indexes")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--query", default=None, help="optional query to serve after build")
    ap.add_argument("--project", default=None, help="project id for --query")
    ap.add_argument("--top-k", type=int, default=5)
    args = ap.parse_args()

    from darkbo_spark.retrieval.prebuild import query_project
    from darkbo_spark.session import get_spark

    spark = get_spark("darkbo-prebuild", master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    failed = 0
    from darkbo_spark.sources.discovery import discover_project_dirs
    from darkbo_spark.retrieval.prebuild import prebuild_project

    for pid, paths in sorted(discover_project_dirs(args.data).items()):
        try:
            r = prebuild_project(spark, pid, paths, args.out)
            results[pid] = {
                "skipped": r["skipped"],
                "versions": r["versions"],
            }
        except Exception as e:  # per-project isolation, reference behavior
            results[pid] = {"error": str(e)}
            failed += 1

    out = {"projects": results, "failed": failed}
    if args.query and not args.project:
        ap.error("--query requires --project")
    if args.query:
        try:
            rows = query_project(
                spark, args.out, args.project, args.query, top_k=args.top_k
            ).collect()
            out["query_results"] = [
                {"id": r.id, "score": r.score, "search_type": r.search_type}
                for r in rows
            ]
        except Exception as e:
            # a failed/absent project must not break the one-JSON-line
            # contract — the per-project summary still prints, exit stays 1
            out["query_error"] = str(e)
            failed += 1
    print(json.dumps(out))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
