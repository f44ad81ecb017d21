"""Measure the fusion-table write shapes (kg/pipeline.py fusion_mode):
driver (coalesce(1)) vs distributed (fact_bucket-bucketed) — the cost of
dropping the dictionary-bounded assumption, and the per-entity read
benefit bucketing buys. Interleaved best-of-N on the SAME session; the 5
core stages are prebuilt per output dir so each timed run measures ONLY
the five fusion stages (the kg_facts_stages bench shape).

Usage: python scripts/bench_fusion_shape.py [pages=100000] [trials=3]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> int:
    from pyspark.sql import functions as F

    from darkbo_spark.kg.pipeline import run_pipeline
    from darkbo_spark.session import get_spark

    spark = get_spark("fusion-shape", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    bases = {m: tempfile.mkdtemp(prefix=f"fusion_{m}_") for m in ("driver", "distributed")}
    for out in bases.values():
        run_pipeline(spark, out, n_pages=PAGES, seed=42)  # core stages, untimed

    walls = {m: [] for m in bases}
    loads = []
    fusion = ("kg_facts", "kg_conflicts", "kg_entity_types",
              "kg_fact_history", "kg_entity_profiles")
    for _ in range(TRIALS):
        for mode, out in bases.items():
            for t in fusion:  # drop previous fusion output → full recompute
                shutil.rmtree(os.path.join(out, t), ignore_errors=True)
            loads.append(os.getloadavg()[0])
            t0 = time.time()
            res = run_pipeline(spark, out, n_pages=PAGES, seed=42,
                               facts_asof="2024-01-02", fusion_mode=mode)
            walls[mode].append(time.time() - t0)
            assert set(res.stages_run) == set(fusion), res.stages_run

    # read benefit: one entity's fact history from each layout
    reads = {}
    for mode, out in bases.items():
        run_pipeline(spark, out, n_pages=PAGES, seed=42,
                     facts_asof="2024-01-02", fusion_mode=mode)
        tbl_df = None
        from darkbo_spark.storage.snapshots import SnapshotTable
        tbl = SnapshotTable(out, "kg_fact_history")
        eid = tbl.read(spark).select("subj_eid").first().subj_eid
        # the documented per-entity read convention: the bucket predicate
        # (constant-folded pmod(xxhash64(eid), N)) prunes files via
        # row-group stats BEFORE the entity filter runs
        cond = F.col("subj_eid") == eid
        if mode == "distributed":
            cond = cond & (
                F.col("fact_bucket")
                == F.pmod(F.xxhash64(F.lit(eid)), F.lit(32)).cast("int")
            )
        rs = []
        for _ in range(3):
            t0 = time.time()
            tbl.read(spark).filter(cond).write.format(
                "noop").mode("overwrite").save()
            rs.append(time.time() - t0)
        reads[mode] = round(sorted(rs)[1], 3)

    row = {
        "experiment": "fusion_write_shape", "pages": PAGES, "trials": TRIALS,
        "load1_min": round(min(loads), 1), "load1_max": round(max(loads), 1),
    }
    for mode in bases:
        ws = sorted(walls[mode])
        row[mode] = {"best": round(ws[0], 3), "median": round(ws[len(ws) // 2], 3),
                     "entity_read_median": reads[mode]}
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
