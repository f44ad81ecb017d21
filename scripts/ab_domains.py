"""Interleaved same-session A/B for the domains family (r6 verdict ask #1):
is the r5→r6 `domain_stats_x`/`domain_caps_x` slowdown the PSL expression
growth (16 literals → ~430 compiled rules) or box load?

Method (same discipline as the r6 kg_pipeline discharge): ONE Spark
session, full bench-style warm-up, then A/B trials strictly interleaved
(A,B,A,B,…) so any load drift hits both variants equally; per-trial
load1 readings; best-of-N is the contention-free floor, median the
typical. Variant A = a 16-entry PSL file (the r5 seam size), variant B =
the vendored ~430-rule subset; both go through the IDENTICAL code path
(operators/domains.load_rules via DARKBO_PSL_FILE), so the ONLY delta is
the compiled expression size. `host_components_x` (untouched code, 2.95×
in the r6 artifact) runs the same interleaved protocol against itself
(A = B = HEAD) — its two "variants" measure pure run-to-run noise.

Usage: python scripts/ab_domains.py [trials=8]
Prints one JSON line per experiment plus a markdown table for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8

# the r5 seam: 16 classic multi-part suffixes (rule COUNT is what the
# expression cost depends on, not which ccTLDs are in it)
PSL_16 = """co.uk
org.uk
ac.uk
gov.uk
com.au
net.au
org.au
co.jp
or.jp
ne.jp
com.br
net.br
co.in
co.nz
com.mx
com.cn
"""


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from darkbo_spark.session import get_spark

    p16 = os.path.join(tempfile.mkdtemp(prefix="psl_ab_"), "psl16.dat")
    with open(p16, "w") as f:
        f.write(PSL_16)
    subset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "darkbo_spark", "data", "public_suffix_subset.dat",
    )

    threads = 16
    spark = get_spark("ab-domains", master=f"local[{threads}]",
                      shuffle_partitions=2 * threads)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    def run_once(qname: str, psl_path: str | None) -> tuple[float, float]:
        """(wall_s, load1) for one fresh composition + noop materialize."""
        if psl_path is not None:
            os.environ["DARKBO_PSL_FILE"] = psl_path
        load1 = os.getloadavg()[0]
        t0 = time.time()
        qs[qname](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0, load1

    results = []
    md = ["| experiment | variant | best | median | loads (min–max) |",
          "|---|---|---|---|---|"]

    for qname in ("domain_stats_x", "domain_caps_x"):
        # untimed warm-up of BOTH variants (codegen for both expression sizes)
        run_once(qname, p16)
        run_once(qname, subset)
        walls = {"psl16": [], "subset": []}
        loads = {"psl16": [], "subset": []}
        for _ in range(TRIALS):
            for tag, path in (("psl16", p16), ("subset", subset)):
                w, l1 = run_once(qname, path)
                walls[tag].append(w)
                loads[tag].append(l1)
        row = {"experiment": qname, "trials": TRIALS}
        for tag in ("psl16", "subset"):
            ws = sorted(walls[tag])
            row[tag] = {
                "best": round(ws[0], 3),
                "median": round(ws[len(ws) // 2], 3),
                "load1_min": round(min(loads[tag]), 1),
                "load1_max": round(max(loads[tag]), 1),
            }
            md.append(
                f"| {qname} | {tag} | {row[tag]['best']} | {row[tag]['median']} "
                f"| {row[tag]['load1_min']}–{row[tag]['load1_max']} |"
            )
        row["best_ratio_subset_over_16"] = round(
            row["subset"]["best"] / row["psl16"]["best"], 3
        )
        results.append(row)
        print(json.dumps(row))

    os.environ.pop("DARKBO_PSL_FILE", None)
    # host_components_x: same protocol, no variant — 2N interleaved-slot
    # trials measuring pure noise on untouched code
    qname = "host_components_x"
    run_once(qname, None)
    walls, loads = [], []
    for _ in range(2 * TRIALS):
        w, l1 = run_once(qname, None)
        walls.append(w)
        loads.append(l1)
    ws = sorted(walls)
    row = {
        "experiment": qname,
        "trials": 2 * TRIALS,
        "best": round(ws[0], 3),
        "median": round(ws[len(ws) // 2], 3),
        "max": round(ws[-1], 3),
        "load1_min": round(min(loads), 1),
        "load1_max": round(max(loads), 1),
    }
    md.append(
        f"| {qname} | head | {row['best']} | {row['median']} "
        f"| {row['load1_min']}–{row['load1_max']} |"
    )
    results.append(row)
    print(json.dumps(row))
    print("\n".join(md))
    return 0




def impl_ab(trials: int = 6) -> None:
    """Second experiment: expr (inline literals) vs join (broadcast
    probes) for the SAME rollup, at the vendored ~430-rule subset and at
    a synthetic ~9k-rule file (the upstream PSL's size — fake exact
    rules; expression cost depends on rule COUNT and depth mix, not on
    which ccTLDs they are). Interleaved best-of-N, per-trial load1."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import functions as F

    from darkbo_spark.operators.domains import (
        host_of,
        load_rules,
        registered_domain,
        with_registered_domain,
    )
    from darkbo_spark.queries.domain_queries import _DOC_URL_SQL
    from darkbo_spark.session import get_spark

    spark = get_spark("ab-domains-impl", master="local[16]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    subset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "darkbo_spark", "data", "public_suffix_subset.dat",
    )
    big = os.path.join(tempfile.mkdtemp(prefix="psl9k_"), "psl9k.dat")
    with open(big, "w") as f:
        f.write(open(subset).read())
        for i in range(6000):
            f.write(f"fake{i}.zz{i % 40}\n")
        for i in range(2600):
            f.write(f"deep{i}.fake{i % 97}.zz{i % 40}\n")

    def run(impl: str, rules) -> tuple[float, float]:
        host = host_of(F.expr(_DOC_URL_SQL))
        if impl == "expr":
            out = docs.withColumn("domain", registered_domain(host, rules))
        else:
            out = with_registered_domain(docs, host, "domain", rules=rules,
                                         impl="join")
        load1 = os.getloadavg()[0]
        t0 = time.time()
        (out.groupBy("domain")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"))
            .write.format("noop").mode("overwrite").save())
        return time.time() - t0, load1

    md = ["| rule set | impl | best | median | loads (min–max) |",
          "|---|---|---|---|---|"]
    for tag, path in (("subset430", subset), ("psl9k", big)):
        rules = load_rules(path)
        run("expr", rules)
        run("join", rules)  # warm both codegen paths, untimed
        walls = {"expr": [], "join": []}
        loads = {"expr": [], "join": []}
        for _ in range(trials):
            for impl in ("expr", "join"):
                w, l1 = run(impl, rules)
                walls[impl].append(w)
                loads[impl].append(l1)
        row = {"experiment": f"impl_ab_{tag}", "trials": trials}
        for impl in ("expr", "join"):
            ws = sorted(walls[impl])
            row[impl] = {
                "best": round(ws[0], 3),
                "median": round(ws[len(ws) // 2], 3),
                "load1_min": round(min(loads[impl]), 1),
                "load1_max": round(max(loads[impl]), 1),
            }
            md.append(
                f"| {tag} | {impl} | {row[impl]['best']} | {row[impl]['median']} "
                f"| {row[impl]['load1_min']}–{row[impl]['load1_max']} |"
            )
        row["best_ratio_expr_over_join"] = round(
            row["expr"]["best"] / row["join"]["best"], 3
        )
        print(json.dumps(row))
    print("\n".join(md))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "impl":
        impl_ab(int(sys.argv[2]) if len(sys.argv) > 2 else 6)
        raise SystemExit(0)
    raise SystemExit(main())
