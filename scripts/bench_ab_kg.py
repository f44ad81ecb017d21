"""Interleaved A/B of the KG pipeline across two source trees.

Round-5's driver bench recorded kg_pipeline 5.57 s (r4) -> 7.79 s (r5) and
kg_docs_per_sec 17,958 -> 12,843 on a box with documented 3x same-code
jitter. This script settles load-vs-regression the only defensible way:
run BOTH code versions in ONE session, alternating trials (A B A B ...),
fresh output dir per run, sync + settle sleep between runs, best-of-N per
side. Under equal (interleaved) load, a real regression survives; noise
does not.

    python scripts/bench_ab_kg.py --tree-a /tmp/r4tree --tree-b /root/repo \
        --pages 100000 --cores 16 --trials 3

Each run is `spark-submit --py-files <side's darkbo_spark.zip>
scripts/run_kg.py` from that side's tree, so the two versions share
nothing but the JVM binary and the box. Per-trial timeout guards the
wedged-python-worker hang observed once under load.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile


def _zip_pkg(tree: str, dest: str) -> None:
    pkg = os.path.join(tree, "darkbo_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                zf.write(p, os.path.relpath(p, tree))


def _run_once(tree: str, zip_path: str, pages: int, cores: int,
              timeout_s: int) -> dict:
    out = tempfile.mkdtemp(prefix="ab_kg_")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "8g",
        "--py-files", zip_path,
        os.path.join(tree, "scripts", "run_kg.py"),
        "--pages", str(pages),
        "--out", out,
        "--cores", str(cores),
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s, cwd=tree
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    if proc.returncode != 0:
        raise RuntimeError(f"run failed in {tree}:\n{proc.stderr[-2000:]}")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from {tree}:\n{proc.stdout[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True, help="first source tree (e.g. r4 worktree)")
    ap.add_argument("--tree-b", required=True, help="second source tree (e.g. HEAD)")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--pages", type=int, default=100000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--settle", type=int, default=20)
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()

    zips = {}
    for label, tree in ((args.label_a, args.tree_a), (args.label_b, args.tree_b)):
        zp = os.path.join(tempfile.mkdtemp(prefix=f"ab_zip_{label}_"),
                          "darkbo_spark.zip")
        _zip_pkg(tree, zp)
        zips[label] = (tree, zp)

    results: dict[str, list[dict]] = {args.label_a: [], args.label_b: []}
    order = [args.label_a, args.label_b]
    for trial in range(args.trials):
        # alternate which side goes first each trial
        for label in (order if trial % 2 == 0 else order[::-1]):
            tree, zp = zips[label]
            os.sync()
            time.sleep(args.settle)
            res = _run_once(tree, zp, args.pages, args.cores, args.timeout)
            res["_load1"] = os.getloadavg()[0]
            results[label].append(res)
            print(
                f"trial {trial} {label}: wall={res['wall_s']}s "
                f"docs/s={res['docs_per_sec']} load1={res['_load1']:.2f}",
                flush=True,
            )

    summary = {"pages": args.pages, "cores": args.cores, "trials": args.trials}
    for label in (args.label_a, args.label_b):
        walls = sorted(r["wall_s"] for r in results[label])
        # best-per-STAGE across trials: on a noisy box the per-stage floor
        # is the sharpest signal — a real regression shows up in the floor
        # of the stage the suspect commit touched, noise does not
        stage_best: dict[str, float] = {}
        for r in results[label]:
            for st, t in r.get("timings", {}).items():
                stage_best[st] = min(stage_best.get(st, float("inf")), t)
        summary[label] = {
            "walls": walls,
            "best_wall_s": walls[0],
            "median_wall_s": walls[len(walls) // 2],
            "best_docs_per_sec": round(args.pages / walls[0], 2),
            "stage_best": {k: round(v, 3) for k, v in stage_best.items()},
        }
    a, b = summary[args.label_a], summary[args.label_b]
    summary["ratio_best_b_over_a"] = round(b["best_wall_s"] / a["best_wall_s"], 3)
    summary["ratio_median_b_over_a"] = round(
        b["median_wall_s"] / a["median_wall_s"], 3
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
