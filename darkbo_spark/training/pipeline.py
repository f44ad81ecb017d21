"""Resumable staged runner for the training-data pipeline — the KG
spine's checkpoint-resume discipline (kg/pipeline.py) applied to the
corpus-shaping flow: gate → exact dedup → per-domain cap → deterministic
sample → token-budget shard pack.

Each stage publishes a versioned table (storage factory — Iceberg-ready)
whose fingerprint chains (parent_fp, stage, params, CODE_VERSION), so a
rerun recomputes ONLY stages whose input, parameters, or code changed; a
kill between stages resumes downstream-only; per-stage metrics rows
(stage, fingerprint, rows, wall) are published alongside. Stage inputs
are read BACK from the published tables — each stage's cost is paid once
per fingerprint, which is what makes a multi-day 100 TB pipeline
restartable instead of all-or-nothing.

The stage SEMANTICS are the same operators the one-job composed twin
uses (queries/pipeline_queries.training_pipeline, driver-hash-proven vs
DuckDB); equality of staged vs one-job output is pinned in
tests/test_training_pipeline.py.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.functions import text_analysis as ta
from darkbo_spark.storage import BuildLock, make_table

CODE_VERSION = "tp1"


def _fp(*parts: str) -> str:
    return hashlib.md5("|".join(parts).encode()).hexdigest()


@dataclass
class TrainingRunResult:
    tables: dict = field(default_factory=dict)
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    rows: dict = field(default_factory=dict)
    timings: dict = field(default_factory=dict)


def run_training_pipeline(
    spark: SparkSession,
    out_dir: str,
    docs: DataFrame,
    input_fingerprint: str,
    domain_col,
    domain_desc: str,
    quality_min: float = 0.7,
    cap_k: int = 5,
    sample_fraction: float = 0.8,
    sample_salt: str = "pipe1",
    shard_budget: int = 2000,
) -> TrainingRunResult:
    """docs must carry (doc_id, text, lang, n_chars); `domain_col` is a
    Column over those columns yielding the registered domain (a URL
    column in production — the caller owns where domains come from, the
    runner owns the staged flow) and `domain_desc` is its stable string
    form for the stage fingerprint."""
    from darkbo_spark.operators.dedup import exact_dedup
    from darkbo_spark.operators.domains import cap_per_domain
    from darkbo_spark.operators.sampling import deterministic_sample
    from darkbo_spark.operators.sharding import pack_shards

    import os

    os.makedirs(out_dir, exist_ok=True)
    res = TrainingRunResult()
    lock = BuildLock(out_dir, "training_pipeline")
    owner = f"tp-{time.time()}"
    for _ in range(240):
        if lock.acquire(owner):
            break
        time.sleep(0.5)
    else:
        raise RuntimeError(f"training pipeline locked by {lock.owner()}")
    try:
        metrics_tbl = make_table(out_dir, "_metrics")
        metrics_rows: list[dict] = []

        def stage(name: str, parent_fp: str, params: str, build):
            fp = _fp(parent_fp, name, params, CODE_VERSION)
            tbl = make_table(out_dir, name)
            res.tables[name] = tbl
            if tbl.current_fingerprint() == fp:
                res.stages_skipped.append(name)
                return tbl, fp
            lock.heartbeat(owner)
            t0 = time.time()
            tbl.publish(build(), fp)
            wall = round(time.time() - t0, 3)
            n = tbl.read(spark).count()
            res.stages_run.append(name)
            res.timings[name] = wall
            res.rows[name] = n
            metrics_rows.append(
                {"stage": name, "run_fingerprint": fp, "rows": n, "wall_s": wall}
            )
            return tbl, fp

        gate_params = f"q{quality_min}"
        gated_tbl, fp1 = stage(
            "gated", input_fingerprint, gate_params,
            lambda: docs.filter(
                (ta.lang_id_heuristic(F.col("text")) == "en_like")
                & (ta.quality_score(F.col("text")) >= quality_min)
            ).select("doc_id", "text", "lang", "n_chars"),
        )
        dd_tbl, fp2 = stage(
            "deduped", fp1, "md5-first",
            lambda: exact_dedup(gated_tbl.read(spark), "text", "doc_id")
            .select("doc_id", "text", "lang", "n_chars"),
        )
        cap_tbl, fp3 = stage(
            "capped", fp2, f"k{cap_k}|{domain_desc}",
            lambda: cap_per_domain(
                dd_tbl.read(spark).withColumn("domain", domain_col),
                k=cap_k,
                order_by=[F.col("n_chars").desc()],
            ).select("doc_id", "domain", "text", "n_chars"),
        )
        samp_tbl, fp4 = stage(
            "sampled", fp3, f"f{sample_fraction}:{sample_salt}",
            lambda: deterministic_sample(
                cap_tbl.read(spark), sample_fraction, salt=sample_salt
            ),
        )
        packed_tbl, fp5 = stage(
            "packed", fp4, f"b{shard_budget}",
            lambda: pack_shards(
                samp_tbl.read(spark).select(
                    "doc_id", "domain",
                    ta.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
                ),
                budget=shard_budget,
            ),
        )
        if metrics_rows:
            import pandas as pd

            metrics_tbl.publish(
                spark.createDataFrame(pd.DataFrame(metrics_rows)), _fp(fp5, "metrics")
            )
        return res
    finally:
        lock.release(owner)
