"""End-to-end KG construction pipeline with per-stage checkpoint-resume.

    pages ─E→ docs ─S→ sentences ─T→ raw_triples ─L→ linked ─C/M→ kg_triples
                                                            └───→ kg_entities

Every stage output is a SnapshotTable version whose fingerprint is
sha256(parent_fingerprint : stage name : params : CODE_VERSION). A rerun
(or a resumed run after a kill) recomputes nothing whose fingerprint
already matches the table's current version — the scaled-out restatement of
the reference's checksum-gated rebuild (behavior:
api/index_versioning.py:68-156). Each publish also records per-partition
lineage/metrics rows into the `_metrics` table.

Stage boundaries are REAL materialization points on purpose: at 100 TB you
do not want a single 6-stage lineage — a lost executor would recompute the
world, and the UDF stages (E/S/T) should run exactly once. The narrow
stages E→S→T are fused into ONE pass (no intermediate write) because they
are per-row maps with no shuffle between them; only their fused output
(raw_triples) is persisted. L/C/M read persisted triples.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from darkbo_spark.kg.canonicalize import (
    build_entity_table,
    canonicalize_entities,
    remap_triples,
)
from darkbo_spark.kg.extract import extract_docs
from darkbo_spark.kg.link import link_entities
from darkbo_spark.kg.materialize import bucketize_triples
from darkbo_spark.kg.pages import entity_dictionary_df, synth_pages
from darkbo_spark.kg.triples import extract_raw_triples, segment_sentences
from darkbo_spark.storage.snapshots import SnapshotTable, partition_metrics

CODE_VERSION = "1"


def _fp(*parts: str) -> str:
    return hashlib.sha256(":".join(parts).encode()).hexdigest()


@dataclass
class PipelineResult:
    tables: dict = field(default_factory=dict)  # name -> SnapshotTable
    stages_run: list = field(default_factory=list)
    stages_skipped: list = field(default_factory=list)
    rows: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    out_dir: str,
    pages: DataFrame | None = None,
    n_pages: int = 1000,
    seed: int = 42,
    link_strategy: str = "broadcast",
    n_buckets: int = 32,
    input_fingerprint: str | None = None,
) -> PipelineResult:
    """Run (or resume) the full pipeline; every stage is fingerprint-gated."""
    res = PipelineResult()
    run_t0 = time.time()
    if pages is None:
        pages = synth_pages(spark, n_pages, seed=seed)
        input_fingerprint = input_fingerprint or _fp("synth_pages", str(n_pages), str(seed))
    assert input_fingerprint, "provide input_fingerprint for external pages input"

    metrics_tbl = SnapshotTable(out_dir, "_metrics")
    metrics_rows: list[dict] = []

    def stage(name: str, parent_fp: str, params: str, build) -> tuple[SnapshotTable, str]:
        fp = _fp(parent_fp, name, params, CODE_VERSION)
        tbl = SnapshotTable(out_dir, name)
        res.tables[name] = tbl
        if tbl.current_fingerprint() == fp:
            res.stages_skipped.append(name)
            return tbl, fp
        t0 = time.time()
        df, partition_by = build()
        tbl.publish(df, fp, partition_by=partition_by)
        wall = time.time() - t0
        res.stages_run.append(name)
        pm = partition_metrics(spark, tbl.data_path()).collect()
        n = 0
        for r in pm:
            n += r["rows"]
            metrics_rows.append(
                {
                    "stage": name,
                    "run_fingerprint": fp,
                    "partition_file": r["partition_file"],
                    "rows": r["rows"],
                    "wall_s": round(wall, 3),
                }
            )
        res.rows[name] = n
        return tbl, fp

    # ---- fused E→S→T (narrow maps, single pass, one persisted output) ----
    def build_triples():
        docs = extract_docs(pages)
        sents = segment_sentences(docs)
        return extract_raw_triples(sents), None

    triples_tbl, fp_t = stage("raw_triples", input_fingerprint, "en_only", build_triples)

    # docs table is also persisted (byte-identical text is a deliverable of
    # its own — golden tests and downstream consumers read it)
    def build_docs():
        return extract_docs(pages), None

    docs_tbl, fp_d = stage("docs", input_fingerprint, "clean_v1", build_docs)

    # ---- L: link --------------------------------------------------------
    entity_dict = entity_dictionary_df(spark)

    def build_linked():
        raw = triples_tbl.read(spark)
        return link_entities(raw, entity_dict, strategy=link_strategy), None

    linked_tbl, fp_l = stage("linked_triples", fp_t, f"link_{link_strategy}", build_linked)

    # ---- C: canonicalize --------------------------------------------------
    def build_entities():
        eid_map = canonicalize_entities(entity_dict)
        return build_entity_table(entity_dict, eid_map), None

    entities_tbl, fp_e = stage("kg_entities", fp_l, "cc_v1", build_entities)

    # ---- M: materialize ----------------------------------------------------
    def build_kg():
        eid_map = canonicalize_entities(entity_dict)
        remapped = remap_triples(linked_tbl.read(spark), eid_map)
        return bucketize_triples(remapped, n_buckets=n_buckets), ["subj_bucket"]

    kg_tbl, fp_k = stage("kg_triples", fp_l + fp_e, f"buckets_{n_buckets}", build_kg)

    if metrics_rows:
        mdf = spark.createDataFrame(metrics_rows)
        metrics_tbl.publish(mdf, _fp("metrics", fp_k, str(run_t0)))
    for t in res.tables.values():
        t.expire(retain_last=3)
    return res
