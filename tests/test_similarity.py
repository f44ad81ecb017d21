"""Dense similarity: brute-force vs a NumPy oracle; LSH recall measured."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.operators.similarity import brute_force_topk, lsh_topk


def _emb(spark, n=200, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(float)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [list(v) for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_brute_force_matches_numpy(spark):
    df, vecs = _emb(spark)
    q = df.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"), F.col("embedding").alias("qvec")
    )
    got = [
        (r.doc_id, r.score)
        for r in brute_force_topk(df, q, k=10).orderBy("rank").collect()
    ]
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    order = sorted(range(len(sims)), key=lambda i: (-round(sims[i], 6), i))[:10]
    assert [g[0] for g in got] == order
    for doc_id, score in got:
        assert abs(score - sims[doc_id]) < 1e-5


def test_lsh_recall_vs_brute_force(spark):
    df, vecs = _emb(spark, n=300)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk(df, queries, k=5).select("qid", "doc_id").collect()
    approx = lsh_topk(df, queries, dim=16, k=5, n_planes=4).select(
        "qid", "doc_id"
    ).collect()
    exact_set = {(r.qid, r.doc_id) for r in exact}
    approx_set = {(r.qid, r.doc_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # measured, not assumed: 4 planes → 16 buckets over 300 vecs; the query
    # itself (sim=1.0) always shares its own bucket so recall is bounded >0
    assert recall >= 0.2
    for qid in range(5):  # self-match always survives
        assert (qid, qid) in approx_set


def test_multitable_multiprobe_recall_beats_single(spark):
    """The scale-path upgrade: 4 tables + Hamming-1 query probes must
    strictly dominate single-table single-probe recall on the same data."""
    from darkbo_spark.operators.similarity import lsh_topk_multi

    df, vecs = _emb(spark, n=300)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = {(r.qid, r.doc_id) for r in brute_force_topk(df, queries, k=5).select("qid", "doc_id").collect()}
    single = {(r.qid, r.doc_id) for r in lsh_topk(df, queries, dim=16, k=5, n_planes=4).select("qid", "doc_id").collect()}
    multi = {
        (r.qid, r.doc_id)
        for r in lsh_topk_multi(
            df, queries, dim=16, k=5, n_planes=4, n_tables=4, multiprobe=True
        ).select("qid", "doc_id").collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.6  # measured floor with 4x tables + 1-bit probes
    for qid in range(5):
        assert (qid, qid) in multi  # self-match always survives


def test_multitable_pairs_scored_once(spark):
    """Candidates colliding in several tables must not duplicate rows."""
    from darkbo_spark.operators.similarity import lsh_topk_multi

    df, _ = _emb(spark, n=100)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res = lsh_topk_multi(df, queries, dim=16, k=100, n_planes=4, n_tables=4).collect()
    pairs = [(r.qid, r.doc_id) for r in res]
    assert len(pairs) == len(set(pairs))


def test_ivf_topk_recall_and_exact_at_full_probe(spark):
    from darkbo_spark.operators.similarity import ivf_topk

    df, vecs = _emb(spark, n=300)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = {
        (r.qid, r.doc_id)
        for r in brute_force_topk(df, queries, k=5).select("qid", "doc_id").collect()
    }
    # probing EVERY cell must reproduce brute force exactly (every corpus
    # vector lives in exactly one cell, and all cells get scored)
    full = {
        (r.qid, r.doc_id)
        for r in ivf_topk(df, queries, dim=16, k=5, n_cells=8, n_probe=8)
        .select("qid", "doc_id").collect()
    }
    assert full == exact
    # partial probe: measured recall floor + self-match always survives
    part = {
        (r.qid, r.doc_id)
        for r in ivf_topk(df, queries, dim=16, k=5, n_cells=8, n_probe=2)
        .select("qid", "doc_id").collect()
    }
    recall = len(exact & part) / len(exact)
    assert recall >= 0.5
    for qid in range(5):
        assert (qid, qid) in part


def test_ivf_centroids_deterministic(spark):
    from darkbo_spark.operators.similarity import train_ivf_centroids

    df, _ = _emb(spark, n=120)
    a = train_ivf_centroids(df, dim=16, n_cells=6, seed=9)
    b = train_ivf_centroids(df, dim=16, n_cells=6, seed=9)
    assert a == b


def test_ivf_stored_equals_inplan_and_prunes(spark, tmp_path):
    """The stored-index IVF path (publish partitioned by cell, literal
    probe-cell filter, serve from the store) returns EXACTLY the in-plan
    ivf_topk result at the same n_probe, and the stored scan carries a
    partition filter on cell (scan-level pruning, the 100 TB claim)."""
    import io
    from contextlib import redirect_stdout

    from darkbo_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_stored,
        train_ivf_centroids,
    )
    from darkbo_spark.storage.snapshots import SnapshotTable

    df, _ = _emb(spark, n=300)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    centroids = train_ivf_centroids(df, dim=16, n_cells=8, seed=42)
    index, _ = build_ivf_index(df, dim=16, n_cells=8, centroids=centroids)
    table = SnapshotTable(str(tmp_path), "ivf_index")
    table.publish(index, "fp-test", partition_by=["cell"])
    stored = table.read(spark)

    got_df = ivf_topk_stored(stored, queries, centroids, k=5, n_probe=2)
    got = {(r.qid, r.doc_id, r.score) for r in got_df.collect()}
    want = {
        (r.qid, r.doc_id, r.score)
        for r in ivf_topk(
            df, queries, dim=16, k=5, n_cells=8, n_probe=2, centroids=centroids
        ).collect()
    }
    assert got == want and len(got) > 0

    # the stored scan must carry the literal cell filter as a PARTITION
    # filter (cell is the partition column) — pruning happens before read
    buf = io.StringIO()
    with redirect_stdout(buf):
        got_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan
    # and it must be non-empty (the literal IN list reached the scan)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"empty partition filter: {m}"
