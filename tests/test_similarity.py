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
