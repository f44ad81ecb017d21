"""Hybrid merge: dense-first precedence at equal ids (order-sensitive dedup
— the reference's hybrid semantics, NOT dropDuplicates), top-k determinism.
"""

import pandas as pd

from darkbo_spark.operators.hybrid import hybrid_merge


def _ch(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "score"]))


def test_dense_beats_sparse_at_equal_id(spark):
    dense = _ch(spark, [(1, 0.5), (2, 0.9)])
    sparse = _ch(spark, [(1, 99.0), (3, 1.0)])  # higher score but lower priority
    basic = _ch(spark, [(3, 50.0), (4, 0.1)])
    out = {
        r.id: (r.score, r.search_type)
        for r in hybrid_merge(
            {"dense": dense, "sparse": sparse, "basic": basic}, top_k=10
        ).collect()
    }
    assert out[1] == (0.5, "dense")  # dense wins despite lower score
    assert out[2] == (0.9, "dense")
    assert out[3] == (1.0, "sparse")  # sparse beats basic
    assert out[4] == (0.1, "basic")


def test_topk_and_tiebreak(spark):
    dense = _ch(spark, [(i, 1.0) for i in range(10)])
    out = [r.id for r in hybrid_merge({"dense": dense}, top_k=3).collect()]
    assert out == [0, 1, 2]  # equal scores → id asc
