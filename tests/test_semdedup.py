"""SemDeDup-style semantic dedup (operators/semdedup.py)."""

import pandas as pd
from pyspark.sql import functions as F

from darkbo_spark.operators.semdedup import (
    assign_cells,
    fixed_codebook,
    semantic_dedup,
)

DIM = 8
CB = fixed_codebook(DIM, 4, seed=7)


def _emb(spark, rows):
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [list(map(float, r[1])) for r in rows]})
    return spark.createDataFrame(df)


def _unit(i):
    v = [0.0] * DIM
    v[i % DIM] = 1.0
    return v


def test_planted_duplicates_keep_lowest_id(spark):
    base = [float(x) / 10 for x in range(1, DIM + 1)]
    near = list(base)
    near[0] += 1e-4  # cosine ≈ 1
    rows = [(5, base), (9, near), (1, base), (3, _unit(0))]
    out = {r.vec_id: r.kept for r in semantic_dedup(_emb(spark, rows), CB, 0.95).collect()}
    assert out[1] is True          # lowest id of the duplicate family
    assert out[5] is False and out[9] is False
    assert out[3] is True          # orthogonal vector untouched
    assert len(out) == 4           # nobody vanishes — kept is a FLAG


def test_cross_cell_pairs_never_compared(spark):
    """Two identical vectors forced into different cells by construction
    cannot pair — duplicates are only visible within a cell (the SemDeDup
    tradeoff; recall comes from raising k, not cross-cell scans)."""
    cells = assign_cells(_emb(spark, [(i, _unit(i)) for i in range(DIM)]), CB)
    by_cell = {}
    for r in cells.collect():
        by_cell.setdefault(r.cell, []).append(r.vec_id)
    # sanity: the 8 axis vectors do spread over >1 cell for this codebook
    assert len(by_cell) > 1


def test_assignment_deterministic_and_bounded(spark):
    rows = [(i, [((i * 31 + j * 17) % 13 - 6) / 6.0 for j in range(DIM)])
            for i in range(60)]
    a = {(r.vec_id, r.cell) for r in assign_cells(_emb(spark, rows), CB).collect()}
    b = {(r.vec_id, r.cell) for r in
         assign_cells(_emb(spark, rows).repartition(7), CB).collect()}
    assert a == b  # partitioning-invariant
    assert all(0 <= c < len(CB) for _, c in a)


def test_threshold_boundary(spark):
    rows = [(0, _unit(0)), (1, _unit(0))]
    strict = {r.vec_id: r.kept
              for r in semantic_dedup(_emb(spark, rows), CB, 1.0).collect()}
    assert strict == {0: True, 1: False}  # cosine exactly 1.0 >= 1.0
