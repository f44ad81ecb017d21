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


# ---------------------------------------------------------------------------
# learned (IVF k-means) codebook — identical semantics, balanced cells
# ---------------------------------------------------------------------------

from darkbo_spark.operators.semdedup import cell_sizes, learned_codebook


def _np_reference(rows, codebook, tau):
    """The operator's rule in plain numpy: 9dp-rounded argmax-dot
    assignment (first index wins ties), in-cell pairs, 6dp-rounded cosine
    threshold, keep-lowest-id."""
    import numpy as np

    ids = [r[0] for r in rows]
    x = np.array([r[1] for r in rows], dtype=np.float64)
    cb = np.array(codebook, dtype=np.float64)
    dots = np.round(x @ cb.T, 9)
    cells = dots.argmax(axis=1)  # numpy argmax takes the FIRST max index
    dropped = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cells[i] == cells[j]:
                c = x[i] @ x[j] / (
                    np.sqrt(x[i] @ x[i]) * np.sqrt(x[j] @ x[j])
                )
                if round(float(c), 6) >= tau:
                    dropped.add(ids[j])
    return {ids[i]: (int(cells[i]), ids[i] not in dropped) for i in range(len(ids))}


def _clustered_rows(n=60, dim=DIM, seed=3):
    """Skewed synthetic embeddings: 3 tight clusters of very different
    sizes plus planted near-dup pairs inside each."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(3, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sizes = [int(n * 0.7), int(n * 0.2), n - int(n * 0.7) - int(n * 0.2)]
    rows, vid = [], 0
    for c, sz in zip(centers, sizes):
        for _ in range(sz):
            v = c + 0.05 * rng.randn(dim)
            rows.append((vid, [float(t) for t in v]))
            vid += 1
    # planted exact near-dups (same direction, scaled)
    for src in (0, sizes[0], sizes[0] + sizes[1]):
        rows.append((vid, [2.0 * t for t in rows[src][1]]))
        vid += 1
    return rows


def test_learned_codebook_same_semantics_as_fixed(spark):
    rows = _clustered_rows()
    df = _emb(spark, rows)
    tau = 0.95
    fixed = fixed_codebook(DIM, 4, seed=7)
    learned = learned_codebook(df, DIM, 4, n_train=100, iters=6, seed=7)
    assert len(learned) == 4 and all(len(c) == DIM for c in learned)
    for cb in (fixed, learned):
        want = _np_reference(rows, cb, tau)
        got = {
            r.vec_id: (r.cell, r.kept)
            for r in semantic_dedup(df, cb, min_cosine=tau).collect()
        }
        assert got == want, "operator diverged from the rule under this codebook"
    # the planted scaled duplicates must be dropped under BOTH codebooks
    # (cosine 1.0 with their source, which always shares their cell)
    n_src = len(rows) - 3
    for cb in (fixed, learned):
        kept = {
            r.vec_id: r.kept
            for r in semantic_dedup(df, cb, min_cosine=tau).collect()
        }
        assert all(not kept[v] for v in (n_src, n_src + 1, n_src + 2))


def test_learned_codebook_balances_skewed_cells(spark):
    rows = _clustered_rows(n=90)
    df = _emb(spark, rows)
    from darkbo_spark.operators.semdedup import assign_cells

    fixed = fixed_codebook(DIM, 4, seed=7)
    learned = learned_codebook(df, DIM, 4, n_train=100, iters=8, seed=7)
    hist = lambda cb: {
        r.cell: r.n_vectors for r in cell_sizes(assign_cells(df, cb)).collect()
    }
    hf, hl = hist(fixed), hist(learned)
    assert sum(hf.values()) == sum(hl.values()) == len(rows)
    # k-means puts a centroid INSIDE each real cluster, so the largest
    # cell under the learned codebook can't exceed the fixed code's —
    # the skew knob the histogram row makes visible
    assert max(hl.values()) <= max(hf.values())


def test_cell_sizes_is_complete_and_ordered(spark):
    rows = _clustered_rows(n=30)
    df = _emb(spark, rows)
    from darkbo_spark.operators.semdedup import assign_cells

    out = cell_sizes(assign_cells(df, fixed_codebook(DIM, 4, seed=7))).collect()
    assert [r.cell for r in out] == sorted(r.cell for r in out)
    assert sum(r.n_vectors for r in out) == len(rows)
