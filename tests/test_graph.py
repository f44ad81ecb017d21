"""Graph analytics (operators/graph.py): PageRank and degree centrality
as iterative DataFrame joins, checked against hand-computed values on a
known graph and structural invariants."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from darkbo_spark.operators.graph import degree_centrality, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_degree_centrality_counts(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "b")])
    got = {r.node: (r.out_deg, r.in_deg) for r in degree_centrality(e).collect()}
    # duplicate (a,b) collapses: distinct edge set
    assert got == {"a": (2, 1), "b": (1, 1), "c": (1, 2)}


def _reference_pagerank(pairs, damping, iters):
    edges = sorted(set(pairs))
    nodes = sorted({x for p in edges for x in p})
    n = len(nodes)
    outdeg = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = {u: 0.0 for u in nodes}
        for u, v in edges:
            contrib[v] += round(r[u] / outdeg[u], 12)
        r = {u: round(base + damping * round(contrib[u], 12), 12) for u in nodes}
    return r


def test_pagerank_matches_reference_power_method(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c"), ("c", "d"),
    ]
    got = {r.node: r.rank for r in pagerank(_edges(spark, pairs), iters=5).collect()}
    want = _reference_pagerank(pairs, 0.85, 5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    # sink c (highest in-degree) outranks everything
    assert got["c"] == max(got.values())


def test_pagerank_mass_invariants(spark):
    # a cycle has no dangling mass: total rank stays ~1
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    got = pagerank(_edges(spark, pairs), iters=8).collect()
    total = sum(r.rank for r in got)
    assert total == pytest.approx(1.0, abs=1e-9)
    # symmetric cycle → equal ranks
    ranks = {r.rank for r in got}
    assert len(ranks) == 1


def test_pagerank_empty_graph(spark):
    e = _edges(spark, [("a", "a")]).filter(F.col("src") != F.col("src"))
    assert pagerank(e, iters=3).count() == 0


def test_pagerank_convergence_mode(spark):
    """tol mode stops early once Σ|Δ| ≤ tol and matches the fixed-iteration
    values at the round it stops (same per-round arithmetic)."""
    pairs = [(i, (i * 7 + 1) % 40) for i in range(120)]
    loose = {r.node: r.rank for r in
             pagerank(_edges(spark, pairs), iters=50, tol=1e-6).collect()}
    tight = {r.node: r.rank for r in
             pagerank(_edges(spark, pairs), iters=50, tol=1e-13).collect()}
    # both converged well past tol=1e-6's stopping round → ranks agree to
    # the tolerance scale even though they stopped at different rounds
    assert set(loose) == set(tight)
    assert all(abs(loose[n] - tight[n]) <= 1e-5 for n in loose)


def test_pagerank_checkpoint_cadence_bit_identical(spark):
    """checkpoint_every must be a pure materialization knob: every cadence
    yields bit-identical ranks to per-round checkpointing."""
    pairs = [(i % 23, (i * 5 + 2) % 23) for i in range(80)]
    want = {r.node: r.rank for r in
            pagerank(_edges(spark, pairs), iters=7, checkpoint_every=1).collect()}
    for k in (2, 3, 10):
        got = {r.node: r.rank for r in
               pagerank(_edges(spark, pairs), iters=7, checkpoint_every=k).collect()}
        assert got == want, f"cadence {k} changed values"


# ---------------------------------------------------------------------------
# entity_cooccurrence: document-level PMI edges
# ---------------------------------------------------------------------------

import math

from darkbo_spark.operators.graph import entity_cooccurrence


def _mentions(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["url", "eid"]))


def test_entity_cooccurrence_pmi_hand_computed(spark):
    # d1{A,B} d2{A,B} d3{A,C} d4{B}; duplicate mention of A in d1 collapses
    m = _mentions(
        spark,
        [
            ("d1", "A"), ("d1", "A"), ("d1", "B"),
            ("d2", "A"), ("d2", "B"),
            ("d3", "A"), ("d3", "C"),
            ("d4", "B"),
        ],
    )
    got = {
        (r.e1, r.e2): (r.n_docs_together, r.pmi)
        for r in entity_cooccurrence(m).collect()
    }
    # N=4 docs; c_A=3, c_B=3, c_C=1
    assert got[("A", "B")] == (2, round(math.log(2 * 4.0 / (3.0 * 3.0)), 6))
    assert got[("A", "C")] == (1, round(math.log(1 * 4.0 / (3.0 * 1.0)), 6))
    assert ("B", "C") not in got  # never co-occur
    assert set(got) == {("A", "B"), ("A", "C")}


def test_entity_cooccurrence_min_pair_docs_filter(spark):
    m = _mentions(
        spark,
        [("d1", "A"), ("d1", "B"), ("d2", "A"), ("d2", "B"), ("d3", "A"), ("d3", "C")],
    )
    got = entity_cooccurrence(m, min_pair_docs=2).collect()
    assert [(r.e1, r.e2, r.n_docs_together) for r in got] == [("A", "B", 2)]
