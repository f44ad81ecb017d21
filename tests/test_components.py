"""Connected components: crafted graphs (chain, star, clique, islands),
O(log n) round count on deep chains, and the loud non-convergence error."""

import pandas as pd
import pytest

from darkbo_spark.operators.components import ConvergenceError, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    rows = connected_components(df).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r.comp, set()).add(r.node)
    return sorted(frozenset(v) for v in comps.values())


def test_chain(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    got = _cc(spark, edges)
    assert got == [frozenset({f"n{i}" for i in range(9)})]


def test_star_and_island(spark):
    edges = [("hub", f"leaf{i}") for i in range(5)] + [("x1", "x2")]
    got = _cc(spark, edges)
    assert len(got) == 2
    assert frozenset({"x1", "x2"}) in got


def test_clique_merge_via_bridge(spark):
    a = [(f"a{i}", f"a{j}") for i in range(3) for j in range(i + 1, 3)]
    b = [(f"b{i}", f"b{j}") for i in range(3) for j in range(i + 1, 3)]
    got = _cc(spark, a + b + [("a0", "b0")])
    assert len(got) == 1 and len(got[0]) == 6


def test_component_label_is_min(spark):
    edges = [("m", "z"), ("a", "z")]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    rows = {r.node: r.comp for r in connected_components(df).collect()}
    assert set(rows.values()) == {"a"}


def test_deep_chain_converges_in_log_rounds(spark):
    """A 64-deep chain would defeat 25-round min-label propagation at larger
    depths; star contraction converges in O(log n) rounds — prove it by
    giving the loop only 8 rounds."""
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(64)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    rows = {r.node: r.comp for r in connected_components(df, max_iter=8).collect()}
    assert set(rows.values()) == {"n000"}
    assert len(rows) == 65


def test_unconverged_raises(spark):
    """Exhausting max_iter must RAISE, never return silently-wrong labels."""
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(32)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    with pytest.raises(ConvergenceError):
        connected_components(df, max_iter=1)


def test_random_graphs_match_union_find(spark):
    """Star contraction vs a plain python union-find on seeded random
    graphs (fixed seeds — no flake): labels must match exactly."""
    import random

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        n = 60
        edges = [
            (f"v{rng.randrange(n):02d}", f"v{rng.randrange(n):02d}")
            for _ in range(70)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # python union-find oracle
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
        got = {r.node: r.comp for r in connected_components(df).collect()}
        assert got == want, f"seed {seed}"


def test_cc_over_union_distinct_projection_lineage(spark):
    """Regression: Spark 4.1 constraint propagation through localCheckpoint
    (LogicalRDD keeps origin constraints) crashes PruneFilters with
    `key not found: dst#N` when the edges come from a concat-projection
    over a union+distinct — exactly the canonicalize alias-graph shape.
    connected_components scope-disables constraint propagation, so this
    must run and produce the right clusters."""
    from pyspark.sql import functions as F

    b = spark.range(20)

    def _al(expr):
        return F.concat(F.lit("alias-"), expr.cast("string")).alias("alias")

    d = b.select(F.col("id").cast("string").alias("eid"), _al(F.col("id"))).unionByName(
        b.select(F.col("id").cast("string").alias("eid"), _al(F.col("id") - F.col("id") % 4))
    )
    pairs = d.select("eid", F.lower(F.trim(F.col("alias"))).alias("alias_norm")).distinct()
    edges = pairs.select(
        F.concat(F.lit("e:"), "eid").alias("src"),
        F.concat(F.lit("a:"), "alias_norm").alias("dst"),
    )
    comps = connected_components(edges)
    e_nodes = comps.filter(F.col("node").startswith("e:"))
    got = {r.node[2:]: r.comp for r in e_nodes.collect()}
    assert len(got) == 20
    # entities {4k..4k+3} share alias-4k -> 5 clusters
    assert len(set(got.values())) == 5
    for i in range(20):
        assert got[str(i)] == got[str(i - i % 4)]

    # the conf guard restored the session default
    assert spark.conf.get("spark.sql.constraintPropagation.enabled") == "true"
