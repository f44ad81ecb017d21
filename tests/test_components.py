"""Connected components: crafted graphs (chain, star, clique, islands)."""

import pandas as pd

from darkbo_spark.operators.components import connected_components


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
