"""Connected components over an edge DataFrame — iterative min-label
propagation with per-iteration checkpointing (GraphFrames-style, no GraphX
dependency).

Used by the canonicalization stage (kg/canonicalize.py) to merge entity
alias clusters — the scaled-up analog of the reference's many-surface-forms
→ one-canonical-name mapping (behavior: prebuild_kb.py:84-103).

Scale notes:
* Each iteration is one shuffle join + one groupBy; lineage is truncated
  every iteration with localCheckpoint, otherwise the plan grows
  unboundedly and re-executes prior iterations.
* Min-propagation converges in O(graph diameter) iterations. Alias graphs
  are shallow (stars around a canonical node, short chains), so diameter is
  small; for adversarial deep graphs the alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond") bounds iterations at O(log n) — `max_iter` guards the loop
  either way and convergence is detected by an exact changed-count.
* Component labels are the MIN node id (stable, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    `edges` is undirected input (each pair listed once is enough); isolated
    nodes simply don't appear (callers union them back if needed).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    comp = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min component among neighbors of each node
        nbr_min = (
            sym.join(comp.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("src", "node")
        )
        new_comp = (
            comp.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_comp.withColumnRenamed("comp", "new_comp")
            .join(comp, "node")
            .filter(F.col("new_comp") != F.col("comp"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    return comp
