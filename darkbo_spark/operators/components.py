"""Connected components over an edge DataFrame — alternating
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) as iterative DataFrame joins, no
GraphX/GraphFrames dependency.

Used by the canonicalization stage (kg/canonicalize.py) to merge entity
alias clusters — the scaled-up analog of the reference's many-surface-forms
→ one-canonical-name mapping (behavior: prebuild_kb.py:84-103).

Scale notes:
* Plain min-label propagation needs O(graph diameter) rounds — fine for
  shallow alias stars, quadratic-shuffle-wasteful and `max_iter`-fragile on
  adversarial alias chains. Star contraction converges in O(log n) rounds
  regardless of diameter: each round is two groupBy shuffles over the
  (shrinking) edge set.
* Lineage is truncated every round with localCheckpoint, otherwise the
  plan re-executes all prior rounds.
* Convergence is detected EXACTLY: both rounds' edge frames are distinct
  sets, so symmetric-difference emptiness (`exceptAll` both ways) is set
  equality — no hash-collision failure mode. The check is COUNT-GATED:
  each round's count (a shuffle-free job that also materializes the lazy
  checkpoint) is compared to the previous round's memoized count first,
  and sets of different size are unequal by definition, so the exceptAll
  shuffle job runs only on the rare equal-count rounds (in practice: the
  fixpoint round itself, where it still provides the exact guarantee).
  Exhausting `max_iter` without converging RAISES — silently-unconverged
  labels would mis-merge entities downstream with no error signal.
* Component labels are the MIN node id (stable, deterministic).

large-star(u): connect every neighbor v > u to min(Γ(u) ∪ {u}).
small-star(u): over edges oriented u > v, connect u and all smaller
neighbors to min(Γ⁻(u) ∪ {u}). At the fixpoint every edge is
(node, component-min).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when CC exhausts max_iter without reaching a fixpoint."""


@contextmanager
def _constraints_off(spark):
    """Scope-disable Catalyst constraint propagation.

    Spark 4.1's localCheckpoint keeps the origin plan's constraints on the
    resulting LogicalRDD; when the pre-checkpoint plan was a projection
    over a union+distinct, those constraints can reference attributes no
    longer in any plan and PruneFilters dies with
    `NoSuchElementException: key not found: dst#N` the first time the loop
    filters over the self-union (reproduced minimally: range → union →
    distinct → concat-projection → checkpoint → flip-union → join →
    filter). Constraint propagation is a pure optimization (inferred
    filters/join conditions), so turning it off inside the CC loop only
    costs unplanned-but-correct plans; it is restored on exit. The config
    is session-scoped, so a concurrent job thread may momentarily lose the
    same optimization — never correctness."""
    key = "spark.sql.constraintPropagation.enabled"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _edge_sets_equal(a: DataFrame, b: DataFrame) -> bool:
    """Exact order-insensitive equality of two DISTINCT edge frames in one
    job: symmetric difference is empty ⇔ the sets are equal. Both inputs
    are localCheckpoint'ed by the caller, so the double scan is cheap."""
    return a.exceptAll(b).union(b.exceptAll(a)).isEmpty()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, comp) with comp = min node id reachable.

    `edges` is undirected input (each pair listed once is enough); isolated
    nodes simply don't appear (callers union them back if needed). Raises
    ConvergenceError if `max_iter` rounds don't reach the fixpoint (at
    O(log n) convergence, 25 rounds covers any graph that fits on disk).
    """
    with _constraints_off(edges.sparkSession):
        return _cc_loop(edges, src, dst, max_iter)


def _cc_loop(edges: DataFrame, src: str, dst: str, max_iter: int) -> DataFrame:
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.isEmpty():
        return e.select(F.col("src").alias("node"), F.col("dst").alias("comp"))
    prev = e
    prev_n = e.count()  # cheap map job over the eager checkpoint

    for _ in range(max_iter):
        # -- large-star: for each u, attach strictly-larger neighbors to the
        # minimum of the closed neighborhood ---------------------------------
        sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        lmin = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        e = (
            sym.join(lmin, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # -- small-star: orient u > v, attach u and smaller neighbors to the
        # minimum of the small neighborhood ----------------------------------
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        smin = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        e = (
            oriented.join(smin, "src")
            .select(
                F.explode(F.array(F.col("src"), F.col("dst"))).alias("src"),
                F.col("m").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            # LAZY checkpoint: the count right below materializes it, so
            # eager=True would only add a separate job per round; lineage
            # is truncated at the same point either way (the LogicalRDD is
            # created here, the RDD computes in the next job)
            .localCheckpoint(eager=False)
        )
        # count gate: |e| != |prev| proves e != prev without the exceptAll
        # shuffle job; only equal-count rounds (the fixpoint round) pay
        # for the exact symmetric-difference check
        n = e.count()
        if n == prev_n and _edge_sets_equal(e, prev):
            break
        prev, prev_n = e, n
    else:
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # fixpoint: every edge is (node, component-min); roots map to themselves.
    # Materialized HERE (one cheap extra job over node-count rows) so the
    # caller's downstream filters optimize over a clean LogicalRDD while
    # constraint propagation is still scope-disabled.
    children = e.select(F.col("src").alias("node"), F.col("dst").alias("comp"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("comp")).distinct()
    return children.union(roots).distinct().localCheckpoint(eager=True)
