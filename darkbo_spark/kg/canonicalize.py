"""Stage C — surface-form canonicalization via connected components.

Builds an undirected alias graph and merges entities whose surface forms
overlap (transitively): nodes are entity ids ("e:{eid}") and normalized
alias strings ("a:{alias}"); an edge links every entity to each of its
aliases, so two entities sharing any alias (or chained through aliases)
land in one component. Component representative = deterministic min eid;
canonical name = the dictionary canonical of that representative.

entities output: (eid, canonical, aliases array) — eid here is the MERGED
id every triple's subj_eid/obj_eid is rewritten to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from darkbo_spark.kg.link import _norm
from darkbo_spark.operators.components import connected_components


# Python-object overhead multiplier on collected string pairs: each Row
# carries two str objects (~49-byte header each) plus tuple/list slots —
# measured ~4-6x the raw character bytes; 6 is the safe side
_PY_OVERHEAD = 6


def _driver_cc_budget_bytes(spark) -> int:
    """The driver union-find is justified ONLY while the dictionary is
    broadcast-sized — derive the byte budget from the session's own
    broadcast threshold (default 10 MB) instead of a row count: 2M rows of
    short aliases and 50k rows of fat ones are different animals."""
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    s = str(raw).strip().lower().removesuffix("b")
    mult = units.get(s[-1:], 1)
    num = s[:-1] if s[-1:] in units else s
    try:
        budget = int(float(num)) * mult
    except ValueError:
        budget = 10 << 20
    return budget if budget > 0 else 10 << 20  # -1 = broadcast disabled


def canonicalize_entities(
    entity_dict: DataFrame,
    max_iter: int = 25,
    mode: str = "auto",
    max_driver_bytes: int | None = None,
) -> DataFrame:
    """→ (eid, canon_eid): mapping from dictionary eid to merged component
    representative eid (min eid in the alias-connected cluster).

    mode:
    * "distributed" — connected components via iterative DataFrame joins
      (operators/components.py). The plan for open-vocabulary dictionaries.
    * "driver"      — union-find on the collected (eid, alias) pairs. The
      canonical dictionary is by definition broadcast-bounded (it is the
      broadcast side of the link join), so when it fits, a driver-side
      union-find is strictly better than ~6 shuffle rounds over tiny data.
    * "auto"        — driver iff the ESTIMATED COLLECTED BYTES (string
      chars × python-object overhead, measured by one tiny aggregate over
      the pairs) fit `max_driver_bytes`, defaulting to the session's
      autoBroadcastJoinThreshold — a byte bound, not a row count, so a
      fat-alias dictionary can't cliff the driver heap.

    Both paths produce the identical mapping (asserted in tests).
    """
    pairs = entity_dict.select(
        "eid", _norm(F.col("alias")).alias("alias_norm")
    ).distinct()
    if mode == "auto":
        budget = (
            max_driver_bytes
            if max_driver_bytes is not None
            else _driver_cc_budget_bytes(entity_dict.sparkSession)
        )
        stats = pairs.agg(
            F.coalesce(
                F.sum(F.length("eid") + F.length("alias_norm")), F.lit(0)
            ).alias("chars")
        ).collect()[0]
        mode = "driver" if stats.chars * _PY_OVERHEAD <= budget else "distributed"
    if mode == "driver":
        return _driver_cc(pairs)
    edges = pairs.select(
        F.concat(F.lit("e:"), "eid").alias("src"),
        F.concat(F.lit("a:"), "alias_norm").alias("dst"),
    )
    comps = connected_components(edges, max_iter=max_iter)
    e_nodes = comps.filter(F.col("node").startswith("e:")).select(
        F.expr("substring(node, 3)").alias("eid"), "comp"
    )
    # representative = min eid within each component
    rep = e_nodes.groupBy("comp").agg(F.min("eid").alias("canon_eid"))
    return e_nodes.join(rep, "comp").select("eid", "canon_eid")


def _driver_cc(pairs: DataFrame) -> DataFrame:
    """Union-find over collected (eid, alias_norm) pairs; representative =
    min eid per alias-connected cluster (same labels as the distributed
    path)."""
    rows = [(r.eid, r.alias_norm) for r in pairs.collect()]
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for eid, alias in rows:
        union("e:" + eid, "a:" + alias)
    clusters: dict[str, str] = {}
    for eid, _ in rows:
        root = find("e:" + eid)
        cur = clusters.get(root)
        if cur is None or eid < cur:
            clusters[root] = eid
    out = [(eid, clusters[find("e:" + eid)]) for eid in {e for e, _ in rows}]
    spark = pairs.sparkSession
    # pandas → Arrow createDataFrame (the list form takes the slow
    # RDD-pickle path and spins a python task for a 400-row table)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(sorted(out), columns=["eid", "canon_eid"])
    )


def build_entity_table_driver(entity_dict: DataFrame, eid_map: DataFrame) -> DataFrame:
    """Driver-side twin of build_entity_table for broadcast-bounded
    dictionaries (identical output, asserted in tests): the shuffles and
    codegen of three joins/groupBys on a 3k-row table are pure fixed cost."""
    import pandas as pd

    dict_pdf = entity_dict.select("eid", "canonical", "alias").toPandas()
    map_pdf = eid_map.toPandas()
    canon_of = dict(zip(map_pdf["eid"], map_pdf["canon_eid"]))
    canonical_name: dict[str, str] = {}
    aliases: dict[str, set] = {}
    for r in dict_pdf.itertuples():
        rep = canon_of[r.eid]
        aliases.setdefault(rep, set()).add(r.alias)
        if r.eid == rep:
            cur = canonical_name.get(rep)
            if cur is None or r.canonical < cur:
                canonical_name[rep] = r.canonical
    rows = [
        {"eid": rep, "canonical": canonical_name[rep], "aliases": sorted(al)}
        for rep, al in sorted(aliases.items())
    ]
    spark = entity_dict.sparkSession
    return spark.createDataFrame(pd.DataFrame(rows, columns=["eid", "canonical", "aliases"]))


def build_entity_table(entity_dict: DataFrame, eid_map: DataFrame) -> DataFrame:
    """→ entities(eid, canonical, aliases array<string>) post-merge."""
    merged = entity_dict.join(eid_map, "eid").select(
        F.col("canon_eid").alias("eid"), "canonical", "alias"
    )
    canon_names = (
        entity_dict.join(eid_map, "eid")
        .filter(F.col("eid") == F.col("canon_eid"))
        .select(F.col("canon_eid").alias("eid"), "canonical")
        .distinct()
        .groupBy("eid")
        .agg(F.min("canonical").alias("canonical"))
    )
    aliases = merged.groupBy("eid").agg(
        F.array_sort(F.collect_set("alias")).alias("aliases")
    )
    return canon_names.join(aliases, "eid")


def remap_triples(linked: DataFrame, eid_map: DataFrame) -> DataFrame:
    """Rewrite subj_eid/obj_eid to merged canonical ids (broadcast joins —
    the map is dictionary-sized)."""
    m_subj = F.broadcast(
        eid_map.select(F.col("eid").alias("subj_eid"), F.col("canon_eid").alias("_s"))
    )
    m_obj = F.broadcast(
        eid_map.select(F.col("eid").alias("obj_eid"), F.col("canon_eid").alias("_o"))
    )
    return (
        linked.join(m_subj, "subj_eid", "left")
        .join(m_obj, "obj_eid", "left")
        .withColumn("subj_eid", F.coalesce("_s", "subj_eid"))
        .withColumn("obj_eid", F.coalesce("_o", "obj_eid"))
        .drop("_s", "_o")
    )
