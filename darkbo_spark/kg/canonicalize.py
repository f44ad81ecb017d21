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


def canonicalize_entities(entity_dict: DataFrame, max_iter: int = 25) -> DataFrame:
    """→ (eid, canon_eid): mapping from dictionary eid to merged component
    representative eid (min eid in the alias-connected cluster)."""
    pairs = entity_dict.select(
        "eid", _norm(F.col("alias")).alias("alias_norm")
    ).distinct()
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
