"""Entity linking: fuzzy candidate generation + upsert/merge operators."""

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.kg.link import (
    apply_fuzzy_fallback,
    embed_candidates,
    fuzzy_candidates,
    link_entities,
)
from darkbo_spark.kg.pages import entity_dictionary_df
from darkbo_spark.operators.merge import split_created_updated, upsert
from darkbo_spark.reference_impl import uuid5_id


def test_fuzzy_candidates_pick_best_overlap(spark):
    d = entity_dictionary_df(spark)
    surfaces = spark.createDataFrame(
        pd.DataFrame({"surface": ["acme systems incorporated", "the stellar labs"]})
    )
    got = {r.s_norm: r.eid for r in fuzzy_candidates(surfaces, d, min_jaccard=0.3).collect()}
    assert got["acme systems incorporated"] == uuid5_id("entity", "Acme Systems")
    assert got["stellar labs"] == uuid5_id("entity", "Stellar Labs")


def test_fuzzy_threshold_filters(spark):
    d = entity_dictionary_df(spark)
    surfaces = spark.createDataFrame(pd.DataFrame({"surface": ["utterly unrelated words"]}))
    assert fuzzy_candidates(surfaces, d, min_jaccard=0.5).count() == 0


def test_embed_candidates_exact_and_threshold(spark):
    d = entity_dictionary_df(spark)
    # exact normalized duplicates embed to the IDENTICAL vector → cosine 1.0
    surfaces = spark.createDataFrame(
        pd.DataFrame({"surface": ["The Acme Systems", "utterly unrelated words"]})
    )
    got = {r.s_norm: (r.eid, r.cosine) for r in embed_candidates(surfaces, d).collect()}
    assert "acme systems" in got
    eid, cos = got["acme systems"]
    assert eid == uuid5_id("entity", "Acme Systems")
    assert cos == 1.0
    # the unrelated surface must not clear a high threshold
    assert "utterly unrelated words" not in {
        r.s_norm
        for r in embed_candidates(surfaces, d, min_cosine=0.95).collect()
    }


def _linked_fixture(spark):
    """Triples whose subj misses the exact alias join but is fuzzily
    linkable, next to one exactly-linkable row."""
    triples = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u2"],
                "sent_idx": [0, 0],
                "subj": ["Acme Systems", "Acme Systems Incorporated"],
                "pred": ["founded_in", "founded_in"],
                "obj": ["1999", "1999"],
                "triple_id": ["t1", "t2"],
            }
        )
    )
    d = entity_dictionary_df(spark).select("alias", "eid")
    return link_entities(triples, d), d


def test_fallback_improves_link_rate_and_generators_agree(spark):
    linked, d = _linked_fixture(spark)
    base_null = linked.filter(F.col("subj_eid").isNull()).count()
    assert base_null == 1  # the 'Incorporated' surface misses the exact join

    jac = apply_fuzzy_fallback(linked, d, method="jaccard", min_jaccard=0.5)
    emb = apply_fuzzy_fallback(linked, d, method="embed", min_cosine=0.7)
    jac_null = jac.filter(F.col("subj_eid").isNull()).count()
    emb_null = emb.filter(F.col("subj_eid").isNull()).count()
    assert jac_null < base_null and emb_null < base_null

    # where BOTH generators produce a link for the same surface, the linked
    # eid must be identical — the drop-in-alternates contract
    j = {r.triple_id: r.subj_eid for r in jac.collect() if r.subj_eid}
    e = {r.triple_id: r.subj_eid for r in emb.collect() if r.subj_eid}
    for tid in set(j) & set(e):
        assert j[tid] == e[tid]
    # already-exact rows are untouched by either fallback
    exact = {r.triple_id: r.subj_eid for r in linked.collect() if r.subj_eid}
    for tid, eid in exact.items():
        assert j[tid] == eid and e[tid] == eid


def test_upsert_semantics(spark):
    target = spark.createDataFrame(
        pd.DataFrame([(1, "a"), (2, "b")], columns=["id", "v"])
    )
    updates = spark.createDataFrame(
        pd.DataFrame([(2, "B"), (3, "c")], columns=["id", "v"])
    )
    got = {r.id: r.v for r in upsert(target, updates, "id").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    ops = {
        (r.id, r.op) for r in split_created_updated(target, updates, "id").collect()
    }
    assert ops == {(2, "updated"), (3, "created")}


def test_dictionary_growth_roundtrip_lifts_link_rate(spark):
    """r6 ask #8: mine NIL candidates from a link pass against a HOLEY
    dictionary, augment the dictionary, relink the SAME corpus — every
    previously-unlinked recurring surface links, and the link rate
    strictly rises. The metrics rows are the before/after evidence a
    growth pass publishes."""
    from darkbo_spark.kg.incremental import extract_and_link
    from darkbo_spark.kg.link import _norm, augment_dictionary, link_rate
    from darkbo_spark.kg.pages import entity_dictionary_df, synth_pages
    from darkbo_spark.kg.temporal import nil_candidates
    from pyspark.sql import functions as F

    pages = synth_pages(spark, 150, seed=11)
    full = entity_dictionary_df(spark)
    # withhold every alias whose normalized form starts with 'a'-'c' —
    # those entities become genuine dictionary misses
    holey = full.filter(~_norm(F.col("alias")).rlike("^[a-c]"))
    assert holey.count() < full.count()

    linked1 = extract_and_link(pages, holey)
    before = link_rate(linked1).collect()[0]
    nil = nil_candidates(linked1, min_mentions=2)
    assert nil.count() > 0  # the holes recur in the corpus

    grown = augment_dictionary(holey, nil)
    linked2 = extract_and_link(pages, grown)
    after = link_rate(linked2).collect()[0]

    # metrics: same mention universe, strictly more linked
    assert after.n_mentions == before.n_mentions
    assert after.n_linked > before.n_linked
    assert after.link_rate > before.link_rate

    # every mined surface's mentions are linked after the round trip,
    # and they link to the namespaced grown entity
    mined = {r.surface_norm for r in nil.collect()}
    still = (
        linked2.filter(F.col("subj_eid").isNull())
        .select(_norm(F.col("subj")).alias("sn"))
        .distinct()
    )
    assert not ({r.sn for r in still.collect()} & mined)
    grown_links = (
        linked2.filter(F.col("subj_eid").startswith("nil:"))
        .select(_norm(F.col("subj")).alias("sn"))
        .distinct()
    )
    assert {r.sn for r in grown_links.collect()} <= mined
    assert grown_links.count() > 0
