"""Entity linking: fuzzy candidate generation + upsert/merge operators."""

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.kg.link import fuzzy_candidates
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
