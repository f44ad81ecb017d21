"""Incremental KG maintenance (kg/incremental.py): delta upsert ≡ full
rebuild, including the zero-triple retirement trap."""

import pandas as pd
from pyspark.sql import functions as F

from darkbo_spark.kg.incremental import extract_and_link, upsert_triples_by_url
from darkbo_spark.kg.oracle_twin import twin_entity_dict


def _pages(spark, rows):
    df = pd.DataFrame(rows, columns=["url", "text"])
    df["warc_ts"] = pd.Timestamp("2024-01-01")
    df["lang"] = "en"
    return spark.createDataFrame(df[["url", "warc_ts", "lang", "text"]])


def _key_set(df):
    return {
        (r.url, r.sent_idx, r.subj, r.pred, r.obj, r.subj_eid, r.obj_eid)
        for r in df.collect()
    }


def test_upsert_equals_full_rebuild(spark):
    dictionary = twin_entity_dict(spark)
    true_rows = [
        ("u/0", "Acme Systems was founded in 1990. Alice Walker is the CEO of Acme Systems."),
        ("u/1", "Quantum Labs is based in Berlin."),
        ("u/2", "Maria Garcia works at Stellar Dynamics."),
    ]
    stale_rows = [
        ("u/0", "Nimbus Holdings acquired Orion Labs."),  # wrong content
        ("u/1", "Quantum Labs is based in Berlin."),
        ("u/2", "Maria Garcia works at Stellar Dynamics."),
    ]
    stale_kg = extract_and_link(_pages(spark, stale_rows), dictionary)
    delta = _pages(spark, [true_rows[0]])
    fresh = extract_and_link(delta, dictionary)
    merged = upsert_triples_by_url(stale_kg, fresh, delta.select("url"))
    rebuilt = extract_and_link(_pages(spark, true_rows), dictionary)
    assert _key_set(merged) == _key_set(rebuilt)
    # the stale wrong triples are actually gone
    assert merged.filter(F.col("subj") == "Nimbus Holdings").count() == 0


def test_zero_triple_refetch_retires_stale_rows(spark):
    """A refetched page whose new content yields NO triples must still
    retire its stale triples — the trap of deriving deleted urls from the
    fresh triple set instead of the delta pages."""
    dictionary = twin_entity_dict(spark)
    stale_kg = extract_and_link(
        _pages(spark, [("u/9", "Acme Systems was founded in 1990.")]), dictionary
    )
    assert stale_kg.count() > 0
    delta = _pages(spark, [("u/9", "nothing extractable in this refetch at all")])
    fresh = extract_and_link(delta, dictionary)
    assert fresh.count() == 0
    merged = upsert_triples_by_url(stale_kg, fresh, delta.select("url"))
    assert merged.count() == 0  # stale rows retired even with zero fresh


def test_untouched_urls_pass_through(spark):
    dictionary = twin_entity_dict(spark)
    stale_kg = extract_and_link(
        _pages(spark, [("u/0", "Quantum Labs is based in Tokyo."),
                       ("u/1", "Wei Chen works at Vertex Holdings.")]),
        dictionary,
    )
    delta = _pages(spark, [("u/1", "Wei Chen works for Nimbus Labs.")])
    merged = upsert_triples_by_url(
        stale_kg, extract_and_link(delta, dictionary), delta.select("url")
    )
    u0 = {t for t in _key_set(merged) if t[0] == "u/0"}
    assert u0 == {t for t in _key_set(stale_kg) if t[0] == "u/0"}
