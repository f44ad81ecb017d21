"""Deterministic sampling (operators/sampling.py): reproducibility across
partitionings, fraction accuracy, stratum isolation, salt independence."""

import pandas as pd
from pyspark.sql import functions as F

from darkbo_spark.operators.sampling import deterministic_sample, stratified_sample


def _docs(spark, n=2000):
    langs = ["en", "de", "fr", "zz"]
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n),
        "lang": [langs[i % 4] for i in range(n)],
    }))


def test_sample_is_partitioning_invariant(spark):
    d = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(d, 0.3).collect()}
    b = {r.doc_id for r in deterministic_sample(d.repartition(17), 0.3).collect()}
    assert a == b and a  # rand()-based sampling would fail this


def test_fraction_accuracy_and_monotone_nesting(spark):
    d = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(d, 0.2).collect()}
    big = {r.doc_id for r in deterministic_sample(d, 0.5).collect()}
    assert small < big  # threshold sampling nests: 20% ⊂ 50%
    assert abs(len(small) / 2000 - 0.2) < 0.05
    assert abs(len(big) / 2000 - 0.5) < 0.05


def test_salt_redraws_independently(spark):
    d = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(d, 0.5, salt="s1").collect()}
    b = {r.doc_id for r in deterministic_sample(d, 0.5, salt="s2").collect()}
    assert a != b
    overlap = len(a & b) / len(a)
    assert 0.3 < overlap < 0.7  # ~independent draws


def test_threshold_rounds_instead_of_truncating():
    from darkbo_spark.operators.sampling import _threshold

    # 0.29 is not exactly representable: int() would truncate to 289999,
    # one millionth under the documented keep(row) formula
    assert _threshold(0.29) == 290000
    assert _threshold(0.1) == 100000
    assert _threshold(0.0) == 0
    assert _threshold(1.0) == 1_000_000


def test_stratified_fractions_per_stratum(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, "lang", {"en": 0.8, "de": 0.1}, default_fraction=0.0
    )
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in per and "zz" not in per  # default 0 drops them
    assert abs(per["en"] / 500 - 0.8) < 0.1
    assert abs(per.get("de", 0) / 500 - 0.1) < 0.07
