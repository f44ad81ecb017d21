"""Embedding UDF: iterator form, determinism across partitionings, unit
norm, and usability as the ANN corpus."""

import math

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.functions.embed import EMBED_DIM, embed_udf


def _texts(spark):
    rows = [(i, f"token{i % 7} shared words appear here {i}") for i in range(40)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))


def test_embed_shape_and_norm(spark):
    out = _texts(spark).select("id", embed_udf("text").alias("v")).collect()
    assert len(out) == 40
    for r in out:
        assert len(r.v) == EMBED_DIM
        n = math.sqrt(sum(x * x for x in r.v))
        assert abs(n - 1.0) < 1e-3 or n == 0.0


def test_embed_partition_invariant(spark):
    df = _texts(spark)
    a = {r.id: tuple(r.v) for r in df.select("id", embed_udf("text").alias("v")).collect()}
    b = {
        r.id: tuple(r.v)
        for r in df.repartition(13).select("id", embed_udf("text").alias("v")).collect()
    }
    assert a == b


def test_embed_null_safe(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [0], "text": [None]}))
    (r,) = df.select(embed_udf("text").alias("v")).collect()
    assert len(r.v) == EMBED_DIM
