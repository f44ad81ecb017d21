"""Native (JVM) uuid5 must be bit-for-bit equal to Python uuid.uuid5 — the
reference's id derivation scheme (content-addressed uuid5 over a namespaced
key, api/models.py:26-29,84-88 behavior)."""

import uuid

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from darkbo_spark import reference_impl as ref
from darkbo_spark.functions.ids import sha256_id_col, uuid5_col


def test_uuid5_native_matches_python(spark):
    keys = [
        "simple",
        "with spaces and punct!?",
        "unicode: żółć 漢字 emoji 😀",
        "",
        "a" * 500,
        "trailing:colons::",
    ]
    pdf = pd.DataFrame({"k": keys})
    df = spark.createDataFrame(pdf)
    got = {
        r.k: r.u
        for r in df.select("k", uuid5_col("triple", "k").alias("u")).collect()
    }
    for k in keys:
        assert got[k] == ref.uuid5_id("triple", k), k


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=100))
def test_uuid5_python_is_rfc(k):
    assert ref.uuid5_id("x", k) == str(uuid.uuid5(uuid.NAMESPACE_URL, "x:" + k))


def test_sha256_id_cross_engine(spark):
    import duckdb

    keys = ["alpha", "beta gamma", "ünïcode"]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = {
        r.k: r.s
        for r in df.select("k", sha256_id_col("kind", "k").alias("s")).collect()
    }
    con = duckdb.connect()
    for k in keys:
        (want,) = con.execute(
            "select substr(sha256('kind:' || ?), 1, 32)", [k]
        ).fetchone()
        assert got[k] == want == ref.sha256_id("kind", k)


def test_null_key_part_raises(spark):
    """concat_ws silently skips NULLs → (a,NULL,b) would collide with (a,b);
    the id builder must fail loudly instead (reference uuid5_id raises on
    None, api/models.py:26-29)."""
    import pandas as pd
    import pytest
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "y"], "b": ["1", None]})
    )
    ok = df.filter(F.col("b").isNotNull()).select(uuid5_col("t", "a", "b").alias("id"))
    assert ok.count() == 1  # non-null rows fine
    bad = df.select(uuid5_col("t", "a", "b").alias("id"))
    with pytest.raises(SparkRuntimeException, match="NULL"):
        bad.collect()
