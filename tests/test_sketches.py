"""Sketch operators: approximate results must sit within documented error
of their exact oracled twins (accuracy measured, not assumed)."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_hll_within_rsd(spark):
    from darkbo_spark.entry_queries import QUERIES

    exact = {
        r.event_type: r.users for r in QUERIES["user_counts_exact"](spark, SF).collect()
    }
    approx = {
        r.event_type: r.users_approx
        for r in QUERIES["user_counts_sketch"](spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        # rsd=0.02 → generous 3-sigma-ish bound
        assert abs(approx[k] - v) <= max(3, 0.06 * v), (k, v, approx[k])


def test_approx_percentile_within_tolerance(spark):
    from darkbo_spark.entry_queries import QUERIES

    exact = {
        r.event_type: (r.p50, r.p95)
        for r in QUERIES["value_percentiles"](spark, SF).collect()
    }
    approx = {
        r.event_type: (r.p50_approx, r.p95_approx)
        for r in QUERIES["value_percentiles_sketch"](spark, SF).collect()
    }
    for k, (p50, p95) in exact.items():
        a50, a95 = approx[k]
        spread = max(abs(p95), 1.0)
        assert abs(a50 - p50) <= 0.05 * spread, (k, p50, a50)
        assert abs(a95 - p95) <= 0.05 * spread, (k, p95, a95)


def test_rolling_fingerprint_order_sensitive(spark):
    """Rolling hash: equal token streams → equal; reordered/edited → differ;
    matches a python twin computing the same polynomial over Spark's own
    per-token hashes."""
    import pandas as pd
    from darkbo_spark.functions.text_analysis import (
        _ROLL_B, _ROLL_P, rolling_fingerprint,
    )

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),   # identical → same fp
        (2, "gamma beta alpha"),   # reordered → different fp
        (3, "alpha beta"),         # prefix → different fp
        (4, ""),                   # empty → 0
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r.doc_id: r.rfp
        for r in df.select("doc_id", rolling_fingerprint(F.col("text")).alias("rfp")).collect()
    }
    assert got[0] == got[1]
    assert got[0] != got[2] and got[0] != got[3]
    assert got[4] == 0
    # python twin over Spark's own token hashes (xxhash64 % P per token)
    th = {
        r.t: r.h
        for r in spark.createDataFrame(
            pd.DataFrame({"t": ["alpha", "beta", "gamma"]})
        ).select("t", (F.pmod(F.xxhash64("t"), F.lit(_ROLL_P))).alias("h")).collect()
    }
    acc = 0
    for t in ["alpha", "beta", "gamma"]:
        acc = (acc * _ROLL_B + th[t]) % _ROLL_P
    assert got[0] == acc


def test_heavy_hitters_sketch_superset_of_exact(spark, sf_dir):
    """freqItems guarantee: every user whose true frequency ≥ support must
    appear in the sketch output (false positives allowed, negatives not)."""
    import pyspark.sql.functions as F

    support = 0.005
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    exact_hh = {
        r.user_id
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= support * n)
        .collect()
    }
    sketch = {
        r.user_id
        for r in ev.stat.freqItems(["user_id"], support=support)
        .select(F.explode("user_id_freqItems").alias("user_id"))
        .collect()
    }
    assert exact_hh <= sketch
