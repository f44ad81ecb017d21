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
