"""Token-budget shard packing (operators/sharding.py): the distributed
prefix sum must equal a serial cumulative sum for any partitioning, and
the plan must not contain a SinglePartition window funnel."""

import io
from contextlib import redirect_stdout

import pandas as pd
from pyspark.sql import functions as F

from darkbo_spark.operators.sharding import pack_shards


def _docs(spark, n=500, parts=1):
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "n_tokens": [(i * 37) % 90 + 1 for i in range(n)],
    })
    return spark.createDataFrame(pdf).repartition(parts)


def test_pack_matches_serial_cumsum_any_partitioning(spark):
    for parts in (1, 7, 32):
        df = _docs(spark, parts=parts)
        got = {
            r.doc_id: (r.cum_tokens, r.shard_id)
            for r in pack_shards(df, budget=1000, num_range_partitions=8).collect()
        }
        cum = 0
        for i in range(500):
            w = (i * 37) % 90 + 1
            cum += w
            assert got[i] == (cum, (cum - w) // 1000), (parts, i)


def test_shards_are_contiguous_and_budget_sized(spark):
    out = pack_shards(_docs(spark, parts=5), budget=700).orderBy("doc_id").collect()
    # contiguity: shard ids are non-decreasing in the global order
    sids = [r.shard_id for r in out]
    assert sids == sorted(sids) and sids[0] == 0
    # every full shard holds >= budget tokens incl. its last (straddling) doc
    per = {}
    for r in out:
        per[r.shard_id] = per.get(r.shard_id, 0) + r.n_tokens
    for sid, tot in per.items():
        if sid != max(sids):
            assert tot >= 700 - 90  # a doc starts in the shard its first token lands in


def test_empty_input_yields_empty_output(spark):
    df = _docs(spark).filter(F.col("doc_id") < 0)  # empty, schema intact
    out = pack_shards(df, budget=1000)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "n_tokens", "cum_tokens", "shard_id"}


def test_plan_has_no_single_partition_window(spark):
    df = pack_shards(_docs(spark, parts=4), budget=1000, num_range_partitions=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()
