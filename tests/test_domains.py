"""Per-domain caps + registered-domain extraction (operators/domains.py)."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from darkbo_spark.operators.domains import (
    cap_per_domain,
    host_of,
    registered_domain,
)


def test_registered_domain_rules(spark):
    hosts = [
        ("www.example.com", "example.com"),
        ("a.b.news.co.uk", "news.co.uk"),  # multi-part suffix → last 3
        ("shop.com.au", "shop.com.au"),  # host IS suffix+label, 3 labels
        ("example.org", "example.org"),
        ("localhost", "localhost"),  # single label → unchanged
        ("deep.sub.tree.example.com", "example.com"),
    ]
    df = spark.createDataFrame(pd.DataFrame(hosts, columns=["host", "want"]))
    rows = df.select("want", registered_domain(F.col("host")).alias("got")).collect()
    for r in rows:
        assert r.got == r.want, f"{r.got} != {r.want}"


def test_host_of_strips_port_and_case(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "url": ["HTTPS://WWW.Site.COM:8443/a/b?q=1#frag", "http://host.org/x"]
    }))
    got = [r.h for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["www.site.com", "host.org"]


def _skewed(spark, n=500, head_frac=0.6):
    head = int(n * head_frac)
    rows = [(i, "big.com" if i < head else f"site{i % 37}.org", (i * 31) % 997)
            for i in range(n)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "domain", "score"])
    )


def test_two_phase_cap_equals_single_window(spark):
    docs = _skewed(spark)
    got = cap_per_domain(docs, k=7, order_by=[F.col("score").desc()])
    w = Window.partitionBy("domain").orderBy(F.col("score").desc(), F.col("doc_id"))
    want = (
        docs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 7)
    )
    a = sorted((r.doc_id, r.domain, r.rk) for r in got.collect())
    b = sorted((r.doc_id, r.domain, r.rk) for r in want.collect())
    assert a == b


def test_cap_salt_invariance(spark):
    docs = _skewed(spark, n=300)
    base = sorted(r.doc_id for r in cap_per_domain(docs, k=4, salt=16).collect())
    for s in (1, 3, 64):
        got = sorted(r.doc_id for r in cap_per_domain(docs, k=4, salt=s).collect())
        assert got == base, f"salt={s} changed the selection"


def test_cap_small_domains_untouched(spark):
    docs = _skewed(spark, n=50, head_frac=0.0)  # every domain below k
    assert cap_per_domain(docs, k=10).count() == 50
