"""Hyperlink graph extraction (operators/linkgraph.py)."""

import pandas as pd

from darkbo_spark.operators.linkgraph import extract_links, host_edges


def _pages(spark, rows):
    df = pd.DataFrame(rows, columns=["url", "html_s"])
    df["html"] = df["html_s"].map(lambda s: s.encode("utf-8"))
    sdf = spark.createDataFrame(df[["url", "html"]])
    return sdf


def test_extract_links_filters_and_multiplicity(spark):
    pages = _pages(spark, [
        (
            "https://www.a.com/x",
            '<a href="https://b.org/1">1</a>'
            '<a href="http://b.org/2">2</a>'       # same host twice
            '<a href="/relative">r</a>'
            '<a href="mailto:z@q.com">m</a>'
            '<a href="javascript:void(0)">j</a>',
        ),
    ])
    links = extract_links(pages).collect()
    assert [(r.src_host, r.dst_host) for r in links] == [
        ("www.a.com", "b.org"), ("www.a.com", "b.org")
    ]


def test_host_edges_weights_and_self_drop(spark):
    pages = _pages(spark, [
        ("https://a.com/1", '<a href="https://b.com/x">x</a><a href="https://a.com/y">self</a>'),
        ("https://a.com/2", '<a href="https://b.com/z">z</a>'),
    ])
    edges = {(r.src_host, r.dst_host): r.n_links
             for r in host_edges(extract_links(pages)).collect()}
    assert edges == {("a.com", "b.com"): 2}
    kept = host_edges(extract_links(pages), drop_self=False).count()
    assert kept == 2  # self edge kept on request


def test_host_extraction_normalizes(spark):
    pages = _pages(spark, [
        ("HTTPS://WWW.UP.COM:8443/p", '<a href="HTTP://Mixed.Case.ORG:80/q">q</a>'),
    ])
    r = extract_links(pages).collect()[0]
    assert (r.src_host, r.dst_host) == ("www.up.com", "mixed.case.org")
