"""Anchor-text entity evidence (operators/anchors.py): extraction filters
(scheme, emptiness, relative links), multiplicity semantics, the
kg.link._norm parity on alias matching, and the two-level distinct-source
rollup — all on hand-built pages with known expected votes."""

import pandas as pd
from pyspark.sql import functions as F

from darkbo_spark.operators.anchors import (
    anchor_entity_evidence,
    extract_anchor_texts,
)


def _pages(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    return df.select("url", F.encode(F.col("html"), "utf-8").alias("html"))


_HTML_A = (
    '<html><body>'
    '<a href="https://target.com/x">Acme Systems</a>'
    '<a href="https://target.com/y">Acme Systems</a>'  # repeated vote kept
    '<a href="https://other.net/z">The Acme Systems Company</a>'
    '<a href="/relative">Acme Systems</a>'  # relative: dropped
    '<a href="mailto:a@b.c">Acme Systems</a>'  # wrong scheme: dropped
    '<a href="javascript:void(0)">Acme Systems</a>'  # wrong scheme: dropped
    '<a href="https://empty.example/e">   </a>'  # whitespace text: dropped
    '<a href="HTTPS://upper.com/u">Quantum Labs</a>'  # scheme case-insensitive
    '</body></html>'
)


def test_extract_anchor_texts_filters_and_multiplicity(spark):
    pages = _pages(spark, [("https://src.example/page", _HTML_A)])
    got = [
        (r.src_host, r.dst_host, r.anchor_text)
        for r in extract_anchor_texts(pages).collect()
    ]
    assert sorted(got) == sorted(
        [
            ("src.example", "target.com", "Acme Systems"),
            ("src.example", "target.com", "Acme Systems"),
            ("src.example", "other.net", "The Acme Systems Company"),
            ("src.example", "upper.com", "Quantum Labs"),
        ]
    )


def test_anchor_entity_evidence_norm_and_distinct_sources(spark):
    pages = _pages(
        spark,
        [
            ("https://s1.example/a", _HTML_A),
            # second SOURCE host voting for the same target with the
            # leading-'the ' variant (norm strips it) — and an anchor that
            # is NOT a dictionary surface form (no evidence row)
            (
                "https://s2.example/b",
                '<a href="https://target.com/z">the acme systems</a>'
                '<a href="https://target.com/w">click here</a>',
            ),
        ],
    )
    # duplicate alias_norm across eids: min eid must win
    edict = spark.createDataFrame(
        pd.DataFrame(
            {
                "alias": ["Acme Systems", "The Acme Systems", "Quantum Labs"],
                "eid": ["e9", "e1", "e2"],
            }
        )
    )
    out = {
        (r.dst_host, r.eid): (r.n_mentions, r.n_src_hosts)
        for r in anchor_entity_evidence(
            extract_anchor_texts(pages), edict
        ).collect()
    }
    # target.com ← 'acme systems' from s1 (×2) and s2 (×1): 3 mentions,
    # 2 distinct source hosts, tie-broken to e1 (min eid for the norm)
    assert out[("target.com", "e1")] == (3, 2)
    # 'The Acme Systems Company' does NOT norm to a dictionary alias
    # (norm strips only the LEADING 'the ', not the trailing ' company')
    assert ("other.net", "e1") not in out and ("other.net", "e9") not in out
    assert out[("upper.com", "e2")] == (1, 1)
    assert all(k[1] != "e9" for k in out)
