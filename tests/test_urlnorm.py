"""URL canonicalization rules, pinned case by case (the driver hash covers
the bulk corpus; these make individual rule regressions readable)."""

import pytest
from pyspark.sql import functions as F

from darkbo_spark.functions.urlnorm import canonical_url

CASES = [
    # lowercase scheme + host, path case preserved
    ("HTTP://WWW.Ex.COM/Path", "http://www.ex.com/Path"),
    # fragment stripped
    ("http://ex.com/a#frag", "http://ex.com/a"),
    # default ports dropped, per scheme
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("https://ex.com:443/a", "https://ex.com/a"),
    # non-default ports kept; https:80 is NOT a default
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    ("https://ex.com:80/a", "https://ex.com:80/a"),
    # one trailing slash stripped; root path untouched; no path untouched
    ("http://ex.com/a/b/", "http://ex.com/a/b"),
    ("http://ex.com/", "http://ex.com/"),
    ("http://ex.com", "http://ex.com"),
    # query params sorted; empty query dropped
    ("http://ex.com/a?b=2&a=1", "http://ex.com/a?a=1&b=2"),
    ("http://ex.com/a?z=9", "http://ex.com/a?z=9"),
    ("http://ex.com/a?", "http://ex.com/a"),
    # everything at once
    (
        "HtTpS://Ex.COM:443/Dir/?b=2&a=1#Sec",
        "https://ex.com/Dir?a=1&b=2",
    ),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url_rules(spark, raw, want):
    got = (
        spark.range(1)
        .select(canonical_url(F.lit(raw)).alias("c"))
        .collect()[0]
        .c
    )
    assert got == want, raw
