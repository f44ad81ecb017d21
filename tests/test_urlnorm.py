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


def test_repetition_signals_on_crafted_text(spark):
    from darkbo_spark.functions.text_analysis import (
        dup_token_fraction,
        top_bigram_fraction,
    )

    rows = (
        spark.createDataFrame(
            [("a b a b a b",), ("all distinct words here now",), ("", ), ("one",)],
            ["text"],
        )
        .select(
            dup_token_fraction(F.col("text")).alias("d"),
            top_bigram_fraction(F.col("text")).alias("t"),
        )
        .collect()
    )
    # "a b a b a b": 6 tokens, 2 distinct -> dup 2/3; bigrams: 'a b'x3,'b a'x2 of 5
    assert rows[0].d == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert rows[0].t == pytest.approx(3 / 5, abs=1e-6)
    assert rows[1].d == 0.0
    assert rows[2].d == 0.0 and rows[2].t == 0.0
    assert rows[3].t == 0.0  # single token: no bigrams


def test_redact_pii_spellings(spark):
    from darkbo_spark.functions.text_analysis import redact_pii

    raw = "mail a.b+c@x.co.uk or (555)-123-4567 or 555.123.4567 or 555 123 4567"
    got = spark.range(1).select(redact_pii(F.lit(raw)).alias("r")).collect()[0].r
    assert got == "mail [EMAIL] or [PHONE] or [PHONE] or [PHONE]"


def test_unigram_logprob_known_values(spark):
    import math

    from darkbo_spark.functions.text_analysis import (
        UNIGRAM_LOGS,
        UNIGRAM_OOV,
        UNIGRAM_VOCAB,
        unigram_logprob,
    )

    lut = dict(zip(UNIGRAM_VOCAB, UNIGRAM_LOGS))
    rows = (
        spark.createDataFrame([("the table",), ("zzqq unknown",), ("",)], ["text"])
        .select(unigram_logprob(F.col("text")).alias("lp"))
        .collect()
    )
    assert rows[0].lp == round((lut["the"] + lut["table"]) / 2, 6)
    # fully-OOV text scores exactly the OOV floor
    assert rows[1].lp == round(UNIGRAM_OOV, 6)
    assert rows[2].lp == 0.0
    # in-vocab text must beat OOV text (the filter's discriminating power)
    assert rows[0].lp > rows[1].lp
    assert math.isfinite(rows[0].lp)


def test_canonical_url_idempotent_property(spark):
    """Property: canonicalization is idempotent — canon(canon(u)) ==
    canon(u) for generated messy URLs (scheme case × port × trailing
    slash × param order × fragment). One Spark job over the whole grid."""
    import itertools

    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.functions.urlnorm import canonical_url

    urls = [
        f"{scheme}://WWW.Example{i}.COM{port}{path}{q}{frag}"
        for i, (scheme, port, path, q, frag) in enumerate(
            itertools.product(
                ["http", "HTTPS", "HtTp"],
                ["", ":80", ":443", ":8080"],
                ["", "/A/b", "/A/b/"],
                ["", "?z=1&a=2"],
                ["", "#Sec"],
            )
        )
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = df.select(
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    assert len(out) == len(urls)
    for r in out:
        assert r.c1 == r.c2, r


def test_surt_key_rules(spark):
    """SURT = canonical url with reversed comma-joined host labels:
    lowercasing, fragment drop, default-port drop, trailing-slash strip,
    and query sort all apply BEFORE the reorder; explicit non-default
    ports survive after the host labels."""
    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.functions.urlnorm import surt_key

    cases = {
        "https://www.Example.com:443/a/b/?y=2&x=1#frag": "com,example,www)/a/b?x=1&y=2",
        "http://Example.com:80/": "com,example)/",
        "https://sub.site.org:8443/p": "org,site,sub:8443)/p",
        "http://host.com/path": "com,host)/path",
    }
    df = spark.createDataFrame(pd.DataFrame({"url": list(cases)}))
    got = {r.url: r.k for r in df.select("url", surt_key(F.col("url")).alias("k")).collect()}
    assert got == cases


def test_surt_prefix_filter_never_matches_sibling_domains(spark):
    """'example.com' must match apex, subdomains, and explicit-port hosts
    of example.com — and never 'exampleco.com' or 'example.com.evil.net'
    (reversed ordering puts the TLD first, so a spoofing suffix can't
    collide either)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.functions.urlnorm import surt_key, surt_prefix_filter

    urls = {
        "https://example.com/a": True,
        "https://www.example.com/a": True,
        "https://deep.www.example.com/a": True,
        "https://example.com:8080/a": True,
        "https://exampleco.com/a": False,
        "https://example.com.evil.net/a": False,
        "https://notexample.com/a": False,
    }
    df = spark.createDataFrame(pd.DataFrame({"url": list(urls)}))
    got = {
        r.url: r.m
        for r in df.select(
            "url",
            surt_prefix_filter(
                surt_key(F.col("url")), "example.com"
            ).alias("m"),
        ).collect()
    }
    assert got == urls


def test_surt_sql_twin_parity(spark):
    """The DuckDB twin produces byte-identical SURT keys and prefix
    verdicts over a url grid (the same parity contract canonical_url
    holds)."""
    import itertools

    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.functions.urlnorm import (
        sql_surt_key,
        sql_surt_prefix_filter,
        surt_key,
        surt_prefix_filter,
    )

    urls = [
        f"{scheme}://Sub{i % 3}.Example{i % 2}.COM{port}{path}{q}"
        for i, (scheme, port, path, q) in enumerate(
            itertools.product(
                ["http", "HTTPS"],
                ["", ":80", ":443", ":9090"],
                ["/", "/A/b/", "/x"],
                ["", "?z=1&a=2&m=0"],
            )
        )
    ]
    pdf = pd.DataFrame({"url": urls})
    df = spark.createDataFrame(pdf)
    got_spark = [
        (r.k, r.m)
        for r in df.select(
            surt_key(F.col("url")).alias("k"),
            surt_prefix_filter(surt_key(F.col("url")), "example0.com").alias("m"),
        ).collect()
    ]
    con = duckdb.connect()
    con.register("u", pdf)
    got_duck = con.execute(
        f"SELECT {sql_surt_key('url')} AS k, "
        f"{sql_surt_prefix_filter(sql_surt_key('url'), 'example0.com')} AS m FROM u"
    ).fetchall()
    assert got_spark == [(k, bool(m)) for k, m in got_duck]


def test_surt_key_py_equals_column_expr(spark):
    """The driver-side Python twin (probe-key construction for serving)
    is byte-equal to the column expression over a url product grid —
    schemes, ports, paths, queries, fragments, casing."""
    import itertools

    import pandas as pd
    import pyspark.sql.functions as F

    from darkbo_spark.functions.urlnorm import surt_key, surt_key_py

    urls = [
        f"{scheme}://{host}{port}{path}{q}{frag}"
        for scheme, host, port, path, q, frag in itertools.product(
            ["http", "HTTPS"],
            ["WWW.Example.COM", "sub.a.b.org", "single"],
            ["", ":80", ":443", ":9090"],
            ["", "/", "/A/b/", "/x?notaquery"],
            ["", "?z=1&a=2"],
            ["", "#Frag"],
        )
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got_col = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    got_py = [surt_key_py(u) for u in urls]
    assert got_col == got_py
