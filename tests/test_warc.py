"""WARC source (sources/warc.py): byte-exact parse, adversarial payloads,
torn tails, HTTP envelope strip, and the full WARC→pages→pipeline-input
round trip."""

import pandas as pd
from pyspark.sql import functions as F

from darkbo_spark.sources.warc import (
    http_body,
    pages_from_warc,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def _rec(url, payload, rec_type="response", date="2024-01-01T00:00:00Z"):
    return {"url": url, "warc_date": date, "rec_type": rec_type, "payload": payload}


def _rec_bytes_of(r):
    from darkbo_spark.sources.warc import _record_bytes

    return _record_bytes(r)


def test_round_trip_multi_record(tmp_path):
    recs = [
        _rec("https://a.test/1", b"<html>one</html>"),
        _rec("https://a.test/2", b"<html>two</html>"),
        _rec("https://a.test/meta", b"{}", rec_type="warcinfo"),
    ]
    p = str(tmp_path / "t.warc")
    write_warc(recs, p)
    got = list(parse_warc_bytes(open(p, "rb").read()))
    assert [(r["url"], r["payload"]) for r in got] == [
        (r["url"], r["payload"]) for r in recs
    ]


def test_payload_containing_warc_magic_not_split():
    """Payload bytes must be sliced by Content-Length, never scanned —
    a page QUOTING 'WARC/1.0\\r\\n\\r\\n' stays one record."""
    evil = b"look: WARC/1.0\r\nContent-Length: 0\r\n\r\n inside a page"
    recs = [_rec("https://e.test/x", evil), _rec("https://e.test/y", b"next")]
    data = b""
    import io
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as f:
        write_warc(recs, f.name)
        data = open(f.name, "rb").read()
    got = list(parse_warc_bytes(data))
    assert [r["url"] for r in got] == ["https://e.test/x", "https://e.test/y"]
    assert got[0]["payload"] == evil


def test_torn_tail_dropped_not_raised(tmp_path):
    p = str(tmp_path / "torn.warc")
    write_warc([_rec("https://t.test/ok", b"complete"),
                _rec("https://t.test/torn", b"this payload gets cut")], p)
    data = open(p, "rb").read()[:-15]  # cut into the last payload
    got = list(parse_warc_bytes(data))
    assert [r["url"] for r in got] == ["https://t.test/ok"]


def test_http_body_strip():
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    assert http_body(payload) == b"<html>hi</html>"
    assert http_body(b"no envelope here") == b"no envelope here"


def test_read_warc_to_pages_to_docs(spark, tmp_path):
    """The production ingestion path end to end: WARC member file →
    distributed parse → pages shape → extract_docs(re_extract_html) —
    the recovered clean text matches cleaning the raw html directly."""
    from darkbo_spark.functions.textnorm import clean_text_udf, html_to_text
    from darkbo_spark.kg.extract import extract_docs
    from darkbo_spark.reference_impl import clean_text

    html = b"<html><head><script>var x=1;</script></head><body><p>Acme Systems was founded in 1990.</p></body></html>"
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    p = str(tmp_path / "cc.warc")
    write_warc(
        [_rec("https://cc.test/p1", payload),
         _rec("https://cc.test/robots", b"User-agent: *", rec_type="resource")],
        p,
    )
    pages = pages_from_warc(read_warc(spark, p))
    rows = pages.collect()
    assert [r.url for r in rows] == ["https://cc.test/p1"]  # non-response dropped
    assert bytes(rows[0].html) == html                      # HTTP envelope stripped
    docs = extract_docs(pages, re_extract_html=True).collect()
    assert docs[0].text == clean_text(html_to_text(html))
    assert "Acme Systems" in docs[0].text


def test_gz_round_trip_multi_member(tmp_path):
    """CC .warc.gz layout: one gzip member per record, concatenated.
    gunzip_members must decode ALL members, not just the first (plain
    gzip.decompress stops at member 1)."""
    import zlib

    from darkbo_spark.sources.warc import gunzip_members, write_warc_gz

    recs = [
        _rec("https://g.test/1", b"<html>one</html>"),
        _rec("https://g.test/2", b"<html>two</html>"),
        _rec("https://g.test/meta", b"{}", rec_type="warcinfo"),
    ]
    p = str(tmp_path / "t.warc.gz")
    write_warc_gz(recs, p)
    data = open(p, "rb").read()
    # layout sanity: single-member zlib decode stops after record 1 —
    # the file really is concatenated independent members
    one = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16).decompress(data)
    assert one == _rec_bytes_of(recs[0]) and len(one) < len(gunzip_members(data))
    got = list(parse_warc_bytes(gunzip_members(data)))
    assert [(r["url"], r["payload"]) for r in got] == [
        (r["url"], r["payload"]) for r in recs
    ]


def test_gz_torn_tail_dropped_not_raised(tmp_path):
    """A .gz file cut mid-final-member loses ONLY that record; a corrupt
    byte inside the final member likewise."""
    from darkbo_spark.sources.warc import gunzip_members, write_warc_gz

    recs = [_rec("https://gt.test/ok", b"complete record"),
            _rec("https://gt.test/torn", b"this record gets cut")]
    p = str(tmp_path / "torn.warc.gz")
    write_warc_gz(recs, p)
    data = open(p, "rb").read()
    torn = data[:-7]  # cut into the final member (deflate body / trailer)
    got = list(parse_warc_bytes(gunzip_members(torn)))
    assert [r["url"] for r in got] == ["https://gt.test/ok"]
    # corrupt byte mid-final-member: flip a bit well inside member 2
    # (member 2 starts right after member 1's compressed bytes)
    import gzip as _g

    m1 = _g.compress(_rec_bytes_of(recs[0]), mtime=0)
    corrupt = bytearray(data)
    corrupt[len(m1) + 15] ^= 0xFF
    got2 = list(parse_warc_bytes(gunzip_members(bytes(corrupt))))
    assert [r["url"] for r in got2] == ["https://gt.test/ok"]


def test_read_warc_gz_distributed(spark, tmp_path):
    """read_warc sniffs gzip magic per file and parses .warc.gz members
    identically to the plain form — same rows from a mixed directory."""
    html = b"HTTP/1.1 200 OK\r\n\r\n<html><p>Gzip page.</p></html>"
    from darkbo_spark.sources.warc import write_warc_gz

    write_warc([_rec("https://mix.test/plain", html)], str(tmp_path / "a.warc"))
    write_warc_gz([_rec("https://mix.test/gz", html)], str(tmp_path / "b.warc.gz"))
    rows = (read_warc(spark, str(tmp_path))
            .orderBy("url").select("url", "payload").collect())
    assert [r.url for r in rows] == ["https://mix.test/gz", "https://mix.test/plain"]
    assert bytes(rows[0].payload) == html == bytes(rows[1].payload)


# ---------------------------------------------------------------- CDX index


def test_cdx_fetch_round_trip_plain(tmp_path):
    """Every (offset, length) the index emits must slice back to a
    self-contained record with identical url + payload bytes."""
    from darkbo_spark.sources.warc import cdx_records, fetch_warc_record

    recs = [
        _rec("https://c.test/1", b"<html>alpha</html>"),
        _rec("https://c.test/2", b"beta " * 100),
        _rec("https://c.test/3", b""),
    ]
    p = str(tmp_path / "c.warc")
    write_warc(recs, p)
    data = open(p, "rb").read()
    idx = list(cdx_records(data))
    assert [r["url"] for r in idx] == [r["url"] for r in recs]
    for want, entry in zip(recs, idx):
        got = fetch_warc_record(data, entry["offset"], entry["length"])
        assert got is not None
        assert got["url"] == want["url"]
        assert got["payload"] == want["payload"]


def test_cdx_fetch_round_trip_gz(tmp_path):
    """.warc.gz: offsets/lengths address COMPRESSED members; fetch must
    seek-slice-gunzip-parse back to identical payload bytes (the CC
    range-GET contract)."""
    from darkbo_spark.sources.warc import cdx_records, fetch_warc_record, write_warc_gz

    recs = [
        _rec("https://g.test/1", b"<html>one</html>"),
        _rec("https://g.test/2", b"two " * 500),
        _rec("https://g.test/3", b"{}", rec_type="metadata"),
    ]
    p = str(tmp_path / "c.warc.gz")
    write_warc_gz(recs, p)
    data = open(p, "rb").read()
    idx = list(cdx_records(data))
    assert [r["url"] for r in idx] == [r["url"] for r in recs]
    # members are contiguous and cover the file exactly
    assert idx[0]["offset"] == 0
    for a, b in zip(idx, idx[1:]):
        assert b["offset"] == a["offset"] + a["length"]
    assert idx[-1]["offset"] + idx[-1]["length"] == len(data)
    for want, entry in zip(recs, idx):
        got = fetch_warc_record(data, entry["offset"], entry["length"])
        assert got["url"] == want["url"]
        assert got["payload"] == want["payload"]


def test_cdx_gz_torn_tail_drops_only_last(tmp_path):
    from darkbo_spark.sources.warc import cdx_records, write_warc_gz

    recs = [_rec("https://t.test/1", b"keep"), _rec("https://t.test/2", b"torn")]
    p = str(tmp_path / "t.warc.gz")
    write_warc_gz(recs, p)
    data = open(p, "rb").read()
    whole = list(cdx_records(data))
    torn = list(cdx_records(data[:-7]))
    assert [r["url"] for r in whole] == ["https://t.test/1", "https://t.test/2"]
    assert [r["url"] for r in torn] == ["https://t.test/1"]


def test_warc_cdx_index_distributed(spark, tmp_path):
    """warc_cdx_index over a mixed dir (one .warc, one .warc.gz): every
    row's coordinates must fetch back the md5-matching payload from its
    own file."""
    import hashlib

    from darkbo_spark.sources.warc import fetch_warc_record, warc_cdx_index, write_warc_gz

    write_warc(
        [_rec("https://d.test/p1", b"plain one"), _rec("https://d.test/p2", b"plain two")],
        str(tmp_path / "a.warc"),
    )
    write_warc_gz(
        [_rec("https://d.test/g1", b"gz one"), _rec("https://d.test/g2", b"gz two")],
        str(tmp_path / "b.warc.gz"),
    )
    rows = warc_cdx_index(spark, str(tmp_path)).collect()
    assert sorted(r.url for r in rows) == [
        "https://d.test/g1",
        "https://d.test/g2",
        "https://d.test/p1",
        "https://d.test/p2",
    ]
    by_file = {}
    for r in rows:
        fpath = r.file.removeprefix("file:")
        if fpath not in by_file:
            by_file[fpath] = open(fpath, "rb").read()
        rec = fetch_warc_record(by_file[fpath], r.rec_offset, r.rec_length)
        assert rec is not None and rec["url"] == r.url
        assert hashlib.md5(rec["payload"]).hexdigest() == r.payload_md5


# ------------------------------------------------------------- revisits


def test_resolve_revisits_roundtrip(spark, tmp_path):
    """response + resolving revisit + dangling revisit through the real
    file path: bodies re-attach by digest, dangling stays visible."""
    from darkbo_spark.sources.warc import read_warc, resolve_revisits

    body = b"<html>the original fetch</html>"
    recs = [
        dict(_rec("https://r.test/orig", body), payload_digest="md5:aaa"),
        dict(
            _rec("https://r.test/again", b"", rec_type="revisit"),
            payload_digest="md5:aaa",
        ),
        dict(
            _rec("https://r.test/lost", b"", rec_type="revisit"),
            payload_digest="md5:zzz",
        ),
    ]
    p = str(tmp_path / "rv.warc")
    write_warc(recs, p)
    out = {r.url: r for r in resolve_revisits(read_warc(spark, p)).collect()}
    assert out["https://r.test/orig"].resolved == 1
    assert bytes(out["https://r.test/again"].payload) == body
    assert out["https://r.test/again"].resolved == 1
    assert out["https://r.test/lost"].payload is None
    assert out["https://r.test/lost"].resolved == 0


def test_resolve_revisits_deterministic_canonical(spark):
    """Two responses sharing a digest (same bytes by definition): the
    revisit joins exactly one canonical payload — no row duplication."""
    from darkbo_spark.sources.warc import resolve_revisits

    pdf = pd.DataFrame(
        {
            "url": ["u/b", "u/a", "u/rev"],
            "warc_date": ["d"] * 3,
            "rec_type": ["response", "response", "revisit"],
            "content_length": [1, 1, 0],
            "payload": [b"X", b"X", None],
            "payload_digest": ["md5:x", "md5:x", "md5:x"],
        }
    )
    out = resolve_revisits(spark.createDataFrame(pdf)).filter(
        F.col("rec_type") == "revisit"
    ).collect()
    assert len(out) == 1
    assert bytes(out[0].payload) == b"X" and out[0].resolved == 1


def test_gz_walk_is_chunked_and_offsets_roundtrip(tmp_path):
    """The member walk feeds bounded slices (never the whole remaining
    tail): a member whose compressed size spans several 64 KB chunks
    decodes byte-identically, and every (offset, length) pair round-trips
    through fetch_warc_record — the CDX random-access contract."""
    import os

    from darkbo_spark.sources.warc import (
        fetch_warc_record,
        iter_gzip_members,
        write_warc_gz,
    )

    big = os.urandom(300_000)  # incompressible → compressed size > 4 chunks
    recs = [
        _rec("https://c.test/big", big),
        _rec("https://c.test/small", b"tail record"),
    ]
    p = str(tmp_path / "chunked.warc.gz")
    write_warc_gz(recs, p)
    data = open(p, "rb").read()
    members = list(iter_gzip_members(data))
    assert len(members) == 2
    # offsets tile the file exactly: member k starts where k-1 ended
    assert members[0][0] == 0
    assert members[1][0] == members[0][1]
    assert members[1][0] + members[1][1] == len(data)
    got = [fetch_warc_record(data, off, ln) for off, ln, _ in members]
    assert [r["url"] for r in got] == ["https://c.test/big", "https://c.test/small"]
    assert got[0]["payload"] == big


def test_merge_cdx_delta_replaces_by_file(spark):
    """A delta's files replace their index rows wholesale; untouched
    files pass through; brand-new files append. Offsets never shift
    because they are per-file coordinates."""
    import pandas as pd

    from darkbo_spark.sources.warc import merge_cdx_delta

    idx = spark.createDataFrame(
        pd.DataFrame(
            {
                "file": ["f1", "f1", "f2", "f3"],
                "url": ["a", "b", "c", "d"],
                "rec_offset": [0, 100, 0, 0],
            }
        )
    )
    delta = spark.createDataFrame(
        pd.DataFrame(
            {
                "file": ["f2", "f4"],       # f2 re-crawled, f4 new
                "url": ["c2", "e"],
                "rec_offset": [0, 0],
            }
        )
    )
    got = {
        (r.file, r.url, r.rec_offset)
        for r in merge_cdx_delta(idx, delta).collect()
    }
    assert got == {
        ("f1", "a", 0), ("f1", "b", 100),   # untouched
        ("f2", "c2", 0),                     # replaced (old c gone)
        ("f3", "d", 0),
        ("f4", "e", 0),                      # appended
    }


def test_dedup_fetches_latest_wins_across_variants(spark, tmp_path):
    """The full ingestion composition: write a .warc.gz with three raw
    variants of ONE page fetched on different days (mixed-case host +
    default port + fragment, unsorted query, trailing slash) plus an
    unrelated page → read_warc → pages_from_warc → dedup_fetches keeps
    the LATEST fetch of the canonical page and the unrelated page."""
    from darkbo_spark.sources.warc import (
        dedup_fetches,
        pages_from_warc,
        read_warc,
        write_warc_gz,
    )

    recs = [
        dict(_rec("HTTPS://Host.com:443/a/?b=2&a=1#x", b"v-old"),
             warc_date="2024-01-01T00:00:00Z"),
        dict(_rec("https://host.com/a?a=1&b=2", b"v-new"),
             warc_date="2024-01-03T00:00:00Z"),
        dict(_rec("https://host.com/a/?b=2&a=1", b"v-mid"),
             warc_date="2024-01-02T00:00:00Z"),
        dict(_rec("https://other.com/b", b"other"),
             warc_date="2024-01-01T00:00:00Z"),
    ]
    p = str(tmp_path / "fetches.warc.gz")
    write_warc_gz(recs, p)
    pages = pages_from_warc(read_warc(spark, p))
    got = {
        r.canon_url: bytes(r.html)
        for r in dedup_fetches(pages).collect()
    }
    assert got == {
        "https://host.com/a?a=1&b=2": b"v-new",
        "https://other.com/b": b"other",
    }
