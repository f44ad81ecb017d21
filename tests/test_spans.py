"""Span-level (substring) dedup (operators/spans.py): planted boilerplate
must surface as exact maximal spans, keep_first must exempt one copy,
trim must remove precisely the spanned tokens, and the degenerate-
fingerprint cap must drop over-shared windows."""

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.operators.spans import (
    duplicate_spans,
    trim_duplicate_spans,
    window_fingerprints,
)

HEADER = "copyright notice all rights reserved by the example corporation inc"  # 10 tokens
BODIES = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima",
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray",
    "one two three four five six seven eight nine ten eleven twelve",
]


def _corpus(spark):
    rows = [(i, f"{HEADER} {b}") for i, b in enumerate(BODIES)]
    rows.append((10, "totally unrelated text with no shared windows anywhere at all today"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_window_fingerprints_positions_and_count(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, "a b c d e"), (1, "a b")], columns=["doc_id", "text"])
    )
    out = window_fingerprints(df, n=3).collect()
    # doc 0: 3 windows at pos 0,1,2; doc 1 shorter than n → none
    assert sorted((r.doc_id, r.pos) for r in out) == [(0, 0), (0, 1), (0, 2)]
    # identical windows hash identically across docs
    df2 = spark.createDataFrame(
        pd.DataFrame([(0, "x a b c"), (1, "a b c y")], columns=["doc_id", "text"])
    )
    fps = {(r.doc_id, r.pos): r.fp for r in window_fingerprints(df2, n=3).collect()}
    assert fps[(0, 1)] == fps[(1, 0)]  # both are 'a b c'


def test_planted_header_becomes_exact_maximal_span(spark):
    # 10-token header, n=8 → windows 0..2 shared across docs 0,1,2
    spans = duplicate_spans(_corpus(spark), n=8).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in spans}
    assert got == {(0, 0, 10, 3), (1, 0, 10, 3), (2, 0, 10, 3)}


def test_keep_first_exempts_min_doc_pos(spark):
    spans = duplicate_spans(_corpus(spark), n=8, keep_first=True).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    # doc 0 holds the first occurrence of every header window → no span
    assert got == {(1, 0, 10), (2, 0, 10)}


def test_trim_removes_exactly_spanned_tokens(spark):
    docs = _corpus(spark)
    spans = duplicate_spans(docs, n=8, keep_first=True)
    out = {r.doc_id: r.text for r in trim_duplicate_spans(docs, spans).collect()}
    assert out[0] == f"{HEADER} {BODIES[0]}"  # first copy kept verbatim
    assert out[1] == BODIES[1] and out[2] == BODIES[2]
    assert out[10].startswith("totally unrelated")


def test_within_doc_repetition_not_cross_doc(spark):
    # the same window twice in ONE doc is not a cross-document duplicate
    df = spark.createDataFrame(pd.DataFrame(
        [(0, "p q r s t u v w p q r s t u v w"),
         (1, "different words entirely here that share nothing with the other")],
        columns=["doc_id", "text"],
    ))
    assert duplicate_spans(df, n=8).count() == 0


def test_degenerate_fp_cap_drops_overshared_windows(spark):
    docs = _corpus(spark)
    # header fps live in 3 docs; cap at 2 drops them all
    assert duplicate_spans(docs, n=8, max_docs_per_fp=2).count() == 0
    # cap above the family size keeps them
    assert duplicate_spans(docs, n=8, max_docs_per_fp=3).count() == 3


def test_overlapping_families_merge_to_one_span(spark):
    # doc A shares its first 10 tokens with B and tokens 3..13 with C:
    # the duplicate windows overlap and must merge into ONE maximal span
    a = "w1 w2 w3 c1 c2 c3 c4 c5 c6 c7 t1 t2 t3 zz yy xx"
    b = "w1 w2 w3 c1 c2 c3 c4 c5 c6 c7 unrelated tail of doc b here"
    c = "c1 c2 c3 c4 c5 c6 c7 t1 t2 t3 another different ending entirely now"
    df = spark.createDataFrame(
        pd.DataFrame([(0, a), (1, b), (2, c)], columns=["doc_id", "text"])
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicate_spans(df, n=8).collect()
    }
    # doc 0: windows 0..2 (shared with B) and 3..5? — window width 8:
    # B-shared windows start at 0,1,2; C-shared at 3,4,5... all gaps <= 8
    # → one span covering [0, last_start + 8)
    assert spans[0][0] == 0 and spans[0][1] >= 10
    assert len(spans) == 3


def test_portable_mode_matches_fast_mode_structure(spark):
    docs = _corpus(spark)
    fast = {(r.doc_id, r.span_start, r.span_end) for r in duplicate_spans(docs, n=8).collect()}
    port = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(docs, n=8, hash_mode="portable").collect()
    }
    assert fast == port  # same windows, different hash primitive


def test_plan_has_no_cartesian_or_nested_loop(spark):
    import io
    from contextlib import redirect_stdout

    df = duplicate_spans(_corpus(spark), n=8, keep_first=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# byte-faithful trim (trim_spans_exact + tokenizer="ws" spans)
# ---------------------------------------------------------------------------

import re

from darkbo_spark.operators.spans import trim_spans_exact

# Java \S (Spark's regex engine) — ASCII whitespace complement
_JTOK = re.compile(r"[^ \t\n\x0b\f\r]+")


def _ref_trim_bytes(text: str, spans: list[tuple[int, int]]) -> str:
    """Offset-slicing reference: excise the byte range [start of tok_a,
    end of tok_{b-1}) for each token span [a, b)."""
    toks = [(m.start(), m.end()) for m in _JTOK.finditer(text)]
    cuts = sorted((toks[a][0], toks[b - 1][1]) for a, b in spans)
    out, prev = [], 0
    for s, e in cuts:
        out.append(text[prev:s])
        prev = e
    out.append(text[prev:])
    return "".join(out)


def _exact_corpus(spark):
    # preserved case, tabs/newlines/double spaces, leading whitespace,
    # multibyte UTF-8 tokens — everything the normalized trim destroys
    header = "LICENSE Héader: Αll rights\treserved by Exämple Corp 名前 GmbH"  # 10 toks
    rows = [
        (0, f"{header}\n\nBody züro  with\tsome filler tokens here now ok fine"),
        (1, f"  {header} body-öne unique tail words appear only here today yes"),
        (2, f"\t{header}\r\nbody two's DIFFERENT tail £set of unique words here"),
        (3, "No boilerplate at ALL — this döcument\tmust come back byte-identical\n"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_trim_exact_untouched_docs_byte_identical(spark):
    df = _exact_corpus(spark)
    spans = duplicate_spans(
        df, n=8, min_docs=2, keep_first=True, hash_mode="portable", tokenizer="ws"
    )
    got = {r.doc_id: r.text for r in trim_spans_exact(df, spans).collect()}
    orig = {r.doc_id: r.text for r in df.collect()}
    # doc 3 shares nothing; doc 0 holds the exempt first occurrence of the
    # header — if no other window of doc 0 duplicates, it's untouched too
    span_docs = {r.doc_id for r in spans.collect()}
    for d in orig:
        if d not in span_docs:
            assert got[d] == orig[d], f"doc {d} not byte-identical"
    assert 3 not in span_docs


def test_trim_exact_matches_offset_slicing_reference(spark):
    df = _exact_corpus(spark)
    spans_df = duplicate_spans(
        df, n=8, min_docs=2, keep_first=True, hash_mode="portable", tokenizer="ws"
    )
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans_df.collect():
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert by_doc, "expected planted header spans"
    got = {r.doc_id: r.text for r in trim_spans_exact(df, spans_df).collect()}
    for r in df.collect():
        want = _ref_trim_bytes(r.text, by_doc.get(r.doc_id, []))
        assert got[r.doc_id] == want, f"doc {r.doc_id}: {got[r.doc_id]!r} != {want!r}"
        # byte-level, not just str equality
        assert got[r.doc_id].encode("utf-8") == want.encode("utf-8")


def test_trim_exact_mid_doc_and_multiple_spans(spark):
    # hand-built spans (not derived) pin the excision geometry itself:
    # mid-document span keeps surrounding whitespace; two spans in one doc
    text = "aa  bb\tcc dd\nee ff gg  hh ii jj"
    df = spark.createDataFrame(pd.DataFrame([(0, text)], columns=["doc_id", "text"]))
    spans = spark.createDataFrame(
        pd.DataFrame(
            [(0, 2, 4), (0, 7, 9)], columns=["doc_id", "span_start", "span_end"]
        )
    )
    got = trim_spans_exact(df, spans).collect()[0].text
    assert got == _ref_trim_bytes(text, [(2, 4), (7, 9)])
    # spot-check the actual bytes: cc..dd and hh..ii excised, seps around kept
    # seps on BOTH sides of an excised span survive: "gg  " + " jj"
    assert got == "aa  bb\t\nee ff gg   jj"


def test_trim_exact_full_doc_span(spark):
    text = "  x y z  "
    df = spark.createDataFrame(pd.DataFrame([(0, text)], columns=["doc_id", "text"]))
    spans = spark.createDataFrame(
        pd.DataFrame([(0, 0, 3)], columns=["doc_id", "span_start", "span_end"])
    )
    got = trim_spans_exact(df, spans).collect()[0].text
    assert got == _ref_trim_bytes(text, [(0, 3)]) == "    "
