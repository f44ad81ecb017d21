"""Line-level boilerplate dedup (operators/lines.py)."""

import pandas as pd

from darkbo_spark.operators.lines import dedup_lines, line_stats


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


BOILER = "accept cookies to continue"


def test_line_stats_counts(spark):
    docs = _docs(spark, [
        (1, f"{BOILER}\nunique one"),
        (2, f"{BOILER}\nunique two\n{BOILER}"),
        (3, "only original prose"),
    ])
    stats = {r.line: (r.n_docs, r.n_occ) for r in line_stats(docs).collect()}
    assert stats[BOILER] == (2, 3)  # 2 docs, 3 occurrences
    assert stats["unique one"] == (1, 1)


def test_dedup_lines_removes_boiler_preserves_order(spark):
    docs = _docs(spark, [
        (1, f"alpha\n{BOILER}\nbeta"),
        (2, f"{BOILER}\ngamma"),
        (3, "delta\nepsilon"),
    ])
    out = {r.doc_id: r for r in dedup_lines(docs, min_docs=2).collect()}
    assert out[1].text == "alpha\nbeta"  # removed from the middle, order kept
    assert out[1].n_lines_removed == 1 and out[1].n_lines_kept == 2
    assert out[2].text == "gamma"
    assert out[3].text == "delta\nepsilon" and out[3].n_lines_removed == 0


def test_all_boiler_doc_survives_empty(spark):
    docs = _docs(spark, [(1, BOILER), (2, BOILER), (3, "keep me")])
    out = {r.doc_id: r for r in dedup_lines(docs, min_docs=2).collect()}
    assert out[1].text == "" and out[1].n_lines_kept == 0
    assert out[2].text == ""
    assert out[3].text == "keep me"
    assert len(out) == 3  # nobody silently vanishes


def test_empty_lines_never_boiler_and_preserved(spark):
    docs = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
    out = {r.doc_id: r.text for r in dedup_lines(docs, min_docs=2).collect()}
    # the empty line appears in both docs but is exempt from classification
    assert out[1] == "a\n\nb"
    assert out[2] == "c\n\nd"


def test_min_docs_threshold(spark):
    docs = _docs(spark, [(1, f"x\n{BOILER}"), (2, BOILER), (3, BOILER)])
    loose = {r.doc_id: r.text for r in dedup_lines(docs, min_docs=4).collect()}
    assert loose[1] == f"x\n{BOILER}"  # below threshold: nothing removed
    tight = {r.doc_id: r.text for r in dedup_lines(docs, min_docs=3).collect()}
    assert tight[1] == "x"
