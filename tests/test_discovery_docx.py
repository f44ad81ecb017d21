"""S4 project auto-discovery (prebuild_kb.py:61-106 behavior) and S6
dependency-free DOCX extraction (the reference ships ASPCATEST.docx to
exercise this path; here a synthetic in-memory docx plays that role)."""

import io
import json
import zipfile

import pandas as pd
import pyspark.sql.functions as F

from darkbo_spark.sources.discovery import discover_project_dirs, discover_projects
from darkbo_spark.sources.ingest_documents import (
    PLACEHOLDER_TEXT,
    extract_docx_text,
    extract_file_text_udf,
    ingest_documents,
)

# ---------------------------------------------------------------------------
# synthetic docx bytes (a .docx IS a zip with word/document.xml)
# ---------------------------------------------------------------------------

_DOC_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
  <w:body>
    <w:p><w:r><w:t>ASPCA Test Document</w:t></w:r></w:p>
    <w:p><w:r><w:t>First para</w:t></w:r><w:r><w:t>graph spans runs.</w:t></w:r></w:p>
    <w:p><w:r><w:t>   </w:t></w:r></w:p>
    <w:tbl>
      <w:tr>
        <w:tc><w:p><w:r><w:t>Animal</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>Count</w:t></w:r></w:p></w:tc>
      </w:tr>
      <w:tr>
        <w:tc><w:p><w:r><w:t>Dogs</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>42</w:t></w:r></w:p></w:tc>
      </w:tr>
    </w:tbl>
    <w:p><w:r><w:t>Closing paragraph.</w:t></w:r></w:p>
  </w:body>
</w:document>"""


def make_docx_bytes(doc_xml: str = _DOC_XML) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("word/document.xml", doc_xml)
    return buf.getvalue()


def test_extract_docx_text_paragraphs_runs_tables():
    text = extract_docx_text(make_docx_bytes())
    parts = text.split("\n\n")
    assert parts[0] == "ASPCA Test Document"
    assert parts[1] == "First paragraph spans runs."  # runs concatenated
    assert "Animal | Count" in parts  # table rows joined like the docx branch
    assert "Dogs | 42" in parts
    assert parts[-1] == "Closing paragraph."
    assert "   " not in parts  # whitespace-only paragraph dropped


def test_docx_through_spark_ingest(spark):
    files = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": ["/up/aspca_test.docx", "/up/readme.txt", "/up/blob.xyz"],
                "content": [make_docx_bytes(), b"plain text body", b"\x00\x01"],
            }
        )
    )
    texts = {
        r.path: r.text
        for r in files.select(
            "path", extract_file_text_udf(F.col("path"), F.col("content")).alias("text")
        ).collect()
    }
    assert texts["/up/aspca_test.docx"].startswith("ASPCA Test Document")
    assert texts["/up/readme.txt"] == "plain text body"
    assert texts["/up/blob.xyz"] == PLACEHOLDER_TEXT
    # and the full chunk pipeline produces KB rows with titles from the stem
    rows = ingest_documents(files, "proj1").collect()
    assert {r.article for r in rows} >= {"Aspca Test", "Readme"}
    assert all(r.id and r.project_id == "proj1" for r in rows)


def test_corrupt_docx_falls_to_placeholder(spark):
    files = spark.createDataFrame(
        pd.DataFrame({"path": ["/up/broken.docx"], "content": [b"not a zip at all"]})
    )
    got = files.select(
        extract_file_text_udf(F.col("path"), F.col("content")).alias("t")
    ).collect()[0].t
    assert got == PLACEHOLDER_TEXT


# ---------------------------------------------------------------------------
# S4 discovery
# ---------------------------------------------------------------------------


def _write_project(tmp_path, pid, faqs=None, kb=None):
    d = tmp_path / pid
    d.mkdir()
    if faqs is not None:
        (d / f"{pid}.faq.json").write_text(json.dumps(faqs))
    if kb is not None:
        (d / f"{pid}.kb.json").write_text(json.dumps(kb))


def test_discovery_two_projects_named(spark, tmp_path):
    _write_project(
        tmp_path,
        "101",
        faqs=[
            {"question": "What is this?", "answer": "General info."},
            {"question": "Who runs it?", "answer": "The ASPCA animal shelter."},
        ],
    )
    _write_project(
        tmp_path,
        "202",
        faqs=[{"question": "Rights?", "answer": "American Civil Liberties info."}],
    )
    _write_project(tmp_path, "303", kb=[{"article": "A", "content": "kb only"}])
    (tmp_path / "not_a_project").mkdir()  # no faq/kb file → ignored
    (tmp_path / "loose.txt").write_text("x")

    dirs = discover_project_dirs(str(tmp_path))
    assert set(dirs) == {"101", "202", "303"}
    assert dirs["303"]["faq"] is None and dirs["303"]["kb"] is not None

    got = {r.project_id: r.name for r in discover_projects(spark, str(tmp_path)).collect()}
    assert got == {"101": "ASPCA", "202": "ACLU", "303": "303"}


def test_discovery_first_faq_match_wins(spark, tmp_path):
    # FAQ #1 mentions ASPCA, FAQ #2 mentions ACLU → first matching FAQ decides
    _write_project(
        tmp_path,
        "p1",
        faqs=[
            {"question": "q", "answer": "about ASPCA"},
            {"question": "q", "answer": "about ACLU"},
        ],
    )
    # sniff only checks the first 3 FAQs: marker on the 4th is invisible
    _write_project(
        tmp_path,
        "p2",
        faqs=[
            {"question": "q1", "answer": "a1"},
            {"question": "q2", "answer": "a2"},
            {"question": "q3", "answer": "a3"},
            {"question": "q4", "answer": "late ACLU mention"},
        ],
    )
    got = {r.project_id: r.name for r in discover_projects(spark, str(tmp_path)).collect()}
    assert got == {"p1": "ASPCA", "p2": "p2"}


def test_discovery_empty_dir(spark, tmp_path):
    assert discover_projects(spark, str(tmp_path / "missing")).count() == 0


# ---------------------------------------------------------------------------
# S5 PDF fallback (dependency-free; PyPDF2 branch stays gated like the
# reference's HAS_PDF)
# ---------------------------------------------------------------------------


def make_pdf_bytes() -> bytes:
    import zlib

    page1 = b"BT /F1 12 Tf 72 720 Td (Hello PDF) Tj (world!) Tj ET"
    page2 = zlib.compress(
        rb"BT [(Zlib) -250 (compressed \(page\))] TJ (line \134two) ' ET"
    )
    out = [b"%PDF-1.4"]
    for body in (page1, page2):
        out.append(b"1 0 obj << /Length " + str(len(body)).encode() + b" >>")
        out.append(b"stream\n" + body + b"endstream")
        out.append(b"endobj")
    out.append(b"%%EOF")
    return b"\n".join(out)


def test_extract_pdf_text_raw_and_flate():
    from darkbo_spark.sources.ingest_documents import extract_pdf_text

    text = extract_pdf_text(make_pdf_bytes())
    pages = text.split("\n\n")
    assert pages[0] == "Hello PDF world!"
    # escapes: \( \) and octal \134 (backslash) handled; TJ + ' operators
    assert pages[1] == "Zlib compressed (page) line \\two"


def test_pdf_through_spark_ingest(spark):
    files = spark.createDataFrame(
        pd.DataFrame(
            {"path": ["/up/report.pdf", "/up/junk.pdf"],
             "content": [make_pdf_bytes(), b"%PDF-1.4 no streams"]}
        )
    )
    texts = {
        r.path: r.text
        for r in files.select(
            "path", extract_file_text_udf(F.col("path"), F.col("content")).alias("text")
        ).collect()
    }
    assert texts["/up/report.pdf"].startswith("Hello PDF world!")
    assert texts["/up/junk.pdf"] == PLACEHOLDER_TEXT
