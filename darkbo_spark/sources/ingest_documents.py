"""Document ingestion (§3.3): raw files → cleaned text → overlapping chunks
→ content-addressed KB rows. The Spark restatement of the reference's
upload path (behavior: ai_worker.py:970-1055 → document_processor
extract/clean/chunk → KBEntry rows with uuid5 ids and chunk_index).

PDF/DOCX text extraction (S5/S6) is gated behind import-try exactly like
the reference gates its optional dependencies: when the libraries are
absent, those rows fall to the placeholder source (S8) instead of failing
the batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from darkbo_spark.functions.ids import uuid5_col
from darkbo_spark.functions.textnorm import clean_text_udf, create_chunks_udf

try:  # S5 — optional, like the reference's HAS_PDF gate
    import PyPDF2  # noqa: F401

    HAS_PDF = True
except ImportError:
    HAS_PDF = False

try:  # S6 — optional, like HAS_DOCX
    from docx import Document as _DocxDocument  # noqa: F401

    HAS_DOCX = True
except ImportError:
    HAS_DOCX = False

PLACEHOLDER_TEXT = (
    "This document could not be processed automatically. "
    "Please contact support for assistance with this file."
)  # S8 — fixed placeholder for unprocessable files

_PDF_STREAM = None  # compiled lazily (module import stays cheap on executors)


def extract_pdf_text(b: bytes) -> str:
    """Dependency-free PDF text extraction (S5 fallback): decode content
    streams (raw or FlateDecode via stdlib zlib) and collect the text-show
    operators — ``(string) Tj``, ``(string) '`` and ``[(s) n (s)] TJ``.
    Handles the plain-text-PDF common case; anything beyond it (CID fonts,
    encodings) is the PyPDF2 branch's job (reference gates that identically
    behind HAS_PDF). One string per content stream, streams joined by
    blank lines like the reference's per-page join."""
    import re as _re
    import zlib

    global _PDF_STREAM
    if _PDF_STREAM is None:
        _PDF_STREAM = _re.compile(rb"stream\r?\n(.*?)endstream", _re.S)

    def _unescape(s: bytes) -> str:
        out, i = [], 0
        while i < len(s):
            c = s[i]
            if c == 0x5C and i + 1 < len(s):  # backslash
                n = s[i + 1]
                esc = {0x6E: "\n", 0x74: "\t", 0x72: "\r", 0x28: "(", 0x29: ")", 0x5C: "\\"}
                if n in esc:
                    out.append(esc[n])
                    i += 2
                    continue
                if 0x30 <= n <= 0x37:  # octal \ddd
                    j = i + 1
                    oct_digits = []
                    while j < len(s) and len(oct_digits) < 3 and 0x30 <= s[j] <= 0x37:
                        oct_digits.append(chr(s[j]))
                        j += 1
                    out.append(chr(int("".join(oct_digits), 8)))
                    i = j
                    continue
                i += 1
                continue
            out.append(chr(c))
            i += 1
        return "".join(out)

    pages = []
    for m in _PDF_STREAM.finditer(b):
        raw = m.group(1)
        try:
            data = zlib.decompress(raw)
        except Exception:
            data = raw
        # strings inside text-show operators, in stream order
        parts = []
        for sm in _re.finditer(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]\\]|\\.)*\]\s*TJ", data):
            tok = sm.group(0)
            for strm in _re.finditer(rb"\(((?:[^()\\]|\\.)*)\)", tok):
                parts.append(_unescape(strm.group(1)))
        page = " ".join(p for p in parts if p.strip())
        if page.strip():
            pages.append(page)
    return "\n\n".join(pages)


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx_text(b: bytes) -> str:
    """Dependency-free DOCX text extraction (S6): a .docx is a zip whose
    word/document.xml carries paragraphs (<w:p>/<w:t>) and tables (<w:tbl>).
    Emits paragraph text and ' | '-joined table rows — the same shape as the
    python-docx branch (reference behavior: api/document_processor.py DOCX
    path, exercised by its ASPCATEST.docx fixture). stdlib zipfile + etree
    only, so S6 runs everywhere."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(b)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    body = root.find(_W_NS + "body")
    if body is None:
        return ""

    def para_text(p) -> str:
        return "".join(t.text or "" for t in p.iter(_W_NS + "t"))

    parts: list[str] = []
    for child in body:
        if child.tag == _W_NS + "p":
            t = para_text(child)
            if t.strip():
                parts.append(t)
        elif child.tag == _W_NS + "tbl":
            for row in child.iter(_W_NS + "tr"):
                cells = []
                for tc in row.findall(_W_NS + "tc"):
                    ct = " ".join(
                        para_text(p) for p in tc.iter(_W_NS + "p")
                    ).strip()
                    if ct:
                        cells.append(ct)
                if cells:
                    parts.append(" | ".join(cells))
    return "\n\n".join(parts)


@pandas_udf(StringType())
def extract_file_text_udf(path: pd.Series, content: pd.Series) -> pd.Series:
    """Extract raw text from file bytes by extension. txt/md decode with
    latin-1 fallback; pdf/docx go through the optional libraries when
    present; anything else yields the placeholder."""

    def one(p: str, b: bytes | None) -> str:
        ext = (p or "").lower().rsplit(".", 1)[-1]
        if b is None:
            return PLACEHOLDER_TEXT
        if ext in ("txt", "md"):
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                return b.decode("latin-1")
        if ext == "pdf" and HAS_PDF:
            import io

            try:
                reader = PyPDF2.PdfReader(io.BytesIO(b))
                pages = []
                for page in reader.pages:
                    try:
                        t = page.extract_text()
                        if t.strip():
                            pages.append(t)
                    except Exception:
                        continue
                if pages:
                    return "\n\n".join(pages)
                # zero extracted text (image-only PDF): fall through so the
                # row degrades identically with or without the library
            except Exception:
                # corrupt bytes must degrade the ROW, not crash the task —
                # with the library absent the same input falls through to
                # the placeholder, so lib-present must match
                pass
        if ext == "pdf":  # stdlib fallback — plain/Flate text PDFs
            try:
                t = extract_pdf_text(b)
                return t if t.strip() else PLACEHOLDER_TEXT
            except Exception:
                return PLACEHOLDER_TEXT
        if ext in ("docx", "doc") and HAS_DOCX:
            import io

            try:
                doc = _DocxDocument(io.BytesIO(b))
                parts = [p.text for p in doc.paragraphs if p.text.strip()]
                for table in doc.tables:
                    for row in table.rows:
                        cells = [c.text.strip() for c in row.cells if c.text.strip()]
                        if cells:
                            parts.append(" | ".join(cells))
                return "\n\n".join(parts)
            except Exception:
                pass  # corrupt bytes → stdlib fallback → placeholder
        if ext == "docx":  # stdlib fallback — S6 works without python-docx
            try:
                return extract_docx_text(b)
            except Exception:
                return PLACEHOLDER_TEXT
        return PLACEHOLDER_TEXT

    return pd.Series([one(p, b) for p, b in zip(path, content)])


def derive_title(path: F.Column) -> F.Column:
    """P8 — file stem → title: '_'/'-' → space, initcap (behavior
    api/document_processor.py:245-246)."""
    stem = F.regexp_extract(F.element_at(F.split(path, "/"), -1), r"^(.*?)(\.[^.]*)?$", 1)
    return F.initcap(F.translate(stem, "_-", "  "))


def ingest_documents(files: DataFrame, project_id: str) -> DataFrame:
    """files(path, content:binary) → KB chunk rows:
    (id, article, content, chunk_index, source, source_file, project_id).

    One narrow pass: extract → clean (byte-identical P1) → chunk (P2) →
    posexplode → uuid5 ids. Exactly the §3.2 pipeline's first half applied
    to an ingestion micro-batch; the streaming form reuses this function in
    foreachBatch."""
    cleaned = files.select(
        F.col("path"),
        derive_title(F.col("path")).alias("article"),
        clean_text_udf(extract_file_text_udf(F.col("path"), F.col("content"))).alias(
            "text"
        ),
    )
    chunks = cleaned.select(
        "path",
        "article",
        F.posexplode(create_chunks_udf(F.col("text"))).alias("chunk_index", "content"),
    )
    return chunks.select(
        uuid5_col(
            "kb", F.lit(project_id), F.col("article"), F.sha2("content", 256)
        ).alias("id"),
        "article",
        "content",
        "chunk_index",
        F.lit("document_upload").alias("source"),
        F.element_at(F.split("path", "/"), -1).alias("source_file"),
        F.lit(project_id).alias("project_id"),
    )
