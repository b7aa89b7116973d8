"""Stdlib PDF text extraction (functions/pdf.py): fixture-writer
roundtrips (Flate + raw streams, escapes, multi-page), document-order
page walking when object numbering disagrees with page order, TJ/hex
string operators via a hand-built content stream, the shared S7 marker
assembly, honest raises, and the Spark extract_docs dispatch."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row

from agenticknowledgegraphconstructionsystem_spark.functions.pdf import (
    build_pdf,
    extract_pdf_pages,
    extract_pdf_text,
)


def test_roundtrip_flate_and_raw():
    pages = [
        ["hello world", "second line"],
        ["page two (with) nested (parens) and \\backslash\\"],
    ]
    for compress in (True, False):
        payload = build_pdf(pages, compress=compress)
        assert extract_pdf_pages(payload) == [
            "hello world\nsecond line",
            "page two (with) nested (parens) and \\backslash\\",
        ]
        assert extract_pdf_text(payload) == (
            "--- Page 1 ---\nhello world\nsecond line\n"
            "--- Page 2 ---\npage two (with) nested (parens) and \\backslash\\"
        )


def test_marker_assembly_matches_html_twin():
    """PDF and HTML extraction share semantics.assemble_page_texts — the
    same page texts must produce byte-identical S7 output through both
    containers."""
    from agenticknowledgegraphconstructionsystem_spark.semantics import (
        extract_text_from_html,
    )

    pdf_out = extract_pdf_text(build_pdf([["alpha beta"], ["gamma"]]))
    html = b"<html><section>alpha beta</section><section>gamma</section></html>"
    html_out = extract_text_from_html(html)
    # html tag-strip pads with spaces; normalize whitespace per page
    norm = lambda s: re.sub(r"[ \t]+", " ", s).replace(" \n", "\n").strip()  # noqa: E731
    assert norm(pdf_out) == norm(html_out)
    assert pdf_out.startswith("--- Page 1 ---\n")


def test_page_order_follows_kids_tree_not_object_numbering():
    """Swap the /Kids order relative to object numbering: extraction must
    follow the page TREE (document order), not byte/object order."""
    payload = build_pdf([["first"], ["second"]])
    swapped = payload.replace(b"/Kids [3 0 R 5 0 R]", b"/Kids [5 0 R 3 0 R]")
    assert swapped != payload
    assert extract_pdf_pages(swapped) == ["second", "first"]


def test_hand_built_tj_array_and_hex_strings():
    """TJ arrays with kerning numbers and <hex> strings — operators the
    fixture writer doesn't emit, pinned with a hand-assembled stream."""
    content = b"BT /F1 12 Tf 72 720 Td [(ker) -120 (ned)] TJ 0 -14 Td <48690A> Tj ET"
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    base = build_pdf([["placeholder"]], compress=False)
    # splice the hand stream over the generated content object (4 0 obj)
    payload = re.sub(
        rb"4 0 obj\n.*?endobj\n",
        lambda _m: b"4 0 obj\n" + body + b"\nendobj\n",  # literal, no template escapes
        base,
        flags=re.DOTALL,
    )
    assert extract_pdf_pages(payload) == ["kerned\nHi\n"]


def test_escapes_octal_and_line_continuation():
    content = b"BT (tab\\there \\051ok\\050 oct\\101 cont\\\ninues) Tj ET"
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    base = build_pdf([["x"]], compress=False)
    payload = re.sub(
        rb"4 0 obj\n.*?endobj\n", lambda _m: b"4 0 obj\n" + body + b"\nendobj\n",
        base, flags=re.DOTALL,
    )
    assert extract_pdf_pages(payload) == ["tab\there )ok( octA continues"]


def test_honest_raises():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_pages(b"%!PS not a pdf")
    enc = build_pdf([["x"]]).replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_pages(enc)
    lzw = build_pdf([["x"]], compress=False).replace(
        b"/Length", b"/Filter /LZWDecode /Length"
    )
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_pages(lzw)


def test_empty_pdf_extracts_none():
    # a PDF whose single page shows no text -> markers only -> the S7
    # strip leaves the marker; a ZERO-page pdf -> None
    no_pages = build_pdf([])
    assert extract_pdf_text(no_pages) is None


def test_extract_docs_dispatches_pdf_payloads(spark):
    """The Spark S7 path: a pages row whose html column carries %PDF-
    bytes (crawls fetch PDFs too) extracts through the stdlib PDF
    extractor with the same stats/marker semantics as HTML rows."""
    from agenticknowledgegraphconstructionsystem_spark.operators.extract import (
        extract_docs,
    )

    pdf_payload = build_pdf([["spark gradient boosting"], ["table scan"]])
    rows = [
        Row(
            url="https://example.org/paper/pdf1",
            warc_ts=None,
            lang="en",
            html=pdf_payload,
            text=None,
        ),
        Row(
            url="https://example.org/paper/html1",
            warc_ts=None,
            lang="en",
            html=b"<section>plain html body</section>",
            text=None,
        ),
    ]
    docs = extract_docs(
        spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, lang string, html binary, text string",
        )
    )
    got = {r["url"]: r for r in docs.collect()}
    pdf_doc = got["https://example.org/paper/pdf1"]
    assert pdf_doc["extracted_text"] == (
        "--- Page 1 ---\nspark gradient boosting\n--- Page 2 ---\ntable scan"
    )
    assert pdf_doc["n_pages"] == 2
    assert pdf_doc["n_words"] == 13  # incl. the 2x3 marker tokens
    assert "plain html body" in got["https://example.org/paper/html1"]["extracted_text"]
