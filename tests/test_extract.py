"""S7/S8 — byte-identical extraction (the north-star per-row invariant)."""

from __future__ import annotations

from agenticknowledgegraphconstructionsystem_spark import semantics as S
from agenticknowledgegraphconstructionsystem_spark.operators.extract import extract_docs
from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
    PAGES_SCHEMA,
    synthetic_pages,
    synthetic_pages_rows,
)


def test_extract_byte_identical(spark):
    rows = synthetic_pages_rows(64)
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_docs(synthetic_pages(spark, 64)).collect()
    }
    for r in rows:
        exp = r["text"] if r["text"] is not None else S.extract_text_from_html(r["html"])
        assert got[r["url"]] == exp, r["url"]


def test_extract_marker_join_strip_semantics():
    # extract_and_populate.py:51-65: markers, "" join, single outer strip
    html = b"<html><body><section>first</section><section>second</section></body></html>"
    assert S.extract_text_from_html(html) == "--- Page 1 ---\nfirst\n--- Page 2 ---\nsecond"
    assert S.extract_text_from_html(b"<html></html>") is None  # empty -> None
    assert S.extract_text_from_html(None) is None


def test_extract_stats(spark):
    rows = synthetic_pages_rows(32)
    df = extract_docs(spark.createDataFrame(rows, PAGES_SCHEMA))
    for r in df.collect():
        st = S.extraction_stats(r["extracted_text"])
        assert r["n_chars"] == st["char_count"]
        assert r["n_words"] == st["word_count"]
        assert r["n_pages"] == st["page_markers"]
