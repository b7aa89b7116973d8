"""Structured-data tier (operators/structured.py): JSON-LD block
extraction, typed triples over the fixed schema.org vocabulary, entity
summary — plus the branches the DuckDB gate can't express (malformed
JSON degrades to NULL, never raises) and the plan-shape contract (the
extraction tier is generate+projection only, zero exchanges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators.structured import (
    extract_jsonld,
    jsonld_entity_summary,
    jsonld_triples,
)

ART = (
    '<script type="application/ld+json">'
    '{"@context":"https://schema.org","@type":"Article","@id":"ex:a1",'
    '"name":"A One","headline":"H1",'
    '"author":{"@type":"Person","name":"Alice"},'
    '"datePublished":"2021-03-04","publisher":{"name":"Pub"}}'
    "</script>"
)
PERSON_UPPER = (
    "<SCRIPT TYPE='application/ld+json'>"
    '{"@type":"Person","name":"Alice","jobTitle":"Eng",'
    '"worksFor":{"name":"Org X"}}'
    "</SCRIPT>"
)
JS_DECOY = '<script type="text/javascript">var ld = "application/ld+json";</script>'
LT_BODY = '<script type="application/ld+json">{"x":"<tag>"}</script>'
NOT_JSON = '<script type="application/ld+json">not { json</script>'
SCALAR_AUTHOR = (
    '<script type="application/ld+json">'
    '{"@type":"Article","name":"A Two","author":"Bob Raw"}'
    "</script>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_block_extraction_rules(spark):
    """Matches both quote styles and tag cases, skips the javascript
    decoy and any body containing '<' (documented rule, not a parser);
    block_idx is document order."""
    pages = _pages(
        spark, [("u1", JS_DECOY + ART + LT_BODY + PERSON_UPPER), ("u2", "<p>x</p>")]
    )
    got = [
        (r["url"], r["block_idx"], r["block"][:9])
        for r in extract_jsonld(pages).orderBy("url", "block_idx").collect()
    ]
    assert got == [("u1", 0, '{"@contex'), ("u1", 1, '{"@type":')]


def test_triples_vocabulary_and_subject_rule(spark):
    """Nested author/publisher resolve through '.name'; a scalar author
    falls back to the raw value; subj prefers @id, then url, then name;
    @type itself becomes a triple."""
    pages = _pages(spark, [("u1", ART + SCALAR_AUTHOR)])
    t = {
        (r["subj"], r["pred"]): r["obj"]
        for r in jsonld_triples(pages).collect()
    }
    assert t[("ex:a1", "author")] == "Alice"
    assert t[("ex:a1", "publisher")] == "Pub"
    assert t[("ex:a1", "@type")] == "Article"
    assert t[("ex:a1", "datePublished")] == "2021-03-04"
    # scalar-author block has no @id/url → name is the subject
    assert t[("A Two", "author")] == "Bob Raw"
    assert ("ex:a1", "jobTitle") not in t  # absent property → no row


def test_malformed_json_degrades_to_zero_rows(spark):
    """The branch the DuckDB twin can't express (json_extract_string
    raises on malformed input): Spark extracts NULL, so a syntactically
    matched block with broken JSON emits no triples and no error."""
    pages = _pages(spark, [("u1", NOT_JSON), ("u2", NOT_JSON + ART)])
    rows = jsonld_triples(pages).collect()
    assert {r["url"] for r in rows} == {"u2"}
    assert all(r["subj"] == "ex:a1" for r in rows)


def test_entity_summary_counts_pages_distinct(spark):
    """The same entity asserted on two pages and twice on one page:
    n_pages is distinct, n_triples is total."""
    pages = _pages(
        spark,
        [("u1", PERSON_UPPER + PERSON_UPPER), ("u2", PERSON_UPPER)],
    )
    rows = jsonld_entity_summary(pages).collect()
    assert len(rows) == 1
    r = rows[0]
    # Person block emits name/jobTitle/worksFor/@type = 4 triples × 3 blocks
    assert (r["subj_type"], r["subj"], r["n_pages"], r["n_triples"]) == (
        "Person",
        "Alice",
        2,
        12,
    )


def test_union_with_text_triples_schema(spark):
    """Composition: structured triples project onto the text-KG triple
    shape (subj, pred, obj) and union cleanly — the structured tier
    feeds the same downstream graph."""
    pages = _pages(spark, [("u1", ART)])
    structured = jsonld_triples(pages).select("subj", "pred", "obj")
    text_like = spark.createDataFrame(
        [("alpha", "relates_to", "beta")], "subj string, pred string, obj string"
    )
    merged = text_like.unionByName(structured)
    assert merged.count() == 1 + structured.count()
    assert merged.columns == ["subj", "pred", "obj"]


def test_extraction_plan_is_exchange_free(spark):
    """Scale contract: extract_jsonld and jsonld_triples are
    generate+projection inside the scan stage — zero exchanges; the
    entity summary adds the canonical two-exchange count-distinct shape
    (partial agg keyed (type, subj, url), final keyed (type, subj) —
    both map-side combinable, nothing quadratic)."""
    pages = _pages(spark, [("u1", ART)])
    for df, want in [
        (extract_jsonld(pages), 0),
        (jsonld_triples(pages), 0),
        (jsonld_entity_summary(pages), 2),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == want, plan