"""D2 — OpenIE-style sentence-level triple extraction vs the shared pure
function."""

from __future__ import annotations

from agenticknowledgegraphconstructionsystem_spark import semantics as S
from agenticknowledgegraphconstructionsystem_spark.operators.extract import extract_docs
from agenticknowledgegraphconstructionsystem_spark.operators.open_triples import (
    extract_open_triples,
)
from agenticknowledgegraphconstructionsystem_spark.sources.pages import synthetic_pages


def test_pure_function_semantics():
    text = "the spark pipeline improves the seminal table scan approach. unrelated. batch compares well against stream here."
    got = S.extract_open_triples(text)
    assert ("spark", "improves_on", "table scan", 0) in got
    assert ("batch", "evaluates", "stream", 2) in got
    # no triple with object BEFORE the keyword
    assert not any(s == "table scan" and o == "spark" for s, _, o, _ in got)
    assert S.extract_open_triples(None) == []
    assert S.extract_open_triples("no mentions here at all") == []


def test_spark_matches_oracle(spark):
    docs = extract_docs(synthetic_pages(spark, 120))
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"], r["sent_idx"])
        for r in extract_open_triples(docs).collect()
    }
    exp = set()
    for r in docs.collect():
        for s, p, o, si in S.extract_open_triples(r["extracted_text"]):
            exp.add((r["url"], s, p, o, si))
    assert got == exp
    assert len(got) > 0  # fixture rel-sentences must actually fire