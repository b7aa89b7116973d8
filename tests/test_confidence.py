"""D3 — base-confidence formula fidelity (relationship-discovery-agent.ts:43-60),
including the boundary values SURVEY §7 flags as P/R-critical."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark import semantics as S
from agenticknowledgegraphconstructionsystem_spark.operators.relationships import (
    base_confidence_col,
)


def test_bucket_edges_half_open():
    # avg >= .7 | .5 <= avg < .7 | .4 <= avg < .5  (carried as 2x sums)
    assert S.bucket_counts([140]) == (1, 0, 0)  # avg exactly 0.70 -> hi
    assert S.bucket_counts([139]) == (0, 1, 0)  # 0.695 -> med
    assert S.bucket_counts([100]) == (0, 1, 0)  # 0.50 -> med
    assert S.bucket_counts([99]) == (0, 0, 1)   # 0.495 -> lo
    assert S.bucket_counts([80]) == (0, 0, 1)   # 0.40 -> lo
    assert S.bucket_counts([79]) == (0, 0, 0)   # below threshold -> ignored


def test_confidence_formula_and_clamp():
    assert S.base_confidence_pct(0, 0, 0, 0) == 30          # no shared -> floor
    assert S.base_confidence_pct(0, 0, 1, 1) == 30          # 4 -> clamped up to 30
    assert S.base_confidence_pct(2, 1, 0, 3) == 38          # 30+8
    assert S.base_confidence_pct(6, 0, 0, 6) == 85          # 90 -> clamped to ceil
    assert S.base_confidence_pct(3, 2, 1, 6) == 65          # 45+16+4
    # LLM-stand-in refinement
    assert S.final_confidence_pct(85, True) == 90
    assert S.final_confidence_pct(93, True) == 95           # keyword ceil
    assert S.final_confidence_pct(85, False) == 85


def test_spark_column_matches_python(spark):
    cases = [(0, 0, 0, 0), (1, 0, 0, 1), (0, 1, 0, 1), (0, 0, 1, 1), (6, 0, 0, 6), (3, 2, 1, 6)]
    df = spark.createDataFrame(
        [Row(hi=h, med=m, lo=lo, n_shared=n) for h, m, lo, n in cases]
    )
    got = df.select("hi", "med", "lo", "n_shared", base_confidence_col().alias("c")).collect()
    for r in got:
        assert r["c"] == S.base_confidence_pct(r["hi"], r["med"], r["lo"], r["n_shared"])


def test_classifier_priority_and_fallback():
    assert S.classify_relationship_type("we improve and extend things", 0, 0, 0) == "improves_on"
    assert S.classify_relationship_type("we extend things", 0, 0, 0) == "extends"
    assert S.classify_relationship_type("nothing here", 3, 0, 0) == "builds_on"
    assert S.classify_relationship_type("nothing here", 1, 0, 0) == "extends"
    assert S.classify_relationship_type("nothing here", 0, 2, 0) == "evaluates"
    assert S.classify_relationship_type("nothing here", 0, 1, 0) == "addresses"
    assert S.classify_relationship_type("nothing here", 0, 0, 1) == "cites"
    assert S.classify_relationship_type("nothing here", 0, 0, 0) is None
