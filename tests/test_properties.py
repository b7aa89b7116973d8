"""Property-based tests (hypothesis) over the pure semantics layer, plus
coverage for pairwise shared-concepts and embedding near-dup."""

from __future__ import annotations

import pytest

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from agenticknowledgegraphconstructionsystem_spark import semantics as S

# ---------------------------------------------------------------------------
# pure-function properties (no Spark — fast)
# ---------------------------------------------------------------------------


@given(st.integers(1, 10**6), st.integers(1, 10**6), st.integers(0, 1000))
def test_relevance_pct_bounds(pos, n, occ):
    r = S.relevance_pct(pos, n, occ)
    assert 45 <= r <= 100


@given(st.integers(0, 50), st.integers(0, 50), st.integers(0, 50))
def test_confidence_bounds_and_monotonicity(hi, med, lo):
    c = S.base_confidence_pct(hi, med, lo, hi + med + lo)
    assert S.CONF_FLOOR_PCT <= c <= S.CONF_CEIL_PCT
    # adding a hi-bucket concept never lowers confidence
    assert S.base_confidence_pct(hi + 1, med, lo, hi + med + lo + 1) >= c


@given(st.binary(max_size=400))
@settings(max_examples=200)
def test_extractor_never_crashes_and_strip_invariant(payload):
    html = b"<html><section>" + payload + b"</section></html>"
    out = S.extract_text_from_html(html)
    if out is not None:
        assert out == out.strip()
        assert out.startswith("--- Page 1 ---")


@given(st.text(max_size=300))
@settings(max_examples=200)
def test_detect_mentions_matches_containment(text):
    got = {m.name for m in S.detect_mentions(text)}
    lower = text[: S.EXTRACT_TRUNCATE_CHARS].lower()
    exp = {n for n, _ in S.GAZETTEER if n in lower}
    assert got == exp


@given(st.text(max_size=200))
@settings(max_examples=100)
def test_open_triples_well_formed(text):
    for s, p, o, si in S.extract_open_triples(text):
        assert p in S.RELATIONSHIP_TYPES
        assert s != o
        assert si >= 0


@given(st.lists(st.integers(80, 200), max_size=20))
def test_bucket_counts_partition(avg2s):
    hi, med, lo = S.bucket_counts(avg2s)
    assert hi + med + lo == len(avg2s)  # every avg2 >= 80 lands in a bucket


# ---------------------------------------------------------------------------
# pairwise J3 + embedding near-dup (Spark)
# ---------------------------------------------------------------------------


def test_pairwise_shared_concepts_matches_brute_force(spark):
    from agenticknowledgegraphconstructionsystem_spark.operators.relationships import (
        pairwise_shared_concepts,
    )

    mentions = []
    data = {
        "u1": {"a": 90, "b": 55, "c": 45},
        "u2": {"a": 80, "c": 44, "d": 30},  # d below 0.4 -> excluded
        "u3": {"b": 60},
        "u4": {"z": 95},
    }
    for url, m in data.items():
        for name, rel in m.items():
            mentions.append(
                Row(url=url, name=name, concept_type="method", relevance_pct=rel, pos=1, context="c")
            )
    df = spark.createDataFrame(mentions)
    got = {
        (r["url_a"], r["url_b"]): (r["n_shared"], r["hi"], r["med"], r["lo"])
        for r in pairwise_shared_concepts(df, max_df_frac=1.0).collect()
    }
    exp = {}
    for (ua, ma), (ub, mb) in itertools.combinations(sorted(data.items()), 2):
        shared = [
            ma[n] + mb[n]
            for n in set(ma) & set(mb)
            if ma[n] >= 40 and mb[n] >= 40
        ]
        if shared:
            hi, med, lo = S.bucket_counts(shared)
            exp[(ua, ub)] = (len(shared), hi, med, lo)
    assert got == exp
    # (u1,u2) share a(90+80=170->hi) and c(45+44=89->lo)
    assert got[("u1", "u2")] == (2, 1, 0, 1)


@pytest.mark.slow  # round-6 fast-gate rebalance: family keeps a fast representative
def test_pairwise_df_cap_excludes_stop_concepts(spark):
    from agenticknowledgegraphconstructionsystem_spark.operators.relationships import (
        pairwise_shared_concepts,
    )

    rows = []
    for i in range(10):  # 'hot' in all 10 docs, 'rare' in 2
        rows.append(Row(url=f"u{i}", name="hot", concept_type="m", relevance_pct=90, pos=1, context="c"))
    for i in range(2):
        rows.append(Row(url=f"u{i}", name="rare", concept_type="m", relevance_pct=90, pos=1, context="c"))
    df = spark.createDataFrame(rows)
    got = {
        (r["url_a"], r["url_b"]): r["n_shared"]
        for r in pairwise_shared_concepts(df, max_df_frac=0.5, max_df_min=2).collect()
    }
    # 'hot' (df=10 > cap 5) excluded from pairing; only the 'rare' pair remains
    assert got == {("u0", "u1"): 1}


def test_embedding_near_duplicates(spark):
    import random

    from agenticknowledgegraphconstructionsystem_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    rng = random.Random(3)
    base = [rng.gauss(0, 1) for _ in range(16)]
    rows = [
        Row(vec_id=0, embedding=base),
        Row(vec_id=1, embedding=[x + rng.gauss(0, 0.01) for x in base]),  # near-dup of 0
        Row(vec_id=2, embedding=[rng.gauss(0, 1) for _ in range(16)]),
        Row(vec_id=3, embedding=[-x for x in base]),  # anti-parallel
    ]
    got = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(
        spark.createDataFrame(rows), threshold=0.95, dim=16).collect()}
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)
