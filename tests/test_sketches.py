"""KMV sketch properties: exactness below k, estimation accuracy above
it (standard error ≈ 1/√(k-2) → k=64 gives ~13%; assert a generous 3σ
band), determinism across runs."""

from __future__ import annotations

from pyspark.sql import Row

from agenticknowledgegraphconstructionsystem_spark.operators.sketches import (
    kmv_distinct,
)


def _estimates(spark, rows, k=64):
    df = spark.createDataFrame(rows)
    return {
        r["g"]: r["kmv_distinct"]
        for r in kmv_distinct(df, "g", "v", k=k).collect()
    }


def test_kmv_exact_below_k_and_accurate_above(spark):
    rows = (
        # group "small": 40 distinct values (< k) with duplicates — exact
        [Row(g="small", v=f"s{i % 40:04d}") for i in range(200)]
        # group "big": 3000 distinct values — estimated
        + [Row(g="big", v=f"b{i:05d}") for i in range(3000)]
    )
    est = _estimates(spark, rows)
    assert est["small"] == 40
    assert abs(est["big"] - 3000) / 3000 < 0.40, est["big"]


def test_kmv_deterministic_and_duplicate_insensitive(spark):
    base = [Row(g="x", v=f"t{i:05d}") for i in range(1000)]
    est1 = _estimates(spark, base)
    # same value set with every row tripled — distinct-based sketch
    # must not move
    est2 = _estimates(spark, base * 3)
    assert est1 == est2


def test_stratified_sample_topk_properties(spark):
    from pyspark.sql import functions as F

    from agenticknowledgegraphconstructionsystem_spark.operators.sketches import (
        stratified_sample_topk,
    )

    rows = [Row(g=f"d{i % 7}", k=i) for i in range(300)]
    df = spark.createDataFrame(rows)
    got = stratified_sample_topk(df, "g", "k", k=10)
    per_g = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n == 10 for n in per_g.values()) and len(per_g) == 7
    # deterministic under repartitioning
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, stratified_sample_topk(df.repartition(13), "g", "k", 10).collect()))
    assert a == b
    # a group smaller than k keeps everything
    small = spark.createDataFrame([Row(g="x", k=1), Row(g="x", k=2)])
    assert stratified_sample_topk(small, "g", "k", k=10).count() == 2
    # groups with no new rows are untouched when other groups grow
    grown = df.unionByName(spark.createDataFrame([Row(g="d0", k=10_000 + i) for i in range(50)]))
    kept_d1_before = {t for t in a if t[0] == "d1"}
    kept_d1_after = {
        tuple(r) for r in stratified_sample_topk(grown, "g", "k", 10).collect() if r["g"] == "d1"
    }
    assert kept_d1_before == kept_d1_after
    # string keys work too (shared _key_hash dispatch)
    sdf = spark.createDataFrame([Row(g="a", k=f"url{i}") for i in range(40)])
    assert stratified_sample_topk(sdf, "g", "k", k=5).count() == 5


def test_kmv_merge_equals_single_shot(spark):
    """The mergeability claim, substantiated: sketch each half of the
    corpus separately (split by doc hash), union-merge, estimate — the
    result is IDENTICAL to kmv_distinct over the whole corpus, in both
    the exact (<k) and estimator branches."""
    from pyspark.sql import functions as F

    from agenticknowledgegraphconstructionsystem_spark.operators.sketches import (
        kmv_distinct,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.where(F.col("text").isNotNull()).select(
        "lang",
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    # estimator branch: thousands of distinct (doc:token) pairs per lang
    vals = toks.select(
        "lang",
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("tok")).alias("v"),
    )
    halves = [vals.where(F.col("doc_id") % 2 == i) for i in (0, 1)]
    parts = kmv_sketch(halves[0], "lang", "v").unionByName(
        kmv_sketch(halves[1], "lang", "v")
    )
    merged = kmv_estimate(kmv_merge(parts, "lang"), "lang")
    single = kmv_distinct(vals, "lang", "v")
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in single.collect())
    assert got == want
    # exact branch: < k distinct raw tokens per lang
    parts_sm = kmv_sketch(
        toks.where(F.col("doc_id") % 2 == 0), "lang", "tok"
    ).unionByName(kmv_sketch(toks.where(F.col("doc_id") % 2 == 1), "lang", "tok"))
    merged_sm = kmv_estimate(kmv_merge(parts_sm, "lang"), "lang")
    single_sm = kmv_distinct(toks, "lang", "tok")
    assert sorted(map(tuple, merged_sm.collect())) == sorted(
        map(tuple, single_sm.collect())
    )
