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
