"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k: the query set is small
  and broadcast; the corpus side is a single narrow scan (dot product via
  ``F.zip_with`` + ``F.aggregate``, JVM-side); top-k per query is a window
  ``row_number() <= k`` (TakeOrdered per query key, no global sort).
* :func:`rhp_ann_topk` — the scale path: random-hyperplane LSH.  Signatures
  are deterministic (hyperplanes from a seeded PRNG, shipped as literal
  arrays); candidates = corpus rows sharing a signature band with the
  query; exact cosine re-rank on candidates only.  At 10^12 rows the band
  join replaces the full scan with a bucket-local probe.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank) — exact brute force.

    Self-matches are excluded.  Rank ties break on neighbor_id for full
    determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def rhp_signature_col(vec_col, planes: list[list[float]]):
    """Signature bits packed into a long: bit i = sign(v · plane_i)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col).cast("array<double>"), plane) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        sig = sig + bit.cast("long") * F.lit(1 << i).cast("long")
    return sig


def rhp_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures, banded blocking,
    exact cosine re-rank on candidates."""
    assert num_planes % bands == 0
    rpb = num_planes // bands
    planes = _hyperplanes(dim, num_planes, seed)
    sig = rhp_signature_col(vec_col, planes)
    band_arr = F.array(
        *[
            F.shiftrightunsigned(sig, b * rpb).bitwiseAND(F.lit((1 << rpb) - 1))
            for b in range(bands)
        ]
    )

    def with_bands(df, id_alias, vec_alias):
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).cast("array<double>").alias(vec_alias),
            F.posexplode(band_arr).alias("band_id", "band_val"),
        )

    cq = with_bands(queries, "query_id", "qv")
    cc = with_bands(corpus, "neighbor_id", "cv")
    cand = (
        cc.join(F.broadcast(cq), ["band_id", "band_val"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via the same RHP blocking."""
    planes = _hyperplanes(dim, num_planes)
    rpb = num_planes // bands
    sig = rhp_signature_col(vec_col, planes)
    band_arr = F.array(
        *[
            F.shiftrightunsigned(sig, b * rpb).bitwiseAND(F.lit((1 << rpb) - 1))
            for b in range(bands)
        ]
    )
    banded = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.posexplode(band_arr).alias("band_id", "band_val"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "band_id", "band_val")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )
