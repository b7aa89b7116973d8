"""Embedding k-means + SemDedup (operators/clustering.py): label
recovery on a synthetic planted-cluster corpus (the sf testdata
``label`` column is NOT cosine-separable — intra-label cosine ==
inter-label cosine ≈ 0 on random 64-d vectors, measured), iteration
improvement on the real sf0.001 embeddings, planted-duplicate removal,
and cap conservatism.  Float centroid means are partial-sum-order
dependent → property tests, not DuckDB hash gates (see module
docstring)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators.clustering import (
    assign_to_centroids,
    kmeans_fit,
    semantic_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _planted(spark, n_per=40, k=6, dim=32, seed=7):
    """Deterministic well-separated clusters: orthogonal unit centers +
    small Gaussian noise → intra-cluster cosine ≫ inter-cluster."""
    rng = np.random.RandomState(seed)
    rows = []
    for label in range(k):
        center = np.zeros(dim)
        center[label] = 1.0
        pts = center + 0.15 * rng.randn(n_per, dim)
        for j, p in enumerate(pts):
            rows.append((label * n_per + j, [float(x) for x in p], label))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_kmeans_recovers_planted_cluster_structure(spark):
    emb = _planted(spark)
    cents = kmeans_fit(emb, k=6, iters=4)
    assert cents.count() == 6
    assigned = assign_to_centroids(emb, cents)
    rows = (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .select("centroid_id", "label", "c_cos")
        .collect()
    )
    by_centroid = defaultdict(list)
    for r in rows:
        by_centroid[r["centroid_id"]].append(r["label"])
    # purity: members of each learned cluster share a ground-truth label
    purities = [
        Counter(labels).most_common(1)[0][1] / len(labels)
        for labels in by_centroid.values()
    ]
    assert sum(purities) / len(purities) >= 0.9


def test_kmeans_iterations_improve_fit_on_real_embeddings(spark):
    """On the real (unstructured) sf0.001 vectors the recoverable
    property is monotone fit: trained centroids cover the corpus at
    least as well as the raw hash-sample init."""
    emb = _emb(spark)
    trained_rows = assign_to_centroids(emb, kmeans_fit(emb, k=10, iters=3)).collect()
    init_rows = assign_to_centroids(emb, kmeans_fit(emb, k=10, iters=0)).collect()
    mean_cos_trained = sum(r["c_cos"] for r in trained_rows) / len(trained_rows)
    mean_cos_init = sum(r["c_cos"] for r in init_rows) / len(init_rows)
    assert mean_cos_trained >= mean_cos_init


def test_semantic_dedup_removes_planted_duplicates(spark):
    emb = _emb(spark)
    originals = {r["vec_id"] for r in emb.select("vec_id").collect()}
    # plant exact-direction copies (scaled → cosine 1.0) of three vectors
    copies = (
        emb.where(F.col("vec_id").isin([3, 57, 111]))
        .select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x * F.lit(1.001)
            ).alias("embedding"),
            "label",
        )
    )
    planted = emb.unionByName(copies)
    kept = semantic_dedup(planted, threshold=0.999, k=10, iters=2)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every planted copy is dropped (min-id keeper = the original)...
    assert {100_003, 100_057, 100_111}.isdisjoint(kept_ids)
    assert {3, 57, 111} <= kept_ids
    # ...and nothing else at this near-exact threshold
    assert kept_ids == originals


def test_semantic_dedup_cap_is_conservative(spark):
    """max_cluster below every cluster size → zero pairs → zero drops
    (skipped clusters keep all members; dedup never becomes lossy)."""
    emb = _emb(spark)
    kept = semantic_dedup(emb, threshold=0.5, k=4, iters=1, max_cluster=1)
    assert kept.count() == emb.count()


def test_ivf_trained_centroids(spark):
    """kmeans_fit centroids drop into ivf_ann_topk's centroids= slot and,
    on clustered data, match or beat the hash-sample default's recall vs
    exact brute force (the lists align with the clusters, so a probed
    list carries the query's true neighbors)."""
    from agenticknowledgegraphconstructionsystem_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
    )

    emb = _planted(spark, n_per=40, k=6)
    queries = emb.where(F.col("vec_id") % 40 == 0)  # one per true cluster
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(centroids):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_ann_topk(
                emb, queries, k=5, n_centroids=6, n_probe=1, centroids=centroids
            ).collect()
        }
        return len(got & truth) / len(truth)

    trained = kmeans_fit(emb, k=6, iters=4)
    r_trained = recall(trained)
    r_default = recall(None)
    assert r_trained >= r_default
    # with lists == true clusters, 1-probe recall is essentially perfect
    assert r_trained >= 0.95


def test_oversize_clusters_audit(spark):
    """The max_cluster skip is observable: with the cap below every
    cluster size, every cluster appears in the audit view with its true
    member count (summing to the corpus)."""
    from agenticknowledgegraphconstructionsystem_spark.operators.clustering import (
        oversize_clusters,
    )

    emb = _planted(spark)
    cents = kmeans_fit(emb, k=6, iters=2)
    audit = oversize_clusters(emb, cents, max_cluster=1).collect()
    assert sum(r["n_members"] for r in audit) == emb.count()
    assert all(r["n_members"] > 1 for r in audit)
    # generous cap → nothing skipped, empty audit
    assert oversize_clusters(emb, cents, max_cluster=10_000).count() == 0
