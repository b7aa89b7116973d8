"""Graph analytics over the materialized KG: PageRank in exact integer
fixed-point arithmetic.

The reference materializes the graph but never ranks it (its top_concepts
view counts mentions, db_init.py:187-197); document ranking over the
citation/co-mention structure is the canonical next query a KG user runs.
Floating-point PageRank can never be gated cross-engine (partial-sum
order changes the ulps); this implementation does every step in int64 —
scores are fixed-point at SCALE = 10^12, the damping factor is the
rational 85/100, and every division is an integer floor — so Spark and
DuckDB produce bit-identical score vectors (gate: kg_pagerank, the
DuckDB twin unrolls the iterations as chained CTEs).

Scale shape (same as connected components, linking.py): per iteration
one join edges⋈scores shuffled on src + one aggregation shuffled on dst;
localCheckpoint truncates the growing plan.  Hot (high in-degree) nodes
partial-aggregate map-side — the contribution sum is commutative int
addition.  The dangling-mass term is a scalar aggregate per iteration
(same cost class as the CC convergence check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: scores sum to ~SCALE; 10^12 keeps every
#: intermediate (85 * score sums) far under 2^53, so even the
#: floor(double-division) form is exact — and under 2^63 for int sums
PAGERANK_SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    given as canonical edges (src < dst, distinct) — the clustering
    primitive (cohesive KG neighborhoods vs star hubs).

    The ordered-edge join: with every edge stored once as (lo, hi), a
    triangle a<b<c is found exactly once as (a,b)⋈(b,c) wedge closed by
    (a,c) — no double counting, no post-dedup.  Two equi-joins, both on
    edge keys; the standard degree-ordering refinement (orient edges
    from low- to high-degree instead of by id, bounding wedge fan-out by
    arboricity) drops in by re-canonicalizing the edge list first —
    plain id ordering keeps the DuckDB twin line-for-line (the gate
    compares this exact form).

    → (node, n_triangles), one row per node appearing in ≥ 1 triangle.
    """
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col(f"e1.{dst}") == F.col(f"e2.{src}"))
        .join(
            e3,
            (F.col(f"e3.{src}") == F.col(f"e1.{src}"))
            & (F.col(f"e3.{dst}") == F.col(f"e2.{dst}")),
        )
        .select(
            F.col(f"e1.{src}").alias("a"),
            F.col(f"e1.{dst}").alias("b"),
            F.col(f"e2.{dst}").alias("c"),
        )
    )
    members = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(F.count("*").cast("long").alias("n_triangles"))


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
) -> DataFrame:
    """(src, dst) directed edge list (pre-deduplicated) → (node, pr)
    after ``iters`` power iterations, pr an int64 fixed-point score.

    Per iteration, with N nodes and S = PAGERANK_SCALE:

        contrib(u→v) = floor(pr_u / out_deg_u)
        dangling     = Σ pr_u over nodes with no out-edges
        pr'_v = floor(15·S / (100·N)) + floor(85·dangling / (100·N))
                + floor(85 · Σ_in contrib / 100)

    Every term is an integer function of integers — deterministic across
    engines, partitionings, and runs.  Floors leak a little mass per
    round (scores sum to slightly under S), identically in both engines.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0).cast("long"))
    out_deg = edges.groupBy(src).agg(F.count("*").alias("out_deg"))
    e = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "out_deg")
        .localCheckpoint()
    )
    base = ((DAMP_DEN - DAMP_NUM) * PAGERANK_SCALE) // (DAMP_DEN * n)
    scores = nodes.withColumn(
        "pr", F.lit(PAGERANK_SCALE // n).cast("long")
    ).localCheckpoint()
    has_out = out_deg.select(F.col(src).alias("node"))
    # the dangling SET is static even though its mass changes: when it is
    # empty (always true for symmetrized graphs) the per-iteration scalar
    # aggregate is pure overhead — one membership check up front replaces
    # `iters` driver round-trips (measured 16.7 s → ~8 s at sf0.1)
    dangling_nodes = nodes.join(has_out, "node", "left_anti").localCheckpoint()
    any_dangling = bool(dangling_nodes.head(1))
    for _ in range(iters):
        contribs = e.join(scores, e.e_src == scores.node).select(
            F.col("e_dst").alias("node"),
            F.floor(F.col("pr") / F.col("out_deg")).cast("long").alias("c"),
        )
        in_sum = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        dangling = (
            scores.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("pr"), F.lit(0)))
            .first()[0]
            if any_dangling
            else 0
        )
        dang_share = (DAMP_NUM * int(dangling)) // (DAMP_DEN * n)
        scores = (
            nodes.join(in_sum, "node", "left")
            .select(
                "node",
                (
                    F.lit(base + dang_share)
                    + F.floor(
                        F.lit(DAMP_NUM) * F.coalesce(F.col("s"), F.lit(0)) / F.lit(DAMP_DEN)
                    )
                )
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint()
        )
    return scores
