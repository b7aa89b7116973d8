"""Large-graph probe: pagerank_fixed_point co_partition=False (AQE
adaptive, the gate default) vs co_partition=True (pinned exchange fusion,
one exchange per iteration).

The gate-scale A/B (sf0.1 co-mention graph, ~10²-10³ nodes) measured the
fusion 1.5× SLOWER — at that size AQE broadcasts the score vector and
beats co-partitioned SMJs.  This probe synthesizes a graph whose score
vector is too big to broadcast (millions of nodes), the regime the fusion
targets: each node i points to (i*K+c) % N for c in 1..deg — deterministic,
no Python row materialization, heavy-tailed enough to exercise the
partial aggregation.

Interleaved min-of-``--repeats`` per mode (the ab_bench noise discipline),
results asserted bit-identical across modes.  Prints ONE JSON line.

Usage: python scripts/probe_pagerank_copartition.py [--nodes 3000000]
       [--deg 4] [--iters 6] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3_000_000)
    ap.add_argument("--deg", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from agenticknowledgegraphconstructionsystem_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from agenticknowledgegraphconstructionsystem_spark.session import get_spark

    spark = get_spark(
        app_name="pagerank-copartition-probe",
        cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")

    n, k = args.nodes, args.deg
    edges = (
        spark.range(n * k)
        .select(
            (F.col("id") % n).alias("src"),
            ((F.col("id") % n) * 1_000_003 + F.col("id") / n + 1).cast("long").alias("_t"),
        )
        .select("src", (F.col("_t") % n).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )

    def run(co: bool) -> tuple[float, int]:
        t0 = time.time()
        out = pagerank_fixed_point(edges, iters=args.iters, co_partition=co)
        agg = out.agg(
            F.sum("pr").alias("s"), F.count("*").alias("c")
        ).collect()[0]
        return time.time() - t0, (int(agg["s"]), int(agg["c"]))

    walls: dict = {"adaptive": [], "co_partition": []}
    sums = {}
    for _ in range(args.repeats):
        for mode, co in (("adaptive", False), ("co_partition", True)):
            w, s = run(co)
            walls[mode].append(round(w, 2))
            sums[mode] = s
    assert sums["adaptive"] == sums["co_partition"], sums  # bit-identical
    out = {
        "nodes": n,
        "edges": n * k,
        "iters": args.iters,
        "wall_sec": {m: min(w) for m, w in walls.items()},
        "walls_raw": walls,
        "score_checksum": sums["adaptive"],
        "ratio_co_over_adaptive": round(
            min(walls["co_partition"]) / min(walls["adaptive"]), 3
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
