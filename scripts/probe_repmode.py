"""Dense-alias-family probe: canonicalize mode='all_pairs' vs
mode='representative' vs mode='auto' at 100x vocabulary.

Reproduces the PLANS.md round-4 probe (2,200 names: 22 bases x 100
near-identical variants — every name inside a 100-member family, the
pathological web-scale case) and measures, for both modes:

* wall seconds (min of --repeats interleaved runs),
* verified similarity-edge count (the O(f^2) vs O(f) story),
* recovered family partition + precision/recall of intra-family pairs
  vs the all-pairs partition (representative components provably refine
  all-pairs components, so precision is 1.0 by construction; recall
  measures under-merge).

Usage: python scripts/probe_repmode.py [--variants 100] [--repeats 2]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASES = [
    "gradient boosting", "neural radiance field", "table scan", "hash join",
    "sort merge join", "query optimizer", "column store", "vector index",
    "stream processor", "shuffle service", "token filter", "graph engine",
    "entity linker", "schema registry", "page cache", "cost model",
    "join order", "spill manager", "bloom filter", "zone map",
    "delta encoder", "parquet reader",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import Row

    from agenticknowledgegraphconstructionsystem_spark.operators.linking import (
        canonicalize,
        similarity_edges,
    )
    from agenticknowledgegraphconstructionsystem_spark.session import get_spark

    spark = get_spark(app_name="repmode-probe", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    names = [f"{b} v{i}" for b in BASES for i in range(args.variants)]
    ents = spark.createDataFrame([Row(name=n, mention_count=1) for n in names]).localCheckpoint()

    def run(mode: str) -> tuple[float, dict]:
        t0 = time.time()
        rows = canonicalize(ents, mode=mode).collect()
        wall = time.time() - t0
        comp: dict = {}
        for r in rows:
            comp.setdefault(r["component"], set()).add(r["name"])
        return wall, comp

    walls = {"all_pairs": [], "representative": [], "auto": []}
    comps = {}
    for _ in range(args.repeats):  # interleaved — same noise discipline as ab_bench
        for mode in ("all_pairs", "representative", "auto"):
            w, c = run(mode)
            walls[mode].append(round(w, 2))
            comps[mode] = c

    def pairs(comp: dict) -> set:
        out = set()
        for members in comp.values():
            ms = sorted(members)
            out.update((a, b) for i, a in enumerate(ms) for b in ms[i + 1 :])
        return out

    p_exact, p_rep = pairs(comps["all_pairs"]), pairs(comps["representative"])
    p_auto = pairs(comps["auto"])
    inter = len(p_exact & p_rep)
    inter_auto = len(p_exact & p_auto)
    edge_counts = {
        mode: similarity_edges(ents, mode=mode).count()
        for mode in ("all_pairs", "representative", "auto")
    }
    out = {
        "n_names": len(names),
        "family_size": args.variants,
        "wall_sec": {m: min(w) for m, w in walls.items()},
        "walls_raw": walls,
        "verified_edges": edge_counts,
        "intra_family_pairs": {"all_pairs": len(p_exact), "representative": len(p_rep), "auto": len(p_auto)},
        "pair_precision_rep": round(inter / len(p_rep), 6) if p_rep else 1.0,
        "pair_recall_rep": round(inter / len(p_exact), 6) if p_exact else 1.0,
        "pair_precision_auto": round(inter_auto / len(p_auto), 6) if p_auto else 1.0,
        "pair_recall_auto": round(inter_auto / len(p_exact), 6) if p_exact else 1.0,
        "families_equal": comps["all_pairs"].keys() is not None
        and {frozenset(v) for v in comps["all_pairs"].values()}
        == {frozenset(v) for v in comps["representative"].values()},
        "families_equal_auto": {frozenset(v) for v in comps["all_pairs"].values()}
        == {frozenset(v) for v in comps["auto"].values()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
