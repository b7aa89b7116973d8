"""sf1 scale probe — the round protocol's 10x-scale regression gate.

One command that (a) synthesizes the deterministic sf1 level if absent
(scripts/gen_sf.py — ~50k docs / 6M lineitem / 1M events), (b) runs the
FULL Spark-vs-DuckDB gate sweep at sf1 (scripts/check_gate.py) with the
documented oracle-side skip list, (c) runs the headline bench (bench.py)
at sf1, and writes ``BENCH_sf1_r<NN>.json`` with per-query gate walls,
bench walls, calibration, and a comparison row against the previous
round's record — so 10x-scale regressions become round-over-round
attributable exactly like ab_bench made sf0.1 deltas attributable.

Skip list rationale (PLANS.md round 5): kg_pairwise_shared's gate runs
the cap-DISABLED oracle check, which is quadratic BY DESIGN (~10^10 pair
rows at sf1); kg_pagerank/kg_triangles DuckDB twins (nd/dfn/keep/mfk
CTEs + 20 unrolled iterations) grind >50 min while the SPARK side of the
same queries runs in seconds — the skips are oracle-side, never Spark-
side.  kg_stream_mentions is O(1) in corpus size (bounded doc window)
and stays in.

Usage: python scripts/scale_probe.py [--round 6] [--sf-dir /tmp/sf1]
       [--skip-gen] [--gate-only | --bench-only]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: oracle-side quadratic / unrolled-CTE gates (see module docstring)
GATE_SKIP = "kg_pairwise_shared,kg_pagerank,kg_triangles"

#: the round-5 record (PLANS.md) the comparison row is seeded from when
#: no prior BENCH_sf1_r*.json exists
R5_RECORD = {"round": 5, "bench_total_sec": 432.0, "docs_per_sec": 8818.0}


def _run(cmd: list[str], env: dict | None = None, timeout: int = 7200) -> str:
    e = dict(os.environ)
    if env:
        e.update(env)
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO, env=e
    )
    if out.returncode != 0:
        tail = "\n".join((out.stdout + out.stderr).splitlines()[-20:])
        raise RuntimeError(f"{cmd} failed:\n{tail}")
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--gate-only", action="store_true")
    ap.add_argument("--bench-only", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen and not os.path.exists(
        os.path.join(args.sf_dir, "documents.parquet")
    ):
        print("generating sf1 ...", flush=True)
        _run([sys.executable, "scripts/gen_sf.py", "--out", args.sf_dir])

    result: dict = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "gate_skip": GATE_SKIP.split(","),
    }

    if not args.bench_only:
        print("gate sweep at sf1 ...", flush=True)
        t0 = time.time()
        out = _run(
            [sys.executable, "scripts/check_gate.py", args.sf_dir],
            env={"SPARK_GRAFT_GATE_SKIP": GATE_SKIP},
        )
        walls: dict[str, float] = {}
        statuses: dict[str, str] = {}
        for ln in out.splitlines():
            m = re.match(r"(PASS|FAIL|ok\?)\s+(\S+):.*?wall=([0-9.]+)s", ln)
            if m:
                statuses[m.group(2)] = m.group(1)
                walls[m.group(2)] = float(m.group(3))
            elif ln.startswith(("PASS ", "FAIL ")):
                statuses[ln.split()[1].rstrip(":")] = ln.split()[0]
        failures = sum(1 for s in statuses.values() if s == "FAIL")
        result["gate"] = {
            "checks": len(statuses),
            "failures": failures,
            "wall_total_sec": round(time.time() - t0, 1),
            "slowest": dict(
                sorted(walls.items(), key=lambda kv: -kv[1])[:8]
            ),
        }
        print(
            f"gate: {len(statuses)} checks, {failures} failures, "
            f"{result['gate']['wall_total_sec']} s",
            flush=True,
        )

    if not args.gate_only:
        print("headline bench at sf1 ...", flush=True)
        out = _run(
            [sys.executable, "bench.py"],
            # single pass at sf1 (the r5 protocol): min-of-3 at this scale
            # would triple an already ~7-min sweep for noise resolution
            # the calibration normalization supplies more cheaply
            env={"SPARK_GRAFT_SF_DIR": args.sf_dir, "SPARK_GRAFT_BENCH_REPEATS": "1"},
        )
        bench = json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        )
        result["bench"] = bench
        # comparison vs the newest prior record
        prior = R5_RECORD
        for rn in range(args.round - 1, 0, -1):
            p = os.path.join(REPO, f"BENCH_sf1_r{rn:02d}.json")
            if os.path.exists(p):
                with open(p) as f:
                    rec = json.load(f)
                prior = {
                    "round": rn,
                    "bench_total_sec": rec["bench"]["value"],
                    "docs_per_sec": rec["bench"]
                    .get("throughput", {})
                    .get("docs_per_sec"),
                }
                break
        result["vs_prior"] = {
            **prior,
            "ratio_total": round(bench["value"] / prior["bench_total_sec"], 3)
            if prior.get("bench_total_sec")
            else None,
            "note": "cross-round walls on this box are noisy; compare "
            "value_load_normalized when both rounds carry calibration",
        }

    out_path = os.path.join(REPO, f"BENCH_sf1_r{args.round:02d}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", flush=True)
    if result.get("gate", {}).get("failures"):
        sys.exit(1)


if __name__ == "__main__":
    main()
