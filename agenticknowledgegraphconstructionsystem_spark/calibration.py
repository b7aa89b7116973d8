"""Host-load calibration for benchmarks on a shared, noisy box.

Cross-round wall-clock comparisons on this sandbox are unattributable:
identical code has measured 8.4 s vs 21.7 s (kg_pagerank, PLANS.md) and
whole-bench totals swing 41.7–103.5 s, purely from other tenants'
load and turbo clocking.  The fix is to measure the box itself with a
fixed, deterministic CPU-bound workload immediately around the timed
region and report walls *normalized by the calibration wall*: two rounds
are then compared in units of "how long the same fixed work took at that
moment", which cancels first-order host-load effects.

The workload is ``N_PROCS`` processes each running ``N_ITERS`` iterations
of a pure-Python 64-bit xorshift mix — no allocation, no I/O, CPython-
version-stable, and multi-core so it sees the same contention the Spark
executors see.  The final hash is checked against a pinned value so the
workload provably cannot be optimized away or drift.
"""

from __future__ import annotations

import multiprocessing as mp
import time

N_PROCS = 8
N_ITERS = 2_000_000
_MASK = (1 << 64) - 1


def _xorshift_work(seed: int) -> int:
    x = seed & _MASK
    for _ in range(N_ITERS):
        x ^= (x << 13) & _MASK
        x ^= x >> 7
        x ^= (x << 17) & _MASK
    return x


#: pinned result of _xorshift_work(1) — a LITERAL constant, so any drift in
#: the workload (N_ITERS, the mix, the mask) fails across processes and
#: rounds, not just within one process (which is the case that matters for
#: comparing rounds)
_EXPECTED_SEED1 = 16965358617443516922


def calibration_wall(n_procs: int = N_PROCS) -> float:
    """Wall seconds for the fixed workload right now.  Larger = busier box.

    Normalization protocol: ``score = bench_wall / calibration_wall`` is
    comparable across rounds; raw walls are not.
    """
    t0 = time.time()
    with mp.get_context("spawn").Pool(n_procs) as pool:
        results = pool.map(_xorshift_work, range(1, n_procs + 1))
    wall = time.time() - t0
    if results[0] != _EXPECTED_SEED1:
        raise AssertionError("calibration workload drifted from the pinned value")
    return round(wall, 3)
