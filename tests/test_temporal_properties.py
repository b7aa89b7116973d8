"""Property tests for operators/temporal.py against single-process
oracles on seeded-random event sets: the Spark gaps-and-islands
sessionizer and the union+window as-of join must match a brute-force
Python implementation row-for-row (micro-second integer time, so no
float time arithmetic anywhere).
"""

from __future__ import annotations

import datetime as dt
import random

from agenticknowledgegraphconstructionsystem_spark.operators.temporal import (
    as_of_join,
    sessionize_batch,
)

T0 = dt.datetime(2025, 5, 1)


def _random_events(seed: int, n: int, n_users: int, max_gap_min: int):
    rng = random.Random(seed)
    rows = []
    clock = {u: 0 for u in range(1, n_users + 1)}
    for i in range(n):
        u = rng.randrange(1, n_users + 1)
        clock[u] += rng.randrange(1, max_gap_min * 60)
        rows.append(
            (i, T0 + dt.timedelta(seconds=clock[u]), u, float(rng.randrange(100)))
        )
    return rows


def _oracle_sessions(rows, gap_minutes: int):
    by_user: dict[int, list] = {}
    for _, ts, u, v in rows:
        by_user.setdefault(u, []).append((ts, v))
    out = set()
    for u, evs in by_user.items():
        evs.sort()
        cur = None
        for ts, v in evs:
            if cur and (ts - cur["end"]).total_seconds() * 1e6 <= gap_minutes * 60 * 1e6:
                cur["end"] = ts
                cur["n"] += 1
                cur["sum"] += v
            else:
                if cur:
                    out.add((u, cur["start"], cur["end"], cur["n"], cur["sum"]))
                cur = {"start": ts, "end": ts, "n": 1, "sum": v}
        if cur:
            out.add((u, cur["start"], cur["end"], cur["n"], cur["sum"]))
    return out


def test_sessionize_batch_matches_python_oracle(spark):
    for seed in (7, 23):
        rows = _random_events(seed, n=400, n_users=9, max_gap_min=70)
        df = spark.createDataFrame(
            [(i, ts, u, v) for i, ts, u, v in rows],
            "event_id long, ts timestamp, user_id long, value double",
        )
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
             r["sum_value"])
            for r in sessionize_batch(df, gap_minutes=30).collect()
        }
        exp = _oracle_sessions(rows, 30)
        # values are small integers-as-floats: sums are exact in both paths
        assert got == exp, (seed, sorted(got ^ exp)[:4])


def _oracle_asof(left, right):
    out = set()
    for lk, lts, lid in left:
        best = None
        for rk, rts, px in right:
            if rk == lk and rts <= lts and (best is None or rts > best[0]):
                best = (rts, px)
        out.add((lid, best[1] if best else None))
    return out


def test_as_of_join_matches_python_oracle(spark):
    for seed in (11, 42):
        rng = random.Random(seed)
        # distinct timestamps per key on the right side (documented
        # precondition); shared key space so matches and misses both occur
        left = [
            (rng.randrange(1, 6), T0 + dt.timedelta(seconds=rng.randrange(10_000)), i)
            for i in range(200)
        ]
        right_keys = {}
        right = []
        for j in range(80):
            k = rng.randrange(1, 8)
            ts = T0 + dt.timedelta(seconds=rng.randrange(10_000))
            if (k, ts) in right_keys:
                continue
            right_keys[(k, ts)] = True
            right.append((k, ts, j * 10))
        ldf = spark.createDataFrame(left, "k long, ts timestamp, lid long")
        rdf = spark.createDataFrame(right, "k long, ts timestamp, px long")
        got = {
            (r["lid"], r["px_asof"])
            for r in as_of_join(ldf, rdf, on=["k"], ts_col="ts",
                                payloads=["px"]).collect()
        }
        assert got == _oracle_asof(left, right), seed
