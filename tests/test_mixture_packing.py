"""Mixture sampling (sketches.mixture_rates/mixture_sample) and sequence
packing (packing.pack_sequences): hand-computed integer rate math,
composition within binomial noise, determinism, and the concat-stream
packing invariants (contiguous starts, window arithmetic).  The DuckDB
hash gates ride td_sampling_suite (gate_curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators.packing import (
    pack_sequences,
)
from agenticknowledgegraphconstructionsystem_spark.operators.sketches import (
    mixture_rates,
    mixture_sample,
)

SF = "/root/testdata/sf0.001"


def _mini(spark):
    # 100 docs of a, 50 of b, 10 of c (plus an untargeted source d)
    rows = (
        [Row(doc_id=i, source="a") for i in range(100)]
        + [Row(doc_id=1000 + i, source="b") for i in range(50)]
        + [Row(doc_id=2000 + i, source="c") for i in range(10)]
        + [Row(doc_id=3000 + i, source="d") for i in range(7)]
    )
    return spark.createDataFrame(rows)


def test_mixture_rates_integer_math(spark):
    # targets: a 50%, b 30%, c 20% (permille).  T = min(100*1000//500,
    # 50*1000//300, 10*1000//200) = min(200, 166, 50) = 50 — c is the
    # binding source.  keeps: a 25, b 15, c 10.
    rates = {
        r["source"]: r
        for r in mixture_rates(
            _mini(spark), {"a": 500, "b": 300, "c": 200}
        ).collect()
    }
    assert set(rates) == {"a", "b", "c"}  # d dropped (no target)
    assert (rates["a"]["n_docs"], rates["a"]["keep_docs"]) == (100, 25)
    assert (rates["b"]["n_docs"], rates["b"]["keep_docs"]) == (50, 15)
    assert (rates["c"]["n_docs"], rates["c"]["keep_docs"]) == (10, 10)
    assert rates["a"]["rate_ppm"] == 250_000
    assert rates["b"]["rate_ppm"] == 300_000
    assert rates["c"]["rate_ppm"] == 1_000_000  # binding source: keep all
    for r in rates.values():
        assert r["keep_docs"] <= r["n_docs"]


def test_mixture_rates_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        mixture_rates(_mini(spark), {"a": 0})
    with pytest.raises(ValueError):
        mixture_rates(_mini(spark), {"a": 1001})


def test_mixture_sample_membership_and_determinism(spark):
    targets = {"a": 500, "b": 300, "c": 200}
    kept = mixture_sample(_mini(spark), targets).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # untargeted source gone; binding source kept whole (rate 1e6)
    assert "d" not in by_src
    assert by_src["c"] == {2000 + i for i in range(10)}
    # Bernoulli composition: within generous binomial bands of the keeps
    assert 10 <= len(by_src["a"]) <= 45  # E=25, n=100, p=.25
    assert 5 <= len(by_src["b"]) <= 30  # E=15, n=50, p=.30
    # deterministic: identical membership on a second invocation
    again = {
        (r["source"], r["doc_id"])
        for r in mixture_sample(_mini(spark), targets).collect()
    }
    assert again == {(r["source"], r["doc_id"]) for r in kept}


def test_pack_sequences_stream_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx = 128
    out = pack_sequences(docs, ctx_len=ctx, n_shards=4).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    from agenticknowledgegraphconstructionsystem_spark import semantics as S
    from agenticknowledgegraphconstructionsystem_spark.operators.packing import (
        PACK_ORDER_SALT,
    )

    def order_h(doc_id):
        return (
            S.MINHASH_A[PACK_ORDER_SALT] * (doc_id % S.POLY_P)
            + S.MINHASH_B[PACK_ORDER_SALT]
        ) % S.POLY_P

    for rows in by_shard.values():
        rows.sort(key=lambda r: (order_h(r["doc_id"]), r["doc_id"]))
        # starts are the running sum of the stream — no gaps, no overlap
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // ctx
            assert r["pack_offset"] == cum % ctx
            cum += r["n_tokens"]


def test_pack_sequences_null_text_and_edges(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="three word doc"),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="  "),
            Row(doc_id=None, text="dropped"),
        ]
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, ctx_len=2, n_shards=1).collect()}
    assert set(out) == {1, 2, 3}  # NULL key dropped
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 0
    assert out[3]["n_tokens"] == 0
    # one shard: the three docs form one contiguous stream of 3 tokens
    total = sum(r["n_tokens"] for r in out.values())
    assert total == 3
    with pytest.raises(ValueError):
        pack_sequences(docs, ctx_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, ctx_len=8, n_shards=0)


def test_pack_sequences_long_doc_straddles(spark):
    """A document longer than ctx_len starts in pack_id k and spills into
    later windows — start arithmetic stays exact."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * 70)) for i in range(3)]
    )
    out = sorted(
        pack_sequences(docs, ctx_len=100, n_shards=1).collect(),
        key=lambda r: (r["pack_id"], r["pack_offset"]),
    )
    starts = [r["pack_id"] * 100 + r["pack_offset"] for r in out]
    assert starts == [0, 70, 140]
    assert [r["pack_id"] for r in out] == [0, 0, 1]


def test_pack_windows_materializes_exact_stream(spark):
    """Windows re-concatenate to the per-shard stream in order, every
    window but each shard's last holds exactly ctx tokens, and totals
    agree with pack_sequences."""
    from agenticknowledgegraphconstructionsystem_spark import semantics as S
    from agenticknowledgegraphconstructionsystem_spark.operators.packing import (
        PACK_ORDER_SALT,
        pack_windows,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ctx = 100
    wins = pack_windows(docs, ctx_len=ctx, n_shards=4).collect()
    by_shard = {}
    for r in wins:
        by_shard.setdefault(r["shard"], []).append(r)
    # expected stream per shard, rebuilt in python
    rows = docs.select("doc_id", "text").collect()

    def order_h(doc_id):
        return (
            S.MINHASH_A[PACK_ORDER_SALT] * (doc_id % S.POLY_P)
            + S.MINHASH_B[PACK_ORDER_SALT]
        ) % S.POLY_P

    def shard_h(doc_id):
        from agenticknowledgegraphconstructionsystem_spark.operators.packing import (
            PACK_SHARD_SALT,
        )

        return (
            (S.MINHASH_A[PACK_SHARD_SALT] * (doc_id % S.POLY_P)
             + S.MINHASH_B[PACK_SHARD_SALT]) % S.POLY_P
        ) % 4

    streams = {}
    for r in sorted(rows, key=lambda r: (order_h(r["doc_id"]), r["doc_id"])):
        toks = [t for t in (r["text"] or "").lower().split() if t]
        streams.setdefault(shard_h(r["doc_id"]), []).extend(toks)
    for shard, ws in by_shard.items():
        ws.sort(key=lambda r: r["pack_id"])
        # contiguous pack ids from 0
        assert [w["pack_id"] for w in ws] == list(range(len(ws)))
        # all full except the last
        assert all(w["n_tokens"] == ctx for w in ws[:-1])
        assert 0 < ws[-1]["n_tokens"] <= ctx
        rebuilt = " ".join(w["window_text"] for w in ws).split()
        assert rebuilt == streams[shard]
