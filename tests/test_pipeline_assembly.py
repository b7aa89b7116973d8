"""The assembly Pipeline stage (plans/pipeline.py:_assemble): packing
output matches the standalone operator over the committed docs, resumes
like every stage, and the optional domain-mixture resample keeps only
targeted domains."""

from __future__ import annotations

import pytest

import shutil
import tempfile

from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators.packing import (
    pack_sequences,
)
from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import Pipeline
from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
    PAGES_SCHEMA,
    synthetic_pages_rows,
)

N_DOCS = 30
CTX = 64


def _pages(spark, two_domains=False):
    rows = synthetic_pages_rows(N_DOCS)
    if two_domains:
        # move odd docs to a second registered domain
        for i, r in enumerate(rows):
            if i % 2 == 1:
                r["url"] = r["url"].replace("example.org", "news.other.net")
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_assembly_stage_matches_operator_and_resumes(spark):
    out = tempfile.mkdtemp(prefix="kg_asm_")
    try:
        p = Pipeline(spark, out, assemble_ctx=CTX, assemble_shards=2)
        res = p.run(_pages(spark))
        assert "assembly" in res
        asm = {tuple(r) for r in res["assembly"].collect()}
        docs = p.store.read("extract")
        want = {
            tuple(r)
            for r in pack_sequences(
                docs, ctx_len=CTX, key_col="url",
                text_col="extracted_text", n_shards=2,
            ).collect()
        }
        assert asm == want
        assert len(asm) == docs.count()
        # resume: a fresh Pipeline over the same store recomputes nothing
        p2 = Pipeline(spark, out, assemble_ctx=CTX, assemble_shards=2)
        res2 = p2.run(_pages(spark))
        assert p2._recomputed == []
        assert {tuple(r) for r in res2["assembly"].collect()} == asm
    finally:
        shutil.rmtree(out, ignore_errors=True)


@pytest.mark.slow  # round-6 fast-gate rebalance: family keeps a fast representative
def test_assembly_mixture_keeps_only_targeted_domains(spark):
    out = tempfile.mkdtemp(prefix="kg_asm_mix_")
    try:
        p = Pipeline(
            spark,
            out,
            assemble_ctx=CTX,
            assemble_shards=2,
            mixture_targets={"example.org": 700, "other.net": 300},
        )
        res = p.run(_pages(spark, two_domains=True))
        urls = [r["url"] for r in res["assembly"].select("url").collect()]
        assert 0 < len(urls) <= N_DOCS
        assert all("example.org" in u or "news.other.net" in u for u in urls)
        # an untargeted-domain run keeps nothing from that domain
        out2 = tempfile.mkdtemp(prefix="kg_asm_mix2_")
        try:
            p2 = Pipeline(
                spark,
                out2,
                assemble_ctx=CTX,
                assemble_shards=2,
                mixture_targets={"example.org": 1000},
            )
            res2 = p2.run(_pages(spark, two_domains=True))
            urls2 = [r["url"] for r in res2["assembly"].select("url").collect()]
            assert urls2 and all("example.org" in u for u in urls2)
        finally:
            shutil.rmtree(out2, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@pytest.mark.slow  # round-6 fast-gate rebalance: family keeps a fast representative
def test_assembly_partitioned_by_shard_and_prunes(spark):
    """The assembly snapshot is Hive-partitioned by shard (one directory
    per output stream), the read path restores the declared column order
    and types, and a shard filter prunes at the scan
    (PartitionFilters)."""
    import os

    out = tempfile.mkdtemp(prefix="kg_asm_part_")
    try:
        p = Pipeline(spark, out, assemble_ctx=CTX, assemble_shards=2)
        res = p.run(_pages(spark))
        stage_dir = os.path.join(out, "assembly")
        snap = [d for d in os.listdir(stage_dir) if d.startswith("snap-")][0]
        parts = sorted(
            d for d in os.listdir(os.path.join(stage_dir, snap))
            if d.startswith("shard=")
        )
        assert parts and all(d.split("=")[1].isdigit() for d in parts)
        # schema contract survives the partition round-trip
        asm = p.store.read("assembly")
        assert asm.columns == ["url", "shard", "n_tokens", "pack_id", "pack_offset"]
        assert dict(asm.dtypes)["shard"] == "bigint"
        # a shard filter reaches the scan as a partition filter
        plan = (
            asm.where(F.col("shard") == 0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [" in plan
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "shard" in pf
    finally:
        shutil.rmtree(out, ignore_errors=True)
