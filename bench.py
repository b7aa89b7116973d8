"""Headline benchmark — prints ONE JSON line.

Runs the flagship KG pipeline plus the heavy training-data/relational
operators at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Each query is forced end-to-end with the noop
writer (full materialization — count() alone would let Catalyst prune
columns and under-report).

Noise discipline (round-2 verdict): single-shot walls on this shared box
swing up to 2x on identical code, so every headline number is the MIN of
``SPARK_GRAFT_BENCH_REPEATS`` (default 3) runs; the raw per-run walls are
appended to BENCH/history.jsonl for inspection.

Output: {"metric": "total_bench_sec", "value": N, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "throughput": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agenticknowledgegraphconstructionsystem_spark.session import get_spark  # noqa: E402


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _timed(fn) -> tuple[float, list[float]]:
    """min-of-N wall plus the raw walls (N = REPEATS).  Eager persists the
    dedup operators register are released after every run (the module's
    own contract, dedup.py unpersist_tracked) — ~30 queries x N repeats
    would otherwise accumulate MEMORY_AND_DISK caches for the whole
    session and skew later numbers under memory pressure."""
    from agenticknowledgegraphconstructionsystem_spark.operators import dedup

    walls = []
    for _ in range(REPEATS):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
        dedup.unpersist_tracked()
    return min(walls), walls


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="kg-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from agenticknowledgegraphconstructionsystem_spark.gate import KG_QUERIES
    from agenticknowledgegraphconstructionsystem_spark.gate_curation import (
        CURATION_MICRO_QUERIES,
    )
    from agenticknowledgegraphconstructionsystem_spark.gate_relational import REL_QUERIES
    from agenticknowledgegraphconstructionsystem_spark.gate_textdata import (
        TEXT_MICRO_QUERIES,
        TEXT_QUERIES,
    )

    bench_set = {
        # flagship: full KG pipeline to triples (extract->mentions->entities
        # ->hub-join->classify->union)
        "kg_triples": KG_QUERIES["kg_triples"],
        "kg_relationships": KG_QUERIES["kg_relationships"],
        "kg_validation_summary": KG_QUERIES["kg_validation_summary"],
        "kg_open_triples": KG_QUERIES["kg_open_triples"],
        "kg_pagerank": KG_QUERIES["kg_pagerank"],
        "kg_triangles": KG_QUERIES["kg_triangles"],
        # training-data ops
        "td_minhash_dups": TEXT_QUERIES["td_minhash_dups"],
        "td_simhash_sigs": TEXT_MICRO_QUERIES["td_simhash_sigs"],
        "td_ann_cosine_topk": TEXT_QUERIES["td_ann_cosine_topk"],
        "td_emb_near_dup": TEXT_QUERIES["td_emb_near_dup"],
        "td_winnow_dups": TEXT_QUERIES["td_winnow_dups"],
        "td_tfidf_topk": TEXT_QUERIES["td_tfidf_topk"],
        "td_quality": TEXT_MICRO_QUERIES["td_quality"],
        "td_corpus_stats": TEXT_QUERIES["td_corpus_stats"],
        "td_dedup_rate": TEXT_QUERIES["td_dedup_rate"],
        "td_stratified_sample": TEXT_MICRO_QUERIES["td_stratified_sample"],
        # curation/assembly tier (round 5): the heaviest curation report
        # and the packing window — the rest are projections/broadcasts
        # crawl-discovery tier (round 6): the frontier merge (one shuffle
        # + one join over the whole mixed corpus) and the SURT index
        # (zero-exchange projection with a sha256 per payload)
        "td_discovered_urls": CURATION_MICRO_QUERIES["td_discovered_urls"],
        "td_cdx_records": CURATION_MICRO_QUERIES["td_cdx_records"],
        "td_repetition": CURATION_MICRO_QUERIES["td_repetition"],
        "td_pack_sequences": CURATION_MICRO_QUERIES["td_pack_sequences"],
        "td_line_dedup": CURATION_MICRO_QUERIES["td_line_dedup"],
        "td_familiarity": CURATION_MICRO_QUERIES["td_familiarity"],
        "td_span_dedup": CURATION_MICRO_QUERIES["td_span_dedup"],
        # relational heavies
        "rel_pricing_summary": REL_QUERIES["rel_pricing_summary"],
        "rel_big_group": REL_QUERIES["rel_big_group"],
        "rel_rollup": REL_QUERIES["rel_rollup"],
        "rel_shipping_priority": REL_QUERIES["rel_shipping_priority"],
        "rel_local_volume": REL_QUERIES["rel_local_volume"],
        "rel_equi_join": REL_QUERIES["rel_equi_join"],
        "rel_window_dedup": REL_QUERIES["rel_window_dedup"],
        "rel_events_hourly": REL_QUERIES["rel_events_hourly"],
        "rel_sessionize": REL_QUERIES["rel_sessionize"],
        "rel_asof_join": REL_QUERIES["rel_asof_join"],
    }

    # warm the JVM/codegen once on the smallest table so per-query numbers
    # measure the plan, not first-job setup
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()

    # host-load calibration BEFORE the sweep (and again after) — raw walls
    # on this shared box are unattributable round-over-round; the fixed
    # CPU workload's wall is the denominator that makes them comparable
    from agenticknowledgegraphconstructionsystem_spark import calibration

    cal_before = calibration.calibration_wall()

    # Share ONE materialized mentions DF across the kg_* gate queries —
    # the staged pipeline reuses its committed mentions stage the same way
    # (plans/pipeline.py); per-query re-detection in the bench was a
    # harness artifact double-paying the detector (round-1 verdict note).
    # The detection cost itself is timed and reported separately.
    import agenticknowledgegraphconstructionsystem_spark.gate as gate_mod

    _orig_mentions = gate_mod._mentions
    _mcache: dict[str, object] = {}

    def _cached_mentions(spark_, sf_dir_):
        if sf_dir_ not in _mcache:
            _mcache[sf_dir_] = _orig_mentions(spark_, sf_dir_).localCheckpoint()
        return _mcache[sf_dir_]

    gate_mod._mentions = _cached_mentions

    timings: dict[str, float] = {}
    raw_walls: dict[str, list[float]] = {}

    def record(name: str, fn) -> None:
        timings[name], raw_walls[name] = _timed(fn)

    # detection timed on the raw plan (min-of-N), then materialized once as
    # the shared checkpoint the kg_* queries reuse
    record("kg_detect_mentions", lambda: _force(_orig_mentions(spark, sf_dir)))
    _cached_mentions(spark, sf_dir)
    for name, fn in bench_set.items():
        record(name, lambda fn=fn: _force(fn(spark, sf_dir)))

    # entity linking + canonicalization (iterative — timed separately)
    from pyspark.sql import functions as F

    from agenticknowledgegraphconstructionsystem_spark.gate import _mentions
    from agenticknowledgegraphconstructionsystem_spark.operators.entities import (
        build_entities,
    )
    from agenticknowledgegraphconstructionsystem_spark.operators.linking import (
        canonicalize,
    )

    ents = build_entities(_mentions(spark, sf_dir)).select("name", "mention_count")
    record(
        "kg_canonicalize",
        lambda: canonicalize(ents).write.format("noop").mode("overwrite").save(),
    )

    # canonicalize at 20× the name universe: deterministic suffix variants
    # inflate the vocabulary (more components, larger edge/CC rounds) so the
    # iterative stage's scaling is visible round-over-round
    big_ents = (
        ents.crossJoin(spark.range(20).select(F.col("id").alias("_v")))
        .select(
            F.concat(F.col("name"), F.lit(" variant "), F.col("_v")).alias("name"),
            "mention_count",
        )
    )
    record(
        "kg_canonicalize_20x",
        lambda: canonicalize(big_ents).write.format("noop").mode("overwrite").save(),
    )

    # full-pairwise J3 with the document-frequency cap (the skew-safe path)
    from agenticknowledgegraphconstructionsystem_spark.operators.relationships import (
        pairwise_shared_concepts,
    )

    record(
        "kg_pairwise_capped",
        lambda: _force(pairwise_shared_concepts(_mentions(spark, sf_dir))),
    )

    cal_after = calibration.calibration_wall()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_triples_df = KG_QUERIES["kg_triples"](spark, sf_dir)
    n_triples = n_triples_df.count()
    kg_sec = timings["kg_triples"]
    total = round(sum(timings.values()), 3)
    cal_mean = round((cal_before + cal_after) / 2, 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": REPEATS,
        "sf": sf_dir,
        "cpus": cpus,
        # load-normalized score: total in units of the fixed calibration
        # workload's wall at bench time.  Compare THIS across rounds;
        # raw seconds only within one session.
        "calibration": {
            "before_sec": cal_before,
            "after_sec": cal_after,
            "mean_sec": cal_mean,
            "n_procs": calibration.N_PROCS,
            "n_iters": calibration.N_ITERS,
        },
        "value_load_normalized": round(total / cal_mean, 2),
        "throughput": {
            "docs_per_sec": round(n_docs / kg_sec, 1),
            "triples_per_sec": round(n_triples / kg_sec, 1),
            "n_docs": n_docs,
            "n_triples": n_triples,
        },
    }
    print(json.dumps(out))
    # per-round history (append, never overwrite) with the RAW walls so
    # regressions and machine noise are answerable round-over-round
    try:
        hist_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
        os.makedirs(hist_dir, exist_ok=True)
        with open(os.path.join(hist_dir, "history.jsonl"), "a") as f:
            f.write(json.dumps({"ts": int(time.time()), "walls": raw_walls, **out}) + "\n")
    except OSError:
        pass  # history is best-effort; the stdout contract must not break
    spark.stop()


if __name__ == "__main__":
    main()
