"""Round-4 hardening: driver gate surface is exactly 50 with every
training-data gate inside the window, hash_sample handles string keys
(ADVICE r3), the dedup persist contract drains to zero after a sweep,
and the gate suites faithfully restate their member micro-gates."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators import dedup
from agenticknowledgegraphconstructionsystem_spark.operators.sketches import (
    hash_sample,
)

SF = "/root/testdata/sf0.001"


def test_driver_surface_is_exactly_50_with_all_td_gates():
    """The driver records CORRECTNESS rows for the first 50 queries() in
    insertion order; round 3 exposed 65 and every LSH/ANN/winnow/sketch
    gate fell outside the window.  Pin: exactly 50 entries, every td_
    gate present, every query has an oracle with the same key set."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    names = list(qs)
    assert len(names) == 50, names
    assert set(names) == set(os_)
    td = [n for n in names if n.startswith("td_")]
    # round 6: simhash sigs+dups folded into td_simhash_suite, their freed
    # slot carries kg_stream_mentions (the streaming drain's driver row)
    assert len(td) == 18, td
    kg = [n for n in names if n.startswith("kg_")]
    assert "kg_stream_mentions" in kg and len(kg) == 20, kg
    # kg + td both fully inside the window even if it shrank to 38
    assert all(not n.startswith("rel_") for n in names[:38])


def test_hash_sample_string_keys(spark):
    df = spark.createDataFrame([Row(k=f"url-{i:04d}", v=i) for i in range(500)])
    got = hash_sample(df, "k", percent=20)
    n = got.count()
    # ~20% of 500 with binomial noise; the old long-cast path returned 0
    assert 40 <= n <= 160, n
    # deterministic: same keys → same side, across invocations
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in hash_sample(df, "k", percent=20).collect()
    )
    # disjoint complement: percent p and the first p'-% with p' > p nest
    sup = {r["k"] for r in hash_sample(df, "k", percent=50).collect()}
    assert {r["k"] for r in got.collect()} <= sup


def test_hash_sample_numeric_keys_unchanged(spark):
    df = spark.createDataFrame([Row(k=i, v=i) for i in range(1000)])
    n = hash_sample(df, "k", percent=10).count()
    assert 40 <= n <= 200, n


def test_hash_sample_rejects_unhashable_key_type(spark):
    df = spark.createDataFrame([Row(k=1.5, v=1)])
    with pytest.raises(TypeError, match="hash_sample"):
        hash_sample(df, "k", percent=10)


def test_dedup_persist_contract_drains(spark):
    """dedup.py's own contract: callers release tracked persists after the
    final action (bench.py and scripts/check_gate.py now do).  A dedup
    query registers >= 1 persist; unpersist_tracked() drains the registry
    to exactly zero and is idempotent."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pairs = dedup.minhash_near_duplicates(docs, key="doc_id", text_col="text")
    pairs.count()
    assert len(dedup._PERSISTED) >= 1
    released = dedup.unpersist_tracked()
    assert released >= 1
    assert dedup._PERSISTED == []
    assert dedup.unpersist_tracked() == 0


@pytest.mark.slow
def test_suites_restate_members(spark):
    """Each suite row set equals the union of its members' stringified
    rows — so a suite hash pins exactly what the 15 separate gates did."""
    from agenticknowledgegraphconstructionsystem_spark.gate_relational import (
        _AGG_SUITE,
        _JOIN_SUITE,
        _SCAN_SUITE,
        _norm_rows,
        q_agg_suite,
        q_join_suite,
        q_scan_suite,
    )

    from agenticknowledgegraphconstructionsystem_spark.gate_textdata import (
        _TEXTSTATS_SUITE,
        q_textstats_suite,
    )

    for suite_q, members in [
        (q_join_suite, _JOIN_SUITE),
        (q_agg_suite, _AGG_SUITE),
        (q_scan_suite, _SCAN_SUITE),
        (q_textstats_suite, _TEXTSTATS_SUITE),
    ]:
        got = sorted(
            (r["gate"], r["row_str"]) for r in suite_q(spark, SF).collect()
        )
        want = sorted(
            (r["gate"], r["row_str"])
            for g, fn, _sql, _cols in members
            for r in _norm_rows(fn(spark, SF), g).collect()
        )
        assert got == want
        assert len({g for g, _ in got}) == len(members)  # every member non-absent


def test_suite_column_lists_match_member_queries(spark):
    """The hardcoded per-member column lists (used to build the DuckDB
    stringification) must equal the member DataFrame's column order."""
    from agenticknowledgegraphconstructionsystem_spark.gate_relational import (
        _AGG_SUITE,
        _JOIN_SUITE,
        _SCAN_SUITE,
    )

    from agenticknowledgegraphconstructionsystem_spark.gate_textdata import (
        _TEXTSTATS_SUITE,
    )

    for members in [_JOIN_SUITE, _AGG_SUITE, _SCAN_SUITE, _TEXTSTATS_SUITE]:
        for g, fn, _sql, cols in members:
            assert fn(spark, SF).columns == cols, g


def test_anti_join_gate_non_vacuous(spark):
    from agenticknowledgegraphconstructionsystem_spark.gate_relational import (
        q_anti_join,
    )

    assert q_anti_join(spark, SF).count() > 0


def test_entity_findings_gate_non_vacuous(spark):
    from agenticknowledgegraphconstructionsystem_spark.gate import (
        q_entity_findings,
    )

    rows = q_entity_findings(spark, SF).collect()
    rules = {r["rule"] for r in rows}
    assert {
        "no_generic_terms",
        "name_too_short",
        "name_too_long",
        "suspicious_perfect_score",
    } <= rules, rules


@pytest.mark.slow
def test_pipeline_graph_metrics_stage(spark, tmp_path):
    """Pipeline(graph_metrics=True) emits a committed graph_metrics stage
    (PageRank + triangles over the co-mention graph) with lineage rows,
    participating in resume like every other stage."""
    from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import (
        Pipeline,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
        synthetic_pages,
    )

    pages = synthetic_pages(spark, 60)
    p = Pipeline(spark, str(tmp_path / "gm"), run_id="g1", graph_metrics=True)
    r = p.run(pages)
    assert "graph_metrics" in p._recomputed
    gm = r["graph_metrics"]
    assert gm.columns == ["url", "pr", "n_triangles"]
    gm_rows = sorted(map(tuple, gm.collect()))  # before any later overwrite
    assert len(gm_rows) > 0
    assert all(pr > 0 for _, pr, _ in gm_rows)
    assert p.lineage().where("stage = 'graph_metrics'").count() >= 1

    # full resume: nothing recomputes
    p2 = Pipeline(spark, str(tmp_path / "gm"), run_id="g2", graph_metrics=True)
    p2.run(pages)
    assert p2._recomputed == []

    # kill only graph_metrics -> only it recomputes, result unchanged
    p2.store.uncommit("graph_metrics")
    p3 = Pipeline(spark, str(tmp_path / "gm"), run_id="g3", graph_metrics=True)
    r3 = p3.run(pages)
    assert p3._recomputed == ["graph_metrics"]
    assert sorted(map(tuple, r3["graph_metrics"].collect())) == gm_rows


@pytest.mark.slow
def test_reference_sql_views(spark, tmp_path):
    """The reference's SQL surface (db_init.py:170-210) works verbatim on
    the rebuild: register_views() exposes papers/concepts/paper_concepts/
    paper_relationships plus the three derived views, and the view
    results agree with the DataFrame operators they restate."""
    from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import (
        Pipeline,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
        synthetic_pages,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.views import (
        VIEW_NAMES,
        register_views,
    )

    r = Pipeline(spark, str(tmp_path / "v"), run_id="v1").run(
        synthetic_pages(spark, 60)
    )
    assert register_views(r) == list(VIEW_NAMES)

    # top_concepts: paper_count == mention_count (edges are one row per
    # (url, name); mention_count counts distinct urls) and ordering holds
    tc = spark.sql("SELECT * FROM top_concepts").collect()
    assert tc and all(row["paper_count"] == row["mention_count"] for row in tc)
    counts = [row["paper_count"] for row in tc]
    assert counts == sorted(counts, reverse=True)

    # paper_concept_summary: every doc appears, zero-mention docs included
    pcs = {row["url"]: row["concept_count"]
           for row in spark.sql("SELECT * FROM paper_concept_summary").collect()}
    assert len(pcs) == r["docs"].count()
    edge_counts = {
        row["url"]: row["n"]
        for row in r["edges"].groupBy("url").count().withColumnRenamed("count", "n").collect()
    }
    for url, n in edge_counts.items():
        assert pcs[url] == n
    assert sum(pcs.values()) == sum(edge_counts.values())

    # relationship_summary: totals tie back to the validated-edge table
    rs = spark.sql("SELECT * FROM relationship_summary").collect()
    assert sum(row["count"] for row in rs) == r["validated_edges"].count()
    assert all(0 <= row["avg_confidence_pct"] <= 100 for row in rs)

    # the views are live plans: a filter through the view still works
    one = spark.sql(
        "SELECT name FROM top_concepts WHERE paper_count >= 1 LIMIT 1"
    ).collect()
    assert one


@pytest.mark.slow
def test_reference_sample_queries_run_on_views(spark, tmp_path):
    """db_init.py:218-273 stores five sample SQL queries a reference user
    runs against its Postgres schema.  Schema-adapted (papers keyed by
    url, concepts by name, is_seminal = min url per the hub-spoke
    semantics, ts_rank -> the token-overlap analog the kg_text_search
    gate pins), all five run through the registered Spark views and
    return sane results."""
    from pyspark.sql import functions as F

    from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import (
        Pipeline,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
        synthetic_pages,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.views import (
        register_views,
    )

    r = Pipeline(spark, str(tmp_path / "sq"), run_id="sq").run(
        synthetic_pages(spark, 60)
    )
    register_views(r)

    # Q1 — papers that improve the seminal paper, by confidence
    q1 = spark.sql("""
        SELECT pr.source_url AS improving_paper, pr.explanation,
               pr.confidence_pct
        FROM paper_relationships pr
        WHERE pr.target_url = (SELECT MIN(url) FROM papers)
          AND pr.rel_type = 'improves_on'
        ORDER BY pr.confidence_pct DESC
    """).collect()
    assert all(row["confidence_pct"] >= 0 for row in q1)

    # Q2 — most mentioned concepts (verbatim modulo LIMIT keyword order)
    q2 = spark.sql("""
        SELECT name, concept_type, mention_count
        FROM concepts ORDER BY mention_count DESC LIMIT 10
    """).collect()
    assert len(q2) == 10
    from agenticknowledgegraphconstructionsystem_spark.operators.entities import (
        top_concepts,
    )

    op = top_concepts(r["entities"], k=10).collect()
    assert {row["name"] for row in q2} == {row["name"] for row in op}

    # Q3 — papers similar to the seminal by shared concepts
    q3 = spark.sql("""
        SELECT p2.url AS similar_paper, COUNT(DISTINCT pc1.name) AS shared_concepts
        FROM papers p1
        JOIN paper_concepts pc1 ON p1.url = pc1.url
        JOIN paper_concepts pc2 ON pc1.name = pc2.name
        JOIN papers p2 ON pc2.url = p2.url
        WHERE p1.url = (SELECT MIN(url) FROM papers) AND p2.url != p1.url
        GROUP BY p2.url ORDER BY shared_concepts DESC LIMIT 10
    """).collect()
    assert len(q3) == 10 and q3[0]["shared_concepts"] >= q3[-1]["shared_concepts"]

    # Q4 — full-text search analog (token-overlap AND ranking; the
    # reference's to_tsquery is Postgres-specific even there)
    q4 = spark.sql("""
        SELECT url,
               (length(' ' || lower(extracted_text) || ' ')
                - length(replace(' ' || lower(extracted_text) || ' ', ' spark ', '')))
               DIV 7 AS rank
        FROM papers
        WHERE lower(extracted_text) LIKE '%spark%'
        ORDER BY rank DESC, url LIMIT 10
    """).collect()
    assert q4 and all(row["rank"] >= 0 for row in q4)

    # Q5 — papers with no relationships (potential issues)
    q5 = spark.sql("""
        SELECT p.url FROM papers p
        WHERE NOT EXISTS (
            SELECT 1 FROM paper_relationships
            WHERE source_url = p.url OR target_url = p.url)
    """).collect()
    # hub-spoke: every non-seminal doc with mentions gets a relationship
    # row, so the survivor set is small but well-defined
    n_docs = spark.sql("SELECT COUNT(*) AS n FROM papers").collect()[0]["n"]
    assert 0 <= len(q5) < n_docs
