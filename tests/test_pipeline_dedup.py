"""Near-dup corpus dedup as a first-class Pipeline stage (round-2 verdict
item 1): plant near-duplicate crawl copies, run the pipeline with
dedup_mode="minhash"/"winnow", and assert entities/relationships/triples
match the pipeline run on the clean corpus (the dedup'd oracle) — plus
lineage rows and stage-level resume for the dedup stage.
"""

from __future__ import annotations

import pytest

from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import Pipeline
from agenticknowledgegraphconstructionsystem_spark.semantics import (
    extract_text_from_html,
)
from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
    PAGES_SCHEMA,
    synthetic_pages_rows,
)

N_DOCS = 60


def _planted_rows(rows: list[dict], max_copies: int = 4) -> tuple[list[dict], int]:
    """Append near-duplicate crawl copies of long docs: same content with a
    per-copy banner prefix (shift-tolerant dup), url sorting AFTER the
    original (zcopy > paper) so the original is the min-url keeper."""
    planted = [dict(r) for r in rows]
    n = 0
    for r in rows:
        text = extract_text_from_html(r["html"])
        if not text or len(text) < 300:
            continue
        planted.append(
            {
                **r,
                "url": r["url"].replace("/paper/", "/zcopy/"),
                "html": None,
                # distinct banner per copy so copies never pair with each
                # other through the banner alone
                "text": f"breaking update {n}: subscribe to newsletter {n} today. "
                + text,
            }
        )
        n += 1
        if n == max_copies:
            break
    # one exact duplicate exercises the exact sub-pass inside near mode
    planted.append(
        {**rows[0], "url": rows[0]["url"].replace("/paper/", "/zdup/")}
    )
    return planted, n


@pytest.mark.parametrize("mode", ["minhash", "winnow"])
@pytest.mark.slow
def test_near_dedup_pipeline_matches_clean_oracle(spark, tmp_path, mode):
    rows = synthetic_pages_rows(N_DOCS)
    planted, n_copies = _planted_rows(rows)
    assert n_copies >= 3, "fixture must plant at least 3 near-dup copies"

    dirty = Pipeline(
        spark, str(tmp_path / f"dirty_{mode}"), link=False, dedup_mode=mode
    )
    res_dirty = dirty.run(spark.createDataFrame(planted, PAGES_SCHEMA))
    clean = Pipeline(
        spark, str(tmp_path / f"clean_{mode}"), link=False, dedup_mode=mode
    )
    res_clean = clean.run(spark.createDataFrame(rows, PAGES_SCHEMA))

    # every planted copy is dropped; every original survives
    surv = {r["url"] for r in res_dirty["docs"].select("url").collect()}
    assert not any("/zcopy/" in u or "/zdup/" in u for u in surv), sorted(
        u for u in surv if "/z" in u
    )
    assert surv == {r["url"] for r in res_clean["docs"].select("url").collect()}

    # downstream tables match the dedup'd oracle exactly
    for key, cols in (
        ("entities", ["name", "mention_count", "sum_relevance_pct", "first_context"]),
        ("relationships", ["source_url", "target_url", "rel_type", "confidence_pct"]),
        ("triples", ["subj", "pred", "obj", "score_pct"]),
    ):
        got = {tuple(r) for r in res_dirty[key].select(*cols).collect()}
        exp = {tuple(r) for r in res_clean[key].select(*cols).collect()}
        assert got == exp, (key, sorted(got ^ exp)[:5])


@pytest.mark.slow
def test_near_dedup_stage_lineage_and_resume(spark, tmp_path):
    rows = synthetic_pages_rows(40)
    planted, _ = _planted_rows(rows, max_copies=2)
    out = str(tmp_path / "resume")
    pages = spark.createDataFrame(planted, PAGES_SCHEMA)

    p1 = Pipeline(spark, out, link=False, dedup_mode="winnow")
    p1.run(pages)
    assert "dedup" in p1._recomputed
    lin = p1.lineage().where("stage = 'dedup'")
    assert lin.count() >= 1
    assert lin.where("status = 'success'").count() == lin.count()

    # a second run resumes from the committed stage — nothing recomputed
    p2 = Pipeline(spark, out, link=False, dedup_mode="winnow")
    res2 = p2.run(pages)
    assert "dedup" not in p2._recomputed
    assert not any(
        "/zcopy/" in r["url"] for r in res2["docs"].select("url").collect()
    )


def test_dedup_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        Pipeline(spark, str(tmp_path / "bad"), dedup_mode="fuzzy")
