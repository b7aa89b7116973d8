"""Page-policy tier (operators/policy.py): canonical extraction rules,
robots-directive token semantics, cluster keying — the branches beyond
the DuckDB gate (binary html plumbing, dropped canonical schemes,
token-boundary negatives) plus the plan-shape contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators.policy import (
    canonical_clusters,
    extract_canonical,
    page_policy,
    robots_directives,
)


def _pages(spark, rows, schema="url string, html string"):
    return spark.createDataFrame(rows, schema)


def test_canonical_first_wins_and_drops(spark):
    pages = _pages(
        spark,
        [
            # first canonical wins over the second
            (
                "https://a.example/p?utm_x=1",
                '<link rel="canonical" href="/one">'
                '<link rel="canonical" href="/two">',
            ),
            # javascript: scheme drops → page absent
            ("https://b.example/p", '<link rel="canonical" href="javascript:x()">'),
            # stylesheet decoy only → absent
            ("https://c.example/p", '<link rel="stylesheet" href="/s.css">'),
        ],
    )
    got = {r["url"]: r["canonical_url"] for r in extract_canonical(pages).collect()}
    assert got == {"https://a.example/p?utm_x=1": "https://a.example/one"}


def test_robots_token_boundaries(spark):
    """'noindexing' must NOT trip noindex; tokens match on comma
    boundaries of the lowercased content."""
    pages = _pages(
        spark,
        [
            ("u1", '<meta name="robots" content="noindexing, follow">'),
            ("u2", '<meta name="robots" content="all, NOINDEX">'),
            ("u3", '<meta name="robots" content="nofollow,noindex">'),
        ],
    )
    got = {
        r["url"]: (r["noindex"], r["nofollow"])
        for r in robots_directives(pages).collect()
    }
    assert got == {
        "u1": (False, False),
        "u2": (True, False),
        "u3": (True, True),
    }


def test_page_policy_defaults_and_binary_html(spark):
    """Pages without tags get (NULL, false, false); html may arrive as
    binary (WARC payload) — cast-to-string plumbing shared with the
    link tier."""
    pages = spark.createDataFrame(
        [
            ("u1", bytearray(b'<link rel="canonical" href="https://x.example/c">')),
            ("u2", bytearray(b"<p>nothing</p>")),
        ],
        "url string, html binary",
    )
    got = {
        r["url"]: (r["canonical_url"], r["noindex"], r["nofollow"])
        for r in page_policy(pages).collect()
    }
    assert got == {
        "u1": ("https://x.example/c", False, False),
        "u2": (None, False, False),
    }


def test_clusters_exclude_noindex_and_key_by_effective_target(spark):
    pages = _pages(
        spark,
        [
            ("https://a.example/1", '<link rel="canonical" href="/c">'),
            ("https://a.example/2?utm_y=2", '<link rel="canonical" href="/c">'),
            # noindex page pointing at the same canonical: excluded
            (
                "https://a.example/3",
                '<link rel="canonical" href="/c">'
                '<meta name="robots" content="noindex">',
            ),
            # no canonical → keyed by its own normalized url
            ("https://b.example/solo?utm_z=1", "<p>x</p>"),
        ],
    )
    got = {
        r["canonical_target"]: (r["representative"], r["n_pages"])
        for r in canonical_clusters(pages).collect()
    }
    assert got == {
        "https://a.example/c": ("https://a.example/1", 2),
        "https://b.example/solo": ("https://b.example/solo?utm_z=1", 1),
    }


def test_policy_plan_shape(spark):
    """Scale contract: extract_canonical and robots_directives each ONE
    aggregate exchange; nothing quadratic.  The canonical pick's min_by
    carries a string payload so it plans as SortAggregate — the A8
    edge-upsert precedent (PLANS.md): the string IS the value being
    selected, partial aggregation still collapses to one row per url
    before the exchange, and the sort covers only the canonical-tag
    rows, not the pages.  robots_directives stays pure HashAggregate."""
    pages = _pages(spark, [("u1", '<link rel="canonical" href="/c">')])
    for df, allow_sortagg in [
        (extract_canonical(pages), True),
        (robots_directives(pages), False),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        if not allow_sortagg:
            assert "SortAggregate" not in plan, plan
        else:
            assert "partial_min_by" in plan, plan  # map-side combine intact
        assert "CartesianProduct" not in plan, plan