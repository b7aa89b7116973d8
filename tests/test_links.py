"""Link-graph tier (operators/links.py): resolution-rule edge cases,
DuckDB twins over html synthesized identically in both engines from the
real sf0.001 documents table (the gate_links members), binary-html
plumbing, and the host-graph → pagerank composition."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.gate_links import (
    LINK_SUITE_MEMBERS,
    link_pages,
)
from agenticknowledgegraphconstructionsystem_spark.operators.links import (
    extract_anchors,
    extract_links,
    host_graph,
    link_edges,
    resolve_href,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_resolve_href_edge_cases(spark):
    src = "HTTPS://WWW.Example.ORG:443/dir/page?x=1"
    cases = {
        # absolute http(s): pass through + normalize (case, :443, tracking)
        "HTTP://Host.COM:80/A?utm_a=1&id=2": "http://host.com/A?id=2",
        "https://h.io/p": "https://h.io/p",
        # protocol-relative: source scheme
        "//cdn.example.net/a": "https://cdn.example.net/a",
        # root-relative: source scheme://authority (port re-stripped)
        "/top/x?gclid=1": "https://www.example.org/top/x",
        # dropped forms
        "ftp://files.example.org/f": None,
        "mailto:a@b.c": None,
        "javascript:void(0)": None,
        "rel/path/page": None,
        "#frag": None,
        "": None,
    }
    df = spark.createDataFrame([Row(href=h) for h in cases])
    got = {
        r["href"]: r["dst"]
        for r in df.select(
            "href", resolve_href(F.lit(src), F.col("href")).alias("dst")
        ).collect()
    }
    for href, want in cases.items():
        assert got[href] == want, href
    # scheme-less SOURCE: relative forms have no base → dropped
    df2 = spark.createDataFrame([Row(href="/x"), Row(href="//h.io/x")])
    assert [
        r["d"]
        for r in df2.select(
            resolve_href(F.lit("no-scheme-source"), F.col("href")).alias("d")
        ).collect()
    ] == [None, None]


def test_extract_anchors_rule(spark):
    html = (
        '<a href="/one">first</a>'
        "<A  DATA-X='1' HREF='/two'> padded text </A>"
        '<a href="/three"><b>nested markup drops whole anchor</b></a>'
        "<a href=/four>unquoted drops</a>"
        "<a name=anchor-no-href>no href</a>"
    )
    df = spark.createDataFrame([Row(url="https://e.org/p", html=html)])
    got = sorted(
        (r["href"], r["anchor_text"])
        for r in extract_anchors(df).collect()
    )
    assert got == [("/one", "first"), ("/two", "padded text")]


def test_extract_anchors_binary_html(spark):
    """The pages schema carries html as binary (WARC payload) — the
    operator casts; one row per matching anchor."""
    df = spark.createDataFrame(
        [Row(url="https://e.org/p", html=b'<a href="https://t.com/x">t</a>')],
        "url string, html binary",
    )
    rows = extract_links(df).collect()
    assert [(r["dst_url"], r["anchor_text"]) for r in rows] == [
        ("https://t.com/x", "t")
    ]


def _member_sql(name):
    return next(
        (sql, cols) for g, _fn, sql, cols in LINK_SUITE_MEMBERS if g == name
    )


def test_extract_links_matches_duckdb_twin(spark):
    pages = link_pages(spark, SF_DIR)
    got = sorted(
        (r["url"], r["href"], r["anchor_text"], r["dst_url"])
        for r in extract_links(pages).collect()
    )
    sql, _cols = _member_sql("links")
    assert got == _duck(sql)
    # non-vacuous: exactly the 4 resolving anchor forms per page survive
    n_pages = pages.count()
    assert len(got) == 4 * n_pages
    assert {h.split("/")[1] or "//" for _u, h, _t, _d in got} >= {"local", "p"}
    assert all("utm_" not in d and "#" not in d for _u, _h, _t, d in got)


def test_link_edges_matches_duckdb_twin(spark):
    pages = link_pages(spark, SF_DIR)
    got = sorted(
        (r["src"], r["dst"]) for r in link_edges(pages).collect()
    )
    sql, _cols = _member_sql("link_edges")
    assert got == _duck(sql)
    # self-links vanished; every endpoint is normalized (lowercase scheme,
    # no tracking params, no fragments)
    assert all(s != d for s, d in got)
    assert all(
        u.startswith("https://") and "utm_" not in u and "#" not in u
        for e in got
        for u in e
    )


def test_host_graph_matches_duckdb_twin(spark):
    pages = link_pages(spark, SF_DIR)
    got = sorted(
        (r["src_domain"], r["dst_domain"], r["n_links"])
        for r in host_graph(pages).collect()
    )
    sql, _cols = _member_sql("host_graph")
    assert got == _duck(sql)
    # intra-domain edges are gone; cdn + t*.com targets present
    assert all(s != d for s, d, _n in got)
    assert {d for _s, d, _n in got} >= {"example.net"}


def test_anchor_text_profile_matches_duckdb_twin(spark):
    from agenticknowledgegraphconstructionsystem_spark.gate_links import (
        _PROFILE_K,
        q_anchor_profile,
    )

    got = sorted(
        tuple(r) for r in q_anchor_profile(spark, SF_DIR).collect()
    )
    sql, _cols = _member_sql("anchor_profile")
    assert got == _duck(sql)
    # bounded per target, ranks contiguous from 1
    per = {}
    for dst, _t, _n, rank in got:
        per.setdefault(dst, []).append(rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= _PROFILE_K
               for v in per.values())


def test_pipeline_link_graph_stages(spark, tmp_path):
    """Pipeline(link_graph=True) commits page-level edges + host-rank
    stages over the RAW pages html, with lineage + resume like every
    stage, matching the standalone operators exactly."""
    from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import (
        Pipeline,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
        synthetic_pages,
    )

    base = synthetic_pages(spark, 40)
    # synthetic html carries no anchors — append one absolute + one
    # root-relative per page (binary html stays binary)
    pages = base.withColumn(
        "html",
        F.concat(
            F.col("html").cast("string"),
            F.lit('<a href="https://hub.example.com/h">hub</a>'),
            F.concat(
                F.lit('<a href="/next/'),
                F.crc32(F.col("url")) % 7,
                F.lit('">next</a>'),
            ),
        ).cast("binary"),
    )
    p = Pipeline(spark, str(tmp_path / "lg"), run_id="l1", link_graph=True)
    r = p.run(pages)
    assert {"link_graph", "host_rank"} <= set(p._recomputed)
    got_edges = sorted(map(tuple, r["link_graph"].collect()))
    want_edges = sorted(map(tuple, link_edges(pages).collect()))
    assert got_edges == want_edges and len(got_edges) > 0
    hr = {row["node"]: row["pr"] for row in r["host_rank"].collect()}
    # hosts are REGISTERED domains; the hub (example.com) is linked from
    # every page while example.org only links out (its /next self-links
    # are intra-domain and dropped by the rollup)
    assert set(hr) == {"example.org", "example.com"}
    assert hr["example.com"] > hr["example.org"]
    assert p.lineage().where("stage = 'link_graph'").count() >= 1

    # full resume: nothing recomputes
    p2 = Pipeline(spark, str(tmp_path / "lg"), run_id="l2", link_graph=True)
    p2.run(pages)
    assert p2._recomputed == []

    # kill only host_rank -> only it recomputes, result unchanged
    p2.store.uncommit("host_rank")
    p3 = Pipeline(spark, str(tmp_path / "lg"), run_id="l3", link_graph=True)
    r3 = p3.run(pages)
    assert p3._recomputed == ["host_rank"]
    assert {row["node"]: row["pr"] for row in r3["host_rank"].collect()} == hr


def test_host_graph_pagerank_composition(spark):
    """host_graph feeds pagerank_fixed_point unchanged — deterministic
    int64 scores, one row per host, repeat-run bit-identical."""
    from agenticknowledgegraphconstructionsystem_spark.operators.graph import (
        pagerank_fixed_point,
    )

    hg = host_graph(link_pages(spark, SF_DIR))
    pr = pagerank_fixed_point(
        hg, src="src_domain", dst="dst_domain", iters=4
    )
    rows = {r["node"]: r["pr"] for r in pr.collect()}
    nodes = set()
    for r in hg.collect():
        nodes.update((r["src_domain"], r["dst_domain"]))
    assert set(rows) == nodes
    assert all(isinstance(v, int) and v > 0 for v in rows.values())
    rows2 = {
        r["node"]: r["pr"]
        for r in pagerank_fixed_point(
            hg, src="src_domain", dst="dst_domain", iters=4
        ).collect()
    }
    assert rows == rows2


def test_pipeline_host_hits_stage(spark, tmp_path):
    """link_graph=True also commits HITS over the host rollup: the hub
    domain (example.org, pure out-pointer) and the authority
    (example.com, pure in-target) split roles — and the stage equals
    the standalone operator."""
    from agenticknowledgegraphconstructionsystem_spark.operators.graph import (
        hits_scores,
    )
    from agenticknowledgegraphconstructionsystem_spark.operators.links import (
        host_rollup,
    )
    from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import (
        Pipeline,
    )
    from agenticknowledgegraphconstructionsystem_spark.sources.pages import (
        synthetic_pages,
    )

    base = synthetic_pages(spark, 20)
    pages = base.withColumn(
        "html",
        F.concat(
            F.col("html").cast("string"),
            F.lit('<a href="https://hub.example.com/h">hub</a>'),
        ).cast("binary"),
    )
    p = Pipeline(spark, str(tmp_path / "hh"), run_id="h1", link_graph=True)
    r = p.run(pages)
    got = {row["node"]: (row["hub"], row["authority"])
           for row in r["host_hits"].collect()}
    assert got["example.org"] == (1.0, 0.0)
    assert got["example.com"] == (0.0, 1.0)
    hosts = host_rollup(r["link_graph"]).select("src_domain", "dst_domain")
    want = {row["node"]: (row["hub"], row["authority"])
            for row in hits_scores(hosts, src="src_domain",
                                   dst="dst_domain", iters=8).collect()}
    assert got == want
