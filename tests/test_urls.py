"""URL curation (operators/urls.py): normalization edge cases + DuckDB
twins for every operator over messy URLs synthesized identically in both
engines from the real sf0.001 documents table (kept out of the pinned
50-query surface)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark import semantics as S
from agenticknowledgegraphconstructionsystem_spark.gate_textdata import _sql_poly
from agenticknowledgegraphconstructionsystem_spark.operators.urls import (
    add_url_columns,
    cap_per_domain,
    filter_blocked_domains,
    latest_capture,
    normalize_url,
    registered_domain,
)

SF_DIR = "/root/testdata/sf0.001"


def test_normalize_and_domain_edge_cases(spark):
    cases = {
        # lowercased scheme+host, default port stripped, fragment dropped
        "HTTPS://WWW.Example.ORG:443/A/b?x=1#frag": "https://www.example.org/A/b?x=1",
        "http://Host.Com:80": "http://host.com/",
        # non-default port kept; tracking params dropped, others kept
        "https://h.io:8443/p?utm_source=rss&id=3&gclid=z": "https://h.io:8443/p?id=3",
        # ALL params tracking → no '?'
        "http://a.b/p?utm_a=1&utm_b=2": "http://a.b/p",
        # no scheme → passthrough, untouched
        "example.org/path?utm_x=1": "example.org/path?utm_x=1",
    }
    df = spark.createDataFrame([Row(url=u) for u in cases])
    got = {
        r["url"]: (r["n"], r["d"])
        for r in df.select(
            "url",
            normalize_url(F.col("url")).alias("n"),
            registered_domain(F.col("url")).alias("d"),
        ).collect()
    }
    for u, n in cases.items():
        assert got[u][0] == n, u
    assert got["HTTPS://WWW.Example.ORG:443/A/b?x=1#frag"][1] == "example.org"
    assert got["http://Host.Com:80"][1] == "host.com"
    assert got["https://h.io:8443/p?utm_source=rss&id=3&gclid=z"][1] == "h.io"
    assert got["example.org/path?utm_x=1"][1] == ""  # no authority → no domain


def _spark_pages(spark):
    """Messy crawl URLs from the real documents table — urls collide
    after normalization (the fragment carries doc_id), three domains,
    tracking params throughout; cap_seq stands in for warc_ts."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    host = F.element_at(
        F.array(
            F.lit("WWW.Example.org:443"),
            F.lit("News.Example.NET"),
            F.lit("Spam.Tracker.com:8080"),
        ),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            host,
            F.lit("/Page/"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit("?id="),
            (F.col("doc_id") % 37).cast("string"),
            F.lit("&utm_campaign=x&gclid=abc#sec"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("doc_id").alias("cap_seq"),
    )


_DUCK_PAGES = """
p AS (
  SELECT doc_id,
         'HTTPS://'
           || CASE doc_id % 3
                WHEN 0 THEN 'WWW.Example.org:443'
                WHEN 1 THEN 'News.Example.NET'
                ELSE 'Spam.Tracker.com:8080' END
           || '/Page/' || (doc_id % 37) || '?id=' || (doc_id % 37)
           || '&utm_campaign=x&gclid=abc#sec' || doc_id AS url,
         doc_id AS cap_seq
  FROM documents
)"""

_DUCK_NORM = f"""
n AS (
  SELECT doc_id, url, cap_seq,
         regexp_extract(url, '{S.URL_PARSE_RE}', 1) AS scheme_raw,
         lower(regexp_extract(url, '{S.URL_PARSE_RE}', 1)) AS scheme,
         lower(regexp_extract(url, '{S.URL_PARSE_RE}', 2)) AS auth,
         regexp_extract(url, '{S.URL_PARSE_RE}', 3) AS path,
         regexp_extract(url, '{S.URL_PARSE_RE}', 4) AS query
  FROM p
),
n2 AS (
  SELECT doc_id, url, cap_seq, scheme_raw, scheme,
         CASE WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
              ELSE auth END AS host,
         CASE WHEN path = '' THEN '/' ELSE path END AS path2,
         coalesce(array_to_string(
           list_filter(string_split(query, '&'),
                       x -> x <> '' AND NOT regexp_matches(x, '{S.TRACKING_PARAM_RE}')),
           '&'), '') AS q2,
         regexp_replace(auth, ':[0-9]+$', '') AS host0
  FROM n
),
norm AS (
  SELECT doc_id, url, cap_seq,
         CASE WHEN scheme_raw = '' THEN url
              ELSE scheme || '://' || host || path2
                   || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END
         END AS norm_url,
         CASE WHEN regexp_extract(host0, '[^.]+\\.[^.]+$', 0) = '' THEN host0
              ELSE regexp_extract(host0, '[^.]+\\.[^.]+$', 0) END AS domain
  FROM n2
)"""


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_add_url_columns_matches_duckdb_twin(spark):
    pages = _spark_pages(spark)
    got = sorted(
        (r["doc_id"], r["norm_url"], r["domain"])
        for r in add_url_columns(pages).collect()
    )
    want = _duck(
        f"WITH {_DUCK_PAGES}, {_DUCK_NORM} "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, norm_url, domain FROM norm"
    )
    assert got == want
    # non-vacuous: collisions exist and tracking params are gone
    assert len({n for _d, n, _dom in got}) < len(got)
    assert all("utm_" not in n and "#" not in n for _d, n, _dom in got)


def test_latest_capture_matches_duckdb_twin(spark):
    pages = _spark_pages(spark)
    got = sorted(
        (r["doc_id"], r["url"], r["cap_seq"], r["norm_url"])
        for r in latest_capture(pages, ts_col="cap_seq").collect()
    )
    want = _duck(
        f"WITH {_DUCK_PAGES}, {_DUCK_NORM}, "
        "r AS (SELECT doc_id, url, cap_seq, norm_url, "
        "ROW_NUMBER() OVER (PARTITION BY norm_url ORDER BY cap_seq DESC, url ASC) AS rn "
        "FROM norm) "
        "SELECT CAST(doc_id AS BIGINT), url, CAST(cap_seq AS BIGINT), norm_url "
        "FROM r WHERE rn = 1"
    )
    assert got == want
    assert len(got) < 500  # captures actually collapsed


def test_cap_per_domain_matches_duckdb_twin(spark):
    k = 5
    pages = _spark_pages(spark)
    got = sorted(
        (r["doc_id"], r["url"]) for r in cap_per_domain(pages, k).collect()
    )
    want = _duck(
        f"WITH {_DUCK_PAGES}, {_DUCK_NORM}, "
        f"h AS (SELECT doc_id, url, domain, {_sql_poly('norm_url')} AS hh FROM norm), "
        "r AS (SELECT doc_id, url, "
        "ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hh ASC, url ASC) AS rn "
        "FROM h) "
        f"SELECT CAST(doc_id AS BIGINT), url FROM r WHERE rn <= {k}"
    )
    assert got == want
    assert len(got) == 15  # 3 domains × k


def test_filter_blocked_domains_matches_duckdb_twin(spark):
    pages = _spark_pages(spark)
    blocked = spark.createDataFrame([Row(domain="tracker.com")])
    got = sorted(
        (r["doc_id"], r["url"])
        for r in filter_blocked_domains(pages, blocked).collect()
    )
    want = _duck(
        f"WITH {_DUCK_PAGES}, {_DUCK_NORM} "
        "SELECT CAST(doc_id AS BIGINT), url FROM norm WHERE domain <> 'tracker.com'"
    )
    assert got == want
    assert 0 < len(got) < 500  # something was actually blocked
