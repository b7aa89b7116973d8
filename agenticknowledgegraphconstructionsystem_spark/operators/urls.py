"""URL curation over the pages table — the crawl-hygiene pass a
Common-Crawl-style pipeline runs before text work starts: URL
normalization, registered-domain extraction, latest-capture dedup,
domain blocklists, and per-domain caps.

The reference fetches papers by arXiv id and never sees messy web URLs;
this tier belongs to the brief's Common-Crawl first mile next to the
WARC source (sources/warc.py).

All parsing is regexp Columns from semantics.URL_PARSE_RE /
TRACKING_PARAM_RE (the Java-regex ∩ RE2 subset — the same discipline as
PII_PATTERNS) so the DuckDB twin in test_urls derives from the same
constants.  Spark's native ``parse_url`` is deliberately NOT used: its
semantics can't be reproduced oracle-side, and the regexp form stays in
whole-stage codegen anyway.

Scale shape: normalization/domain are pure projections (zero shuffle);
``latest_capture`` and ``cap_per_domain`` are one WindowGroupLimit
exchange each (rank pushdown, bounded per-group state — the same
discipline as sketches.stratified_sample_topk); the blocklist filter is
a broadcast anti-join (blocklists are KBs against TBs of pages)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import semantics as S
from ..functions.hashing import poly_hash_col


def url_parts(url: Column) -> dict[str, Column]:
    """→ {scheme, authority, path, query} via semantics.URL_PARSE_RE;
    all-empty for URLs without a scheme (regexp_extract no-match)."""
    return {
        name: F.regexp_extract(url, S.URL_PARSE_RE, g)
        for g, name in enumerate(("scheme", "authority", "path", "query"), start=1)
    }


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default port stripped
    (http:80 / https:443), fragment dropped, tracking params
    (semantics.TRACKING_PARAM_RE) removed, empty path → '/'.  URLs
    without a scheme pass through unchanged (no guessing)."""
    p = url_parts(url)
    scheme = F.lower(p["scheme"])
    host = F.lower(p["authority"])
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    query = F.array_join(
        F.filter(
            F.split(p["query"], "&"),
            lambda x: (x != "") & ~x.rlike(S.TRACKING_PARAM_RE),
        ),
        "&",
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(p["scheme"] == "", url).otherwise(rebuilt)


def registered_domain(url: Column) -> Column:
    """Last-two-labels heuristic over the (port-stripped, lowercased)
    host: news.example.org → example.org; single-label hosts pass
    through.  A production pipeline swaps in the public-suffix list —
    same column shape, broadcastable lookup."""
    host = F.regexp_replace(
        F.lower(url_parts(url)["authority"]), ":[0-9]+$", ""
    )
    two = F.regexp_extract(host, r"[^.]+\.[^.]+$", 0)
    return F.when(two == "", host).otherwise(two)


def add_url_columns(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """pages + (norm_url, domain) — pure projection, zero exchanges."""
    u = F.col(url_col)
    return pages.withColumn("norm_url", normalize_url(u)).withColumn(
        "domain", registered_domain(u)
    )


def latest_capture(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per NORMALIZED url — the newest capture (ties broken by
    raw url ASC, fully deterministic).  The crawl-dedup that keeps
    re-crawled pages from double-counting downstream.  Compiles to
    WindowGroupLimit on both sides of its single exchange."""
    w = Window.partitionBy("norm_url").orderBy(
        F.desc(ts_col), F.asc(url_col)
    )
    return (
        pages.withColumn("norm_url", normalize_url(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def filter_blocked_domains(
    pages: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """pages minus rows whose registered domain appears in ``blocked``
    (a 1-column DataFrame named ``domain``) — broadcast LEFT ANTI."""
    return (
        pages.withColumn("domain", registered_domain(F.col(url_col)))
        .join(F.broadcast(blocked.select("domain")), "domain", "left_anti")
        .drop("domain")
    )


def cap_per_domain(
    pages: DataFrame, k: int, url_col: str = "url"
) -> DataFrame:
    """At most ``k`` pages per registered domain, membership decided by
    the portable content-independent hash of the normalized url (ties by
    raw url ASC) — deterministic, stable under corpus growth for
    unchanged urls in the kept range, and bounded per-group state
    (WindowGroupLimit), exactly the stratified-sampling discipline of
    sketches.stratified_sample_topk."""
    w = Window.partitionBy("domain").orderBy(
        F.asc("_h"), F.asc(url_col)
    )
    return (
        pages.withColumn("domain", registered_domain(F.col(url_col)))
        .withColumn("_h", poly_hash_col(normalize_url(F.col(url_col))))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_h", "domain")
    )
