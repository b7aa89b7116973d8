"""Page-policy extraction: rel=canonical links and robots-meta
directives — the two in-page signals a Common-Crawl curation pass must
honor before indexing or deduplicating (the reference has no crawl
tier; this generalizes its per-paper "should this document enter the
graph" gating, run-validation.ts, to web-corpus semantics).

Pipeline shape::

    pages(url, html, ...) ── extract_canonical ──► (url, canonical_url)
                          ── robots_directives ──► (url, noindex, nofollow)
                          ── page_policy ────────► all of the above, one row/url
                          ── canonical_clusters ─► (canonical_target,
                                                    representative, n_pages)

Every stage is pure Column work from the ``semantics`` constants
(LINK_TAG_RE / META_TAG_RE / REL_CANONICAL_RE / NAME_ROBOTS_RE /
CONTENT_ATTR_RE / NOINDEX_TOKEN_RE — the Java-regex ∩ RE2 subset), so
the DuckDB twins in gate_policy.py run identical semantics.  Canonical
hrefs resolve through links.resolve_href (absolute / protocol-relative
/ root-relative; anything else drops) and normalize like every other
URL in the engine.  No UDFs anywhere.

Rules, not a parser: the FIRST rel=canonical link in document order
wins (Google's documented tie-break); robots directives are
comma-separated tokens matched on the lowercased content attribute;
multiple robots metas OR together (the restrictive union, per the
robots-meta spec).

Scale shape (100 TB): tag extraction is regexp_extract_all + posexplode
inside the scan stage; extract_canonical / robots_directives each
reduce with ONE map-side-combinable aggregate keyed on url (the
canonical pick's min_by carries the string payload it selects, so it
plans as SortAggregate — the A8 edge-upsert precedent in PLANS.md:
partial aggregation still collapses to one row per url before the
exchange, and the sort covers only canonical-tag rows);
page_policy joins the two aggregates back to the page list on url
(equi-joins on the same key — bucketing the pages table by url makes
them co-located); canonical_clusters is one more partial agg on the
cluster key.  Everything is linear in tag count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import semantics as S
from .links import resolve_href
from .urls import normalize_url


def _tags(pages: DataFrame, tag_re: str, url_col: str, html_col: str) -> DataFrame:
    """(url, pos, tag) for every whole-tag regex match, in document
    order.  Generate-only: no exchange."""
    html = F.col(html_col).cast("string")
    return pages.select(
        F.col(url_col),
        F.posexplode(
            F.regexp_extract_all(html, F.lit(tag_re), F.lit(0))
        ).alias("pos", "tag"),
    )


def extract_canonical(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, canonical_url): the FIRST rel=canonical <link> per page,
    href resolved against the page url and normalized; pages without a
    resolvable canonical are absent.  ONE exchange (min_by on url)."""
    cand = (
        _tags(pages, S.LINK_TAG_RE, url_col, html_col)
        .where(F.col("tag").rlike(S.REL_CANONICAL_RE))
        .select(
            url_col,
            "pos",
            resolve_href(
                F.col(url_col),
                F.regexp_extract("tag", S.HREF_ATTR_RE, 1),
            ).alias("cand"),
        )
        .where(F.col("cand").isNotNull())
    )
    return cand.groupBy(url_col).agg(
        F.min_by("cand", "pos").alias("canonical_url")
    )


def robots_directives(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, noindex, nofollow) for pages carrying at least one
    robots-meta tag; multiple tags OR together (restrictive union).
    ONE exchange (bool_or on url)."""
    metas = (
        _tags(pages, S.META_TAG_RE, url_col, html_col)
        .where(F.col("tag").rlike(S.NAME_ROBOTS_RE))
        .select(
            url_col,
            F.lower(F.regexp_extract("tag", S.CONTENT_ATTR_RE, 1)).alias(
                "content"
            ),
        )
    )
    return metas.groupBy(url_col).agg(
        F.max(F.col("content").rlike(S.NOINDEX_TOKEN_RE)).alias("noindex"),
        F.max(F.col("content").rlike(S.NOFOLLOW_TOKEN_RE)).alias("nofollow"),
    )


def page_policy(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per page: (url, canonical_url, noindex, nofollow) —
    canonical_url NULL when the page declares none (or it doesn't
    resolve), directives FALSE when absent.  Two aggregate exchanges +
    the equi-joins back on url."""
    base = pages.select(F.col(url_col))
    canon = extract_canonical(pages, url_col, html_col)
    robots = robots_directives(pages, url_col, html_col)
    return (
        base.join(canon, url_col, "left")
        .join(robots, url_col, "left")
        .select(
            url_col,
            "canonical_url",
            F.coalesce("noindex", F.lit(False)).alias("noindex"),
            F.coalesce("nofollow", F.lit(False)).alias("nofollow"),
        )
    )


def canonical_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Capture groups keyed by the page's effective canonical target —
    the declared canonical when present, else the page's own normalized
    url: (canonical_target, representative, n_pages).  The
    representative is the minimum member url (deterministic tie-break;
    CLAUDE.md forbids id-generation tie-breaks).  noindex pages are
    excluded first — they ask not to be indexed at all.  One more
    partial-agg exchange over page_policy."""
    pol = page_policy(pages, url_col, html_col)
    eff = (
        pol.where(~F.col("noindex"))
        .select(
            F.coalesce(
                F.col("canonical_url"), normalize_url(F.col(url_col))
            ).alias("canonical_target"),
            F.col(url_col),
        )
    )
    return eff.groupBy("canonical_target").agg(
        F.min(url_col).alias("representative"),
        F.count(F.lit(1)).alias("n_pages"),
    )
