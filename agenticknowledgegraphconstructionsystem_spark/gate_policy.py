"""Driver-window gates for the page-policy tier (operators/policy.py):
rel=canonical extraction → robots directives → per-page policy →
canonical capture clusters, each hash-pinned against a DuckDB twin
running the IDENTICAL semantics.py regexes (LINK_TAG_RE / META_TAG_RE /
REL_CANONICAL_RE / NAME_ROBOTS_RE / CONTENT_ATTR_RE /
NOINDEX_TOKEN_RE / NOFOLLOW_TOKEN_RE) and the shared gate_links
resolve+normalize SQL over html synthesized IDENTICALLY in both
engines from the documents table.

The members ride ``td_url_suite`` (gate_curation.py) so the exported
``queries()`` surface stays at exactly 50; scripts/check_gate.py sweeps
each member individually via CURATION_MICRO_QUERIES.

The synthetic html covers every branch: an absolute canonical that
needs normalization (case, :443, tracking param), an uppercase <LINK>
with href BEFORE rel in single quotes, a protocol-relative canonical,
TWO canonicals where the first must win, a relative canonical that
drops (page keeps NULL), a page with no canonical, a stylesheet <link>
decoy on every page, robots metas in both cases/quote styles, a page
with TWO robots metas that OR together, an "index, follow" page, and
pages with no robots meta at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .gate_links import _sql_norm, _sql_resolve
from .gate_textdata import _docs

_BIG = "bigint"


def policy_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    decoy = F.lit('<link rel="stylesheet" href="/s.css">')
    canon = (
        F.when(
            i % 6 == 0,
            F.concat(
                F.lit('<link rel="canonical" href="HTTPS://Canon.EXAMPLE:443/c/'),
                s(i % 10), F.lit('?utm_a=1">'),
            ),
        )
        .when(
            i % 6 == 1,
            F.concat(
                F.lit("<LINK HREF='/c/"), s(i % 10), F.lit("' REL='canonical'>")
            ),
        )
        .when(
            i % 6 == 2,
            F.concat(
                F.lit('<link rel="canonical" href="//cdn.example/c/'),
                s(i % 10), F.lit('">'),
            ),
        )
        .when(
            i % 6 == 3,
            F.concat(
                F.lit('<link rel="canonical" href="/c/f'), s(i % 10),
                F.lit('"><link rel="canonical" href="/c/second">'),
            ),
        )
        .when(i % 6 == 4, F.lit('<link rel="canonical" href="rel/x">'))
        .otherwise(F.lit(""))
    )
    robots = (
        F.when(i % 5 == 0, F.lit('<meta name="robots" content="noindex, follow">'))
        .when(i % 5 == 1, F.lit("<META NAME='ROBOTS' CONTENT='NOFOLLOW'>"))
        .when(
            i % 5 == 2,
            F.lit(
                '<meta name="robots" content="nofollow">'
                '<meta name="robots" content="noindex">'
            ),
        )
        .when(i % 5 == 3, F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(F.lit('<meta name="viewport" content="w">'))
    )
    return docs.select(
        F.concat(F.lit("https://s"), s(i % 3), F.lit(".example/x/"), s(i)).alias(
            "url"
        ),
        F.concat(decoy, canon, robots).alias("html"),
    )


_DUCK_PAGES = """
p AS (
  SELECT
    'https://s' || (doc_id % 3) || '.example/x/' || doc_id AS url,
    '<link rel="stylesheet" href="/s.css">'
      || CASE doc_id % 6
           WHEN 0 THEN '<link rel="canonical" href="HTTPS://Canon.EXAMPLE:443/c/'
                       || (doc_id % 10) || '?utm_a=1">'
           WHEN 1 THEN '<LINK HREF=''/c/' || (doc_id % 10)
                       || ''' REL=''canonical''>'
           WHEN 2 THEN '<link rel="canonical" href="//cdn.example/c/'
                       || (doc_id % 10) || '">'
           WHEN 3 THEN '<link rel="canonical" href="/c/f' || (doc_id % 10)
                       || '"><link rel="canonical" href="/c/second">'
           WHEN 4 THEN '<link rel="canonical" href="rel/x">'
           ELSE '' END
      || CASE doc_id % 5
           WHEN 0 THEN '<meta name="robots" content="noindex, follow">'
           WHEN 1 THEN '<META NAME=''ROBOTS'' CONTENT=''NOFOLLOW''>'
           WHEN 2 THEN '<meta name="robots" content="nofollow">'
                       || '<meta name="robots" content="noindex">'
           WHEN 3 THEN '<meta name="robots" content="index, follow">'
           ELSE '<meta name="viewport" content="w">' END AS html
  FROM documents
)"""

_DUCK_CANON = f"""
la AS (
  SELECT url, regexp_extract_all(html, '{S.LINK_TAG_RE}') AS arr FROM p
),
lt AS (
  SELECT url, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS tag
  FROM la
),
lc AS (
  SELECT url, pos,
         {_sql_resolve('url', f"regexp_extract(tag, '{S.HREF_ATTR_RE}', 1)")} AS cand
  FROM lt WHERE regexp_matches(tag, '{S.REL_CANONICAL_RE}')
),
canon AS (
  SELECT url, min_by({_sql_norm('cand')}, pos) AS canonical_url
  FROM lc WHERE {_sql_norm('cand')} IS NOT NULL
  GROUP BY url
)"""

_DUCK_ROBOTS = f"""
ma AS (
  SELECT url, regexp_extract_all(html, '{S.META_TAG_RE}') AS arr FROM p
),
mt AS (SELECT url, unnest(arr) AS tag FROM ma),
rb AS (
  SELECT url, lower(regexp_extract(tag, '{S.CONTENT_ATTR_RE}', 1)) AS content
  FROM mt WHERE regexp_matches(tag, '{S.NAME_ROBOTS_RE}')
),
rr AS (
  SELECT url,
         bool_or(regexp_matches(content, '{S.NOINDEX_TOKEN_RE}')) AS noindex,
         bool_or(regexp_matches(content, '{S.NOFOLLOW_TOKEN_RE}')) AS nofollow
  FROM rb GROUP BY url
)"""

_DUCK_POLICY = """
pol AS (
  SELECT p.url,
         canon.canonical_url,
         coalesce(rr.noindex, FALSE) AS noindex,
         coalesce(rr.nofollow, FALSE) AS nofollow
  FROM p LEFT JOIN canon ON p.url = canon.url
         LEFT JOIN rr ON p.url = rr.url
)"""


# --- members ---------------------------------------------------------------


def q_canonical(spark, sf_dir):
    """policy.extract_canonical: first rel=canonical per page, resolved
    + normalized — ONE min_by exchange."""
    from .operators.policy import extract_canonical

    return extract_canonical(policy_pages(spark, sf_dir)).select(
        "url", "canonical_url"
    )


O_CANONICAL = (
    f"WITH {_DUCK_PAGES}, {_DUCK_CANON} "
    "SELECT url, canonical_url FROM canon"
)


def q_page_policy(spark, sf_dir):
    """policy.page_policy: one row per page with canonical + robots
    directives (absent → NULL / FALSE)."""
    from .operators.policy import page_policy

    return page_policy(policy_pages(spark, sf_dir)).select(
        "url",
        "canonical_url",
        F.col("noindex").cast(_BIG).alias("noindex"),
        F.col("nofollow").cast(_BIG).alias("nofollow"),
    )


O_PAGE_POLICY = (
    f"WITH {_DUCK_PAGES}, {_DUCK_CANON}, {_DUCK_ROBOTS}, {_DUCK_POLICY} "
    "SELECT url, canonical_url, CAST(noindex AS BIGINT) AS noindex, "
    "CAST(nofollow AS BIGINT) AS nofollow FROM pol"
)


def q_canonical_clusters(spark, sf_dir):
    """policy.canonical_clusters: capture groups keyed by effective
    canonical target, noindex pages excluded, min-url representative."""
    from .operators.policy import canonical_clusters

    return canonical_clusters(policy_pages(spark, sf_dir)).select(
        "canonical_target",
        "representative",
        F.col("n_pages").cast(_BIG).alias("n_pages"),
    )


O_CANONICAL_CLUSTERS = (
    f"WITH {_DUCK_PAGES}, {_DUCK_CANON}, {_DUCK_ROBOTS}, {_DUCK_POLICY} "
    f"SELECT coalesce(canonical_url, {_sql_norm('url')}) AS canonical_target, "
    "min(url) AS representative, CAST(COUNT(*) AS BIGINT) AS n_pages "
    "FROM pol WHERE NOT noindex GROUP BY 1"
)


#: folded into gate_curation's td_url_suite + CURATION_MICRO_* registries
POLICY_SUITE_MEMBERS = [
    ("canonical", q_canonical, O_CANONICAL, ["url", "canonical_url"]),
    ("page_policy", q_page_policy, O_PAGE_POLICY,
     ["url", "canonical_url", "noindex", "nofollow"]),
    ("canonical_clusters", q_canonical_clusters, O_CANONICAL_CLUSTERS,
     ["canonical_target", "representative", "n_pages"]),
]
