"""Driver-window gates for the link-graph tier (operators/links.py):
anchor extraction → href resolution → page edges → host graph, each
hash-pinned against a DuckDB twin that runs the IDENTICAL semantics.py
regexes (ANCHOR_TAG_RE / HREF_ATTR_RE / ANCHOR_TEXT_RE / URL_PARSE_RE —
the Java-regex ∩ RE2 subset) over html synthesized IDENTICALLY in both
engines from the documents table.

The members ride ``td_url_suite`` (gate_curation.py) so the exported
``queries()`` surface stays at exactly 50 (CLAUDE.md hard rule);
scripts/check_gate.py sweeps each member individually via
CURATION_MICRO_QUERIES.

The synthetic html covers every branch of the resolution rule: a messy
absolute href (case, :443, tracking param, fragment), a single-quoted
protocol-relative href on an uppercase <A> tag, a root-relative href
with extra attributes, a self-link that must vanish from link_edges,
and five dropped forms (mailto:, relative path, ftp://, nested markup,
unquoted href).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .gate_textdata import _docs

_BIG = "bigint"
_RE = S.URL_PARSE_RE


def _sql_norm(e: str) -> str:
    """DuckDB restatement of urls.normalize_url over the SQL expression
    ``e`` (a column name or scalar expression).  NULL-safe: NULL in →
    NULL out, scheme-less strings pass through unchanged."""
    scheme = f"lower(regexp_extract({e}, '{_RE}', 1))"
    auth = f"lower(regexp_extract({e}, '{_RE}', 2))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth}, ':80$', '')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({auth}, ':443$', '')"
        f" ELSE {auth} END"
    )
    path = (
        f"CASE WHEN regexp_extract({e}, '{_RE}', 3) = '' THEN '/'"
        f" ELSE regexp_extract({e}, '{_RE}', 3) END"
    )
    # COALESCE: DuckDB's array_to_string over an EMPTY list yields NULL
    # where Spark's array_join yields '' — bites every no-query URL.
    q2 = (
        f"coalesce(array_to_string(list_filter(string_split("
        f"regexp_extract({e}, '{_RE}', 4), '&'),"
        f" x -> x <> '' AND NOT regexp_matches(x, '{S.TRACKING_PARAM_RE}')), '&'), '')"
    )
    return (
        f"CASE WHEN regexp_extract({e}, '{_RE}', 1) = '' THEN {e}"
        f" ELSE {scheme} || '://' || {host} || {path}"
        f" || CASE WHEN {q2} = '' THEN '' ELSE '?' || {q2} END END"
    )


def _sql_domain(e: str) -> str:
    """DuckDB restatement of urls.registered_domain over ``e``."""
    host0 = f"regexp_replace(lower(regexp_extract({e}, '{_RE}', 2)), ':[0-9]+$', '')"
    two = rf"regexp_extract({host0}, '[^.]+\.[^.]+$', 0)"
    return f"CASE WHEN {two} = '' THEN {host0} ELSE {two} END"


def _sql_resolve(src: str, href: str) -> str:
    """DuckDB restatement of links.resolve_href (pre-normalization
    candidate): same branch order as the Column expression."""
    hscheme = f"lower(regexp_extract({href}, '{_RE}', 1))"
    sscheme = f"regexp_extract({src}, '{_RE}', 1)"
    sauth = f"regexp_extract({src}, '{_RE}', 2)"
    schemes = ", ".join(f"'{s}'" for s in S.LINK_SCHEMES)
    return (
        f"CASE WHEN {hscheme} <> '' THEN"
        f" (CASE WHEN {hscheme} IN ({schemes}) THEN {href} END)"
        f" WHEN {href} LIKE '//%' THEN"
        f" (CASE WHEN {sscheme} <> '' THEN {sscheme} || ':' || {href} END)"
        f" WHEN {href} LIKE '/%' THEN"
        f" (CASE WHEN {sscheme} <> '' THEN {sscheme} || '://' || {sauth} || {href} END)"
        f" END"
    )


# ---------------------------------------------------------------------------
# Shared synthetic link pages: html with anchors of every form, built
# identically from documents.doc_id in both engines.
# ---------------------------------------------------------------------------


def link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    host = F.element_at(
        F.array(
            F.lit("WWW.Alpha.ORG"),
            F.lit("News.Beta.NET"),
            F.lit("Gamma.COM:443"),
        ),
        (i % 3 + 1).cast("int"),
    )
    s = lambda c: c.cast("string")  # noqa: E731
    html = F.concat(
        F.lit('<a href="HTTPS://WWW.T'), s(i % 5),
        F.lit(".COM:443/t/"), s(i % 11),
        F.lit("?utm_source=x&q="), s(i % 7),
        F.lit('#f">to '), s(i % 11), F.lit("</a>"),
        F.lit("<A CLASS='x' HREF='//cdn.example.net/a/"), s(i % 13),
        F.lit("'>cdn asset</A>"),
        F.lit('<a rel="nofollow" href="/local/'), s(i % 17),
        F.lit('"> local page </a>'),
        F.lit('<a href="/p/'), s(i), F.lit('?gclid=t">self</a>'),
        F.lit('<a href="mailto:a@b.c">mail</a>'),
        F.lit('<a href="rel/'), s(i % 3), F.lit('">rel</a>'),
        F.lit('<a href="ftp://x.org/f">ftp</a>'),
        F.lit('<a href="/nested"><b>b</b></a>'),
        F.lit("<a href=/unq>unq</a>"),
    )
    return docs.select(
        F.concat(
            F.lit("HTTPS://"), host, F.lit("/p/"), s(i),
            F.lit("?gclid=t&utm_x=1#sec"), s(i),
        ).alias("url"),
        html.alias("html"),
    )


_DUCK_PAGES = """
p AS (
  SELECT
    'HTTPS://'
      || CASE doc_id % 3
           WHEN 0 THEN 'WWW.Alpha.ORG'
           WHEN 1 THEN 'News.Beta.NET'
           ELSE 'Gamma.COM:443' END
      || '/p/' || doc_id || '?gclid=t&utm_x=1#sec' || doc_id AS url,
    '<a href="HTTPS://WWW.T' || (doc_id % 5) || '.COM:443/t/' || (doc_id % 11)
      || '?utm_source=x&q=' || (doc_id % 7) || '#f">to ' || (doc_id % 11) || '</a>'
      || '<A CLASS=''x'' HREF=''//cdn.example.net/a/' || (doc_id % 13)
      || '''>cdn asset</A>'
      || '<a rel="nofollow" href="/local/' || (doc_id % 17) || '"> local page </a>'
      || '<a href="/p/' || doc_id || '?gclid=t">self</a>'
      || '<a href="mailto:a@b.c">mail</a>'
      || '<a href="rel/' || (doc_id % 3) || '">rel</a>'
      || '<a href="ftp://x.org/f">ftp</a>'
      || '<a href="/nested"><b>b</b></a>'
      || '<a href=/unq>unq</a>' AS html
  FROM documents
)"""

#: anchors → href/text → resolved+normalized dst_url (NULL = dropped)
_DUCK_LINKS = f"""
a AS (
  SELECT url, unnest(regexp_extract_all(html, '{S.ANCHOR_TAG_RE}')) AS anchor
  FROM p
),
x AS (
  SELECT url,
         regexp_extract(anchor, '{S.HREF_ATTR_RE}', 1) AS href,
         trim(regexp_extract(anchor, '{S.ANCHOR_TEXT_RE}', 1)) AS anchor_text
  FROM a
),
c AS (
  SELECT url, href, anchor_text, {_sql_resolve('url', 'href')} AS cand FROM x
),
links AS (
  SELECT url, href, anchor_text, {_sql_norm('cand')} AS dst_url
  FROM c WHERE {_sql_norm('cand')} IS NOT NULL
)"""

_DUCK_EDGES = f"""
edges AS (
  SELECT DISTINCT {_sql_norm('url')} AS src, dst_url AS dst
  FROM links WHERE {_sql_norm('url')} <> dst_url
)"""


# --- members ---------------------------------------------------------------


def q_links(spark, sf_dir):
    """links.extract_links: per-anchor (url, href, anchor_text, dst_url)
    — generate + projection only, zero exchanges."""
    from .operators.links import extract_links

    return extract_links(link_pages(spark, sf_dir)).select(
        "url", "href", "anchor_text", "dst_url"
    )


O_LINKS = (
    f"WITH {_DUCK_PAGES}, {_DUCK_LINKS} "
    "SELECT url, href, anchor_text, dst_url FROM links"
)


def q_link_edges(spark, sf_dir):
    """links.link_edges: distinct normalized (src, dst), self-loops
    dropped — ONE exchange."""
    from .operators.links import link_edges

    return link_edges(link_pages(spark, sf_dir)).select("src", "dst")


O_LINK_EDGES = (
    f"WITH {_DUCK_PAGES}, {_DUCK_LINKS}, {_DUCK_EDGES} "
    "SELECT src, dst FROM edges"
)


def q_host_graph(spark, sf_dir):
    """links.host_graph: (src_domain, dst_domain, n_links) over the
    distinct page edges, intra-domain edges dropped."""
    from .operators.links import host_graph

    return host_graph(link_pages(spark, sf_dir)).select(
        "src_domain",
        "dst_domain",
        F.col("n_links").cast(_BIG).alias("n_links"),
    )


O_HOST_GRAPH = (
    f"WITH {_DUCK_PAGES}, {_DUCK_LINKS}, {_DUCK_EDGES}, "
    f"d AS (SELECT {_sql_domain('src')} AS src_domain, "
    f"{_sql_domain('dst')} AS dst_domain FROM edges) "
    "SELECT src_domain, dst_domain, CAST(COUNT(*) AS BIGINT) AS n_links "
    "FROM d WHERE src_domain <> dst_domain "
    "GROUP BY src_domain, dst_domain"
)


_PROFILE_K = 2


def q_anchor_profile(spark, sf_dir):
    """links.anchor_text_profile: top-k anchor texts per resolved
    target — count agg + WindowGroupLimit rank."""
    from .operators.links import anchor_text_profile

    return anchor_text_profile(link_pages(spark, sf_dir), k=_PROFILE_K).select(
        "dst_url",
        "anchor_text",
        F.col("n_mentions").cast(_BIG).alias("n_mentions"),
        F.col("rank").cast(_BIG).alias("rank"),
    )


O_ANCHOR_PROFILE = (
    f"WITH {_DUCK_PAGES}, {_DUCK_LINKS}, "
    "g AS (SELECT dst_url, anchor_text, COUNT(*) AS n_mentions "
    "FROM links GROUP BY dst_url, anchor_text), "
    "r AS (SELECT dst_url, anchor_text, n_mentions, "
    "ROW_NUMBER() OVER (PARTITION BY dst_url "
    "ORDER BY n_mentions DESC, anchor_text ASC) AS rank FROM g) "
    "SELECT dst_url, anchor_text, CAST(n_mentions AS BIGINT) AS n_mentions, "
    f"CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {_PROFILE_K}"
)


#: folded into gate_curation's td_url_suite + CURATION_MICRO_* registries
LINK_SUITE_MEMBERS = [
    ("links", q_links, O_LINKS, ["url", "href", "anchor_text", "dst_url"]),
    ("link_edges", q_link_edges, O_LINK_EDGES, ["src", "dst"]),
    ("host_graph", q_host_graph, O_HOST_GRAPH,
     ["src_domain", "dst_domain", "n_links"]),
    ("anchor_profile", q_anchor_profile, O_ANCHOR_PROFILE,
     ["dst_url", "anchor_text", "n_mentions", "rank"]),
]
