"""Driver-window gates for the sitemap/feed discovery tier
(operators/sitemaps.py): <urlset> entries, <sitemapindex> children,
RSS/Atom feed items, robots.txt ``Sitemap:`` directives, and the
composed ``discovered_urls`` crawl frontier — each hash-pinned against
a DuckDB twin that replays the IDENTICAL semantics (the SITEMAP_*/
XML_*/RSS_*/ATOM_* regexes, strip→unescape→keep-http(s)→normalize) over
XML synthesized IDENTICALLY in both engines from the documents table.

The members ride ``td_url_suite`` (gate_curation.py) so the exported
``queries()`` surface stays at exactly 50; scripts/check_gate.py sweeps
each member individually via CURATION_MICRO_QUERIES.

Fixture synthesis uses ONE template string per document kind, expanded
into a Spark concat AND a DuckDB ``||`` expression by the same
tokenizer (``{m3}`` → ``doc_id % 3`` etc.), so the engines hold
byte-identical bodies — newlines included (chr(10) on the SQL side).
The bodies cover: newline-indented <loc> (XML_STRIP_WS_RE, not trim),
``&amp;`` escapes feeding the tracking-param cut, uppercase host +
default :443/:80 ports, relative and ftp locs (dropped whole), missing
optional children (NULL), channel-level RSS <link> outside <item>
(must NOT extract), a linkless item and a mailto: Atom entry (dropped),
and — for ``discovered_urls`` — anchor/sitemap/feed references that
merge on one normalized url plus a crawled self-reference.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .gate_links import _sql_domain, _sql_norm, _sql_resolve
from .gate_robots import _sql_lit
from .gate_textdata import _docs

_BIG = "bigint"


# ---------------------------------------------------------------------------
# Template expansion — one string, two engines
# ---------------------------------------------------------------------------

#: token → DuckDB expression (Spark twin in _token_col)
_TOKEN_SQL = {
    "id": "doc_id",
    "m2": "(doc_id % 2)",
    "m3": "(doc_id % 3)",
    "m4": "(doc_id % 4)",
    "m5": "(doc_id % 5)",
    "m7": "(doc_id % 7)",
    "m11": "(doc_id % 11)",
    "p9": "(doc_id % 9 + 1)",
    "t5": "(doc_id + 5)",
    "t3": "((doc_id + 5) % 3)",
}

_TOKEN_RE = re.compile(r"\{(\w+)\}")


def _token_col(name: str) -> Column:
    i = F.col("doc_id")
    expr = {
        "id": i,
        "m2": i % 2,
        "m3": i % 3,
        "m4": i % 4,
        "m5": i % 5,
        "m7": i % 7,
        "m11": i % 11,
        "p9": i % 9 + 1,
        "t5": i + 5,
        "t3": (i + 5) % 3,
    }[name]
    return expr.cast("string")


def tmpl_col(tmpl: str) -> Column:
    """Template → Spark concat Column over doc_id."""
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN_RE.finditer(tmpl):
        if m.start() > pos:
            parts.append(F.lit(tmpl[pos : m.start()]))
        parts.append(_token_col(m.group(1)))
        pos = m.end()
    if pos < len(tmpl):
        parts.append(F.lit(tmpl[pos:]))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def tmpl_sql(tmpl: str) -> str:
    """Template → DuckDB ``||`` expression; newlines → chr(10)."""
    parts: list[str] = []
    pos = 0
    for m in _TOKEN_RE.finditer(tmpl):
        if m.start() > pos:
            parts.append(_sql_lit(tmpl[pos : m.start()]))
        parts.append(_TOKEN_SQL[m.group(1)])
        pos = m.end()
    if pos < len(tmpl):
        parts.append(_sql_lit(tmpl[pos:]))
    return "(" + " || ".join(parts) + ")"


# ---------------------------------------------------------------------------
# DuckDB restatements of the clean/keep/normalize rules
# ---------------------------------------------------------------------------


def _sql_unesc(e: str) -> str:
    """sitemaps.xml_unescape over SQL expression ``e`` — same entity
    order (&amp; last)."""
    out = e
    for ent, ch in S.XML_ENTITIES:
        out = f"replace({out}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return out


def _sql_clean(e: str) -> str:
    """sitemaps._clean: strip (global regexp_replace — DuckDB defaults
    to first-match-only, Spark to all, hence the 'g' flag) → unescape →
    '' → NULL."""
    stripped = f"regexp_replace({e}, '{S.XML_STRIP_WS_RE}', '', 'g')"
    return f"nullif({_sql_unesc(stripped)}, '')"


def _sql_abs(e: str) -> str:
    """sitemaps.abs_http_url over a (cleaned) column name ``e``."""
    scheme = f"lower(regexp_extract({e}, '{S.URL_PARSE_RE}', 1))"
    schemes = ", ".join(f"'{s}'" for s in S.LINK_SCHEMES)
    return f"CASE WHEN {scheme} IN ({schemes}) THEN {_sql_norm(e)} END"


# ---------------------------------------------------------------------------
# Fixtures — template per document kind
# ---------------------------------------------------------------------------

_URLSET_TMPL = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    " <url>\n"
    "  <loc>\n"
    "    HTTPS://WWW.S{m3}.EXAMPLE:443/a/{m7}?x={m11}&amp;utm_source=m\n"
    "  </loc>\n"
    "  <lastmod>2025-01-0{p9}</lastmod>\n"
    "  <changefreq>daily</changefreq>\n"
    "  <priority>0.{m7}</priority>\n"
    " </url>\n"
    " <url><loc>/rel/{m4}</loc></url>\n"
    " <url><loc>ftp://x.org/{id}</loc></url>\n"
    " <url>\n"
    "  <loc>http://s{m3}.example/b/{m11}</loc>\n"
    " </url>\n"
    "</urlset>"
)

_INDEX_TMPL = (
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    " <sitemap>\n"
    "  <loc> https://www.s{m3}.example/maps/part{m4}.xml?a={m5}&amp;b={m7} </loc>\n"
    "  <lastmod>2025-02-0{p9}</lastmod>\n"
    " </sitemap>\n"
    " <sitemap><loc>part-rel{m4}.xml</loc></sitemap>\n"
    " <sitemap><loc>HTTP://S{m3}.EXAMPLE:80/maps/root.xml</loc></sitemap>\n"
    "</sitemapindex>"
)

_RSS_TMPL = (
    '<rss version="2.0">\n'
    " <channel>\n"
    "  <title>chan {m5}</title>\n"
    "  <link>https://www.s{m3}.example/</link>\n"
    "  <item>\n"
    "   <title>Post {m7} &amp; friends</title>\n"
    "   <link> HTTPS://WWW.S{m3}.EXAMPLE/post/{id}?utm_y=2 </link>\n"
    "   <pubDate>Mon, 0{p9} Jan 2025</pubDate>\n"
    "  </item>\n"
    "  <item><title>linkless {m4}</title></item>\n"
    "  <item><link>rel/{m4}</link><title>rel</title></item>\n"
    " </channel>\n"
    "</rss>"
)

_ATOM_TMPL = (
    '<feed xmlns="http://www.w3.org/2005/Atom">\n'
    " <title>feed {m5}</title>\n"
    " <entry>\n"
    "  <title>Entry {m7}</title>\n"
    '  <link rel="alternate" href="https://www.s{m3}.example/atom/{id}'
    '?gclid=z&amp;q={m5}"/>\n'
    "  <updated>2025-03-0{p9}</updated>\n"
    " </entry>\n"
    ' <entry><title>mail</title><link href="mailto:a@b.c"/></entry>\n'
    "</feed>"
)

# discovered_urls fixture: k = doc_id % 5 picks the page kind
_HTML0_TMPL = (
    '<a href="https://www.s{t3}.example/p/{t5}">next</a>'
    '<a href="/local/{m7}">loc</a>'
)
_HTML1_TMPL = (
    '<a href="HTTPS://WWW.S{m3}.EXAMPLE:443/a/{m7}?x={m11}&utm_z=1">x</a>'
)

_URL0_TMPL = "https://www.s{m3}.example/p/{id}"
_URL1_TMPL = "https://www.s{m3}.example/q/{id}"
_URL2_TMPL = "https://www.s{m3}.example/sitemap{m2}.xml"
_URL3_TMPL = "https://www.s{m3}.example/feed{m2}.rss"
_URL4_TMPL = "https://www.s{m3}.example/atom{m2}.xml"
_URLI_TMPL = "https://www.s{m3}.example/sitemap-index{m2}.xml"


def urlset_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        tmpl_col(_URL2_TMPL).alias("url"), tmpl_col(_URLSET_TMPL).alias("html")
    )


def index_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        tmpl_col(_URLI_TMPL).alias("url"), tmpl_col(_INDEX_TMPL).alias("html")
    )


def feed_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternating RSS / Atom bodies keyed on doc_id % 2."""
    even = F.col("doc_id") % 2 == 0
    return _docs(spark, sf_dir).select(
        F.when(even, tmpl_col(_URL3_TMPL))
        .otherwise(tmpl_col(_URL4_TMPL))
        .alias("url"),
        F.when(even, tmpl_col(_RSS_TMPL))
        .otherwise(tmpl_col(_ATOM_TMPL))
        .alias("html"),
    )


def mixed_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The discovered_urls corpus: html (2 kinds), urlset, RSS, Atom
    keyed on doc_id % 5; every page url is also a crawl capture."""
    k = F.col("doc_id") % 5
    url = (
        F.when(k == 0, tmpl_col(_URL0_TMPL))
        .when(k == 1, tmpl_col(_URL1_TMPL))
        .when(k == 2, tmpl_col(_URL2_TMPL))
        .when(k == 3, tmpl_col(_URL3_TMPL))
        .otherwise(tmpl_col(_URL4_TMPL))
    )
    body = (
        F.when(k == 0, tmpl_col(_HTML0_TMPL))
        .when(k == 1, tmpl_col(_HTML1_TMPL))
        .when(k == 2, tmpl_col(_URLSET_TMPL))
        .when(k == 3, tmpl_col(_RSS_TMPL))
        .otherwise(tmpl_col(_ATOM_TMPL))
    )
    return _docs(spark, sf_dir).select(url.alias("url"), body.alias("html"))


_DUCK_URLSET_PAGES = (
    f"p AS (SELECT doc_id, {tmpl_sql(_URL2_TMPL)} AS url, "
    f"{tmpl_sql(_URLSET_TMPL)} AS body FROM documents)"
)

_DUCK_INDEX_PAGES = (
    f"p AS (SELECT doc_id, {tmpl_sql(_URLI_TMPL)} AS url, "
    f"{tmpl_sql(_INDEX_TMPL)} AS body FROM documents)"
)

_DUCK_FEED_PAGES = (
    "p AS (SELECT doc_id, "
    f"CASE WHEN doc_id % 2 = 0 THEN {tmpl_sql(_URL3_TMPL)} "
    f"ELSE {tmpl_sql(_URL4_TMPL)} END AS url, "
    f"CASE WHEN doc_id % 2 = 0 THEN {tmpl_sql(_RSS_TMPL)} "
    f"ELSE {tmpl_sql(_ATOM_TMPL)} END AS body FROM documents)"
)

_DUCK_MIXED_PAGES = (
    "p AS (SELECT doc_id, "
    "CASE doc_id % 5 "
    f"WHEN 0 THEN {tmpl_sql(_URL0_TMPL)} "
    f"WHEN 1 THEN {tmpl_sql(_URL1_TMPL)} "
    f"WHEN 2 THEN {tmpl_sql(_URL2_TMPL)} "
    f"WHEN 3 THEN {tmpl_sql(_URL3_TMPL)} "
    f"ELSE {tmpl_sql(_URL4_TMPL)} END AS url, "
    "CASE doc_id % 5 "
    f"WHEN 0 THEN {tmpl_sql(_HTML0_TMPL)} "
    f"WHEN 1 THEN {tmpl_sql(_HTML1_TMPL)} "
    f"WHEN 2 THEN {tmpl_sql(_URLSET_TMPL)} "
    f"WHEN 3 THEN {tmpl_sql(_RSS_TMPL)} "
    f"ELSE {tmpl_sql(_ATOM_TMPL)} END AS body FROM documents)"
)


# ---------------------------------------------------------------------------
# Members
# ---------------------------------------------------------------------------


def q_sitemap_entries(spark, sf_dir):
    """sitemaps.sitemap_url_entries: strip/unescape/keep/normalize over
    <urlset> blocks — generate + projection, zero exchanges."""
    from .operators.sitemaps import sitemap_url_entries

    return sitemap_url_entries(urlset_pages(spark, sf_dir)).select(
        "sitemap_url", "loc", "lastmod", "changefreq", "priority"
    )


O_SITEMAP_ENTRIES = f"""
WITH {_DUCK_URLSET_PAGES},
b AS (
  SELECT url AS sitemap_url,
         unnest(regexp_extract_all(body, '{S.SITEMAP_URL_BLOCK_RE}')) AS blk
  FROM p
),
c AS (
  SELECT sitemap_url,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_LOC_RE}', 1)")} AS loc_raw,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_LASTMOD_RE}', 1)")} AS lastmod,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_CHANGEFREQ_RE}', 1)")} AS changefreq,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_PRIORITY_RE}', 1)")} AS priority
  FROM b
)
SELECT sitemap_url, {_sql_abs('loc_raw')} AS loc, lastmod, changefreq, priority
FROM c WHERE {_sql_abs('loc_raw')} IS NOT NULL"""


def q_sitemap_tree(spark, sf_dir):
    """sitemaps.sitemap_index_entries: index → child sitemap edges."""
    from .operators.sitemaps import sitemap_index_entries

    return sitemap_index_entries(index_pages(spark, sf_dir)).select(
        "sitemap_url", "child_url"
    )


O_SITEMAP_TREE = f"""
WITH {_DUCK_INDEX_PAGES},
b AS (
  SELECT url AS sitemap_url,
         unnest(regexp_extract_all(body, '{S.SITEMAP_CHILD_BLOCK_RE}')) AS blk
  FROM p
),
c AS (
  SELECT sitemap_url,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_LOC_RE}', 1)")} AS child_raw
  FROM b
)
SELECT sitemap_url, {_sql_abs('child_raw')} AS child_url
FROM c WHERE {_sql_abs('child_raw')} IS NOT NULL"""


def q_feed_items(spark, sf_dir):
    """sitemaps.feed_items: RSS <item>s + Atom <entry>s, channel-level
    <link> excluded, linkless/mailto items dropped."""
    from .operators.sitemaps import feed_items

    return feed_items(feed_pages(spark, sf_dir)).select(
        "feed_url", "kind", "item_url", "title", "published"
    )


_DUCK_FEED_UNION = f"""
rb AS (
  SELECT url AS feed_url,
         unnest(regexp_extract_all(body, '{S.RSS_ITEM_BLOCK_RE}')) AS blk
  FROM p WHERE regexp_matches(body, '{S.RSS_KIND_RE}')
),
r2 AS (
  SELECT feed_url, 'rss' AS kind,
         {_sql_clean(f"regexp_extract(blk, '{S.RSS_LINK_RE}', 1)")} AS item_raw,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_TITLE_RE}', 1)")} AS title,
         {_sql_clean(f"regexp_extract(blk, '{S.RSS_PUBDATE_RE}', 1)")} AS published
  FROM rb
),
ab AS (
  SELECT url AS feed_url,
         unnest(regexp_extract_all(body, '{S.ATOM_ENTRY_BLOCK_RE}')) AS blk
  FROM p WHERE NOT regexp_matches(body, '{S.RSS_KIND_RE}')
          AND regexp_matches(body, '{S.ATOM_KIND_RE}')
),
a2 AS (
  SELECT feed_url, 'atom' AS kind,
         nullif({_sql_unesc(
             f"regexp_extract(regexp_extract(blk, '{S.LINK_TAG_RE}', 0), "
             f"'{S.HREF_ATTR_RE}', 1)"
         )}, '') AS item_raw,
         {_sql_clean(f"regexp_extract(blk, '{S.XML_TITLE_RE}', 1)")} AS title,
         {_sql_clean(f"regexp_extract(blk, '{S.ATOM_UPDATED_RE}', 1)")} AS published
  FROM ab
),
u AS (SELECT * FROM r2 UNION ALL SELECT * FROM a2)"""

O_FEED_ITEMS = f"""
WITH {_DUCK_FEED_PAGES},
{_DUCK_FEED_UNION}
SELECT feed_url, kind, {_sql_abs('item_raw')} AS item_url, title, published
FROM u WHERE {_sql_abs('item_raw')} IS NOT NULL"""


_ROBOTS_TXT = [
    # k=0: directive with a comment tail, inside a group (group-independent)
    "User-agent: *\nDisallow: /x\nSitemap: https://d0.example/sitemap.xml # main",
    # k=1: directive first, messy case/port/tracking; field spelled oddly
    "SiteMap: HTTPS://D1.EXAMPLE:443/s.xml?utm_q=1&v=2\nUser-agent: *\nAllow: /",
    # k=2: relative and ftp values — both dropped
    "sitemap: rel/skip.xml\nSitemap: ftp://d2.example/skip.xml",
    # k=3: no directives at all
    "User-agent: *\nDisallow: /private",
]


def robots_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ks = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 4).cast("int").alias("k")
    ).distinct()
    txt = F.element_at(
        F.array(*[F.lit(t) for t in _ROBOTS_TXT]), F.col("k") + 1
    )
    return ks.select(
        F.concat(F.lit("d"), F.col("k").cast("string"), F.lit(".example")).alias(
            "domain"
        ),
        txt.alias("robots_txt"),
    )


def q_robots_sitemaps(spark, sf_dir):
    """sitemaps.robots_sitemap_urls: RFC 9309 §2.3 group-independent
    Sitemap lines, keep-http(s)+normalize."""
    from .operators.sitemaps import robots_sitemap_urls

    return robots_sitemap_urls(robots_pages(spark, sf_dir)).select(
        "domain", "sitemap_url"
    )


def _duck_robots_case() -> str:
    whens = "\n".join(
        f"       WHEN {k} THEN {_sql_lit(t)}" for k, t in enumerate(_ROBOTS_TXT)
    )
    return (
        "rob AS (\n  SELECT 'd' || k || '.example' AS domain,\n"
        f"    CASE k\n{whens}\n       END AS robots_txt\n"
        "  FROM (SELECT DISTINCT (doc_id % 4) AS k FROM documents)\n)"
    )


O_ROBOTS_SITEMAPS = f"""
WITH {_duck_robots_case()},
rl AS (
  SELECT domain, unnest(string_split(robots_txt, chr(10))) AS raw FROM rob
),
pf AS (
  SELECT domain,
         lower(regexp_extract(trim(regexp_replace(raw, '{S.ROBOTS_COMMENT_RE}', '')), '{S.ROBOTS_FIELD_RE}', 1)) AS field,
         trim(regexp_extract(trim(regexp_replace(raw, '{S.ROBOTS_COMMENT_RE}', '')), '{S.ROBOTS_VALUE_RE}', 1)) AS value
  FROM rl
)
SELECT DISTINCT domain, {_sql_abs('value')} AS sitemap_url
FROM pf WHERE field = 'sitemap' AND {_sql_abs('value')} IS NOT NULL"""


def q_discovered(spark, sf_dir):
    """sitemaps.discovered_urls over the mixed corpus: anchors +
    sitemap locs + feed items merged per normalized url with source
    counts and the crawled flag — ONE groupBy shuffle + one left join."""
    from .operators.sitemaps import discovered_urls

    return discovered_urls(mixed_pages(spark, sf_dir)).select(
        "url", "from_anchors", "from_sitemaps", "from_feeds", "crawled"
    )


_KINDISH = (
    f"(regexp_matches(body, '{S.SITEMAP_URLSET_KIND_RE}') OR "
    f"regexp_matches(body, '{S.SITEMAP_INDEX_KIND_RE}') OR "
    f"regexp_matches(body, '{S.RSS_KIND_RE}') OR "
    f"regexp_matches(body, '{S.ATOM_KIND_RE}'))"
)

#: shared WITH-chain: the full discovered_urls derivation over the
#: mixed corpus (reused by the crawl_schedule member below)
_DUCK_DISC_CTES = f"""
WITH {_DUCK_MIXED_PAGES},
aa AS (
  SELECT url, unnest(regexp_extract_all(body, '{S.ANCHOR_TAG_RE}')) AS anchor
  FROM p WHERE NOT {_KINDISH}
),
ax AS (
  SELECT url, regexp_extract(anchor, '{S.HREF_ATTR_RE}', 1) AS href FROM aa
),
ac AS (SELECT {_sql_resolve('url', 'href')} AS cand FROM ax),
an AS (
  SELECT {_sql_norm('cand')} AS u FROM ac WHERE {_sql_norm('cand')} IS NOT NULL
),
lb AS (
  SELECT unnest(regexp_extract_all(body, '{S.SITEMAP_URL_BLOCK_RE}')) AS blk
  FROM p WHERE regexp_matches(body, '{S.SITEMAP_URLSET_KIND_RE}')
),
lc AS (
  SELECT {_sql_clean(f"regexp_extract(blk, '{S.XML_LOC_RE}', 1)")} AS raw FROM lb
),
ln AS (SELECT {_sql_abs('raw')} AS u FROM lc WHERE {_sql_abs('raw')} IS NOT NULL),
{_DUCK_FEED_UNION},
itm AS (
  SELECT {_sql_abs('item_raw')} AS u FROM u
  WHERE {_sql_abs('item_raw')} IS NOT NULL
),
refs AS (
  SELECT u, 'anchor' AS src FROM an
  UNION ALL SELECT u, 'sitemap' AS src FROM ln
  UNION ALL SELECT u, 'feed' AS src FROM itm
),
merged AS (
  SELECT u AS url,
         CAST(SUM(CASE WHEN src = 'anchor' THEN 1 ELSE 0 END) AS BIGINT) AS from_anchors,
         CAST(SUM(CASE WHEN src = 'sitemap' THEN 1 ELSE 0 END) AS BIGINT) AS from_sitemaps,
         CAST(SUM(CASE WHEN src = 'feed' THEN 1 ELSE 0 END) AS BIGINT) AS from_feeds
  FROM refs GROUP BY u
),
crawled AS (SELECT DISTINCT {_sql_norm('url')} AS url, 1 AS c FROM p),
disc AS (
  SELECT m.url, m.from_anchors, m.from_sitemaps, m.from_feeds,
         CAST(coalesce(c.c, 0) AS BIGINT) AS crawled
  FROM merged m LEFT JOIN crawled c ON m.url = c.url
)"""

O_DISCOVERED = (
    _DUCK_DISC_CTES
    + " SELECT url, from_anchors, from_sitemaps, from_feeds, crawled FROM disc"
)


def q_crawl_schedule(spark, sf_dir):
    """sitemaps.crawl_schedule over the mixed corpus: uncrawled
    frontier joined (broadcast) to a host signal — here the per-domain
    capture count, a deterministic PageRank stand-in; the rank/robots
    interplay is pytest-pinned — capped at 3 per host."""
    from .operators.sitemaps import crawl_schedule, discovered_urls
    from .operators.urls import registered_domain

    pages = mixed_pages(spark, sf_dir)
    hr = (
        pages.select(registered_domain(F.col("url")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("pr"))
    )
    return crawl_schedule(
        discovered_urls(pages), hr, per_host_cap=3
    ).select(
        "url",
        "domain",
        F.col("host_pr").cast(_BIG).alias("host_pr"),
        F.col("rank_in_host").cast(_BIG).alias("rank_in_host"),
    )


O_CRAWL_SCHEDULE = (
    _DUCK_DISC_CTES
    + f""",
hr AS (
  SELECT {_sql_domain('url')} AS node, COUNT(*) AS pr FROM p GROUP BY 1
),
todo AS (
  SELECT url, {_sql_domain('url')} AS domain,
         from_anchors + from_sitemaps + from_feeds AS n_refs
  FROM disc WHERE crawled = 0
),
jn AS (
  SELECT t.url, t.domain, CAST(coalesce(h.pr, 0) AS BIGINT) AS host_pr,
         t.n_refs
  FROM todo t LEFT JOIN hr h ON t.domain = h.node
),
rk AS (
  SELECT url, domain, host_pr,
         row_number() OVER (PARTITION BY domain
                            ORDER BY n_refs DESC, url ASC) AS rank_in_host
  FROM jn
)
SELECT url, domain, host_pr, CAST(rank_in_host AS BIGINT) AS rank_in_host
FROM rk WHERE rank_in_host <= 3"""
)


#: folded into gate_curation's td_url_suite + CURATION_MICRO_* registries
SITEMAP_SUITE_MEMBERS = [
    ("sitemap_entries", q_sitemap_entries, O_SITEMAP_ENTRIES,
     ["sitemap_url", "loc", "lastmod", "changefreq", "priority"]),
    ("sitemap_tree", q_sitemap_tree, O_SITEMAP_TREE,
     ["sitemap_url", "child_url"]),
    ("feed_items", q_feed_items, O_FEED_ITEMS,
     ["feed_url", "kind", "item_url", "title", "published"]),
    ("robots_sitemaps", q_robots_sitemaps, O_ROBOTS_SITEMAPS,
     ["domain", "sitemap_url"]),
    ("discovered_urls", q_discovered, O_DISCOVERED,
     ["url", "from_anchors", "from_sitemaps", "from_feeds", "crawled"]),
    ("crawl_schedule", q_crawl_schedule, O_CRAWL_SCHEDULE,
     ["url", "domain", "host_pr", "rank_in_host"]),
]


# ---------------------------------------------------------------------------
# recrawl scheduling (sitemaps.recrawl_schedule)
# ---------------------------------------------------------------------------

_RECRAWL_AS_OF = "2025-06-01"
_FREQS = ["always", "hourly", "daily", "weekly", "monthly", "yearly",
          "never", "quux"]


def recrawl_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry rows exercising every CHANGEFREQ_REVISIT_DAYS branch plus
    'never'/unknown/NULL cadences and all four lastmod forms (plain
    date, full W3C datetime, invalid month, NULL)."""
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    k = (i % 4).cast("int")
    lastmod = (
        F.when(k == 0, tmpl_col("2025-01-0{p9}"))
        .when(k == 1, F.lit("2025-01-03T04:05:06Z"))
        .when(k == 2, F.lit("2025-13-01"))
        .otherwise(F.lit(None).cast("string"))
    )
    f = (i % 9).cast("int")
    freq = F.when(
        f < 8, F.element_at(F.array(*[F.lit(x) for x in _FREQS]), f + 1)
    ).otherwise(F.lit(None).cast("string"))
    return docs.select(
        tmpl_col("https://s{m3}.example/a/{id}").alias("loc"),
        lastmod.alias("lastmod"),
        freq.alias("changefreq"),
    )


def q_recrawl(spark, sf_dir):
    """sitemaps.recrawl_schedule: lastmod/changefreq → next_fetch/due
    — pure projection, exact date arithmetic, NULL-safe parses."""
    from .operators.sitemaps import recrawl_schedule

    return recrawl_schedule(
        recrawl_entries(spark, sf_dir), as_of=_RECRAWL_AS_OF
    ).select(
        "loc",
        F.col("lastmod_date").cast("string").alias("lastmod_date"),
        "revisit_days",
        F.col("next_fetch").cast("string").alias("next_fetch"),
        "due",
    )


_FREQ_CASE = "CASE (doc_id % 9) " + " ".join(
    f"WHEN {idx} THEN '{v}'" for idx, v in enumerate(_FREQS)
) + " END"

_DAYS_CASE = "CASE lower(changefreq) " + " ".join(
    f"WHEN '{v}' THEN {d}" for v, d in S.CHANGEFREQ_REVISIT_DAYS
) + " END"

O_RECRAWL = f"""
WITH e AS (
  SELECT {tmpl_sql("https://s{m3}.example/a/{id}")} AS loc,
         CASE (doc_id % 4)
           WHEN 0 THEN {tmpl_sql("2025-01-0{p9}")}
           WHEN 1 THEN '2025-01-03T04:05:06Z'
           WHEN 2 THEN '2025-13-01'
         END AS lastmod,
         {_FREQ_CASE} AS changefreq
  FROM documents
),
c AS (
  SELECT loc,
         TRY_CAST(substr(lastmod, 1, 10) AS DATE) AS lastmod_date,
         CAST({_DAYS_CASE} AS BIGINT) AS revisit_days
  FROM e
),
n AS (
  SELECT loc, lastmod_date, revisit_days,
         lastmod_date + CAST(revisit_days AS INTEGER) AS next_fetch
  FROM c
)
SELECT loc, CAST(lastmod_date AS VARCHAR) AS lastmod_date, revisit_days,
       CAST(next_fetch AS VARCHAR) AS next_fetch,
       CAST(CASE WHEN next_fetch IS NOT NULL
                  AND next_fetch <= DATE '{_RECRAWL_AS_OF}'
             THEN 1 ELSE 0 END AS BIGINT) AS due
FROM n"""


#: appended (q_recrawl is defined below the main member list)
SITEMAP_SUITE_MEMBERS.append(
    ("recrawl", q_recrawl, O_RECRAWL,
     ["loc", "lastmod_date", "revisit_days", "next_fetch", "due"])
)
