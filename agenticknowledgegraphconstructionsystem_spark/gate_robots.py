"""Driver-window gates for the robots.txt tier (operators/robots.py):
rule parsing with group selection → longest-match crawl verdicts, each
hash-pinned against a DuckDB twin that replays the IDENTICAL semantics
(semantics.ROBOTS_* regexes, the two window passes — contiguous
User-agent run numbering via lag+running-sum, governing-group fill via
last_value IGNORE NULLS — exact-agent-beats-'*' group choice, literal
prefix join, allow-wins-ties ranking) over robots files and urls
synthesized IDENTICALLY in both engines from the documents table.

The members ride ``td_url_suite`` (gate_curation.py) so the exported
``queries()`` surface stays at exactly 50; scripts/check_gate.py sweeps
each member individually via CURATION_MICRO_QUERIES.

The five synthetic robots files cover: an exact-agent group that must
shadow the '*' group, comment tails, a blank separator line, an empty
Disallow (no restriction), a Crawl-delay line (ignored field), an
equal-length allow/disallow tie (allow must win), a multi-agent group
header run, wildcard and no-leading-slash rules (dropped whole), and an
empty robots file (every url allowed).  Urls exercise every prefix
depth plus the www→registered-domain fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .gate_links import _sql_domain
from .gate_textdata import _docs

_BIG = "bigint"
_AGENT = "KGBot"

_ROBOTS_TXT = [
    # d0: exact-agent group shadows '*' — incl. its Crawl-delay, so the
    # governing group for KGBot carries NO delay (negative case)
    "# crawl policy\nUser-agent: KGBot\nDisallow: /no\nAllow: /no/yes\n\n"
    "User-agent: *\nDisallow: /\nCrawl-delay: 10",
    # d1: '*' group with comment tail, wildcard + empty Disallow dropped
    "User-agent: *  # everyone\nDisallow: /a/\nAllow: /a/b\n"
    "Disallow: /wild*\nDisallow:\nCrawl-delay: 3",
    # d2: other-agent group ignored; equal-length tie → allow wins
    "User-agent: Other\nDisallow: /\n\nUser-agent: *\nAllow: /x\nDisallow: /x",
    # d3: empty file — everything allowed
    "",
    # d4: multi-agent header run shares rules; $ and no-slash dropped;
    # multiple delay lines keep the MIN, non-numeric drops
    "User-agent: KGBot\nUser-agent: *\nDisallow: noslash\nDisallow: /d$\n"
    "Disallow: /q/\nCrawl-delay: 7\nCrawl-delay: x\nCrawl-delay: 2",
]

_SEGS = ["/no/yes/1", "/no/2", "/a/b/c", "/a/zz", "/x", "/x/sub", "/q/7", "/free"]


def robots_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One robots.txt per synthetic domain d0..d4 — derived (not
    hardcoded row counts) so both engines build it from documents."""
    ks = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 5).cast("int").alias("k")
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


def robots_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    seg = F.element_at(
        F.array(*[F.lit(s) for s in _SEGS]), (i % 8).cast("int") + 1
    )
    return docs.select(
        F.concat(
            F.lit("https://www.d"),
            (i % 5).cast("string"),
            F.lit(".example"),
            seg,
            F.lit("?v="),
            i.cast("string"),
        ).alias("url")
    )


def _sql_lit(s: str) -> str:
    """Python robots text → DuckDB literal with real newlines via
    chr(10) so both engines hold byte-identical strings."""
    parts = s.split("\n")
    quoted = " || chr(10) || ".join(
        "'" + p.replace("'", "''") + "'" for p in parts
    )
    return quoted if quoted else "''"


def _duck_robots_case() -> str:
    whens = "\n".join(
        f"       WHEN {k} THEN {_sql_lit(t)}" for k, t in enumerate(_ROBOTS_TXT)
    )
    return (
        "rob AS (\n  SELECT 'd' || k || '.example' AS domain,\n"
        f"    CASE k\n{whens}\n       END AS robots_txt\n"
        "  FROM (SELECT DISTINCT (doc_id % 5) AS k FROM documents)\n)"
    )


def _duck_rules(agent: str) -> str:
    a = agent.lower()
    return f"""
rl AS (
  SELECT domain,
         generate_subscripts(ls, 1) - 1 AS pos,
         unnest(ls) AS raw
  FROM (SELECT domain, string_split(robots_txt, chr(10)) AS ls FROM rob)
),
pf AS (
  SELECT domain, pos,
         lower(regexp_extract(trim(regexp_replace(raw, '{S.ROBOTS_COMMENT_RE}', '')), '{S.ROBOTS_FIELD_RE}', 1)) AS field,
         trim(regexp_extract(trim(regexp_replace(raw, '{S.ROBOTS_COMMENT_RE}', '')), '{S.ROBOTS_VALUE_RE}', 1)) AS value
  FROM rl
),
pg AS (
  SELECT * FROM pf WHERE field IN ('user-agent', 'allow', 'disallow')
),
rn AS (
  SELECT *, (field = 'user-agent') AS is_ua,
         CASE WHEN field = 'user-agent'
                   AND NOT coalesce(lag(field = 'user-agent')
                       OVER (PARTITION BY domain ORDER BY pos), FALSE)
              THEN 1 ELSE 0 END AS new_run
  FROM pg
),
rr AS (
  SELECT *, SUM(new_run) OVER (PARTITION BY domain ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS run_id
  FROM rn
),
bb AS (
  SELECT *, last_value(CASE WHEN is_ua THEN run_id END IGNORE NULLS)
              OVER (PARTITION BY domain ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua_run
  FROM rr
),
gg AS (
  SELECT domain, run_id AS g_run,
         CASE WHEN lower(value) = '{a}' THEN 1 ELSE 2 END AS match_rank
  FROM bb WHERE is_ua AND lower(value) IN ('{a}', '*')
),
bestg AS (SELECT domain, min(match_rank) AS best_rank FROM gg GROUP BY domain),
ch AS (
  SELECT DISTINCT g.domain, g.g_run
  FROM gg g JOIN bestg b ON g.domain = b.domain AND g.match_rank = b.best_rank
),
rules AS (
  SELECT DISTINCT bb.domain, bb.field AS rule, bb.value AS path_prefix
  FROM bb JOIN ch ON bb.domain = ch.domain AND bb.ua_run = ch.g_run
  WHERE NOT bb.is_ua AND bb.value <> '' AND bb.value LIKE '/%'
        AND NOT regexp_matches(bb.value, '{S.ROBOTS_WILDCARD_RE}')
)"""


_DUCK_URLS = """
urls AS (
  SELECT 'https://www.d' || (doc_id % 5) || '.example'
         || CASE doc_id % 8
              WHEN 0 THEN '/no/yes/1' WHEN 1 THEN '/no/2'
              WHEN 2 THEN '/a/b/c'    WHEN 3 THEN '/a/zz'
              WHEN 4 THEN '/x'        WHEN 5 THEN '/x/sub'
              WHEN 6 THEN '/q/7'      ELSE '/free' END
         || '?v=' || doc_id AS url
  FROM documents
)"""


# --- members ---------------------------------------------------------------


def q_robots_rules(spark, sf_dir):
    """robots.parse_robots for the exact agent: group selection, line
    grammar, dropped wildcard/no-slash/empty rules."""
    from .operators.robots import parse_robots

    return parse_robots(robots_table(spark, sf_dir), agent=_AGENT).select(
        "domain", "rule", "path_prefix"
    )


O_ROBOTS_RULES = (
    f"WITH {_duck_robots_case()}, {_duck_rules(_AGENT)} "
    "SELECT domain, rule, path_prefix FROM rules"
)


def q_robots_verdicts(spark, sf_dir):
    """robots.robots_verdicts: longest literal prefix decides, allow
    wins ties, no match / empty file = allowed."""
    from .operators.robots import robots_verdicts

    return robots_verdicts(
        robots_urls(spark, sf_dir), robots_table(spark, sf_dir), agent=_AGENT
    ).select(
        "url",
        "matched_prefix",
        "rule",
        F.col("disallowed").cast(_BIG).alias("disallowed"),
    )


O_ROBOTS_VERDICTS = (
    f"WITH {_duck_robots_case()}, {_duck_rules(_AGENT)}, {_DUCK_URLS}, "
    f"""u2 AS (
  SELECT url, {_sql_domain('url')} AS domain,
         regexp_extract(url, '{S.URL_PARSE_RE}', 3) AS path
  FROM urls
),
m AS (
  SELECT u2.url, rules.path_prefix, rules.rule
  FROM u2 JOIN rules ON u2.domain = rules.domain
  WHERE starts_with(u2.path, rules.path_prefix)
),
bm AS (
  SELECT url, path_prefix, rule,
         row_number() OVER (PARTITION BY url
                            ORDER BY length(path_prefix) DESC, rule ASC) AS rk
  FROM m
)
SELECT u2.url, bm.path_prefix AS matched_prefix, bm.rule,
       CAST(coalesce(bm.rule = 'disallow', FALSE) AS BIGINT) AS disallowed
FROM u2 LEFT JOIN (SELECT * FROM bm WHERE rk = 1) bm ON u2.url = bm.url"""
)


def q_crawl_delays(spark, sf_dir):
    """robots.crawl_delays: group-governed Crawl-delay — exact-agent
    group shadows '*' (so d0's *-group delay must NOT apply to KGBot),
    min of multiple numeric lines, non-numeric dropped."""
    from .operators.robots import crawl_delays

    return crawl_delays(robots_table(spark, sf_dir), agent=_AGENT).select(
        "domain", "crawl_delay_sec"
    )


def _duck_delays(agent: str) -> str:
    """Same group-selection CTE chain as _duck_rules, with crawl-delay
    lines kept and the final CTE aggregating the governing group's
    numeric delays."""
    a = agent.lower()
    return f"""
rl AS (
  SELECT domain,
         generate_subscripts(ls, 1) - 1 AS pos,
         unnest(ls) AS raw
  FROM (SELECT domain, string_split(robots_txt, chr(10)) AS ls FROM rob)
),
pf AS (
  SELECT domain, pos,
         lower(regexp_extract(trim(regexp_replace(raw, '{S.ROBOTS_COMMENT_RE}', '')), '{S.ROBOTS_FIELD_RE}', 1)) AS field,
         trim(regexp_extract(trim(regexp_replace(raw, '{S.ROBOTS_COMMENT_RE}', '')), '{S.ROBOTS_VALUE_RE}', 1)) AS value
  FROM rl
),
pg AS (
  -- allow/disallow survive run numbering: they separate contiguous
  -- User-agent runs (same rationale as the operator)
  SELECT * FROM pf
  WHERE field IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
),
rn AS (
  SELECT *, (field = 'user-agent') AS is_ua,
         CASE WHEN field = 'user-agent'
                   AND NOT coalesce(lag(field = 'user-agent')
                       OVER (PARTITION BY domain ORDER BY pos), FALSE)
              THEN 1 ELSE 0 END AS new_run
  FROM pg
),
rr AS (
  SELECT *, SUM(new_run) OVER (PARTITION BY domain ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS run_id
  FROM rn
),
bb AS (
  SELECT *, last_value(CASE WHEN is_ua THEN run_id END IGNORE NULLS)
              OVER (PARTITION BY domain ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua_run
  FROM rr
),
gg AS (
  SELECT domain, run_id AS g_run,
         CASE WHEN lower(value) = '{a}' THEN 1 ELSE 2 END AS match_rank
  FROM bb WHERE is_ua AND lower(value) IN ('{a}', '*')
),
bestg AS (SELECT domain, min(match_rank) AS best_rank FROM gg GROUP BY domain),
ch AS (
  SELECT DISTINCT g.domain, g.g_run
  FROM gg g JOIN bestg b ON g.domain = b.domain AND g.match_rank = b.best_rank
),
delays AS (
  SELECT bb.domain,
         CAST(MIN(CAST(bb.value AS BIGINT)) AS BIGINT) AS crawl_delay_sec
  FROM bb JOIN ch ON bb.domain = ch.domain AND bb.ua_run = ch.g_run
  WHERE NOT bb.is_ua AND regexp_matches(bb.value, '^[0-9]+$')
  GROUP BY bb.domain
)"""


O_CRAWL_DELAYS = (
    f"WITH {_duck_robots_case()}, {_duck_delays(_AGENT)} "
    "SELECT domain, crawl_delay_sec FROM delays"
)


#: folded into gate_curation's td_url_suite + CURATION_MICRO_* registries
ROBOTS_SUITE_MEMBERS = [
    ("robots_rules", q_robots_rules, O_ROBOTS_RULES,
     ["domain", "rule", "path_prefix"]),
    ("robots_verdicts", q_robots_verdicts, O_ROBOTS_VERDICTS,
     ["url", "matched_prefix", "rule", "disallowed"]),
    ("crawl_delays", q_crawl_delays, O_CRAWL_DELAYS,
     ["domain", "crawl_delay_sec"]),
]
