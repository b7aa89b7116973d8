"""Driver-window gates for the curation tier (urls / PII / repetition /
decontamination) plus the sampling-suite fold.

The driver records CORRECTNESS rows for the first 50 ``queries()`` only
(CLAUDE.md hard rule), so the seven curation micro-gates ride TWO suite
queries (``td_url_suite``, ``td_curation_suite``) and the three sampling
gates that used to hold individual slots (stratified / hash-sample /
KMV) fold into ``td_sampling_suite`` — net zero slots, every curation
operator gains a driver-visible hash gate.  scripts/check_gate.py still
sweeps each folded member individually (CURATION_MICRO_QUERIES here,
sampling members via gate_textdata.TEXT_MICRO_QUERIES).

Inputs are synthesized deterministically from the sf documents table in
BOTH engines (messy crawl URLs whose fragments carry doc_id; planted PII
rows; benchmark = every ``doc_id % 37 == 0`` document) — the same
constructions proven row-exact in tests/test_urls.py, test_pii.py,
test_repetition.py, test_decontam.py.  Everything derives from
``semantics.py`` (URL_PARSE_RE / TRACKING_PARAM_RE / PII_PATTERNS /
repetition caps) per the single-source-of-truth rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .gate_links import LINK_SUITE_MEMBERS
from .gate_policy import POLICY_SUITE_MEMBERS
from .gate_robots import ROBOTS_SUITE_MEMBERS
from .gate_cdx import CDX_SUITE_MEMBERS
from .gate_sitemaps import SITEMAP_SUITE_MEMBERS
from .gate_structured import STRUCT_SUITE_MEMBERS
from .gate_suites import suite_oracle, suite_query
from .gate_textdata import (
    _docs,
    _o_hash_sample,
    _o_kmv_distinct,
    _o_stratified_sample,
    _sql_affine,
    _sql_poly,
    q_hash_sample,
    q_kmv_distinct,
    q_stratified_sample,
)

_BIG = "bigint"


# ---------------------------------------------------------------------------
# Shared synthetic pages: messy crawl URLs from the documents table.
# URLs collide after normalization (the fragment carries doc_id), three
# domains (one blocklisted), tracking params throughout; cap_seq (the
# capture ordinal) stands in for warc_ts.
# ---------------------------------------------------------------------------


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
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

#: DuckDB restatement of urls.normalize_url / registered_domain over p —
#: identical regexes (semantics.URL_PARSE_RE ∩ RE2), identical rebuild.
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


# --- URL micro-gates -------------------------------------------------------


def q_url_norm(spark, sf_dir):
    """urls.add_url_columns: canonical URL + registered domain."""
    from .operators.urls import add_url_columns

    return add_url_columns(_pages(spark, sf_dir)).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"), "norm_url", "domain"
    )


O_URL_NORM = (
    f"WITH {_DUCK_PAGES}, {_DUCK_NORM} "
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, norm_url, domain FROM norm"
)


def q_latest_capture(spark, sf_dir):
    """urls.latest_capture: newest capture per normalized url (ties by
    raw url ASC) — WindowGroupLimit both sides of its one exchange."""
    from .operators.urls import latest_capture

    return latest_capture(_pages(spark, sf_dir), ts_col="cap_seq").select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "url",
        F.col("cap_seq").cast(_BIG).alias("cap_seq"),
        "norm_url",
    )


O_LATEST_CAPTURE = (
    f"WITH {_DUCK_PAGES}, {_DUCK_NORM}, "
    "r AS (SELECT doc_id, url, cap_seq, norm_url, "
    "ROW_NUMBER() OVER (PARTITION BY norm_url ORDER BY cap_seq DESC, url ASC) AS rn "
    "FROM norm) "
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, url, "
    "CAST(cap_seq AS BIGINT) AS cap_seq, norm_url FROM r WHERE rn = 1"
)

_CAP_K = 5


def q_cap_domain(spark, sf_dir):
    """urls.cap_per_domain: ≤ k pages per registered domain, membership
    by portable norm_url hash (stable under corpus growth)."""
    from .operators.urls import cap_per_domain

    return cap_per_domain(_pages(spark, sf_dir), _CAP_K).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"), "url"
    )


O_CAP_DOMAIN = (
    f"WITH {_DUCK_PAGES}, {_DUCK_NORM}, "
    f"h AS (SELECT doc_id, url, domain, {_sql_poly('norm_url')} AS hh FROM norm), "
    "r AS (SELECT doc_id, url, "
    "ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hh ASC, url ASC) AS rn "
    "FROM h) "
    f"SELECT CAST(doc_id AS BIGINT) AS doc_id, url FROM r WHERE rn <= {_CAP_K}"
)


def q_blocked_domains(spark, sf_dir):
    """urls.filter_blocked_domains: broadcast LEFT ANTI on the
    registered domain (blocklist = {tracker.com})."""
    from .operators.urls import filter_blocked_domains

    blocked = spark.createDataFrame([("tracker.com",)], "domain string")
    return filter_blocked_domains(_pages(spark, sf_dir), blocked).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"), "url"
    )


O_BLOCKED_DOMAINS = (
    f"WITH {_DUCK_PAGES}, {_DUCK_NORM} "
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, url FROM norm "
    "WHERE domain <> 'tracker.com'"
)


# --- PII micro-gate --------------------------------------------------------

#: planted rows — the synthetic corpus is PII-free, these keep the
#: comparison non-vacuous (same rows as tests/test_pii.py)
PII_PLANTED = (
    (-1, "contact john.doe@example.com or jane_smith+tag@mail.co.uk today"),
    (-2, "ssn 123-45-6789 then phone 555-123-4567 alt 555.987.6543"),
    (-3, "server at 192.168.0.1 and 10.0.0.255, version 1.2.3"),
    (-4, None),
)


def q_pii_redact(spark, sf_dir):
    """pii.redact_pii over documents ∪ planted PII rows: per-category
    counts (sequential semantics) + the redacted text."""
    from .operators.pii import redact_pii

    planted = spark.createDataFrame(
        list(PII_PLANTED), "doc_id bigint, text string"
    )
    docs = _docs(spark, sf_dir).select("doc_id", "text").unionByName(planted)
    rep = redact_pii(docs)
    return rep.select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        *[F.col(f"n_{c}") for c, _p, _r in S.PII_PATTERNS],
        "text_redacted",
    )


def _o_pii_redact() -> str:
    planted_sql = ", ".join(
        f"({i}, {'NULL' if t is None else repr(t)})" for i, t in PII_PLANTED
    )
    steps = []
    prev = "s0"
    for n, (cat, pat, rep) in enumerate(S.PII_PATTERNS, start=1):
        steps.append(
            f"s{n} AS (SELECT doc_id, "
            + ", ".join(f"n_{c}" for c, _p, _r in S.PII_PATTERNS[: n - 1])
            + (", " if n > 1 else "")
            + f"coalesce(len(regexp_extract_all(t, '{pat}')), 0) AS n_{cat}, "
            f"regexp_replace(t, '{pat}', '{rep}', 'g') AS t FROM {prev})"
        )
        prev = f"s{n}"
    return (
        "WITH d AS (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT * FROM (VALUES {planted_sql}) v(doc_id, text)), "
        "s0 AS (SELECT doc_id, text AS t FROM d), "
        + ", ".join(steps)
        + " SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        + ", ".join(
            f"CAST(n_{c} AS BIGINT) AS n_{c}" for c, _p, _r in S.PII_PATTERNS
        )
        + f", t AS text_redacted FROM {prev}"
    )


# --- repetition micro-gate -------------------------------------------------


def q_repetition(spark, sf_dir):
    """repetition.repetition_report (Gopher A1 filters) over the real
    documents table."""
    from .operators.repetition import repetition_report

    return repetition_report(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "n_lines",
        "dup_line_pct",
        "dup_line_char_pct",
        "top2_char_pct",
        "dup5_char_pct",
        "repetition_ok",
    )


def _o_repetition() -> str:
    return """
WITH b AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
),
b2 AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_chars FROM b),
ln AS (
  SELECT doc_id, trim(l) AS line
  FROM b2, unnest(string_split(t, chr(10))) AS u(l)
),
lg AS (
  SELECT doc_id, line, COUNT(*) AS cnt FROM ln WHERE line <> '' GROUP BY 1, 2
),
la AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_lines,
         CAST(SUM(cnt * len(line)) AS BIGINT) AS line_chars,
         CAST(SUM(CASE WHEN cnt > 1 THEN cnt * len(line) ELSE 0 END) AS BIGINT)
           AS dup_line_chars
  FROM lg GROUP BY 1
),
w AS (
  SELECT doc_id, list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS words
  FROM b2
),
g2 AS (
  SELECT doc_id, array_to_string(words[i:i+1], ' ') AS gram
  FROM w, unnest(range(1, greatest(len(words) - 1, 1) + 1)) AS s(i)
),
g2c AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 WHERE gram <> '' GROUP BY 1, 2
),
t2 AS (
  SELECT doc_id, CAST(cnt * len(gram) AS BIGINT) AS top2_chars,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
  FROM g2c
),
t2a AS (SELECT doc_id, top2_chars FROM t2 WHERE rn = 1),
g5 AS (
  SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, unnest(range(1, greatest(len(words) - 4, 1) + 1)) AS s(i)
),
g5c AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g5 WHERE gram <> '' GROUP BY 1, 2
),
d5 AS (
  SELECT doc_id, CAST(SUM(cnt * len(gram)) AS BIGINT) AS dup5_chars
  FROM g5c WHERE cnt > 1 GROUP BY 1
),
m AS (
  SELECT b2.doc_id,
         coalesce(la.n_lines, 0) AS n_lines,
         CASE WHEN coalesce(la.n_lines, 0) > 0
              THEN CAST(floor(coalesce(la.dup_lines, 0) * 100 / la.n_lines) AS BIGINT)
              ELSE 0 END AS dup_line_pct,
         CASE WHEN coalesce(la.line_chars, 0) > 0
              THEN CAST(floor(coalesce(la.dup_line_chars, 0) * 100 / la.line_chars) AS BIGINT)
              ELSE 0 END AS dup_line_char_pct,
         CASE WHEN n_chars > 0
              THEN CAST(floor(coalesce(t2a.top2_chars, 0) * 100 / n_chars) AS BIGINT)
              ELSE 0 END AS top2_char_pct,
         CASE WHEN n_chars > 0
              THEN least(100, CAST(floor(coalesce(d5.dup5_chars, 0) * 100 / n_chars) AS BIGINT))
              ELSE 0 END AS dup5_char_pct
  FROM b2
  LEFT JOIN la ON b2.doc_id = la.doc_id
  LEFT JOIN t2a ON b2.doc_id = t2a.doc_id
  LEFT JOIN d5 ON b2.doc_id = d5.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_lines, dup_line_pct,
       dup_line_char_pct, top2_char_pct, dup5_char_pct,
       dup_line_pct <= {} AND dup_line_char_pct <= {}
         AND top2_char_pct <= {} AND dup5_char_pct <= {} AS repetition_ok
FROM m""".format(
        S.DUP_LINE_MAX_PCT,
        S.DUP_LINE_CHAR_MAX_PCT,
        S.TOP2_CHAR_MAX_PCT,
        S.DUP5_CHAR_MAX_PCT,
    )


# --- cross-document boilerplate-line micro-gates ---------------------------

#: planted boilerplate over the documents table: a header in EVERY doc,
#: one of three footers per doc (doc_id % 3) — the real content line(s)
#: stay below BOILERPLATE_MIN_DOCS unless genuinely duplicated, in which
#: case both engines strip them identically.
_BOILER_HEADER = "top nav: home | about | contact"
_BOILER_FOOTERS = (
    "  cookie policy: accept all  ",
    "all rights reserved - example",
    "subscribe to our newsletter",
)


def _boiler_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    footer = F.element_at(
        F.array(*[F.lit(x) for x in _BOILER_FOOTERS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.when(
            F.col("text").isNotNull(),
            F.concat(F.lit(_BOILER_HEADER + "\n"), F.col("text"), F.lit("\n"), footer),
        ).alias("text"),
    )


_DUCK_BOILER = f"""
d AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE '{_BOILER_HEADER}' || chr(10) || text || chr(10) ||
                   CASE doc_id % 3
                        WHEN 0 THEN '{_BOILER_FOOTERS[0]}'
                        WHEN 1 THEN '{_BOILER_FOOTERS[1]}'
                        ELSE '{_BOILER_FOOTERS[2]}' END
         END AS text
  FROM documents
),
sp AS (SELECT doc_id, string_split(text, chr(10)) AS sp FROM d WHERE text IS NOT NULL),
l AS (
  SELECT doc_id, i AS pos, sp[i] AS raw, trim(sp[i]) AS line
  FROM sp, unnest(range(1, len(sp) + 1)) AS t(i)
),
boil AS (
  SELECT line,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM l WHERE line <> '' GROUP BY line
  HAVING COUNT(DISTINCT doc_id) >= {S.BOILERPLATE_MIN_DOCS}
)"""


def q_boilerplate_lines(spark, sf_dir):
    """lines.boilerplate_lines: the corpus-wide boilerplate census over
    documents with planted header/footers."""
    from .operators.lines import boilerplate_lines

    return boilerplate_lines(_boiler_docs(spark, sf_dir)).select(
        "line", "n_docs", "n_occurrences"
    )


O_BOILERPLATE_LINES = (
    f"WITH {_DUCK_BOILER} SELECT line, n_docs, n_occurrences FROM boil"
)


def q_line_dedup(spark, sf_dir):
    """lines.strip_boilerplate_lines: every document with its boilerplate
    lines removed — the hash pins the exact reconstructed text, so line
    order, untrimmed originals and the NULL/empty edge rows are all
    value-checked."""
    from .operators.lines import strip_boilerplate_lines

    return strip_boilerplate_lines(_boiler_docs(spark, sf_dir)).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "text_clean",
        "n_lines_kept",
        "n_lines_removed",
    )


O_LINE_DEDUP = f"""
WITH {_DUCK_BOILER},
kept AS (
  SELECT doc_id, pos, raw FROM l
  WHERE line NOT IN (SELECT line FROM boil)
),
reb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
         string_agg(raw, chr(10) ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines FROM l GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(reb.text_clean, '') END AS text_clean,
       CAST(CASE WHEN d.text IS NULL THEN 0
                 ELSE coalesce(reb.n_lines_kept, 0) END AS BIGINT) AS n_lines_kept,
       CAST(coalesce(tot.n_lines, 0)
            - CASE WHEN d.text IS NULL THEN 0
                   ELSE coalesce(reb.n_lines_kept, 0) END AS BIGINT) AS n_lines_removed
FROM d
LEFT JOIN reb ON d.doc_id = reb.doc_id
LEFT JOIN tot ON d.doc_id = tot.doc_id"""


# --- decontamination micro-gate --------------------------------------------

_DECONTAM_N = 13


def q_decontam(spark, sf_dir):
    """decontam.contamination_report with benchmark = every
    ``doc_id % 37 == 0`` document (those are 100% contaminated by
    construction; the rest measure incidental 13-gram collisions)."""
    from .operators.decontam import contamination_report

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_report(docs, bench, n=_DECONTAM_N).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "n_grams",
        "n_contaminated",
        "contam_pct",
        "contaminated",
    )


def _o_decontam() -> str:
    n = _DECONTAM_N
    return f"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+{n - 1}], ' ') AS shingle
  FROM w, unnest(range(1, greatest(len(words) - {n - 1}, 1) + 1)) AS t(i)
),
shn AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
hs AS (SELECT doc_id, {_sql_poly('shingle')} AS h FROM shn),
bh AS (SELECT DISTINCT h FROM hs WHERE doc_id % 37 = 0),
rep AS (
  SELECT hs.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(bh.h) AS BIGINT) AS n_contaminated
  FROM hs LEFT JOIN bh ON hs.h = bh.h
  GROUP BY hs.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_grams, n_contaminated,
       CAST(floor(n_contaminated * 100 / n_grams) AS BIGINT) AS contam_pct,
       n_contaminated >= 1 AS contaminated
FROM rep"""


# --- mixture sampling + sequence packing micro-gates -----------------------

#: gate mixture: 5 of the 20 synthetic sources, deliberately unequal
#: weights so every source gets a different rate (permille)
MIXTURE_TARGETS = {"src0": 300, "src1": 200, "src2": 100, "src3": 50, "src4": 350}

_MIX_VALUES = ", ".join(
    f"('{s}', CAST({w} AS BIGINT))" for s, w in sorted(MIXTURE_TARGETS.items())
)

#: shared oracle CTEs: per-source counts → scaled max total → rates
_MIX_CTES = f"""
counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE doc_id IS NOT NULL GROUP BY source
),
tgt(source, target_permille) AS (VALUES {_MIX_VALUES}),
j AS (
  SELECT counts.source, n_docs, target_permille
  FROM counts JOIN tgt USING (source)
),
t AS (SELECT MIN(n_docs * 1000 // target_permille) AS t_scaled FROM j),
rates AS (
  SELECT source, n_docs, target_permille,
         (target_permille * t_scaled // 1000) AS keep_docs,
         ((target_permille * t_scaled // 1000) * 1000000 // n_docs) AS rate_ppm
  FROM j, t
)"""


def q_mixture_rates(spark, sf_dir):
    """sketches.mixture_rates: integer-exact per-source keep rates toward
    the target mixture (largest total every source can supply)."""
    from .operators.sketches import mixture_rates

    return mixture_rates(_docs(spark, sf_dir), MIXTURE_TARGETS).select(
        "source",
        "n_docs",
        "target_permille",
        "keep_docs",
        "rate_ppm",
    )


O_MIXTURE_RATES = (
    f"WITH {_MIX_CTES} SELECT source, n_docs, target_permille, keep_docs, "
    "rate_ppm FROM rates"
)


def q_mixture_sample(spark, sf_dir):
    """sketches.mixture_sample: the surviving (source, doc_id) membership
    under the mixture rates — broadcast rate join + pure hash filter."""
    from .operators.sketches import mixture_sample

    return mixture_sample(_docs(spark, sf_dir), MIXTURE_TARGETS).select(
        "source", F.col("doc_id").cast(_BIG).alias("doc_id")
    )


def _o_mixture_sample() -> str:
    h = _sql_affine(f"(doc_id % {S.POLY_P})", S.MINHASH_A[3], S.MINHASH_B[3])
    return (
        f"WITH {_MIX_CTES} "
        "SELECT d.source, CAST(d.doc_id AS BIGINT) AS doc_id "
        "FROM documents d JOIN rates r ON d.source = r.source "
        f"WHERE d.doc_id IS NOT NULL AND ({h}) % 1000000 < r.rate_ppm"
    )


_PACK_CTX = 512
_PACK_SHARDS = 8


def q_pack_sequences(spark, sf_dir):
    """packing.pack_sequences: concat-and-chunk window assignment
    (ctx 512, 8 shards) in the deterministic shuffled stream order."""
    from .operators.packing import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), ctx_len=_PACK_CTX, n_shards=_PACK_SHARDS
    ).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "shard",
        "n_tokens",
        "pack_id",
        "pack_offset",
    )


def q_pack_windows(spark, sf_dir):
    """packing.pack_windows: the materialized ctx-token training windows
    — the hash pins the exact window TEXT, so stream order, straddling
    slices and window boundaries are all value-checked."""
    from .operators.packing import pack_windows

    return pack_windows(
        _docs(spark, sf_dir), ctx_len=_PACK_CTX, n_shards=_PACK_SHARDS
    ).select(
        "shard",
        "pack_id",
        "n_tokens",
        "window_text",
    )


def _o_pack_windows() -> str:
    from .operators.packing import PACK_ORDER_SALT, PACK_SHARD_SALT

    h_shard = _sql_affine(
        f"(doc_id % {S.POLY_P})", S.MINHASH_A[PACK_SHARD_SALT], S.MINHASH_B[PACK_SHARD_SALT]
    )
    h_ord = _sql_affine(
        f"(doc_id % {S.POLY_P})", S.MINHASH_A[PACK_ORDER_SALT], S.MINHASH_B[PACK_ORDER_SALT]
    )
    ctx = _PACK_CTX
    return f"""
WITH b AS (
  SELECT doc_id,
         CAST(({h_shard}) % {_PACK_SHARDS} AS BIGINT) AS shard,
         ({h_ord}) AS ord,
         list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE doc_id IS NOT NULL
),
c AS (
  SELECT doc_id, shard, ord, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(len(toks) AS BIGINT))
                OVER (PARTITION BY shard ORDER BY ord, doc_id
                      ROWS UNBOUNDED PRECEDING) - len(toks) AS BIGINT) AS strt
  FROM b
),
spans AS (
  SELECT shard, ord, doc_id, toks, n_tokens, strt, s.pack_id
  FROM c, unnest(range(strt // {ctx}, (strt + n_tokens - 1) // {ctx} + 1))
         AS s(pack_id)
  WHERE n_tokens > 0
),
pieces AS (
  SELECT shard, pack_id, ord, doc_id,
         toks[CAST(greatest(0, pack_id * {ctx} - strt) + 1 AS BIGINT)
              : CAST(least(n_tokens, (pack_id + 1) * {ctx} - strt) AS BIGINT)]
           AS piece
  FROM spans
),
agg AS (
  SELECT shard, CAST(pack_id AS BIGINT) AS pack_id,
         flatten(list(piece ORDER BY ord, doc_id)) AS w
  FROM pieces GROUP BY 1, 2
)
SELECT shard, pack_id, CAST(len(w) AS BIGINT) AS n_tokens,
       array_to_string(w, ' ') AS window_text
FROM agg"""


def _o_pack_sequences() -> str:
    from .operators.packing import PACK_ORDER_SALT, PACK_SHARD_SALT

    h_shard = _sql_affine(
        f"(doc_id % {S.POLY_P})", S.MINHASH_A[PACK_SHARD_SALT], S.MINHASH_B[PACK_SHARD_SALT]
    )
    h_ord = _sql_affine(
        f"(doc_id % {S.POLY_P})", S.MINHASH_A[PACK_ORDER_SALT], S.MINHASH_B[PACK_ORDER_SALT]
    )
    return f"""
WITH b AS (
  SELECT doc_id,
         CAST(({h_shard}) % {_PACK_SHARDS} AS BIGINT) AS shard,
         ({h_ord}) AS ord,
         CAST(len(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL
),
c AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
  FROM b
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, shard, n_tokens,
       (strt // {_PACK_CTX}) AS pack_id,
       (strt % {_PACK_CTX}) AS pack_offset
FROM c"""


# --- vocabulary micro-gate -------------------------------------------------

_VOCAB_V = 200


def q_vocabulary(spark, sf_dir):
    """textstats.top_vocabulary: top-200 corpus tokens with occurrence
    count, document frequency, and deterministic rank."""
    from .operators.textstats import top_vocabulary

    return top_vocabulary(_docs(spark, sf_dir), v=_VOCAB_V).select(
        "term", "n_occurrences", "n_docs", "rank"
    )


O_VOCABULARY = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents WHERE text IS NOT NULL
),
per_doc AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
counts AS (
  SELECT term,
         CAST(SUM(tf) AS BIGINT) AS n_occurrences,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM per_doc GROUP BY term
),
ranked AS (
  SELECT term, n_occurrences, n_docs,
         ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term ASC) AS rank
  FROM counts
)
SELECT term, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_VOCAB_V}"""


# --- exact duplicated-span micro-gate --------------------------------------

#: gate span length: 13 (the decontam gram size) — short enough that the
#: corpus's exact-duplicate docs and shared sentences make the check
#: non-vacuous at every sf level; the operator default stays
#: semantics.SPAN_DEDUP_N = 50.
_SPAN_N = 13


def q_span_dedup(spark, sf_dir):
    """dedup.duplicated_span_report (Lee et al. ExactSubstr measure at
    fixed span length) over the real documents table."""
    from .operators.dedup import duplicated_span_report

    return duplicated_span_report(_docs(spark, sf_dir), n=_SPAN_N).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "n_spans",
        "n_dup_spans",
        "dup_span_pct",
        "span_dup_ok",
    )


def _o_span_dedup() -> str:
    k = _SPAN_N - 1
    tok_fold = (
        f"list_reduce(list_prepend(CAST({S.POLY_SEED0} AS BIGINT), "
        "list_transform(string_split(w, ''), c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {S.POLY_BASE} + c) % {S.POLY_P})"
    )
    span_fold = (
        f"list_reduce(list_prepend(CAST({S.POLY_SEED0} AS BIGINT), th[i:i+{k}]), "
        f"(acc, c) -> (acc * {S.POLY_BASE} + c) % {S.POLY_P})"
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS words
  FROM documents WHERE text IS NOT NULL
),
th AS (
  SELECT doc_id, list_transform(words, w -> {tok_fold}) AS th, len(words) AS nw
  FROM w WHERE len(words) > 0
),
hs AS (
  SELECT doc_id, {span_fold} AS h
  FROM th, unnest(range(1, greatest(nw - {k}, 1) + 1)) AS t(i)
),
pd AS (
  SELECT doc_id, h, CAST(COUNT(*) AS BIGINT) AS k_cnt FROM hs GROUP BY 1, 2
),
c AS (SELECT h, CAST(SUM(k_cnt) AS BIGINT) AS c FROM pd GROUP BY h),
r AS (
  SELECT pd.doc_id,
         CAST(SUM(k_cnt) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN c.c > 1 THEN k_cnt ELSE 0 END) AS BIGINT) AS n_dup
  FROM pd JOIN c USING (h) GROUP BY pd.doc_id
),
m AS (
  SELECT d.doc_id,
         coalesce(r.n_spans, 0) AS n_spans,
         coalesce(r.n_dup, 0) AS n_dup_spans,
         CASE WHEN coalesce(r.n_spans, 0) > 0
              THEN CAST(floor(coalesce(r.n_dup, 0) * 100 / r.n_spans) AS BIGINT)
              ELSE 0 END AS dup_span_pct
  FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_dup_spans AS BIGINT) AS n_dup_spans,
       dup_span_pct,
       dup_span_pct <= {S.DUP_SPAN_MAX_PCT} AS span_dup_ok
FROM m"""


# --- token-familiarity micro-gate ------------------------------------------


def q_familiarity(spark, sf_dir):
    """textstats.token_familiarity: CCNet-style quality proxy — mean
    corpus document-frequency of each doc's tokens in ppm, integer-exact
    `div` arithmetic end to end."""
    from .operators.textstats import token_familiarity

    return token_familiarity(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast(_BIG).alias("doc_id"),
        "n_tokens",
        "familiarity_ppm",
    )


O_FAMILIARITY = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents WHERE text IS NOT NULL
),
pdt AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
),
dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pdt GROUP BY term),
n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus
  FROM documents WHERE text IS NOT NULL
),
ppm AS (SELECT term, (df * 1000000 // n_corpus) AS term_ppm FROM dfs, n),
agg AS (
  SELECT pdt.doc_id,
         CAST(SUM(tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf * term_ppm) // SUM(tf) AS BIGINT) AS familiarity_ppm
  FROM pdt JOIN ppm USING (term) GROUP BY pdt.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.familiarity_ppm, 0) AS BIGINT) AS familiarity_ppm
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""


# ---------------------------------------------------------------------------
# Suites (driver-window slots) + individual sweep registry
# ---------------------------------------------------------------------------

_URL_SUITE = [
    ("url_norm", q_url_norm, O_URL_NORM, ["doc_id", "norm_url", "domain"]),
    ("latest_capture", q_latest_capture, O_LATEST_CAPTURE,
     ["doc_id", "url", "cap_seq", "norm_url"]),
    ("cap_domain", q_cap_domain, O_CAP_DOMAIN, ["doc_id", "url"]),
    ("blocked_domains", q_blocked_domains, O_BLOCKED_DOMAINS,
     ["doc_id", "url"]),
    # link-graph tier (operators/links.py) — members live in gate_links.py
    *LINK_SUITE_MEMBERS,
    # structured-data tier (operators/structured.py) — gate_structured.py
    *STRUCT_SUITE_MEMBERS,
    # page-policy tier (operators/policy.py) — gate_policy.py
    *POLICY_SUITE_MEMBERS,
    # robots.txt tier (operators/robots.py) — gate_robots.py
    *ROBOTS_SUITE_MEMBERS,
    # sitemap/feed discovery tier (operators/sitemaps.py) — gate_sitemaps.py
    *SITEMAP_SUITE_MEMBERS,
    # CDX capture-index tier (operators/cdx.py) — gate_cdx.py
    *CDX_SUITE_MEMBERS,
]

_CURATE_SUITE = [
    ("pii_redact", q_pii_redact, _o_pii_redact(),
     ["doc_id"] + [f"n_{c}" for c, _p, _r in S.PII_PATTERNS] + ["text_redacted"]),
    ("repetition", q_repetition, _o_repetition(),
     ["doc_id", "n_lines", "dup_line_pct", "dup_line_char_pct",
      "top2_char_pct", "dup5_char_pct", "repetition_ok"]),
    ("decontam", q_decontam, _o_decontam(),
     ["doc_id", "n_grams", "n_contaminated", "contam_pct", "contaminated"]),
    ("vocabulary", q_vocabulary, O_VOCABULARY,
     ["term", "n_occurrences", "n_docs", "rank"]),
    ("boilerplate_lines", q_boilerplate_lines, O_BOILERPLATE_LINES,
     ["line", "n_docs", "n_occurrences"]),
    ("line_dedup", q_line_dedup, O_LINE_DEDUP,
     ["doc_id", "text_clean", "n_lines_kept", "n_lines_removed"]),
    ("familiarity", q_familiarity, O_FAMILIARITY,
     ["doc_id", "n_tokens", "familiarity_ppm"]),
    ("span_dedup", q_span_dedup, _o_span_dedup(),
     ["doc_id", "n_spans", "n_dup_spans", "dup_span_pct", "span_dup_ok"]),
]

_SAMPLING_SUITE = [
    ("stratified_sample", q_stratified_sample, _o_stratified_sample(),
     ["source", "doc_id"]),
    ("hash_sample", q_hash_sample, _o_hash_sample(), ["doc_id"]),
    ("kmv_distinct", q_kmv_distinct, _o_kmv_distinct(),
     ["lang", "kmv_distinct"]),
    ("mixture_rates", q_mixture_rates, O_MIXTURE_RATES,
     ["source", "n_docs", "target_permille", "keep_docs", "rate_ppm"]),
    ("mixture_sample", q_mixture_sample, _o_mixture_sample(),
     ["source", "doc_id"]),
    ("pack_sequences", q_pack_sequences, _o_pack_sequences(),
     ["doc_id", "shard", "n_tokens", "pack_id", "pack_offset"]),
    ("pack_windows", q_pack_windows, _o_pack_windows(),
     ["shard", "pack_id", "n_tokens", "window_text"]),
]

q_url_suite = suite_query(_URL_SUITE)
O_URL_SUITE = suite_oracle(_URL_SUITE)
q_curation_suite = suite_query(_CURATE_SUITE)
O_CURATION_SUITE = suite_oracle(_CURATE_SUITE)
q_sampling_suite = suite_query(_SAMPLING_SUITE)
O_SAMPLING_SUITE = suite_oracle(_SAMPLING_SUITE)

#: driver-window entries (3 slots: the 2 new curation suites + the
#: sampling fold that paid for them)
CURATION_QUERIES = {
    "td_sampling_suite": q_sampling_suite,
    "td_url_suite": q_url_suite,
    "td_curation_suite": q_curation_suite,
}

CURATION_ORACLES = {
    "td_sampling_suite": O_SAMPLING_SUITE,
    "td_url_suite": O_URL_SUITE,
    "td_curation_suite": O_CURATION_SUITE,
}

#: folded members, individually swept by scripts/check_gate.py (sampling
#: members ride gate_textdata.TEXT_MICRO_QUERIES)
CURATION_MICRO_QUERIES = {
    **{f"td_{g}": fn for g, fn, _sql, _cols in LINK_SUITE_MEMBERS},
    **{f"td_{g}": fn for g, fn, _sql, _cols in STRUCT_SUITE_MEMBERS},
    **{f"td_{g}": fn for g, fn, _sql, _cols in POLICY_SUITE_MEMBERS},
    **{f"td_{g}": fn for g, fn, _sql, _cols in ROBOTS_SUITE_MEMBERS},
    **{f"td_{g}": fn for g, fn, _sql, _cols in SITEMAP_SUITE_MEMBERS},
    **{f"td_{g}": fn for g, fn, _sql, _cols in CDX_SUITE_MEMBERS},
    "td_url_norm": q_url_norm,
    "td_latest_capture": q_latest_capture,
    "td_cap_domain": q_cap_domain,
    "td_blocked_domains": q_blocked_domains,
    "td_pii_redact": q_pii_redact,
    "td_repetition": q_repetition,
    "td_decontam": q_decontam,
    "td_mixture_rates": q_mixture_rates,
    "td_mixture_sample": q_mixture_sample,
    "td_pack_sequences": q_pack_sequences,
    "td_pack_windows": q_pack_windows,
    "td_vocabulary": q_vocabulary,
    "td_boilerplate_lines": q_boilerplate_lines,
    "td_line_dedup": q_line_dedup,
    "td_familiarity": q_familiarity,
    "td_span_dedup": q_span_dedup,
}

CURATION_MICRO_ORACLES = {
    **{f"td_{g}": sql for g, _fn, sql, _cols in LINK_SUITE_MEMBERS},
    **{f"td_{g}": sql for g, _fn, sql, _cols in STRUCT_SUITE_MEMBERS},
    **{f"td_{g}": sql for g, _fn, sql, _cols in POLICY_SUITE_MEMBERS},
    **{f"td_{g}": sql for g, _fn, sql, _cols in ROBOTS_SUITE_MEMBERS},
    **{f"td_{g}": sql for g, _fn, sql, _cols in SITEMAP_SUITE_MEMBERS},
    **{f"td_{g}": sql for g, _fn, sql, _cols in CDX_SUITE_MEMBERS},
    "td_url_norm": O_URL_NORM,
    "td_latest_capture": O_LATEST_CAPTURE,
    "td_cap_domain": O_CAP_DOMAIN,
    "td_blocked_domains": O_BLOCKED_DOMAINS,
    "td_pii_redact": _o_pii_redact(),
    "td_repetition": _o_repetition(),
    "td_decontam": _o_decontam(),
    "td_mixture_rates": O_MIXTURE_RATES,
    "td_mixture_sample": _o_mixture_sample(),
    "td_pack_sequences": _o_pack_sequences(),
    "td_pack_windows": _o_pack_windows(),
    "td_vocabulary": O_VOCABULARY,
    "td_boilerplate_lines": O_BOILERPLATE_LINES,
    "td_line_dedup": O_LINE_DEDUP,
    "td_familiarity": O_FAMILIARITY,
    "td_span_dedup": _o_span_dedup(),
}
