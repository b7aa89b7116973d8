"""Structured-data extraction: schema.org JSON-LD blocks → typed
entities and (subj, pred, obj) triples — how production web-scale KG
builds bootstrap their graph from markup before touching free text
(the reference's analogue is the typed metadata it pulls per paper from
the ArXiv/S2 APIs, fetch_papers.py:59-189; here the typed records come
out of the page html itself).

Pipeline shape::

    pages(url, html, ...) ── extract_jsonld ──► (url, block_idx, block)
        ── jsonld_triples ──► (url, subj, subj_type, pred, obj)
        ── jsonld_entity_summary ──► (subj_type, subj, n_pages, n_triples)

Every stage is pure Column work from the ``semantics`` constants
(JSONLD_SCRIPT_RE / JSONLD_BODY_RE / JSONLD_ID_PATHS / JSONLD_PROPS —
the Java-regex ∩ RE2 subset and the JSONPath dialect both Spark's
``get_json_object`` and DuckDB's ``json_extract_string`` accept), so
the DuckDB twins in gate_structured.py run identical semantics.  No
UDFs anywhere.

Extraction rule, not a parser: a block counts iff it matches
JSONLD_SCRIPT_RE whole (quoted type attribute, no '<' in the body);
properties come from the FIXED vocabulary semantics.JSONLD_PROPS — a
target schema, the way real KG pipelines extract (arbitrary-key
explosion is neither engine-portable nor useful downstream).  Malformed
JSON degrades to NULL extracts (rows filter out) rather than raising.

Scale shape (100 TB): block extraction is regexp_extract_all +
posexplode — a generate inside the scan stage, zero exchanges; triple
extraction is a stack() unpivot over ~10 fixed paths, still projection
only.  ``jsonld_entity_summary`` is the tier's single shuffle (one
partial-aggregated groupBy on (subj_type, subj)).  Triples are linear
in block count; nothing is quadratic.  The (subj, pred, obj) rows union
cleanly with the text-derived triples of operators/triples.py
(composition pinned in tests/test_structured.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import semantics as S


def extract_jsonld(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per matched JSON-LD <script> element: (url_col,
    block_idx, block) with block_idx the 0-based match position within
    the page (deterministic: document order).  ``html_col`` may be
    binary (WARC payload) or string.  Generate-only: no exchange."""
    html = F.col(html_col).cast("string")
    return pages.select(
        F.col(url_col),
        F.posexplode(
            F.regexp_extract_all(html, F.lit(S.JSONLD_SCRIPT_RE), F.lit(0))
        ).alias("block_idx", "_script"),
    ).select(
        url_col,
        "block_idx",
        F.regexp_extract("_script", S.JSONLD_BODY_RE, 1).alias("block"),
    )


def _first_path(block: Column, paths: tuple[str, ...]) -> Column:
    return F.coalesce(*[F.get_json_object(block, p) for p in paths])


def jsonld_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, block_idx, subj, subj_type, pred, obj) rows from every
    JSON-LD block: subj = first of @id/url/name (blocks with none are
    dropped — nothing to key the entity on), subj_type = @type (may be
    NULL), one row per JSONLD_PROPS predicate whose extract is non-NULL
    non-empty, plus an explicit ('@type', subj_type) row so the type
    assertion itself is a triple.  Pure projection over
    :func:`extract_jsonld` — still zero exchanges."""
    b = extract_jsonld(pages, url_col, html_col)
    block = F.col("block")
    stack_args: list[Column] = []
    for pred, paths in S.JSONLD_PROPS:
        stack_args.append(F.lit(pred))
        stack_args.append(_first_path(block, paths))
    stack_args.append(F.lit("@type"))
    stack_args.append(F.get_json_object(block, S.JSONLD_TYPE_PATH))
    n = len(S.JSONLD_PROPS) + 1
    return (
        b.select(
            url_col,
            "block_idx",
            _first_path(block, S.JSONLD_ID_PATHS).alias("subj"),
            F.get_json_object(block, S.JSONLD_TYPE_PATH).alias("subj_type"),
            F.stack(F.lit(n), *stack_args).alias("pred", "obj"),
        )
        .where(F.col("subj").isNotNull() & F.col("obj").isNotNull() & (F.col("obj") != ""))
    )


def jsonld_entity_summary(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Canonical structured-entity table: per (subj_type, subj) the
    number of distinct pages asserting it and the total triple count —
    the tier's one shuffle (partial-aggregated groupBy)."""
    t = jsonld_triples(pages, url_col, html_col)
    return t.groupBy("subj_type", "subj").agg(
        F.countDistinct(url_col).alias("n_pages"),
        F.count(F.lit(1)).alias("n_triples"),
    )
