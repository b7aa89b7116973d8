"""Driver-window gates for the structured-data tier
(operators/structured.py): JSON-LD block extraction → typed triples →
entity summary, each hash-pinned against a DuckDB twin that runs the
IDENTICAL semantics.py regexes (JSONLD_SCRIPT_RE / JSONLD_BODY_RE) and
JSONPath vocabulary (JSONLD_ID_PATHS / JSONLD_TYPE_PATH / JSONLD_PROPS
— the dialect Spark's get_json_object and DuckDB's json_extract_string
share) over html synthesized IDENTICALLY in both engines from the
documents table.

The members ride ``td_url_suite`` (gate_curation.py) next to the link
tier, so the exported ``queries()`` surface stays at exactly 50
(CLAUDE.md hard rule); scripts/check_gate.py sweeps each member
individually via CURATION_MICRO_QUERIES.

The synthetic html covers every branch: a double-quoted Article block
with nested author/publisher objects (exercises the '.name' coalesce
paths), an uppercase <SCRIPT> single-quoted-type Person block on even
doc_ids (varies block counts per page), a text/javascript decoy that
must not match, an attribute before ``type=`` on the Article tag, and —
on doc_id % 5 == 0 — a JSON-LD block whose body contains '<' and is
therefore dropped whole per the documented extraction rule.  All gate
JSON is valid by construction: DuckDB's json_extract_string raises on
malformed input where Spark returns NULL, so the graceful-degradation
branch is pinned in tests/test_structured.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import semantics as S
from .gate_textdata import _docs

_BIG = "bigint"


def jsonld_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    article = F.concat(
        F.lit('<script async type="application/ld+json">'),
        F.lit('{"@context":"https://schema.org","@type":"Article",'),
        F.lit('"@id":"https://ex.org/a/'), s(i % 7),
        F.lit('","name":"Article '), s(i % 7),
        F.lit('","headline":"H'), s(i % 5),
        F.lit('","author":{"@type":"Person","name":"Author '), s(i % 11),
        F.lit('"},"datePublished":"2020-01-'), s(i % 28 + 1),
        F.lit('","publisher":{"name":"Pub '), s(i % 3),
        F.lit('"}}</script>'),
    )
    decoy = F.lit('<script type="text/javascript">var x=1;</script>')
    person = F.when(
        i % 2 == 0,
        F.concat(
            F.lit("<SCRIPT TYPE='application/ld+json'>"),
            F.lit('{"@type":"Person","name":"Author '), s(i % 11),
            F.lit('","jobTitle":"JT'), s(i % 4),
            F.lit('","worksFor":{"name":"Org '), s(i % 5),
            F.lit('"}}</SCRIPT>'),
        ),
    ).otherwise(F.lit(""))
    dropped = F.when(
        i % 5 == 0,
        F.lit('<script type="application/ld+json">{"x":"<t>"}</script>'),
    ).otherwise(F.lit(""))
    return docs.select(
        F.concat(F.lit("https://site"), s(i % 3), F.lit(".example/p/"), s(i)).alias(
            "url"
        ),
        F.concat(article, decoy, person, dropped).alias("html"),
    )


_DUCK_PAGES = """
p AS (
  SELECT
    'https://site' || (doc_id % 3) || '.example/p/' || doc_id AS url,
    '<script async type="application/ld+json">'
      || '{"@context":"https://schema.org","@type":"Article",'
      || '"@id":"https://ex.org/a/' || (doc_id % 7)
      || '","name":"Article ' || (doc_id % 7)
      || '","headline":"H' || (doc_id % 5)
      || '","author":{"@type":"Person","name":"Author ' || (doc_id % 11)
      || '"},"datePublished":"2020-01-' || (doc_id % 28 + 1)
      || '","publisher":{"name":"Pub ' || (doc_id % 3)
      || '"}}</script>'
      || '<script type="text/javascript">var x=1;</script>'
      || CASE WHEN doc_id % 2 = 0 THEN
           '<SCRIPT TYPE=''application/ld+json''>'
           || '{"@type":"Person","name":"Author ' || (doc_id % 11)
           || '","jobTitle":"JT' || (doc_id % 4)
           || '","worksFor":{"name":"Org ' || (doc_id % 5)
           || '"}}</SCRIPT>'
         ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN
           '<script type="application/ld+json">{"x":"<t>"}</script>'
         ELSE '' END AS html
  FROM documents
)"""

_DUCK_BLOCKS = f"""
arr AS (
  SELECT url, regexp_extract_all(html, '{S.JSONLD_SCRIPT_RE}') AS scripts
  FROM p
),
b AS (
  SELECT url,
         generate_subscripts(scripts, 1) - 1 AS block_idx,
         unnest(scripts) AS script
  FROM arr
),
blocks AS (
  SELECT url, block_idx,
         regexp_extract(script, '{S.JSONLD_BODY_RE}', 1) AS block
  FROM b
)"""


def _sql_first_path(paths: tuple[str, ...]) -> str:
    return (
        "coalesce("
        + ", ".join(f"json_extract_string(block, '{p}')" for p in paths)
        + ")"
    )


def _duck_triples() -> str:
    branches = [
        f"SELECT url, block_idx, subj, subj_type, '{pred}' AS pred, "
        f"{_sql_first_path(paths)} AS obj FROM s"
        for pred, paths in S.JSONLD_PROPS
    ]
    branches.append(
        "SELECT url, block_idx, subj, subj_type, '@type' AS pred, "
        "subj_type AS obj FROM s"
    )
    union = "\n  UNION ALL\n  ".join(branches)
    return f"""
s AS (
  SELECT url, block_idx, block,
         {_sql_first_path(S.JSONLD_ID_PATHS)} AS subj,
         json_extract_string(block, '{S.JSONLD_TYPE_PATH}') AS subj_type
  FROM blocks
),
t AS (
  {union}
),
triples AS (
  SELECT url, block_idx, subj, subj_type, pred, obj
  FROM t WHERE subj IS NOT NULL AND obj IS NOT NULL AND obj <> ''
)"""


# --- members ---------------------------------------------------------------


def q_jsonld_blocks(spark, sf_dir):
    """structured.extract_jsonld: per-script (url, block_idx, block) —
    generate + projection only, zero exchanges."""
    from .operators.structured import extract_jsonld

    return extract_jsonld(jsonld_pages(spark, sf_dir)).select(
        "url", F.col("block_idx").cast(_BIG).alias("block_idx"), "block"
    )


O_JSONLD_BLOCKS = (
    f"WITH {_DUCK_PAGES}, {_DUCK_BLOCKS} "
    "SELECT url, CAST(block_idx AS BIGINT) AS block_idx, block FROM blocks"
)


def q_jsonld_triples(spark, sf_dir):
    """structured.jsonld_triples: (url, block_idx, subj, subj_type,
    pred, obj) — stack() unpivot over the fixed vocabulary, still zero
    exchanges."""
    from .operators.structured import jsonld_triples

    return jsonld_triples(jsonld_pages(spark, sf_dir)).select(
        "url",
        F.col("block_idx").cast(_BIG).alias("block_idx"),
        "subj",
        "subj_type",
        "pred",
        "obj",
    )


O_JSONLD_TRIPLES = (
    f"WITH {_DUCK_PAGES}, {_DUCK_BLOCKS}, {_duck_triples()} "
    "SELECT url, CAST(block_idx AS BIGINT) AS block_idx, subj, subj_type, "
    "pred, obj FROM triples"
)


def q_jsonld_entities(spark, sf_dir):
    """structured.jsonld_entity_summary: per (subj_type, subj) distinct
    page count + triple count — the tier's one shuffle."""
    from .operators.structured import jsonld_entity_summary

    return jsonld_entity_summary(jsonld_pages(spark, sf_dir)).select(
        "subj_type",
        "subj",
        F.col("n_pages").cast(_BIG).alias("n_pages"),
        F.col("n_triples").cast(_BIG).alias("n_triples"),
    )


O_JSONLD_ENTITIES = (
    f"WITH {_DUCK_PAGES}, {_DUCK_BLOCKS}, {_duck_triples()} "
    "SELECT subj_type, subj, CAST(COUNT(DISTINCT url) AS BIGINT) AS n_pages, "
    "CAST(COUNT(*) AS BIGINT) AS n_triples FROM triples "
    "GROUP BY subj_type, subj"
)


#: folded into gate_curation's td_url_suite + CURATION_MICRO_* registries
STRUCT_SUITE_MEMBERS = [
    ("jsonld_blocks", q_jsonld_blocks, O_JSONLD_BLOCKS,
     ["url", "block_idx", "block"]),
    ("jsonld_triples", q_jsonld_triples, O_JSONLD_TRIPLES,
     ["url", "block_idx", "subj", "subj_type", "pred", "obj"]),
    ("jsonld_entities", q_jsonld_entities, O_JSONLD_ENTITIES,
     ["subj_type", "subj", "n_pages", "n_triples"]),
]
