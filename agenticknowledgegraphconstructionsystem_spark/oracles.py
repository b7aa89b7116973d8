"""DuckDB oracle-SQL builders for the driver's correctness gate.

Each function returns ANSI SQL (DuckDB dialect) that reproduces — bit for
bit — the output of the matching Spark query in ``__spark_entry__.py`` over
the same parquet tables.  The SQL is *generated* from the same constants in
:mod:`semantics` that the Spark operators use, so the two sides cannot
drift.

Exactness rules (why the gate can hash-match):
* every score is integer percent — no float ever enters a comparison,
* counts/sums are CAST to BIGINT on both sides (DuckDB SUM(int) returns
  HUGEINT otherwise),
* string building uses the same concat templates,
* all detection is substring containment + strpos, identical semantics in
  Spark (`position`/`contains`) and DuckDB (`strpos`/`contains`).
"""

from __future__ import annotations

from . import semantics as S

# ---------------------------------------------------------------------------
# shared CTE fragments over the driver's `documents` view
# ---------------------------------------------------------------------------


def _gaz_values() -> str:
    return ", ".join(f"('{n}', '{t}')" for n, t in S.GAZETTEER)


def mentions_cte() -> str:
    """CTEs: gaz, docs_t, mentions — the D1 detector over documents.text."""
    return f"""
gaz(name, concept_type) AS (VALUES {_gaz_values()}),
docs_t AS (
  SELECT doc_id,
         substr(text, 1, {S.EXTRACT_TRUNCATE_CHARS}) AS t,
         lower(substr(text, 1, {S.EXTRACT_TRUNCATE_CHARS})) AS lt,
         length(substr(text, 1, {S.EXTRACT_TRUNCATE_CHARS})) AS n
  FROM documents WHERE text IS NOT NULL
),
mentions AS (
  SELECT doc_id, name, concept_type,
         CAST(LEAST(100,
           CASE WHEN pos = 1 THEN 100
                WHEN pos * 4 <= n THEN 80
                WHEN pos * 2 <= n THEN 60
                ELSE 45 END
           + 5 * LEAST(GREATEST(occ - 1, 0), 4)) AS BIGINT) AS relevance_pct,
         CAST(pos AS BIGINT) AS pos,
         substr(t, pos, {S.CONTEXT_MAX}) AS context
  FROM (
    SELECT d.doc_id, g.name, g.concept_type, d.t, d.n,
           strpos(d.lt, g.name) AS pos,
           CAST((length(d.lt) - length(replace(d.lt, g.name, ''))) / length(g.name) AS INT) AS occ
    FROM docs_t d CROSS JOIN gaz g
  )
  WHERE pos > 0
)"""


def entities_cte(src: str = "mentions") -> str:
    return f"""
entities AS (
  SELECT name, concept_type,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS mention_count,
         CAST(SUM(relevance_pct) AS BIGINT) AS sum_relevance_pct,
         CAST(MAX(relevance_pct) AS BIGINT) AS max_relevance_pct,
         CAST(MIN(relevance_pct) AS BIGINT) AS min_relevance_pct
  FROM {src} GROUP BY name, concept_type
)"""


def first_context_cte() -> str:
    """CTEs: dedup_edges, first_ctx — the A8 best-mention edge dedup
    (relevance DESC, pos ASC, context ASC per (doc, name)) followed by the
    keep-first description rule (database.ts:109): context of the smallest
    doc_id per name.  (doc_id, name) is unique in dedup_edges, so
    arg_min(context, doc_id) is tie-free."""
    return """
dedup_edges AS (
  SELECT doc_id, name, context FROM (
    SELECT doc_id, name, context,
           row_number() OVER (PARTITION BY doc_id, name
                              ORDER BY relevance_pct DESC, pos ASC, context ASC) AS rn
    FROM mentions) WHERE rn = 1
),
first_ctx AS (
  SELECT name, arg_min(context, doc_id) AS first_context
  FROM dedup_edges GROUP BY name
)"""


def _contains_any(col: str, keywords: tuple[str, ...]) -> str:
    return "(" + " OR ".join(f"contains({col}, '{kw}')" for kw in keywords) + ")"


def relationships_cte() -> str:
    """CTEs: seminal, shared, buckets, rels — J3 hub-spoke + D3 + D4."""
    kw_case = " ".join(
        f"WHEN {_contains_any('lt', S.TYPE_KEYWORDS[t])} THEN '{t}'"
        for t in S.RELATIONSHIP_TYPES
    )
    fallback = f"""CASE WHEN hi >= 3 THEN 'builds_on'
                      WHEN hi >= 1 THEN 'extends'
                      WHEN med >= 2 THEN 'evaluates'
                      WHEN med >= 1 THEN 'addresses'
                      WHEN lo >= 1 THEN 'cites'
                      ELSE NULL END"""
    kw_found = _contains_any(
        "lt", tuple(kw for t in S.RELATIONSHIP_TYPES for kw in S.TYPE_KEYWORDS[t])
    )
    first_kw_case = " ".join(
        f"WHEN rel_type = '{t}' THEN '{S.TYPE_KEYWORDS[t][0]}'"
        for t in S.RELATIONSHIP_TYPES
    )
    return f"""
seminal AS (SELECT MIN(doc_id) AS s FROM mentions),
mf AS (SELECT doc_id, name, relevance_pct FROM mentions WHERE relevance_pct >= {S.MIN_RELEVANCE_PCT}),
sem_m AS (SELECT name, relevance_pct AS sem_rel FROM mf, seminal WHERE doc_id = s),
shared AS (
  SELECT mf.doc_id, mf.name, mf.relevance_pct + sem_m.sem_rel AS avg2
  FROM mf JOIN sem_m USING (name), seminal WHERE mf.doc_id <> s
),
buckets AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(CASE WHEN avg2 >= {2 * S.HI_BUCKET_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN avg2 >= {2 * S.MED_BUCKET_PCT} AND avg2 < {2 * S.HI_BUCKET_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS med,
         CAST(SUM(CASE WHEN avg2 >= {2 * S.LO_BUCKET_PCT} AND avg2 < {2 * S.MED_BUCKET_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS lo
  FROM shared GROUP BY doc_id
),
cand AS (SELECT DISTINCT doc_id FROM mentions, seminal WHERE doc_id <> s),
stats AS (
  SELECT c.doc_id,
         COALESCE(b.n_shared, 0) AS n_shared,
         COALESCE(b.hi, 0) AS hi, COALESCE(b.med, 0) AS med, COALESCE(b.lo, 0) AS lo
  FROM cand c LEFT JOIN buckets b USING (doc_id)
),
classified AS (
  SELECT st.*, sem.s AS target_doc_id,
         CASE {kw_case} ELSE {fallback} END AS rel_type,
         {kw_found} AS kw_found,
         CASE WHEN n_shared = 0 THEN {S.CONF_FLOOR_PCT}
              ELSE LEAST({S.CONF_CEIL_PCT}, GREATEST({S.CONF_FLOOR_PCT},
                   {S.HI_WEIGHT_PCT}*hi + {S.MED_WEIGHT_PCT}*med + {S.LO_WEIGHT_PCT}*lo)) END AS base_pct
  FROM stats st
  JOIN (SELECT doc_id, lower(coalesce(text, '')) AS lt FROM documents) d USING (doc_id),
  seminal sem
),
rels AS (
  SELECT doc_id AS source_doc_id, target_doc_id, rel_type,
         CAST(CASE WHEN kw_found THEN LEAST({S.CONF_KEYWORD_CEIL_PCT}, base_pct + {S.KEYWORD_BONUS_PCT})
                   ELSE base_pct END AS BIGINT) AS confidence_pct,
         CAST(n_shared AS BIGINT) AS n_shared,
         CAST(hi AS BIGINT) AS hi, CAST(med AS BIGINT) AS med, CAST(lo AS BIGINT) AS lo,
         CASE WHEN rel_type IS NULL THEN
           'no meaningful relationship found across ' || CAST(n_shared AS VARCHAR) || ' shared concepts'
         ELSE
           'source paper ' || (CASE {first_kw_case} END) || 's the seminal work, derived from '
           || CAST(n_shared AS VARCHAR) || ' shared concepts (hi=' || CAST(hi AS VARCHAR)
           || ', med=' || CAST(med AS VARCHAR) || ', lo=' || CAST(lo AS VARCHAR) || ')'
         END AS explanation
  FROM classified
)"""


def _generic_list() -> str:
    return ", ".join(f"'{g}'" for g in S.GENERIC_TERMS)


def entity_findings_cte(msrc: str = "mentions") -> str:
    """Rules E1-E4 over entities (+ link counts from mentions-dedup edges).
    Gate shape: one row per (item_key, rule, severity)."""
    return f"""
links AS (SELECT name, CAST(COUNT(*) AS BIGINT) AS link_count
          FROM (SELECT DISTINCT doc_id, name FROM {msrc}) GROUP BY name),
ent_base AS (
  SELECT e.*, COALESCE(l.link_count, 0) AS link_count FROM entities e LEFT JOIN links l USING (name)
),
entity_findings AS (
  SELECT 'entity' AS item_kind, name AS item_key, 'no_generic_terms' AS rule, 'error' AS severity
    FROM ent_base WHERE lower(trim(name)) IN ({_generic_list()})
  UNION ALL
  SELECT 'entity', name, 'name_too_short', 'error' FROM ent_base WHERE length(trim(name)) < {S.NAME_MIN_LEN}
  UNION ALL
  SELECT 'entity', name, 'name_too_long', 'warning' FROM ent_base WHERE length(trim(name)) > {S.NAME_WARN_LEN}
  UNION ALL
  SELECT 'entity', name, 'invalid_relevance_score', 'error' FROM ent_base
    WHERE min_relevance_pct < 0 OR max_relevance_pct > 100
  UNION ALL
  SELECT 'entity', name, 'suspicious_perfect_score', 'warning' FROM ent_base
    WHERE max_relevance_pct = 100 AND mention_count = 1
  UNION ALL
  SELECT 'entity', name, 'mention_count_mismatch', 'warning' FROM ent_base
    WHERE mention_count < link_count
)"""


def relationship_findings_cte() -> str:
    """Rules R1-R5 over rels."""
    mismatch_cases = " ".join(
        f"WHEN rel_type = '{t}' THEN NOT {_contains_any('lower(explanation)', S.TYPE_KEYWORDS[t])}"
        for t in S.RELATIONSHIP_TYPES
    )
    key = "CAST(source_doc_id AS VARCHAR) || '->' || CAST(target_doc_id AS VARCHAR) || '->' || COALESCE(rel_type, 'null')"
    return f"""
rel_base AS (SELECT *, {key} AS item_key FROM rels),
relationship_findings AS (
  SELECT 'relationship' AS item_kind, item_key, 'self_reference' AS rule, 'error' AS severity
    FROM rel_base WHERE source_doc_id = target_doc_id
  UNION ALL
  SELECT 'relationship', item_key, 'invalid_confidence', 'error' FROM rel_base
    WHERE confidence_pct < 0 OR confidence_pct > 100
  UNION ALL
  SELECT 'relationship', item_key, 'low_confidence', 'warning' FROM rel_base
    WHERE confidence_pct >= 0 AND confidence_pct < {S.LOW_CONFIDENCE_PCT}
  UNION ALL
  SELECT 'relationship', item_key, 'very_low_confidence', 'warning' FROM rel_base
    WHERE confidence_pct >= 0 AND confidence_pct < {S.VERY_LOW_CONFIDENCE_PCT}
  UNION ALL
  SELECT 'relationship', item_key, 'type_explanation_mismatch', 'warning' FROM rel_base
    WHERE rel_type IS NOT NULL AND (CASE {mismatch_cases} ELSE TRUE END)
  UNION ALL
  SELECT 'relationship', item_key, 'null_type_high_confidence', 'warning' FROM rel_base
    WHERE rel_type IS NULL AND confidence_pct > 50
  UNION ALL
  SELECT 'relationship', item_key, 'null_type_low_confidence', 'info' FROM rel_base
    WHERE rel_type IS NULL AND confidence_pct <= 50
  UNION ALL
  SELECT 'relationship', item_key, 'explanation_too_short', 'warning' FROM rel_base
    WHERE length(trim(explanation)) < {S.EXPLANATION_MIN_LEN}
  UNION ALL
  SELECT 'relationship', item_key, 'explanation_missing', 'warning' FROM rel_base
    WHERE trim(explanation) = '' OR lower(trim(explanation)) = '{S.PLACEHOLDER_EXPLANATION}'
)"""


def with_kg(*extra_ctes: str) -> str:
    return "WITH " + ",".join([mentions_cte(), *extra_ctes])


def _summary_sql() -> str:
    return f"""
all_f AS (SELECT * FROM entity_findings UNION ALL SELECT * FROM relationship_findings),
counts AS (
  SELECT item_kind,
         CAST(COUNT(DISTINCT CASE WHEN severity = 'error' THEN item_key END) AS BIGINT) AS invalid_items,
         CAST(SUM(CASE WHEN severity = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         CAST(SUM(CASE WHEN severity = 'warning' THEN 1 ELSE 0 END) AS BIGINT) AS warnings
  FROM all_f GROUP BY item_kind
),
totals AS (
  SELECT 'entity' AS item_kind, CAST(COUNT(*) AS BIGINT) AS total FROM entities
  UNION ALL
  SELECT 'relationship', CAST(COUNT(*) AS BIGINT) FROM rels
)
SELECT t.item_kind, t.total,
       t.total - COALESCE(c.invalid_items, 0) AS valid,
       COALESCE(c.invalid_items, 0) AS invalid,
       COALESCE(c.errors, 0) AS errors,
       COALESCE(c.warnings, 0) AS warnings
FROM totals t LEFT JOIN counts c USING (item_kind)"""


def open_triples_sql() -> str:
    """D2 oracle: sentence split + ordered gazetteer pair with a type
    keyword strictly between the first occurrences (strpos is 1-based but
    the pa < pk < pb inequalities are shift-invariant)."""
    gaz_names = ", ".join(f"('{n}')" for n, _ in S.GAZETTEER)
    kws = ", ".join(
        f"('{t}', '{kw}')" for t in S.RELATIONSHIP_TYPES for kw in S.TYPE_KEYWORDS[t]
    )
    return f"""
WITH gaz(name) AS (VALUES {gaz_names}),
kws(rtype, kw) AS (VALUES {kws}),
seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || '. the spark pipeline improves the seminal table scan approach.'
              ELSE text END AS text
  FROM documents
),
sarr AS (
  SELECT doc_id,
         string_split_regex(substr(text, 1, {S.EXTRACT_TRUNCATE_CHARS}), '{S.SENTENCE_SPLIT_RE}') AS arr
  FROM seeded WHERE text IS NOT NULL
),
sents AS (
  SELECT doc_id, i - 1 AS sent_idx, lower(arr[i]) AS ls
  FROM sarr, unnest(range(1, len(arr) + 1)) AS t(i)
),
pres AS (
  SELECT s.doc_id, s.sent_idx, g.name, strpos(s.ls, g.name) AS p
  FROM sents s CROSS JOIN gaz g WHERE strpos(s.ls, g.name) > 0
),
kwp AS (
  SELECT s.doc_id, s.sent_idx, k.rtype, strpos(s.ls, k.kw) AS pk
  FROM sents s CROSS JOIN kws k WHERE strpos(s.ls, k.kw) > 0
),
trip AS (
  SELECT a.doc_id, a.name AS subj, k.rtype AS pred, b.name AS obj, a.sent_idx
  FROM pres a
  JOIN pres b ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.name <> b.name
  JOIN kwp k ON k.doc_id = a.doc_id AND k.sent_idx = a.sent_idx
            AND k.pk > a.p AND k.pk < b.p
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, subj, pred, obj,
       CAST(MIN(sent_idx) AS BIGINT) AS sent_idx
FROM trip GROUP BY doc_id, subj, pred, obj"""


#: oracle SQL per gate-query key (DuckDB dialect; driver pre-registers the
#: parquet tables as views)
KG_ORACLES: dict[str, str] = {
    "kg_mentions": with_kg()
    + """
SELECT CAST(doc_id AS BIGINT) AS doc_id, name, concept_type, relevance_pct, pos, context
FROM mentions""",
    # the streaming drain is transport, not semantics: the oracle is the
    # batch mentions CTE restricted to the gate's doc window — any
    # duplicate/lost/corrupted row in the two-drain checkpointed sink
    # breaks the hash (gate.q_stream_mentions)
    "kg_stream_mentions": with_kg()
    + f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, name, concept_type, relevance_pct, pos, context
FROM mentions WHERE doc_id < {S.STREAM_GATE_DOCS}""",
    "kg_entities": with_kg(entities_cte(), first_context_cte())
    + """
SELECT e.name, e.concept_type, e.mention_count, e.sum_relevance_pct,
       e.max_relevance_pct, e.min_relevance_pct, f.first_context
FROM entities e LEFT JOIN first_ctx f ON e.name = f.name""",
    "kg_top_concepts": with_kg(entities_cte())
    + """
SELECT name, concept_type, mention_count FROM entities
ORDER BY mention_count DESC, name ASC LIMIT 10""",
    "kg_relationships": with_kg(relationships_cte())
    + """
SELECT CAST(source_doc_id AS BIGINT) AS source_doc_id,
       CAST(target_doc_id AS BIGINT) AS target_doc_id,
       rel_type, confidence_pct, n_shared, hi, med, lo, explanation
FROM rels""",
    "kg_entity_findings": with_kg(
        # semantics.ENTITY_FINDING_SEEDS unioned into mentions so every rule
        # family has a tripping row (mirrors gate.q_entity_findings)
        "seeds(doc_id, name, concept_type, relevance_pct, pos, context) AS "
        "(VALUES "
        + ", ".join(
            f"(CAST({d} AS BIGINT), '{n}', '{t}', CAST({r} AS BIGINT), "
            f"CAST({p} AS BIGINT), '{c}')"
            for d, n, t, r, p, c in S.ENTITY_FINDING_SEEDS
        )
        + ")",
        "m2 AS (SELECT * FROM mentions UNION ALL SELECT * FROM seeds)",
        entities_cte(src="m2"),
        entity_findings_cte(msrc="m2"),
    )
    + """
SELECT item_kind, item_key, rule, severity FROM entity_findings""",
    "kg_relationship_findings": with_kg(relationships_cte(), relationship_findings_cte())
    + """
SELECT item_kind, item_key, rule, severity FROM relationship_findings""",
    "kg_validation_summary": with_kg(
        entities_cte(),
        relationships_cte(),
        entity_findings_cte(),
        relationship_findings_cte(),
        _summary_sql().split("\nSELECT", 1)[0].lstrip("\n"),
    )
    + "\nSELECT"
    + _summary_sql().split("\nSELECT", 1)[1],
    "kg_triples": with_kg(relationships_cte())
    + """
SELECT CAST(doc_id AS VARCHAR) AS subj, 'mentions' AS pred, name AS obj,
       relevance_pct AS score_pct
FROM mentions
UNION ALL
SELECT CAST(source_doc_id AS VARCHAR), rel_type, CAST(target_doc_id AS VARCHAR), confidence_pct
FROM rels WHERE rel_type IS NOT NULL""",
    "kg_extract_stats": """
SELECT doc_id,
       CAST(COALESCE(length(text), 0) AS BIGINT) AS char_count,
       CAST(COALESCE(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 0) AS BIGINT) AS word_count
FROM documents""",
    "kg_resume_anti_join": "SELECT doc_id FROM documents WHERE doc_id % 3 <> 0",
}

KG_ORACLES["kg_open_triples"] = open_triples_sql()


def comention_kept_cte(min_shared: int = 2) -> str:
    """CTEs mf..kept: the df-capped canonical (da < db) co-mention edge
    set shared by kg_pagerank and kg_triangles (gate._comention_edges)."""
    return f"""
mf AS (SELECT doc_id, name FROM mentions WHERE relevance_pct >= {S.MIN_RELEVANCE_PCT}),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM mf),
dfn AS (SELECT name, COUNT(DISTINCT doc_id) AS df FROM mf GROUP BY name),
keep AS (SELECT name FROM dfn, nd
         WHERE df <= GREATEST(CAST(FLOOR(n * 0.5) AS BIGINT), 100)),
mfk AS (SELECT mf.doc_id, mf.name FROM mf JOIN keep USING (name)),
kept AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM mfk a JOIN mfk b ON a.name = b.name AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {min_shared}
)"""


def pagerank_sql(iters: int = 8, min_shared: int = 2) -> str:
    """kg_pagerank oracle: the exact integer fixed-point power iteration
    (operators/graph.py) unrolled as chained CTEs — standard SQL, no
    recursion, bit-identical to the Spark loop.  The co-mention graph is
    symmetric, so the dangling term is identically zero on both sides."""
    from .operators.graph import DAMP_DEN, DAMP_NUM, PAGERANK_SCALE

    base_cte = f"""
{comention_kept_cte(min_shared)},
edges AS (SELECT da AS src, db AS dst FROM kept UNION ALL SELECT db, da FROM kept),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
pr0 AS (SELECT node, CAST({PAGERANK_SCALE} // n AS BIGINT) AS pr FROM nodes, nn)"""
    iter_ctes = []
    for i in range(1, iters + 1):
        iter_ctes.append(f"""
c{i} AS (
  SELECT e.dst AS node, SUM(p.pr // o.od) AS s
  FROM edges e JOIN outd o ON e.src = o.src JOIN pr{i - 1} p ON p.node = e.src
  GROUP BY e.dst
),
pr{i} AS (
  SELECT n.node,
         CAST(({(DAMP_DEN - DAMP_NUM) * PAGERANK_SCALE} // ({DAMP_DEN} * nn.n))
              + ({DAMP_NUM} * COALESCE(c.s, 0)) // {DAMP_DEN} AS BIGINT) AS pr
  FROM nodes n CROSS JOIN nn LEFT JOIN c{i} c ON c.node = n.node
)""")
    return (
        with_kg(base_cte, *iter_ctes)
        + f"""
SELECT CAST(node AS BIGINT) AS doc_id, pr FROM pr{iters}"""
    )


KG_ORACLES["kg_pagerank"] = pagerank_sql()

KG_ORACLES["kg_triangles"] = (
    with_kg(comention_kept_cte())
    + """
, deg AS (
  SELECT v, COUNT(*) AS deg
  FROM (SELECT da AS v FROM kept UNION ALL SELECT db FROM kept) GROUP BY v
),
oe AS (
  -- degree-(then id-)ordered orientation, mirroring
  -- operators/graph.degree_oriented_edges
  SELECT CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND k.da < k.db)
              THEN k.da ELSE k.db END AS src,
         CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND k.da < k.db)
              THEN k.db ELSE k.da END AS dst
  FROM kept k JOIN deg ds ON ds.v = k.da JOIN deg dd ON dd.v = k.db
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oe e1
  JOIN oe e2 ON e2.src = e1.dst
  JOIN oe e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
members AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM members GROUP BY node"""
)


def canonicalize_sql() -> str:
    """D10/D11 oracle: char-3gram shingles of entity names, exact Jaccard
    >= 1/2 edges (integer cross-multiplication), connected components via a
    WITH RECURSIVE min-label walk (walk(n, ·) = labels reachable from n;
    component root = MIN over the walk), canonical member = highest
    mention_count then smallest name."""
    kg = ",".join([mentions_cte(), entities_cte()])
    return f"""WITH RECURSIVE {kg},
names AS (SELECT name, mention_count FROM entities),
padded AS (SELECT name, ' ' || lower(trim(name)) || ' ' AS p FROM names),
nsh AS (
  SELECT DISTINCT name, substr(p, i, 3) AS shingle
  FROM padded, unnest(range(1, greatest(length(p) - 2, 1) + 1)) AS t(i)
),
nsz AS (SELECT name, COUNT(*) AS sz FROM nsh GROUP BY name),
ninter AS (
  SELECT a.name AS name_a, b.name AS name_b, COUNT(*) AS inter
  FROM nsh a JOIN nsh b USING (shingle)
  WHERE a.name < b.name
  GROUP BY a.name, b.name
),
edges AS (
  SELECT name_a, name_b FROM ninter
  JOIN nsz sa ON sa.name = name_a
  JOIN nsz sb ON sb.name = name_b
  WHERE inter * 2 >= sa.sz + sb.sz - inter
),
sym AS (
  SELECT name_a AS src, name_b AS dst FROM edges
  UNION ALL
  SELECT name_b, name_a FROM edges
),
walk(node, lab) AS (
  SELECT name, name FROM names
  UNION
  SELECT w.node, e.dst FROM walk w JOIN sym e ON e.src = w.lab
),
comp AS (SELECT node AS name, MIN(lab) AS root FROM walk GROUP BY node),
members AS (
  SELECT c.name, c.root, n.mention_count FROM comp c JOIN names n USING (name)
),
best AS (SELECT root, MAX(mention_count) AS mc FROM members GROUP BY root),
canon AS (
  SELECT m.root, MIN(m.name) AS canonical_name
  FROM members m JOIN best b ON b.root = m.root AND m.mention_count = b.mc
  GROUP BY m.root
)
SELECT m.name, c.canonical_name
FROM members m JOIN canon c USING (root)"""


KG_ORACLES["kg_canonicalize"] = canonicalize_sql()

# S9 upsert (database_utils.py:109-113 ON CONFLICT DO UPDATE): incoming
# batch wins on matched keys, current rows survive otherwise
KG_ORACLES["kg_merge_upsert"] = """
WITH cur AS (
  SELECT doc_id, source, n_chars, 1 AS version FROM documents WHERE doc_id % 2 = 0
),
inc AS (
  SELECT doc_id, source, n_chars + 1000 AS n_chars, 2 AS version
  FROM documents WHERE doc_id % 3 = 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars, CAST(version AS BIGINT) AS version
FROM inc
UNION ALL
SELECT CAST(c.doc_id AS BIGINT), c.source, CAST(c.n_chars AS BIGINT), CAST(c.version AS BIGINT)
FROM cur c LEFT JOIN inc i ON c.doc_id = i.doc_id
WHERE i.doc_id IS NULL"""

KG_ORACLES["kg_pairwise_shared"] = with_kg() + f"""
, mf AS (
  SELECT doc_id, name, relevance_pct FROM mentions
  WHERE relevance_pct >= {S.MIN_RELEVANCE_PCT}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.relevance_pct + b.relevance_pct AS avg2
  FROM mf a JOIN mf b ON a.name = b.name AND a.doc_id < b.doc_id
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       CAST(SUM(CASE WHEN avg2 >= {2 * S.HI_BUCKET_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS hi,
       CAST(SUM(CASE WHEN avg2 >= {2 * S.MED_BUCKET_PCT} AND avg2 < {2 * S.HI_BUCKET_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS med,
       CAST(SUM(CASE WHEN avg2 >= {2 * S.LO_BUCKET_PCT} AND avg2 < {2 * S.MED_BUCKET_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS lo
FROM pairs GROUP BY doc_a, doc_b"""

def _search_sql() -> str:
    from .gate import SEARCH_QUERY_TOKENS  # single source for the token set

    occs = [
        f"CAST((length(p) - length(replace(p, ' {t} ', ''))) / {len(t) + 2} AS BIGINT)"
        for t in SEARCH_QUERY_TOKENS
    ]
    score = " + ".join(occs)
    present = " AND ".join(f"({o}) > 0" for o in occs)
    return f"""
WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents)
SELECT doc_id, {score} AS score FROM p
WHERE {present}
ORDER BY score DESC, doc_id ASC LIMIT 20"""


KG_ORACLES["kg_text_search"] = _search_sql()

KG_ORACLES["kg_doc_concept_summary"] = with_kg() + """
SELECT d.doc_id,
       CAST(COALESCE(COUNT(m.name), 0) AS BIGINT) AS n_concepts,
       CAST(COALESCE(SUM(m.relevance_pct), 0) AS BIGINT) AS sum_relevance_pct
FROM documents d LEFT JOIN mentions m ON m.doc_id = d.doc_id
GROUP BY d.doc_id"""

# S7 through the html path: pages_from_documents wraps text in ONE
# <section>, so the reference extractor semantics reduce to
# ('\n--- Page 1 ---\n' + text).strip(); leading char is '-', so only the
# right trim can fire (trim charset == Python str.strip whitespace set)
KG_ORACLES["kg_extract_html"] = """
WITH ws(c) AS (SELECT ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
ex AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE rtrim('--- Page 1 ---' || chr(10) || text, (SELECT c FROM ws))
         END AS extracted_text
  FROM documents
)
SELECT doc_id, extracted_text,
       CAST(COALESCE(length(extracted_text), 0) AS BIGINT) AS n_chars,
       CAST(CASE WHEN extracted_text IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_pages
FROM ex"""
