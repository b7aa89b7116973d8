"""Stage 3 — entity table + doc→concept edges.

A7 (database.ts:97-118 ``INSERT … ON CONFLICT(name) DO UPDATE mention_count
= mention_count + 1``): the row-at-a-time upsert-with-counter becomes a
grouped aggregation.  ``mention_count = countDistinct(url)`` — the
set-based semantics (SURVEY §7 "mention_count drift": the reference
increments per upsert *attempt*, which double-counts re-runs; countDistinct
matches rule E4's intent, validation-agent.ts:157-176).

Skew (north_rule): hot concept names appear in most documents.  A plain
``groupBy(name).agg(countDistinct(url))`` would funnel each hot name into
one reducer.  :func:`build_entities` therefore does an explicit two-phase
aggregation — salt the key, partial-aggregate per (name, salt), then merge
the distinct counts.  Distinct counts don't merge across salts unless the
salt is derived from the *distinct column itself*: salting by
``hash(url) % k`` makes the per-salt url sets disjoint, so the final
``sum`` of partial distinct counts is exact.

A8 (database.ts:123-139 DO UPDATE / database_utils.py:165-192 DO NOTHING):
edge dedup via row_number over an explicit deterministic ordering — never
partition order (SURVEY §7 determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..semantics import NAME_MAX  # noqa: F401  (re-export convenience)


def build_entities(mentions: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """mentions → entities(entity_id, name, concept_type, mention_count,
    sum_relevance_pct, max_relevance_pct, min_relevance_pct).

    Two-phase salted aggregation; deterministic entity_id = xxhash64(name)
    (stable across runs — SURVEY §1.2 bans monotonically_increasing_id).
    For the reference's description payload use
    :func:`build_entities_with_context`.
    """
    salted = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
    )
    # numeric-only aggregate buffers keep both phases in HashAggregate
    # (whole-stage codegen); a min(struct(url, context)) here would force a
    # SortAggregate fallback with full sorts around every exchange — the
    # keep-first context lives in entity_first_context() instead
    partial = salted.groupBy("name", "concept_type", "salt").agg(
        F.countDistinct("url").alias("pc"),
        F.sum("relevance_pct").alias("srel"),
        F.max("relevance_pct").alias("xrel"),
        F.min("relevance_pct").alias("nrel"),
    )
    return partial.groupBy("name", "concept_type").agg(
        F.sum("pc").cast("long").alias("mention_count"),
        F.sum("srel").cast("long").alias("sum_relevance_pct"),
        F.max("xrel").alias("max_relevance_pct"),
        F.min("nrel").alias("min_relevance_pct"),
    ).select(
        F.xxhash64("name").alias("entity_id"),
        "name",
        "concept_type",
        "mention_count",
        "sum_relevance_pct",
        "max_relevance_pct",
        "min_relevance_pct",
    )


def entity_first_context(edges: DataFrame) -> DataFrame:
    """Keep-first description semantics (database.ts:109 ``COALESCE(
    concepts.description, EXCLUDED.description)`` keeps the earliest
    write): the context of the smallest url per entity, from the
    already-deduped edge table.  Runs on the edge table (one row per
    (url, name)) — far smaller than the mentions fact table.  The min is
    over the url alone (unique per name in edges), realized as
    min(struct) so context rides along without a second join."""
    return (
        edges.groupBy("name")
        .agg(F.min(F.struct("url", "context")).alias("f"))
        .select("name", F.col("f.context").alias("first_context"))
    )


def build_entities_with_context(mentions: DataFrame) -> DataFrame:
    """:func:`build_entities` + the reference's keep-first description
    payload (concepts.description, db_init.py:57).  Composed at this level
    so the count aggregation stays numeric-only (HashAggregate end-to-end,
    see PLANS.md) while the string payload is selected over the much
    smaller deduped edge table and joined back on name — at cluster scale
    the entity side is vocabulary-sized, so this is a broadcast join."""
    ents = build_entities(mentions)
    fc = entity_first_context(build_doc_concept_edges(mentions))
    return ents.join(fc, "name", "left")


def build_doc_concept_edges(mentions: DataFrame) -> DataFrame:
    """A8 last-write-wins upsert semantics (database.ts:132-135): one edge
    per (url, name), keeping the highest-relevance mention with explicit
    tie-breaks (pos asc, context asc) for full determinism.

    Implemented as a min(struct) aggregation rather than a row_number
    window: the aggregate partial-combines map-side, so only one candidate
    row per (url, name) per input partition reaches the shuffle — a window
    would shuffle and sort every mention row.  The struct leads with
    -relevance so min() realizes (relevance DESC, pos ASC, context ASC).
    """
    best = mentions.groupBy("url", "name").agg(
        F.min(
            F.struct(
                (-F.col("relevance_pct")).alias("neg_rel"),
                F.col("pos").alias("pos"),
                F.col("context").alias("context"),
                F.col("concept_type").alias("concept_type"),
            )
        ).alias("b")
    )
    return best.select(
        "url",
        F.xxhash64("name").alias("entity_id"),
        "name",
        F.col("b.concept_type").alias("concept_type"),
        (-F.col("b.neg_rel")).cast("int").alias("relevance_pct"),
        F.col("b.context").alias("context"),
    )


def top_concepts(entities: DataFrame, k: int = 10) -> DataFrame:
    """A4/J5-intended: top-k concepts by mention_count (db_init.py:187-197 —
    implementing the *intended* join key, see SURVEY §2.3 J5 bug note).
    Compiles to TakeOrderedAndProject: no global sort."""
    return (
        entities.orderBy(F.desc("mention_count"), F.asc("name"))
        .select("name", "concept_type", "mention_count")
        .limit(k)
    )
