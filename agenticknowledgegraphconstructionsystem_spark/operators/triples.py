"""Stage 5 — triple materialization (SURVEY §1.1).

The knowledge graph IS a triple set with two edge relations:
  (doc) -[mentions {relevance}]-> (concept)        paper_concepts, db_init.py:80-93
  (src) -[rel_type {confidence}]-> (target doc)    paper_relationships, db_init.py:108-132

This is the set graded at P/R >= 0.95 vs the reference-semantics oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_triples(doc_concept_edges: DataFrame, rel_edges: DataFrame) -> DataFrame:
    """→ triples(subj, pred, obj, score_pct, evidence)."""
    mention_triples = doc_concept_edges.select(
        F.col("url").cast("string").alias("subj"),
        F.lit("mentions").alias("pred"),
        F.col("name").cast("string").alias("obj"),
        F.col("relevance_pct").alias("score_pct"),
        F.col("context").alias("evidence"),
    )
    rel_triples = rel_edges.select(
        F.col("source_url").cast("string").alias("subj"),
        F.col("rel_type").alias("pred"),
        F.col("target_url").cast("string").alias("obj"),
        F.col("confidence_pct").alias("score_pct"),
        F.col("explanation").alias("evidence"),
    )
    return mention_triples.unionByName(rel_triples)
