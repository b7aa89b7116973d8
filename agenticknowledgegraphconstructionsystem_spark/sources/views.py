"""SQL view surface (S13): the reference exposes its graph through three
Postgres views — ``paper_concept_summary``, ``top_concepts``,
``relationship_summary`` (db_init.py:170-210) — and its users query them
with plain SQL.  :func:`register_views` recreates the same names as Spark
temp views over the pipeline outputs, so that SQL keeps working on the
rebuild via ``spark.sql(...)``.

Base-table mapping (reference → pipeline output):

    papers              → results["docs"]              (url keys the row)
    concepts            → results["entities"]
    paper_concepts      → results["edges"]             (one row per (url, name))
    paper_relationships → results["validated_edges"]

Documented divergences (each cited in SURVEY §2.3 / COVERAGE.md):

* the reference's ``top_concepts`` view joins ``c.id = pc.id`` — a bug
  (db_init.py:195; the key should be the concept reference).  The rebuild
  implements the INTENDED semantics: join on the concept name.
* confidence is the repo-wide exact integer percent, so the view exposes
  ``avg_confidence_pct`` (an exact integer-sum average) instead of the
  float ``avg_confidence``.
* papers carry (url, n_chars, n_pages) rather than (arxiv_id, title,
  is_seminal) — the corpus is Common-Crawl-style pages, not arXiv papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: every name :func:`register_views` creates, in creation order
VIEW_NAMES = (
    "papers",
    "concepts",
    "paper_concepts",
    "paper_relationships",
    "paper_concept_summary",
    "top_concepts",
    "relationship_summary",
)


def register_views(results: dict[str, DataFrame]) -> list[str]:
    """Register the reference's SQL surface over ``Pipeline.run`` outputs
    (or any dict with the same keys).  Temp views are session-scoped and
    lazy — each query plans against the current DataFrames, so filters on
    a view still push down to the underlying parquet scans."""
    spark = results["docs"].sparkSession
    results["docs"].createOrReplaceTempView("papers")
    results["entities"].createOrReplaceTempView("concepts")
    results["edges"].createOrReplaceTempView("paper_concepts")
    results["validated_edges"].createOrReplaceTempView("paper_relationships")
    # db_init.py:173-182 — papers with their concept counts
    spark.sql(
        """CREATE OR REPLACE TEMP VIEW paper_concept_summary AS
        SELECT p.url, p.n_chars, p.n_pages,
               COUNT(pc.name) AS concept_count
        FROM papers p
        LEFT JOIN paper_concepts pc ON p.url = pc.url
        GROUP BY p.url, p.n_chars, p.n_pages"""
    )
    # db_init.py:187-197 — most influential concepts (INTENDED join key;
    # the reference's c.id = pc.id is the documented J5 bug)
    spark.sql(
        """CREATE OR REPLACE TEMP VIEW top_concepts AS
        SELECT c.entity_id AS id, c.name, c.concept_type, c.mention_count,
               COUNT(DISTINCT pc.url) AS paper_count
        FROM concepts c
        LEFT JOIN paper_concepts pc ON c.name = pc.name
        GROUP BY c.entity_id, c.name, c.concept_type, c.mention_count
        ORDER BY paper_count DESC, c.name ASC"""
    )
    # db_init.py:202-210 — relationship-type statistics
    spark.sql(
        """CREATE OR REPLACE TEMP VIEW relationship_summary AS
        SELECT rel_type AS relationship_type,
               COUNT(*) AS count,
               CAST(AVG(confidence_pct) AS DOUBLE) AS avg_confidence_pct,
               COUNT(CASE WHEN validated THEN 1 END) AS validated_count
        FROM paper_relationships
        GROUP BY rel_type
        ORDER BY count DESC, relationship_type ASC"""
    )
    return list(VIEW_NAMES)
