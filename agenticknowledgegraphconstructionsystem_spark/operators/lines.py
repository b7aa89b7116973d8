"""Cross-document boilerplate-line removal: lines whose trimmed form
recurs across ≥ ``semantics.BOILERPLATE_MIN_DOCS`` distinct documents
(cookie banners, nav menus, subscribe footers) are stripped from every
document, preserving the surviving lines' ORIGINAL text and order.

This is the line-granularity dedup tier a web-crawl training pipeline
runs between within-document repetition filtering (repetition.py,
Gopher-style) and whole/near-document dedup (dedup.py) — cf. RefinedWeb's
line-wise filters (Penedo et al. 2023 §3.3) and Dolma's paragraph-level
dedup.  The reference has no curation tier (its pipeline ends at KG
tables, db_init.py); this belongs to the brief's first-class
training-data operations.

Scale shape (100 TB): one posexplode narrow map emits (doc, pos, line);
the boilerplate census is ONE groupBy on the trimmed line (Spark plans
the distinct-doc count as a two-phase partial aggregation — map-side
combine on (line, doc) first, so a line repeated 10^6× inside one split
reaches the shuffle once per doc); the strip is a broadcast LEFT ANTI
against the census survivors (the ≥ min_docs head of the line-frequency
distribution — bounded and tiny relative to the corpus; drop the
broadcast hint and it degrades gracefully to a balanced hash anti-join
on the line); reconstruction is one groupBy per doc whose collect_list
is made deterministic by sorting on the unique in-doc position.  Nothing
is quadratic; every aggregation is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import semantics as S


def line_occurrences(docs: DataFrame, key: str, text_col: str) -> DataFrame:
    """→ (key, pos, raw, line): one row per physical line of every
    non-NULL text; ``raw`` is the untrimmed original (what reconstruction
    re-emits), ``line`` the trimmed match key, ``pos`` the 0-based
    in-document position."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(key), F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"))
        .withColumn("line", F.trim(F.col("raw")))
    )


def boilerplate_lines(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_docs: int = S.BOILERPLATE_MIN_DOCS,
) -> DataFrame:
    """→ (line, n_docs, n_occurrences): the corpus-wide boilerplate
    census — trimmed non-empty lines appearing in ≥ ``min_docs`` distinct
    documents, with their distinct-document and total occurrence counts."""
    return (
        line_occurrences(docs, key, text_col)
        .where(F.col("line") != "")
        .groupBy("line")
        .agg(
            F.countDistinct(key).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_docs: int = S.BOILERPLATE_MIN_DOCS,
) -> DataFrame:
    """→ (key, text_clean, n_lines_kept, n_lines_removed) for EVERY input
    row: each document with its boilerplate lines removed (surviving
    lines keep their original untrimmed text and order, rejoined with
    ``\\n``).  NULL text → NULL text_clean with zero counts; a document
    whose every line is boilerplate → empty-string text_clean."""
    lo = line_occurrences(docs, key, text_col)
    boil = boilerplate_lines(docs, key=key, text_col=text_col, min_docs=min_docs)
    kept = lo.join(F.broadcast(boil.select("line")), "line", "left_anti")
    rebuilt = kept.groupBy(key).agg(
        F.count("*").cast("long").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "raw"))),
                lambda x: x["raw"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    totals = lo.groupBy(key).agg(F.count("*").cast("long").alias("n_lines"))
    not_null = F.col(text_col).isNotNull()
    kept_n = F.when(not_null, F.coalesce(F.col("n_lines_kept"), F.lit(0))).otherwise(
        F.lit(0)
    ).cast("long")
    return (
        docs.select(key, text_col)
        .join(totals, key, "left")
        .join(rebuilt, key, "left")
        .select(
            key,
            F.when(not_null, F.coalesce(F.col("text_clean"), F.lit(""))).alias(
                "text_clean"
            ),
            kept_n.alias("n_lines_kept"),
            (F.coalesce(F.col("n_lines"), F.lit(0)) - kept_n)
            .cast("long")
            .alias("n_lines_removed"),
        )
    )
