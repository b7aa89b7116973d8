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
reaches the shuffle once per doc); the strip is a LEFT ANTI against the
census survivors whose broadcast hint is SIZE-GATED: the census is the
≥ min_docs head of the line-frequency distribution — usually tiny
relative to the corpus, but corpus-dependent and unbounded (100 TB of
web pages can carry 10⁸+ distinct nav/footer lines), so the hint is
applied only after a counted check against ``CENSUS_BROADCAST_CAP``
(the census is persisted, so the count adds no second corpus scan);
above the cap the join degrades gracefully to a balanced hash anti-join
on the trimmed line instead of a driver/executor OOM, and the overflow
is observable via :func:`census_overflow` — never silent (the
``dropped_band_buckets`` discipline, dedup.py);
reconstruction is one groupBy per doc whose collect_list
is made deterministic by sorting on the unique in-doc position.  Nothing
is quadratic; every aggregation is map-side combinable.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import semantics as S
from .dedup import _PERSISTED

#: maximum census size (rows) that may be broadcast into the strip
#: anti-join.  A physical-plan knob, NOT a semantic threshold (results are
#: identical either side of it), so it lives here rather than semantics.py.
#: 2M short trimmed lines ≈ low hundreds of MB on the driver — comfortably
#: inside a default 1–4 GiB driver/executor heap; a web-scale census above
#: this flips to a balanced hash anti-join on the line key.
CENSUS_BROADCAST_CAP = 2_000_000


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


def census_overflow(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_docs: int = S.BOILERPLATE_MIN_DOCS,
    broadcast_cap: int | None = CENSUS_BROADCAST_CAP,
) -> DataFrame:
    """Audit view for :func:`strip_boilerplate_lines`' size-gated
    broadcast: (census_rows, broadcast_cap, broadcastable) — one row.
    ``broadcastable = false`` means the strip ran (or would run) its
    anti-join as a balanced hash join instead of a broadcast.  The cap
    never changes RESULTS, only the join strategy, so this view is pure
    observability (the ``dropped_band_buckets`` discipline)."""
    boil = boilerplate_lines(docs, key=key, text_col=text_col, min_docs=min_docs)
    cap = F.lit(-1 if broadcast_cap is None else int(broadcast_cap)).cast("long")
    return boil.agg(F.count("*").cast("long").alias("census_rows")).select(
        "census_rows",
        cap.alias("broadcast_cap"),
        (
            F.lit(broadcast_cap is None) | (F.col("census_rows") <= cap)
        ).alias("broadcastable"),
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_docs: int = S.BOILERPLATE_MIN_DOCS,
    broadcast_cap: int | None = CENSUS_BROADCAST_CAP,
) -> DataFrame:
    """→ (key, text_clean, n_lines_kept, n_lines_removed) for EVERY input
    row: each document with its boilerplate lines removed (surviving
    lines keep their original untrimmed text and order, rejoined with
    ``\\n``).  NULL text → NULL text_clean with zero counts; a document
    whose every line is boilerplate → empty-string text_clean.

    ``broadcast_cap``: the census (see module docstring) is persisted and
    counted once; at or under the cap it is broadcast into the strip
    anti-join (the corpus-side line table is never shuffled), above it the
    hint is omitted and the anti-join hash-partitions both sides on the
    line — results are identical either way (pytest-pinned), only the
    physical strategy moves.  ``None`` skips the count and never
    broadcasts (pure-lazy mode for callers that know the census is huge).
    The persist rides dedup's tracked registry
    (:func:`..operators.dedup.unpersist_tracked` releases it)."""
    lo = line_occurrences(docs, key, text_col)
    boil = boilerplate_lines(
        docs, key=key, text_col=text_col, min_docs=min_docs
    ).select("line")
    if broadcast_cap is not None:
        boil = boil.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(boil)  # released via dedup.unpersist_tracked()
        if boil.count() <= broadcast_cap:  # the one eager count fills the cache
            boil = F.broadcast(boil)
    kept = lo.join(boil, "line", "left_anti")
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
