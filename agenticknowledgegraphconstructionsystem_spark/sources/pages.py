"""Deterministic `pages` sources (FIXTURES.md §1).

Input schema per BASELINE.json input_hint:
    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Two sources:
* :func:`synthetic_pages_rows` — seeded generator used by pytest golden
  tests (content model: gazetteer mentions, relationship keyword sentences,
  a hot concept in >=50% of docs, generic-term dirt, empty bodies).
* :func:`pages_from_documents` — derives pages from the driver's
  ``documents.parquet`` (FIXTURES.md §4: synthesize url/warc_ts/html
  deterministically from doc_id/text).
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..semantics import ALIASES, GAZETTEER, TYPE_KEYWORDS

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

_FILLER = (
    "scan column window order sort part agg value line key join merge query "
    "group vector hash slow stream filter fast the spark batch table small "
    "data big customer row"
).split()

#: hot concept — appears in >=50% of docs (skew knob, FIXTURES.md §1)
HOT_CONCEPT = "spark"

#: relationship-keyword sentences, one per type (keyword tables from
#: validation-agent.ts:301-308)
#: subj (hot concept) precedes the keyword, which precedes the object — so
#: the same sentence drives D4 doc-level classification AND D2
#: sentence-level open-triple extraction
_REL_SENTENCES = {
    rtype: f"the {HOT_CONCEPT} pipeline {kws[0]}s the seminal table scan approach."
    for rtype, kws in TYPE_KEYWORDS.items()
}

_BOILER_NAV = b"<nav>home | about | subscribe | login</nav>"
_BOILER_FOOTER = b"<footer>copyright 2025 example.org - all rights reserved</footer>"


def _doc_url(i: int) -> str:
    return f"https://example.org/paper/{i:05d}"


def synthetic_pages_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Deterministic corpus. Doc 0 is the seminal hub (leads with the hot
    concept). ~1/3 of docs carry an explicit relationship-keyword sentence;
    a few docs carry generic-term dirt / alias surface forms / empty bodies.
    """
    gaz_names = [g[0] for g in GAZETTEER if g[0] not in ("dataset", "metric")]
    alias_names = list(ALIASES)
    rel_types = list(_REL_SENTENCES)
    rows: list[dict] = []
    for i in range(n_docs):
        rng = random.Random(f"{seed}:{i}")
        segments: list[str] = []
        if i == 0:
            # seminal doc: hot concept leads, dense high-relevance mentions
            segments.append(
                f"{HOT_CONCEPT} is a system for large scale processing. "
                + " ".join(rng.choices(gaz_names, k=6))
            )
            segments.append(" ".join(rng.choices(_FILLER, k=30)))
        elif i % 17 == 5:
            segments = []  # empty body → extraction yields None
        else:
            n_seg = 1 + rng.randrange(5)
            for s in range(n_seg):
                words = rng.choices(_FILLER, k=10 + rng.randrange(30))
                # sprinkle gazetteer terms
                for _ in range(rng.randrange(4)):
                    words.insert(rng.randrange(len(words)), rng.choice(gaz_names))
                if s == 0 and rng.random() < 0.6:
                    words.insert(0, HOT_CONCEPT)
                segments.append(" ".join(words))
            if i % 3 == 0:
                rt = rel_types[rng.randrange(len(rel_types))]
                segments.append(_REL_SENTENCES[rt])
            if i % 11 == 7:
                segments.append("this dataset metric discussion is generic dirt")
            if i % 13 == 4:
                segments.append(
                    "alias forms appear: " + " and ".join(rng.choices(alias_names, k=2))
                )
        body = b"".join(
            b"<section>" + seg.encode("utf-8") + b"</section>" for seg in segments
        )
        # citation anchors OUTSIDE the sections (extraction only reads
        # <section> contents — semantics._SECTION_RE — so extracted text
        # and every golden downstream of it are untouched): every doc
        # cites the seminal hub, later docs also cite doc i//2 — the
        # synthetic analogue of the reference's citation graph, consumed
        # by operators/links.py (Pipeline link_graph=True)
        cites = b""
        if i > 0:
            cited = sorted({0, i // 2} - {i})
            cites = b"".join(
                f'<a href="/paper/{j:05d}">cites {j}</a>'.encode() for j in cited
            )
        html = (
            b"<html>" + _BOILER_NAV + b"<body>" + body + b"</body>"
            + cites + _BOILER_FOOTER + b"</html>"
        )
        rows.append(
            {
                "url": _doc_url(i),
                "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
                "html": html,
                # half the rows exercise the html→text extraction path
                "text": None,
                "lang": "en" if i % 10 else "de",
            }
        )
    return rows


def synthetic_pages(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synthetic_pages_rows(n_docs, seed), PAGES_SCHEMA)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the canonical pages schema from documents.parquet.

    Deterministic, column-only (no UDF): url/warc_ts from doc_id, html wraps
    the text in one <section> with nav/footer boilerplate.  `text` is kept
    so the extract stage's pre-extracted fast path applies; pytest covers
    the html path with :func:`synthetic_pages`.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://example.org/doc/"), F.col("doc_id")).alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias(
            "warc_ts"
        ),
        F.concat(
            F.lit("<html><nav>n</nav><body><section>"),
            F.col("text"),
            F.lit("</section></body><footer>f</footer></html>"),
        )
        .cast("binary")
        .alias("html"),
        F.col("text"),
        F.col("lang"),
    )
