"""Cross-document boilerplate-line removal (operators/lines.py):
planted-boilerplate semantics, idempotence, and a DuckDB twin over the
real sf0.001 documents table with the same planted header/footer
construction the driver gate uses (kept out of the pinned 50-query
surface)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark.operators.lines import (
    boilerplate_lines,
    census_overflow,
    strip_boilerplate_lines,
)

SF_DIR = "/root/testdata/sf0.001"

_FOOT = "  subscribe to our newsletter  "


def _corpus(spark):
    rows = [
        # 5 docs share the footer (trimmed form matches despite spacing)
        *[
            Row(doc_id=i, text=f"unique content line {i}\n{_FOOT.strip()}")
            for i in range(1, 5)
        ],
        Row(doc_id=5, text=f"unique content line 5\n{_FOOT}"),
        # footer appears twice in one doc — still 5 DISTINCT docs
        Row(doc_id=6, text="only-content doc, untouched"),
        # a line shared by just 2 docs stays (below min_docs=5)
        Row(doc_id=7, text="rare shared line\nmore content"),
        Row(doc_id=8, text="rare shared line"),
        # all-boilerplate doc → empty text_clean
        Row(doc_id=9, text=_FOOT.strip()),
        Row(doc_id=10, text=None),
    ]
    return spark.createDataFrame(rows, schema="doc_id bigint, text string")


def test_planted_boilerplate_semantics(spark):
    docs = _corpus(spark)
    boil = boilerplate_lines(docs, min_docs=5).collect()
    assert [(r["line"], r["n_docs"], r["n_occurrences"]) for r in boil] == [
        (_FOOT.strip(), 6, 6)
    ]

    out = {r["doc_id"]: r for r in strip_boilerplate_lines(docs, min_docs=5).collect()}
    assert len(out) == 10
    # footer stripped, original (untrimmed) content preserved in order
    for i in range(1, 5):
        assert out[i]["text_clean"] == f"unique content line {i}"
        assert (out[i]["n_lines_kept"], out[i]["n_lines_removed"]) == (1, 1)
    assert out[5]["text_clean"] == "unique content line 5"
    # untouched doc round-trips byte-identically
    assert out[6]["text_clean"] == "only-content doc, untouched"
    assert out[6]["n_lines_removed"] == 0
    # sub-threshold shared line survives
    assert out[7]["text_clean"] == "rare shared line\nmore content"
    assert out[8]["text_clean"] == "rare shared line"
    # all-boilerplate doc → empty string, everything removed
    assert out[9]["text_clean"] == "" and out[9]["n_lines_kept"] == 0
    assert out[9]["n_lines_removed"] == 1
    # NULL text passes through as NULL with zero counts
    assert out[10]["text_clean"] is None
    assert (out[10]["n_lines_kept"], out[10]["n_lines_removed"]) == (0, 0)


def test_strip_is_idempotent(spark):
    docs = _corpus(spark)
    once = strip_boilerplate_lines(docs, min_docs=5).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    twice = strip_boilerplate_lines(once, min_docs=5)
    again = {r["doc_id"]: r for r in twice.collect()}
    for r in once.collect():
        assert again[r["doc_id"]]["text_clean"] == r["text"]
        assert again[r["doc_id"]]["n_lines_removed"] == 0


def test_census_above_cap_strips_identically_without_broadcast(spark):
    """The census broadcast is SIZE-GATED: with the cap forced below the
    census size the strip must (a) produce byte-identical results and
    (b) plan the anti-join WITHOUT a broadcast hint — the 100 TB
    OOM guard (a web-scale census can be 10^8+ distinct lines)."""
    docs = _corpus(spark)
    hinted = strip_boilerplate_lines(docs, min_docs=5)  # census=1 ≤ cap
    capped = strip_boilerplate_lines(docs, min_docs=5, broadcast_cap=0)
    lazy = strip_boilerplate_lines(docs, min_docs=5, broadcast_cap=None)
    want = sorted(map(tuple, hinted.collect()))
    assert sorted(map(tuple, capped.collect())) == want
    assert sorted(map(tuple, lazy.collect())) == want
    # the hint must be present under the cap and absent above it / in
    # pure-lazy mode (AQE may still broadcast at runtime from REAL stats —
    # that is the point: no unconditional driver-side broadcast)
    assert "strategy=broadcast" in hinted._jdf.queryExecution().optimizedPlan().toString()
    for df in (capped, lazy):
        assert "strategy=broadcast" not in df._jdf.queryExecution().optimizedPlan().toString()


def test_census_overflow_audit(spark):
    docs = _corpus(spark)  # census = 1 line at min_docs=5
    row = census_overflow(docs, min_docs=5).collect()[0]
    assert (row["census_rows"], row["broadcastable"]) == (1, True)
    over = census_overflow(docs, min_docs=5, broadcast_cap=0).collect()[0]
    assert (over["census_rows"], over["broadcast_cap"], over["broadcastable"]) == (1, 0, False)
    nocap = census_overflow(docs, min_docs=5, broadcast_cap=None).collect()[0]
    assert (nocap["broadcast_cap"], nocap["broadcastable"]) == (-1, True)


def test_line_dedup_matches_duckdb_twin(spark):
    """Exact-value match vs an independent DuckDB formulation on the real
    sf0.001 documents with planted header/footers (the driver-gate
    construction: header in every doc, one of three footers per doc)."""
    import duckdb

    from agenticknowledgegraphconstructionsystem_spark.gate_curation import (
        O_BOILERPLATE_LINES,
        O_LINE_DEDUP,
        q_boilerplate_lines,
        q_line_dedup,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    for fn, sql in ((q_boilerplate_lines, O_BOILERPLATE_LINES), (q_line_dedup, O_LINE_DEDUP)):
        got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"{fn.__name__}: {len(got)} vs {len(want)} rows"
    con.close()
