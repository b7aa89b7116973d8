"""Round-5 curation gates (gate_curation.py): the url / curation /
sampling suites faithfully restate their member micro-gates, the
hardcoded column lists match the member DataFrames, and the driver
surface stays at exactly 50 with the curation suites inside the td
block (the detailed 50-pin lives in test_round4_hardening)."""

from __future__ import annotations

import pytest

from agenticknowledgegraphconstructionsystem_spark.gate_curation import (
    _CURATE_SUITE,
    _SAMPLING_SUITE,
    _URL_SUITE,
    q_curation_suite,
    q_sampling_suite,
    q_url_suite,
)
from agenticknowledgegraphconstructionsystem_spark.gate_suites import norm_rows

SF = "/root/testdata/sf0.001"

_SUITES = [
    (q_url_suite, _URL_SUITE),
    (q_curation_suite, _CURATE_SUITE),
    (q_sampling_suite, _SAMPLING_SUITE),
]


def test_curation_suites_in_driver_window():
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) == 50
    for suite in ("td_sampling_suite", "td_url_suite", "td_curation_suite"):
        assert suite in names
        assert suite in entry.oracle_sql()
    # the folded sampling gates no longer hold individual slots
    for folded in ("td_stratified_sample", "td_kmv_distinct", "td_hash_sample"):
        assert folded not in names


def test_suite_column_lists_match_member_queries(spark):
    """The per-member column lists (which build the DuckDB side of the
    stringification) must equal each member DataFrame's column order —
    suite_query also asserts this at run time, naming the member."""
    for _q, members in _SUITES:
        for g, fn, _sql, cols in members:
            assert list(fn(spark, SF).columns) == list(cols), g


@pytest.mark.slow
def test_suites_restate_members(spark):
    """Each suite row set equals the union of its members' stringified
    rows — a suite hash pins exactly what the separate gates did."""
    for suite_q, members in _SUITES:
        got = sorted(
            (r["gate"], r["row_str"]) for r in suite_q(spark, SF).collect()
        )
        want = sorted(
            (r["gate"], r["row_str"])
            for g, fn, _sql, _cols in members
            for r in norm_rows(fn(spark, SF), g).collect()
        )
        assert got == want
        assert len({g for g, _ in got}) == len(members)
