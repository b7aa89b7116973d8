"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full KG triple set) on
sf0.001.  ``queries()`` exposes one entry per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the exact DuckDB equivalent (generated
from the same constants in ``semantics.py`` — see ``oracles.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from agenticknowledgegraphconstructionsystem_spark.gate import KG_QUERIES
from agenticknowledgegraphconstructionsystem_spark.oracles import KG_ORACLES

_EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_EXTRA_ORACLES: dict[str, str] = {}

try:  # relational + training-data-pipeline operator suites (added as built)
    from agenticknowledgegraphconstructionsystem_spark.gate_relational import (
        REL_ORACLES,
        REL_QUERIES,
    )

    _EXTRA_QUERIES.update(REL_QUERIES)
    _EXTRA_ORACLES.update(REL_ORACLES)
except ImportError:
    pass

try:
    from agenticknowledgegraphconstructionsystem_spark.gate_textdata import (
        TEXT_ORACLES,
        TEXT_QUERIES,
    )

    _EXTRA_QUERIES.update(TEXT_QUERIES)
    _EXTRA_ORACLES.update(TEXT_ORACLES)
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the emitted (subj, pred, obj) triple set at sf0.001."""
    return KG_QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(KG_QUERIES)
    out.update(_EXTRA_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(KG_ORACLES)
    out.update(_EXTRA_ORACLES)
    return out
