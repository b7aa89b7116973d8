"""Shared machinery for combined micro-gate suite queries.

The driver records CORRECTNESS rows for at most 50 queries; trivial
single-shape micro-gates are folded into suite queries so every
substantial operator keeps a driver-visible row.  Each member's full
result is stringified row-wise — columns in a stated order, NULL → a
sentinel — tagged with the member's gate name, and unioned.  The
driver's order-insensitive hash over (gate, row_str) then pins exactly
the same value set per member as separate gates would: a mismatch in ANY
member's rows breaks the suite hash.  The DuckDB oracle applies the
identical stringification per member (same column order, same sentinel)
over the identical per-member SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "@NULL@"


def norm_rows(df: DataFrame, gate: str) -> DataFrame:
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
        for c in df.columns
    ]
    return df.select(
        F.lit(gate).alias("gate"), F.concat_ws("|", *cols).alias("row_str")
    )


def norm_sql(gate: str, sql: str, cols: list[str]) -> str:
    exprs = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '{NULL_SENTINEL}')" for c in cols
    )
    return (
        f"SELECT '{gate}' AS gate, concat_ws('|', {exprs}) AS row_str "
        f"FROM ({sql})"
    )


def suite_query(members):
    """members: [(gate_name, query_fn, oracle_sql, column_list), ...]"""

    def q(spark, sf_dir):
        dfs = []
        for g, fn, _sql, cols in members:
            df = fn(spark, sf_dir)
            # Fail fast, naming the member, if a query's select list drifts
            # from the declared oracle column list — otherwise the drift
            # surfaces only as an opaque suite-hash mismatch in a sweep.
            if list(df.columns) != list(cols):
                raise AssertionError(
                    f"suite member {g!r}: Spark columns {list(df.columns)} "
                    f"!= declared oracle columns {list(cols)}"
                )
            dfs.append(norm_rows(df, g))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    return q


def suite_oracle(members) -> str:
    return "\nUNION ALL\n".join(
        norm_sql(g, sql, cols) for g, _fn, sql, cols in members
    )
