"""Portable hash Columns — the Spark side of :mod:`..semantics`'s
cross-engine hash family (poly_hash / affine_hash).

Everything here compiles to built-in expressions (aggregate/transform over
split — whole-stage codegen, no Python), and every formula has a
bit-identical DuckDB rendering in :mod:`..gate_textdata`'s oracle builders,
which is what lets MinHash/SimHash/LSH outputs be hash-compared against a
DuckDB oracle.  63-bit discipline: all operands < POLY_P ≈ 2^30, so
products stay < 2^63 under Spark ANSI overflow checks.

Inputs must be non-empty strings: Spark splits ``''`` into ``['']`` while
DuckDB yields one empty element too but ``ascii('')`` (0) has no DuckDB
``ord('')`` twin — callers filter empties upstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import semantics as S


def poly_hash_col(col: Column | str) -> Column:
    """semantics.poly_hash as a fold over the string's codepoints."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(S.POLY_SEED0).cast("long"),
        lambda acc, ch: (acc * F.lit(S.POLY_BASE) + ch) % F.lit(S.POLY_P),
    )


def affine_col(h: Column, a: int, b: int) -> Column:
    """semantics.affine_hash: (a·h + b) mod P (h must already be < P)."""
    return (F.lit(a).cast("long") * h + F.lit(b)) % F.lit(S.POLY_P)


def minhash_col(h: Column, k: int) -> Column:
    """k-th minhash permutation of a shingle hash."""
    return affine_col(h, S.MINHASH_A[k], S.MINHASH_B[k])


def simhash_vote_col(h: Column, k: int) -> Column:
    """+1/-1 vote of a token hash for simhash bit k (2·x >= P threshold)."""
    return F.when(
        affine_col(h, S.SIMHASH_A[k], S.SIMHASH_B[k]) * 2 >= F.lit(S.POLY_P),
        F.lit(1),
    ).otherwise(F.lit(-1))
