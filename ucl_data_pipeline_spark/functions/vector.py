"""Vector (embedding) column expressions: dot product, norms, cosine —
as Catalyst higher-order functions over ``array<double>``.

Determinism note: folds are sequential left-to-right, matching DuckDB's
``list_dot_product``; with both sides cast to double the products and
running sums are IEEE-identical, so cosine values hash-match exactly.
At 100 TB these expressions run inside whole-stage codegen; a
Pandas-UDF BLAS path is only worth it for very high dimensions
(~≥1024) where JIT loop overhead dominates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double(vec: ColumnOrName) -> Column:
    return _col(vec).cast("array<double>")


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Sequential-fold dot product (bit-compatible with DuckDB)."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# --- corpus-sized LSH (see SCALE_NOTES "corpus-sized LSH fix") ---
# A FIXED bucket space saturates quadratically once corpus/buckets
# exceeds the target occupancy (measured: 191 s at ×100 corpus for an
# 8-bit space). These helpers size the bucket width to the corpus:
# smallest b ∈ [NBITS_MIN, NBITS_MAX] with 2^b ≥ n/NBITS_TARGET,
# chosen by an exact INTEGER comparison ladder — never log2 of a
# double, whose last-ulp behavior at exact powers of two could fork
# the bucket count across engines. The SQL spellings mirror the
# Column ones term-for-term; ``nbits`` must arrive as a PLAIN column
# (DuckDB rejects subqueries inside lambda bodies).

NBITS_MIN, NBITS_MAX, NBITS_TARGET = 8, 20, 16


def nbits_for_count(n: Column) -> Column:
    """Smallest b ∈ [8, 20] with 2^b ≥ n/16, by exact integer ladder."""
    c = F.when(n <= NBITS_TARGET * 2**NBITS_MIN, NBITS_MIN)
    for b in range(NBITS_MIN + 1, NBITS_MAX):
        c = c.when(n <= NBITS_TARGET * 2**b, b)
    return c.otherwise(F.lit(NBITS_MAX))


def sql_nbits_for_count(n_expr: str) -> str:
    clauses = " ".join(
        f"WHEN {n_expr} <= {NBITS_TARGET * 2**b} THEN {b}"
        for b in range(NBITS_MIN, NBITS_MAX)
    )
    return f"(CASE {clauses} ELSE {NBITS_MAX} END)"


def adaptive_sign_bucket(vec: ColumnOrName, nbits: Column) -> Column:
    """Sign bucket over the first ``nbits`` components with nbits a
    COLUMN: fold Σ 2^i·[vecᵢ₊₁ > 0] over i < nbits. 2^i via pow-cast
    (exact in double through 2^52); ≤ NBITS_MAX cheap lambda steps.
    Agrees bit-for-bit with ``sign_bucket(vec, 8)`` when nbits = 8.

    ``try_element_at`` (not ``element_at``): the when() guard does not
    short-circuit the element access, so under ANSI mode a vector
    shorter than NBITS_MAX would raise INVALID_ARRAY_INDEX where the
    DuckDB spelling yields NULL and falls to the ELSE 0 branch;
    try_element_at returns NULL out-of-range in both ANSI modes, so
    the 0 branch is taken identically cross-engine."""
    v = as_double(vec)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(NBITS_MAX - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            (i < nbits) & (F.try_element_at(v, (i + 1).cast("int")) > 0),
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def sql_adaptive_sign_bucket(e: str) -> str:
    """DuckDB spelling of :func:`adaptive_sign_bucket`; references a
    plain ``nbits`` column (CROSS JOIN the one-row nbits CTE in)."""
    return (
        f"CAST(list_sum(list_transform(range(0, {NBITS_MAX}), i -> "
        f"CASE WHEN i < nbits AND {e}[i + 1] > 0 "
        f"THEN CAST(POWER(2, i) AS BIGINT) ELSE 0 END)) AS BIGINT)"
    )


def sign_bucket(vec: ColumnOrName, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: integer from the sign bits of the
    first ``n_bits`` components. A fixed-hyperplane random-projection
    LSH (planes = coordinate axes) — coarse but reproducible across
    engines; at scale, bucket-join then refine within buckets.

    try_element_at (not element_at): under ANSI mode element_at throws
    INVALID_ARRAY_INDEX for vectors shorter than n_bits, while the
    DuckDB spelling (``v[i+1] > 0``) yields NULL and falls to the 0
    branch; try_element_at returns NULL in both ANSI modes, matching.
    """
    v = as_double(vec)
    bits = [
        F.when(F.try_element_at(v, F.lit(i + 1)) > 0, F.lit(2**i)).otherwise(
            F.lit(0)
        )
        for i in range(n_bits)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")
