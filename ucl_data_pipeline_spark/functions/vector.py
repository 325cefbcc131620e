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


def sign_bucket(vec: ColumnOrName, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: integer from the sign bits of the
    first ``n_bits`` components. A fixed-hyperplane random-projection
    LSH (planes = coordinate axes) — coarse but reproducible across
    engines; at scale, bucket-join then refine within buckets.
    """
    v = as_double(vec)
    bits = [
        F.when(F.element_at(v, i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")
