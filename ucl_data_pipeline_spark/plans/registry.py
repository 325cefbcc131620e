"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2 inventory + the
training-data operators) registers here; the driver harness compares
each Spark result against its oracle SQL on the same parquet tables
(row count + schema + order-insensitive value hash).

Cross-engine float determinism convention (critical for value-hash
equality — Spark and DuckDB sum doubles in different orders):

- Aggregates over money/ratio doubles are computed EXACTLY by casting
  inputs to DECIMAL before SUM and casting the final result to DOUBLE.
  Decimal addition is exact, so both engines produce bit-identical
  doubles regardless of partitioning. Helper: ``dsum``/``davg`` below,
  mirrored in oracle SQL as
  ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
- Per-row transcendental math (haversine, cosine) differs in the last
  ulp between libm and the JVM; such outputs are wrapped in
  ``ROUND(x, 6)`` on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query and its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


# ---------------------------------------------------------------------------
# Cross-engine deterministic aggregate helpers (see module docstring)
# ---------------------------------------------------------------------------

DEC = "decimal(18,6)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a (≤6-decimal) double column."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum ÷ count, in double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def r6(c: Column) -> Column:
    """Round transcendental-math output to 6 dp (cross-libm safety)."""
    return F.round(c, 6)


# Oracle-SQL spellings of the same helpers
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
