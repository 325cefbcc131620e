"""Validation / data-quality operators (SURVEY.md §2.11).

The reference's validation is a runtime report that warns and never
fails (scripts/validate_data.py:9-36); this engine exposes the same
checks as structured results so callers choose the failure policy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class TableReport:
    """V2: per-table summary (row count, columns, sample rows)."""

    name: str
    n_rows: int
    columns: list[str]
    sample: list[dict] = field(default_factory=list)
    missing_columns: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.missing_columns


def required_columns_check(
    df: DataFrame, required: list[str] | T.StructType
) -> list[str]:
    """V1/P9: columns required but absent (reference
    scripts/validate_data.py:16-18 needed.issubset check,
    fetch_the_odds_api.py:41-44). Empty list ⇒ valid.
    """
    if isinstance(required, T.StructType):
        required = [f.name for f in required.fields]
    have = set(df.columns)
    return [c for c in required if c not in have]


def summarize(
    df: DataFrame,
    name: str,
    required: list[str] | T.StructType | None = None,
    n_sample: int = 5,
) -> TableReport:
    """V2: row count + column list + head sample + V1 missing-column
    list (reference scripts/validate_data.py:9-14,20-27 — `.head(5)`
    becomes `.limit(5)`; the count is the only full-table action).
    """
    sample = [r.asDict() for r in df.limit(n_sample).collect()]
    return TableReport(
        name=name,
        n_rows=df.count(),
        columns=list(df.columns),
        sample=sample,
        missing_columns=(
            required_columns_check(df, required) if required is not None else []
        ),
    )


def validation_report(
    tables: dict[str, DataFrame],
    required: dict[str, list[str] | T.StructType] | None = None,
) -> dict[str, TableReport]:
    """The full validate stage: one report per table; never raises
    (graceful-degradation contract V3 — empty/missing tables produce a
    zero-row report, not a failure).
    """
    required = required or {}
    return {
        name: summarize(df, name, required.get(name))
        for name, df in tables.items()
    }
