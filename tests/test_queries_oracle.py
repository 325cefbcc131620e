"""Oracle-differential tests: every registered query vs DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01). This is the
engine's primary correctness gate (SURVEY.md §5.2 item 1).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from ucl_data_pipeline_spark.plans import REGISTRY
from ucl_data_pipeline_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert isinstance(srows, list)  # rows-only smoke
        return
    cur = duck.execute(q.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), "column names must match"
    assert len(srows) == len(drows), "row counts must match"
    assert _multiset(srows, sdf.columns) == _multiset(drows, dcols)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_doc_and_unique_name():
    assert len(REGISTRY) >= 30
    for q in REGISTRY.values():
        assert q.doc.strip(), f"{q.name} missing docstring"
