from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucl_data_pipeline_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    # r12 advisor: query-internal persist() calls rely on the bench's
    # per-run clearCache; the session fixture must not let cache
    # entries accumulate across a whole test session (bounded by LRU,
    # but needless pressure).
    spark.catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
