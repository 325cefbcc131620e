"""S1/S3/S4: driver-side HTTP/REST ingestion (SURVEY.md §2.1).

Fetching stays on the driver — it is control flow (source selection,
auth, rate limiting: reference scripts/fetch_the_odds_api.py:59-71,
fetch_fbr_team_xg.py:86-88), not data-parallel work. The fetched bytes
land in a staging DataFrame and everything downstream is ordinary
engine code. At 100 TB, sources pre-land on object storage and these
helpers disappear in favor of direct ``spark.read``.

Graceful-degradation contract (V3): any fetch failure returns the
empty-but-valid table for the declared schema and the pipeline
continues (reference writes header-only CSVs on failure,
fetch_the_odds_api.py:23-29).
"""

from __future__ import annotations

import io as _io
import time
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ucl_data_pipeline_spark.sources.io import empty_df

Opener = Callable[[str, float], bytes]


def _default_opener(url: str, timeout: float) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def fetch_csv(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    timeout: float = 60.0,
    opener: Opener = _default_opener,
) -> DataFrame:
    """GET a CSV document → typed DataFrame; failure → empty typed df.

    Reference: ``http_get_csv`` (scripts/utils.py:5-8, 60 s timeout).
    ``opener`` is injectable for tests (file:// URLs) and for adding
    auth/retry policies without touching the parse path.
    """
    try:
        raw = opener(url, timeout).decode("utf-8", errors="replace")
        lines = [ln for ln in raw.splitlines() if ln.strip()]
        if len(lines) < 2:
            return empty_df(spark, schema)
        import csv as _csv

        rows = list(_csv.DictReader(_io.StringIO(raw)))
        names = [f.name for f in schema.fields]
        data = [tuple(r.get(n) for n in names) for r in rows]
        df = spark.createDataFrame(
            data, T.StructType([T.StructField(n, T.StringType()) for n in names])
        )
        from ucl_data_pipeline_spark.sources.io import conform

        return conform(df, schema)
    except Exception:
        return empty_df(spark, schema)


def fetch_json(
    spark: SparkSession,
    url: str,
    element_schema: T.ArrayType,
    timeout: float = 30.0,
    rate_limit_s: float = 0.0,
    opener: Opener = _default_opener,
) -> DataFrame:
    """GET a JSON array document → exploded typed rows; failure → empty.

    ``rate_limit_s`` sleeps BEFORE the request (reference FBR throttle:
    1 request / 3.2 s, scripts/fetch_fbr_team_xg.py:86-88).
    """
    try:
        if rate_limit_s > 0:
            time.sleep(rate_limit_s)
        raw = opener(url, timeout).decode("utf-8", errors="replace")
        from ucl_data_pipeline_spark.sources.io import read_json_records

        return read_json_records(spark, raw, element_schema)
    except Exception:
        assert isinstance(element_schema.elementType, T.StructType)
        return empty_df(spark, element_schema.elementType)
