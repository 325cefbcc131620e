"""S1/S3 HTTP ingestion: injectable-opener tests (no network) covering
the parse path and the graceful-degradation contract (V3: any failure
→ empty-but-valid typed table, reference fetch_the_odds_api.py:23-29).
"""

from __future__ import annotations

from pyspark.sql import types as T

from ucl_data_pipeline_spark.sources.http import fetch_csv, fetch_json

MATCH_SCHEMA = T.StructType([
    T.StructField("date", T.StringType()),
    T.StructField("home_team", T.StringType()),
    T.StructField("away_team", T.StringType()),
    T.StructField("home_odds_dec", T.DoubleType()),
])


def test_fetch_csv_parses_and_conforms(spark):
    body = (
        "date,home_team,away_team,home_odds_dec,extra\n"
        "01/02/2024,Arsenal,Chelsea,2.1,ignored\n"
        "02/02/2024,Liverpool,Everton,1.5,ignored\n"
    ).encode()
    df = fetch_csv(spark, "http://example.test/x.csv", MATCH_SCHEMA,
                   opener=lambda url, timeout: body)
    rows = df.orderBy("date").collect()
    assert [f.name for f in df.schema.fields] == [f.name for f in MATCH_SCHEMA.fields]
    assert len(rows) == 2
    assert rows[0].home_team == "Arsenal"
    assert rows[0].home_odds_dec == 2.1  # conformed to double


def test_fetch_csv_failure_yields_empty_typed_table(spark):
    def boom(url, timeout):
        raise OSError("connection refused")

    df = fetch_csv(spark, "http://down.test/x.csv", MATCH_SCHEMA, opener=boom)
    assert df.isEmpty()
    assert df.schema == MATCH_SCHEMA


def test_fetch_csv_header_only_yields_empty(spark):
    df = fetch_csv(spark, "http://example.test/empty.csv", MATCH_SCHEMA,
                   opener=lambda url, timeout: b"date,home_team\n")
    assert df.isEmpty()
    assert df.schema == MATCH_SCHEMA


GAMES_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("home_team", T.StringType()),
    T.StructField("price", T.DoubleType()),
]))


def test_fetch_json_parses_array(spark):
    body = b'[{"id": "g1", "home_team": "Real", "price": 1.8}, {"id": "g2", "home_team": "Bayern", "price": 2.4}]'
    df = fetch_json(spark, "http://api.test/odds", GAMES_SCHEMA,
                    opener=lambda url, timeout: body)
    got = {r.id: r.price for r in df.collect()}
    assert got == {"g1": 1.8, "g2": 2.4}


def test_fetch_json_failure_yields_empty(spark):
    def boom(url, timeout):
        raise TimeoutError

    df = fetch_json(spark, "http://api.test/odds", GAMES_SCHEMA, opener=boom)
    assert df.isEmpty()
    assert [f.name for f in df.schema.fields] == ["id", "home_team", "price"]
