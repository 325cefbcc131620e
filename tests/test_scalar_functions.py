"""Unit tests for the scalar column-expression library — encoding the
reference's semantics (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import (
    clamp_with_midpoint,
    fractional_to_decimal_odds,
    haversine_km,
    parse_date_multi,
    ratio_with_floor,
    sign_score,
    weighted_hybrid,
)


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_haversine_anfield_to_allianz(spark):
    # Reference fixture: Anfield (53.4308,-2.9608) → Allianz Arena
    # (48.2188, 11.6247) ≈ 1174 km; stadium coords from
    # /root/reference/data/stadiums.csv:2-3
    df = spark.createDataFrame(
        [(53.4308, -2.9608, 48.2188, 11.6247)], ["lat1", "lon1", "lat2", "lon2"]
    )
    km = df.select(
        haversine_km("lat1", "lon1", "lat2", "lon2").alias("km")
    ).collect()[0].km
    assert km == pytest.approx(1173.9, abs=5.0)


def test_haversine_zero_distance(spark):
    df = spark.createDataFrame([(10.0, 20.0)], ["lat", "lon"])
    km = df.select(haversine_km("lat", "lon", "lat", "lon").alias("km")).collect()[
        0
    ].km
    assert km == 0.0


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("5/2", 3.5),  # reference scripts/utils.py:10-17
        ("1/1", 2.0),
        ("3.5", 3.5),
        ("2", 2.0),
        ("garbage", None),
        ("5/0", None),
        (None, None),
    ],
)
def test_fractional_odds(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "odds: string")
    got = df.select(fractional_to_decimal_odds("odds").alias("v")).collect()[0].v
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


@pytest.mark.parametrize(
    "raw,expected",
    [("0.72", 0.72), ("0.1", 0.55), ("99", 0.90), ("bad", 0.725), (None, 0.725)],
)
def test_clamp_with_midpoint(spark, raw, expected):
    # reference scripts/bootstrap_team_priors.py:8-11
    df = spark.createDataFrame([(raw,)], "v: string")
    got = df.select(clamp_with_midpoint("v", 0.55, 0.90).alias("c")).collect()[0].c
    assert got == pytest.approx(expected)


@pytest.mark.parametrize(
    "cur,last,expected",
    [
        (2.0, 1.0, 0.6 * 2.0 + 0.4 * 1.0),
        (2.0, None, 2.0),
        (None, 1.0, 1.0),
        (None, None, None),
    ],
)
def test_weighted_hybrid_degradation(spark, cur, last, expected):
    # reference scripts/fetch_fbr_team_xg.py:113-123
    df = spark.createDataFrame([(cur, last)], "cur: double, last: double")
    got = df.select(weighted_hybrid("cur", "last").alias("h")).collect()[0].h
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


def test_sign_score_and_ratio_floor(spark):
    # reference scripts/bootstrap_team_priors.py:27-28
    assert _one(spark, sign_score(F.lit(3.2))) == pytest.approx(0.65)
    assert _one(spark, sign_score(F.lit(-1.0))) == pytest.approx(0.45)
    assert _one(spark, sign_score(F.lit(None).cast("double"))) == pytest.approx(0.55)
    assert _one(spark, ratio_with_floor(F.lit(34.0))) == pytest.approx(0.65)
    assert _one(spark, ratio_with_floor(F.lit(None).cast("double"))) == pytest.approx(
        0.80
    )


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("17/8/2024", "2024-08-17"),  # dayfirst (reference F5)
        ("5/3/1995", "1995-03-05"),
        ("1995-03-05", "1995-03-05"),
        ("not-a-date", None),
    ],
)
def test_parse_date_multi(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "d: string")
    got = df.select(
        parse_date_multi("d", formats=("d/M/yyyy", "yyyy-MM-dd")).alias("p")
    ).collect()[0].p
    assert (got.isoformat() if got else None) == expected


def test_haversine_is_not_a_udf(spark):
    # The whole point (SURVEY.md §2.10): no BatchEvalPython in the plan.
    df = spark.createDataFrame([(1.0, 2.0, 3.0, 4.0)], ["a", "b", "c", "d"])
    plan = df.select(
        haversine_km("a", "b", "c", "d").alias("km")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
