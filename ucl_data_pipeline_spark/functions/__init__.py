"""Scalar/column-expression library (SURVEY.md §2.8) — no Python UDFs."""

from ucl_data_pipeline_spark.functions.scalar import (  # noqa: F401
    clamp,
    clamp_with_midpoint,
    fractional_to_decimal_odds,
    haversine_km,
    parse_date_multi,
    ratio_with_floor,
    sign_score,
    to_naive_timestamp,
    try_double,
    weighted_hybrid,
)
