"""Composite operators: enrichment joins, name normalization, nested
JSON flattening, multimodal column processing, and the reference
pipeline compositions."""

from ucl_data_pipeline_spark.operators.enrich import (  # noqa: F401
    enrich_dont_clobber,
    normalize_names,
    prefix_columns,
)
from ucl_data_pipeline_spark.operators.json_flatten import (  # noqa: F401
    flatten_odds_json,
)
