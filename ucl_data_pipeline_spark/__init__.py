"""ucl_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query & data-processing
capabilities of the reference pipeline (maggs1013/ucl-data-pipeline — a
pandas batch ETL; see SURVEY.md), extended with large-scale
training-data operators (dedup, similarity search, multimodal columns,
text analysis) and designed for 100 TB scale:

- All logic is declared through the DataFrame/SQL API so Catalyst owns
  predicate pushdown, column pruning, join strategy and AQE re-planning.
- Zero row-at-a-time Python UDFs on any hot path; the few Python escape
  hatches are Arrow-vectorized (`mapInPandas` for multimodal decode).
- Dimension joins broadcast; fact-side operations keep a single shuffle
  per logical aggregation; global sorts are avoided at scale in favor of
  partitioned layouts + sortWithinPartitions.
"""

__version__ = "0.1.0"

from ucl_data_pipeline_spark.session import get_spark  # noqa: F401
