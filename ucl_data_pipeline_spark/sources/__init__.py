"""Sources & sinks (SURVEY.md §2.1 S1-S9, Spark-first)."""

from ucl_data_pipeline_spark.sources.io import (  # noqa: F401
    conform,
    empty_df,
    read_csv,
    read_json_records,
    read_table,
    safe_read_csv,
    write_csv,
    write_parquet,
)
