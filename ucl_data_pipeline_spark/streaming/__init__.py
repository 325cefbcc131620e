"""Structured Streaming operators (SURVEY.md §2.9)."""

from ucl_data_pipeline_spark.streaming.windows import (  # noqa: F401
    bench_gram_digests_static,
    curation_gate_stream,
    daily_revenue_stream,
    dedup_within_watermark,
    interval_join_stream,
    late_events_stream,
    ohlc_stream,
    read_docs_stream,
    read_events_stream,
    read_orders_stream,
    rollup_changepoint,
    rollup_cusum,
    rollup_late_stats,
    rollup_session_histogram,
    run_available_now,
    session_length_stream,
    session_window_stream,
    sliding_window_stream,
    tumbling_window_stream,
    user_running_totals_stream,
)
