"""Structured Streaming pipelines over the ``events`` stream.

The reference is a daily full-recompute batch (SURVEY.md §2.9 — cron
re-run, no state); its semantics are exactly Spark's
``Trigger.AvailableNow`` batch-increment model. This module provides the
genuine streaming operators the engine exposes:

- tumbling / sliding window aggregations with watermarks,
- session windows (gap-merge) per key,
- ``dropDuplicatesWithinWatermark`` keyed dedup.

Each transformation is written against an unbounded DataFrame and works
identically on a bounded one — tests assert the AvailableNow streaming
result equals the registered batch queries (plans.events_windows),
which the driver oracle-checks against DuckDB. At scale these run
against a file/Kafka source with checkpointing; state stores are keyed
by (window/session, key) so state size is bounded by the watermark
horizon, not the stream length.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ucl_data_pipeline_spark.functions import scalar as SC

EVENTS_MICROS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream of events (micro-batched directory of
    ``parquet`` or ``csv`` files — the two common landing formats; CSV
    needs the explicit schema since the format carries no types). At
    scale the same pipeline binds to Kafka by swapping this reader.
    """
    reader = spark.readStream.schema(EVENTS_MICROS_SCHEMA).format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def tumbling_window_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count/sum with late-data watermark. State per
    (window, event_type); windows finalize ``watermark`` past their end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_stream(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window aggregation (each event in window/slide buckets)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_window_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows with an inactivity gap: Spark merges
    overlapping session state as events arrive; a session closes once
    the watermark passes its end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def ohlc_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming OHLC bars: per (hour window, event_type) the opening
    value (earliest row by the total order (ts, event_id) via min_by on
    the ordering struct), high, low, close, count and exact-decimal sum
    — the streaming twin of the batch ohlc_resample_hourly query
    (plans/extras5.py), which picks open/close via ROW_NUMBER over the
    same total order; min_by/max_by on the (ts, event_id) struct select
    the identical rows, so stream ≡ batch holds row-for-row.

    State per group is O(1) (two extreme rows + four scalars), so this
    is the pre-aggregation that runs AT the stream and makes downstream
    batch analytics cheap at any volume.
    """
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Keyed streaming dedup: keeps the first arrival per key, with
    state expiring at the watermark horizon
    (``dropDuplicatesWithinWatermark``) — the streaming twin of the
    batch dedup_events_first query.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def interval_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each click joined to the views it
    followed within ``max_lag`` for the same user — the streaming twin
    of the batch query plans.events_windows.view_click_interval_join
    (identical join condition and output columns).

    Both inputs carry watermarks and the join condition bounds the
    event-time distance in BOTH directions, so Spark can expire
    buffered rows once the watermark passes the bound — state is sized
    by (rate × lag window), not stream length. This is the canonical
    ad-attribution / impression-click pattern.
    """
    v = (
        views.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {max_lag}")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        (SC.epoch_s("c_ts") - SC.epoch_s("v_ts")).alias("lag_s"),
    )


RUNNING_TOTALS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_RUNNING_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
])


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) maintained in the state store across
    micro-batches, emitting the updated totals for each user touched by
    a batch.

    This is the arbitrary-state escape hatch for semantics the built-in
    windowed aggregations can't express (per-key accumulators, custom
    session logic, model-feature decay). State is one tiny tuple per
    user — bounded by key cardinality, not stream length; at scale pair
    it with a state TTL (``GroupStateTimeout``) so abandoned keys age
    out.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs, state: GroupState
    ):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    df: DataFrame, checkpoint_dir: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming DataFrame to completion over currently
    available input (Trigger.AvailableNow — the reference's
    batch-increment cadence) into an in-memory sink; returns the result
    as a DataFrame. Test/driver utility: production sinks are
    parquet/Kafka writers with the same trigger.

    Exactly-once semantics: reusing a ``checkpoint_dir`` resumes from
    its recorded progress, so a rerun over already-processed input
    yields an EMPTY result by design — pass a fresh checkpoint dir to
    recompute from scratch.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
