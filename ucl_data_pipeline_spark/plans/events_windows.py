"""Event-stream operators in their batch-expressible form (SURVEY.md
§2.9): tumbling/sliding/session windows, JSON props extraction, and
watermark-style dedup — registered over the ``events`` table with DuckDB
oracles. The true Structured Streaming pipelines (readStream →
withWatermark → window → sink) live in
``ucl_data_pipeline_spark.streaming`` and are pytest-verified to produce
these same results via Trigger.AvailableNow; the driver harness checks
the batch semantics here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import scalar as SC
from ucl_data_pipeline_spark.plans.registry import (
    dsum,
    register,
    sql_dsum,
)
from ucl_data_pipeline_spark.sources.io import read_table

_TUMBLING_ORACLE = f"""
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("tumbling_window_agg", oracle=_TUMBLING_ORACLE, tags=("events", "window"))
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation via ``F.window`` — the exact
    construct the streaming path uses with a watermark; epoch-aligned
    so it equals time_bucket/date_trunc in the oracle.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SLIDING_ORACLE = f"""
WITH slid AS (
  SELECT
    e.*,
    CAST(to_timestamp(floor(epoch(e.ts) / 300) * 300 - off.o) AS TIMESTAMP)
      AS window_start
  FROM events e, (VALUES (0), (300)) AS off(o)
)
SELECT
  window_start,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value
FROM slid
GROUP BY 1
"""


@register("sliding_window_agg", oracle=_SLIDING_ORACLE, tags=("events", "window"))
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): every event lands
    in exactly two windows. ``F.window(ts, '10 minutes', '5 minutes')``
    — the oracle mirrors Spark's window-assignment arithmetic
    (floor to slide grid, minus each slide offset).
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


_SESSION_ORACLE = f"""
WITH marked AS (
  SELECT
    event_id, user_id, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              < INTERVAL '5 minutes'
         THEN 0 ELSE 1 END AS new_session
  FROM events
), numbered AS (
  SELECT
    user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL '5 minutes' AS session_end,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_no
"""


@register("session_window_agg", oracle=_SESSION_ORACLE, tags=("events", "window"))
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user via
    ``F.session_window`` — Spark's native gap-merge; the oracle builds
    the same sessions with gaps-and-islands SQL (lag + running sum).
    Session end = last event + gap, matching Spark's definition.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_JSON_PROPS_ORACLE = """
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
"""


@register("json_props_extract", oracle=_JSON_PROPS_ORACLE, tags=("events", "scalar"))
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 analog: typed extraction from a JSON string column
    (reference: nested odds-JSON flatten,
    scripts/fetch_the_odds_api.py:118-143; here get_json_object /
    from_json — JVM-side JSON path, no UDF).
    """
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


_EVENTS_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
"""


@register("dedup_events_first", oracle=_EVENTS_DEDUP_ORACLE, tags=("events", "dedup"))
def dedup_events_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of dropDuplicatesWithinWatermark: keep the
    earliest event per (user_id, event_type), deterministic tie-break.
    The streaming twin (withWatermark + dropDuplicates) is tested in
    tests/test_streaming.py.
    """
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


_HYPERTABLE_ORACLE = """
SELECT
  CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS resolution,
  COALESCE(h, d) AS bucket_ts,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (
  SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
         event_type, value
  FROM events
)
GROUP BY GROUPING SETS ((d, event_type), (h, event_type))
"""


@register("hypertable_rollup", oracle=_HYPERTABLE_ORACLE, tags=("events", "agg", "temporal"))
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time-bucket rollup (hour + day continuous
    aggregates) in ONE pass via GROUPING SETS — the hypertable /
    continuous-aggregate pattern: every resolution shares the same
    partial aggregation, instead of one scan per resolution. At scale
    the output is itself partitioned by resolution and serves
    dashboards without touching raw events.
    """
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events_ht")
    return spark.sql("""
        SELECT
          CASE WHEN grouping(h) = 0 THEN 'hour' ELSE 'day' END AS resolution,
          COALESCE(h, d) AS bucket_ts,
          event_type,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM (
          SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                 event_type, value
          FROM events_ht
        )
        GROUP BY GROUPING SETS ((d, event_type), (h, event_type))
    """)


_MAP_FN_ORACLE = """
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
  array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
  CAST(2 * CAST(json_extract(props, '$.k') AS BIGINT) AS BIGINT) AS k_doubled
FROM events
"""


@register("map_functions", oracle=_MAP_FN_ORACLE, tags=("events", "scalar", "map"))
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map-column surface: JSON properties parsed to
    ``map<string,bigint>`` once, then element_at / map_keys /
    transform_values — the typed path for semi-structured event
    properties (vs re-parsing JSON per field). Map outputs are
    projected to atomic columns only (sorted keys joined to one
    string) so results stay hash-comparable across engines — the
    driver's pandas canonicalizer cannot hash list cells.
    """
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    doubled = F.transform_values(m, lambda _, v: v * 2)
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(doubled, "k").alias("k_doubled"),
    )


_FUNNEL_ORACLE = """
WITH steps AS (
  SELECT
    user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT
  user_id,
  CAST(t_view IS NOT NULL AS INTEGER) AS did_view,
  CAST(t_view IS NOT NULL AND t_click > t_view AS INTEGER) AS did_click_after_view,
  CAST(t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
       AS INTEGER) AS did_full_funnel
FROM steps
"""


@register("funnel_analysis", oracle=_FUNNEL_ORACLE, tags=("events", "agg"))
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase) per user: first
    occurrence of each step via conditional MIN in ONE aggregation
    pass, then ordering predicates — never a per-step self-join (the
    N-step funnel as N fact scans is the classic analytics
    anti-pattern; this is one scan, one shuffle).
    """
    ev = read_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    steps = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return steps.select(
        "user_id",
        viewed.cast("int").alias("did_view"),
        clicked.cast("int").alias("did_click_after_view"),
        purchased.cast("int").alias("did_full_funnel"),
    )


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS active_day
  FROM events e
)
SELECT
  f.cohort_day,
  CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
  COUNT(DISTINCT a.user_id) AS n_active_users
FROM firsts f
JOIN activity a ON a.user_id = f.user_id
GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.active_day)
"""


@register("cohort_retention", oracle=_COHORT_ORACLE, tags=("events", "agg", "temporal"))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    counted per day-offset from that cohort day. The cohort table is
    per-user (small) → broadcast back onto the distinct-activity set;
    two aggregations, both map-side combinable.
    """
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


_ANOMALY_ORACLE = """
WITH stats AS (
  SELECT
    event_id, user_id, event_type, ts, value,
    COUNT(value) OVER w AS n,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
    CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w
      AS DOUBLE) AS sxx
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT
  event_id, user_id, event_type, ts, value,
  CASE WHEN n >= 3 AND sxx - sx * sx / n > 0
       THEN ROUND((value - sx / n)
                  / sqrt((sxx - sx * sx / n) / (n - 1)), 6)
       END AS trailing_z
FROM stats
"""


@register("rolling_anomaly_score", oracle=_ANOMALY_ORACLE, tags=("events", "window", "temporal"))
def rolling_anomaly_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly score: each reading z-scored against the
    PRECEDING 10 readings of the same (user, type) — strictly past rows
    only, so the operator is causally valid (the batch twin of a
    streaming outlier detector). Exact-decimal rolling sums keep both
    engines bit-identical; insufficient history (<3) → NULL.
    """
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    vd = F.col("value").cast("decimal(18,6)")
    n = F.count("value").over(w)
    sx = F.sum(vd).over(w).cast("double")
    sxx = F.sum(vd * vd).over(w).cast("double")
    var = (sxx - sx * sx / n) / (n - 1)
    z = F.when(
        (n >= 3) & (sxx - sx * sx / n > 0),
        F.round((F.col("value") - sx / n) / F.sqrt(var), 6),
    )
    return ev.select(
        "event_id", "user_id", "event_type", "ts", "value",
        z.alias("trailing_z"),
    )


_INTERVAL_JOIN_ORACLE = """
SELECT
  v.user_id,
  v.event_id AS view_id,
  c.event_id AS click_id,
  CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS lag_s
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
"""


@register(
    "view_click_interval_join",
    oracle=_INTERVAL_JOIN_ORACLE,
    tags=("events", "join", "temporal"),
)
def view_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (time-bounded) self-join: every click within 30 minutes
    after a view by the same user — the batch twin of the stream-stream
    join in streaming.windows.interval_join_stream (identical join
    condition; there each side carries a watermark so the state store
    can expire rows older than the bound).

    Scale: equi-key on user_id carries the shuffle; the time bound is
    evaluated inside the join so no per-user cross product ever
    materializes beyond the 30-minute band.
    """
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        (SC.epoch_s("c_ts") - SC.epoch_s("v_ts")).alias("lag_s"),
    )
