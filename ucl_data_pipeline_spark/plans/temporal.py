"""Temporal / ordered-data operators: as-of join, range join, calendar
gap-filling, and quantile bucketing (ntile).

These are the operators a time-series or training-data pipeline needs
that plain equi-join SQL doesn't give you directly. Each is expressed
as a composition of built-in DataFrame ops (SURVEY.md §2.5 notes the
reference has no window functions at all — its "latest vs previous
season" list-indexing, `fetch_fbr_team_xg.py:32-34`, is the closest
analog), so Catalyst plans and codegens everything.

Scale notes per operator are in the docstrings — the common theme:
express ordered semantics as window functions over a single
partitioned shuffle rather than self-joins, which at 100 TB turn into
quadratic range-intersections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import epoch_us
from ucl_data_pipeline_spark.plans.registry import register, sql_dsum
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# As-of join (point-in-time lookup)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT event_id, user_id, ts, last_error_value FROM (
  SELECT
    event_id, user_id, ts, event_type,
    LAST_VALUE(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS last_error_value
  FROM events
) WHERE event_type = 'click'
"""


@register("as_of_join", oracle=_ASOF_ORACLE, tags=("temporal", "window", "join"))
def as_of_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: each 'click' event picks up the most
    recent 'error' value for the same user at-or-before its timestamp.

    Implemented the scalable way: union-and-carry-forward — one shuffle
    on user_id, ordered window, ``last(..., ignorenulls)`` — instead of
    the naive inequality self-join (``e2.ts <= e1.ts``), which Spark
    would execute as a per-user range intersection growing
    quadratically with events-per-user. The window form is linear and
    streaming-friendly (same shape as applyInPandasWithState carry-over
    state).
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "last_error_value",
        F.last(
            F.when(F.col("event_type") == "error", F.col("value")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "last_error_value"
    )


# ---------------------------------------------------------------------------
# Range (band) join
# ---------------------------------------------------------------------------

_BANDS = [
    ("low", 0.0, 100000.0),
    ("mid", 100000.0, 300000.0),
    ("high", 300000.0, 1000000000.0),
]

_RANGE_ORACLE = f"""
SELECT b.band, COUNT(*) AS n_orders, {sql_dsum('o.o_totalprice')} AS sum_price
FROM orders o
JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)})
  AS b(band, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
"""


@register("range_join_bands", oracle=_RANGE_ORACLE, tags=("temporal", "join", "agg"))
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/band) join: orders matched to a price-band
    dimension on lo <= price < hi, then aggregated per band.

    The band table is tiny and broadcast, so the non-equi predicate
    runs as BroadcastNestedLoopJoin — the *correct* physical plan here:
    each fact row tests 3 bands with zero shuffle. The anti-pattern at
    scale is a non-equi join between two LARGE sides (a real cartesian);
    when both sides are big, bucketize the range into equi-join keys
    first (as the LSH operators in llm_ops do).
    """
    from ucl_data_pipeline_spark.plans.registry import dsum

    o = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar gap-filling (dense time grid)
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
),
days AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT d.day, t.event_type, COALESCE(daily.n, 0) AS n_events
FROM days d
CROSS JOIN types t
LEFT JOIN daily ON daily.day = d.day AND daily.event_type = t.event_type
"""


@register("gap_fill_daily", oracle=_GAPFILL_ORACLE, tags=("temporal", "agg"))
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily counts per event type — missing (day, type) cells
    filled with 0 by joining aggregates against a generated calendar
    (``F.sequence`` + ``explode``).

    Scale shape: the expensive side (raw events) is reduced to
    per-(day, type) counts FIRST (map-side combinable agg), and only
    then joined to the tiny generated grid — never the other way
    around. The grid side is O(days × types), broadcastable for any
    realistic horizon.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    days = (
        ev.agg(
            F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(types)
    return grid.join(F.broadcast(daily), ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Quantile bucketing (ntile)
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  o_totalprice,
  CAST(ntile(4) OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
  ) AS INTEGER) AS quartile
FROM orders
"""


@register("ntile_quartiles", oracle=_NTILE_ORACLE, tags=("temporal", "window"))
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile bucketing via ``ntile(4)`` — the windowed
    equal-frequency binning used for stratifying training data. Fully
    deterministic: ties broken by the unique key in the ORDER BY.

    Scale: one shuffle on the partition key; within-partition sort.
    For GLOBAL quantiles over 100 TB use approx_percentile cutpoints +
    a broadcast range join instead of a single-partition window.
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
    )


_FFILL_ORACLE = """
WITH masked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 5 <> 0 THEN value END AS reading
  FROM events
)
SELECT event_id, user_id, ts, reading,
  LAST_VALUE(reading IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS reading_ffill
FROM masked
"""


@register("forward_fill", oracle=_FFILL_ORACLE, tags=("temporal", "window"))
def forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward) of a sparse
    sensor column — the standard time-series repair before feature
    extraction. The corpus has no natural nulls, so every 5th reading
    is deterministically masked first. Same linear carry-forward
    window shape as the as-of join: one shuffle on the entity key,
    never a self-join.
    """
    ev = read_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("reading"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.withColumn(
        "reading_ffill", F.last("reading", ignorenulls=True).over(w)
    )


_SEQ_ORACLE = """
SELECT
  user_id,
  COUNT(*) AS n_events,
  array_to_string(list(event_type ORDER BY ts, event_id), ',') AS event_seq,
  array_to_string(
    list_transform(list(event_id ORDER BY ts, event_id)[1:5],
                   x -> CAST(x AS VARCHAR)), ',') AS first5_ids
FROM events
GROUP BY user_id
"""


@register("user_event_sequences", oracle=_SEQ_ORACLE, tags=("temporal", "agg", "llm"))
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity ordered event sequences (the behavioral-sequence
    construction step of a training pipeline): collect structs, sort
    once by (ts, id), project the ordered fields out joined to
    delimited strings (atomic output columns only) — explicit
    ordering because distributed collect order is partition-dependent.
    Scale: one shuffle on the entity key; sequences bounded by per-user
    fan-in (cap with a window top-N first when heavy-hitter users
    exist).
    """
    ev = read_table(spark, sf_dir, "events")
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.concat_ws(",", F.transform(seq, lambda s: s["event_type"])).alias("event_seq"),
        F.concat_ws(
            ",",
            F.slice(F.transform(seq, lambda s: s["event_id"].cast("string")), 1, 5),
        ).alias("first5_ids"),
    )


_LERP_ORACLE = """
WITH masked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 5 <> 0 THEN value END AS reading
  FROM events
), nb AS (
  SELECT event_id, user_id, ts, reading,
    LAST_VALUE(reading IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    LAST_VALUE(CASE WHEN reading IS NOT NULL THEN epoch_us(ts) END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    FIRST_VALUE(reading IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    FIRST_VALUE(CASE WHEN reading IS NOT NULL THEN epoch_us(ts) END
                IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM masked
)
SELECT event_id, user_id, ts, reading,
  ROUND(CASE
    WHEN reading IS NOT NULL THEN reading
    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t <> prev_t
      THEN prev_v + (next_v - prev_v)
           * (CAST(epoch_us(ts) - prev_t AS DOUBLE)
              / CAST(next_t - prev_t AS DOUBLE))
    ELSE COALESCE(prev_v, next_v)
  END, 6) AS reading_lerp
FROM nb
"""


@register("linear_interpolate", oracle=_LERP_ORACLE, tags=("temporal", "window"))
def linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of a sparse sensor column:
    missing readings take prev + (next-prev)·Δt/Δtotal between their
    bracketing known values (boundary gaps degrade to nearest-known —
    pandas ``interpolate(method='time')``, the hypertable
    gap-repair primitive). Every 5th reading is deterministically
    masked since the corpus has no natural nulls.

    Shape: four IGNORE-NULLS window functions over ONE (user, time)
    sort — a single shuffle, no self-join; timestamps lerp in exact
    integer microseconds and the one division is rounded to 6 dp
    (registry convention).
    """
    ev = read_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("reading"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_us = epoch_us("ts")
    known_t = F.when(F.col("reading").isNotNull(), t_us)
    nb = masked.select(
        "event_id",
        "user_id",
        "ts",
        "reading",
        F.last("reading", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(known_t, ignorenulls=True).over(wb).alias("prev_t"),
        F.first("reading", ignorenulls=True).over(wf).alias("next_v"),
        F.first(known_t, ignorenulls=True).over(wf).alias("next_t"),
    )
    lerp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        (t_us - F.col("prev_t")).cast("double")
        / (F.col("next_t") - F.col("prev_t")).cast("double")
    )
    out = (
        F.when(F.col("reading").isNotNull(), F.col("reading"))
        .when(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("next_t") != F.col("prev_t")),
            lerp,
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    return nb.select(
        "event_id",
        "user_id",
        "ts",
        "reading",
        F.round(out, 6).alias("reading_lerp"),
    )


# ---------------------------------------------------------------------------
# Nearest as-of join (bidirectional)
# ---------------------------------------------------------------------------

_ASOF_NEAREST_ORACLE = """
WITH carried AS (
  SELECT event_id, user_id, ts, event_type,
    last_value(CASE WHEN event_type = 'error' AND value IS NOT NULL
                    THEN value END IGNORE NULLS) OVER wb AS back_v,
    last_value(CASE WHEN event_type = 'error' AND value IS NOT NULL
                    THEN ts END IGNORE NULLS) OVER wb AS back_ts,
    last_value(CASE WHEN event_type = 'error' AND value IS NOT NULL
                    THEN value END IGNORE NULLS) OVER wf AS fwd_v,
    last_value(CASE WHEN event_type = 'error' AND value IS NOT NULL
                    THEN ts END IGNORE NULLS) OVER wf AS fwd_ts
  FROM events
  WINDOW
    wb AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING),
    wf AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, ts,
  CASE WHEN back_ts IS NULL THEN fwd_v
       WHEN fwd_ts IS NULL THEN back_v
       WHEN epoch_us(ts) - epoch_us(back_ts)
              <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_v
       ELSE fwd_v END AS nearest_error_value,
  CASE WHEN back_ts IS NULL THEN epoch_us(fwd_ts) - epoch_us(ts)
       WHEN fwd_ts IS NULL THEN epoch_us(ts) - epoch_us(back_ts)
       ELSE LEAST(epoch_us(ts) - epoch_us(back_ts),
                  epoch_us(fwd_ts) - epoch_us(ts)) END AS dist_us
FROM carried
WHERE event_type = 'click'
"""


@register("as_of_join_nearest", oracle=_ASOF_NEAREST_ORACLE, tags=("temporal", "window", "join"))
def as_of_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of join: each 'click' picks the NEAREST 'error'
    value in time — before or after — with ties going to the earlier
    one. Same union-and-carry shape as as_of_join, run in both
    directions (backward last + forward last over the reversed order),
    then a pure-arithmetic nearest pick; still one shuffle on user_id,
    still linear — the naive formulation is an inequality self-join
    both ways. Distances are integral microseconds (no float
    conventions); errors carrying NULL values are ignored so the
    (ts, value) pair always comes from one row.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    err_v = F.when(
        (F.col("event_type") == "error") & F.col("value").isNotNull(),
        F.col("value"),
    )
    err_ts = F.when(
        (F.col("event_type") == "error") & F.col("value").isNotNull(),
        F.col("ts"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(err_v, ignorenulls=True).over(wb).alias("back_v"),
        F.last(err_ts, ignorenulls=True).over(wb).alias("back_ts"),
        F.last(err_v, ignorenulls=True).over(wf).alias("fwd_v"),
        F.last(err_ts, ignorenulls=True).over(wf).alias("fwd_ts"),
    )
    d_back = epoch_us("ts") - epoch_us("back_ts")
    d_fwd = epoch_us("fwd_ts") - epoch_us("ts")
    return carried.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("back_ts").isNull(), F.col("fwd_v"))
        .when(F.col("fwd_ts").isNull(), F.col("back_v"))
        .when(d_back <= d_fwd, F.col("back_v"))
        .otherwise(F.col("fwd_v"))
        .alias("nearest_error_value"),
        F.when(F.col("back_ts").isNull(), d_fwd)
        .when(F.col("fwd_ts").isNull(), d_back)
        .otherwise(F.least(d_back, d_fwd))
        .alias("dist_us"),
    )


# ---------------------------------------------------------------------------
# Bounded-window EWMA
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.25
_EWMA_SPAN = 16

_EWMA_ORACLE = f"""
SELECT event_id, user_id, ts,
  list_reduce(
    list(ROUND(value * 100, 0))
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW),
    (acc, x) -> (x + 3.0 * acc) / 4.0) / 100.0 AS ewma
FROM events
"""


@register("ewma_bounded", oracle=_EWMA_ORACLE, tags=("temporal", "window"))
def ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over a BOUNDED trailing
    window (last {SPAN} events per user, alpha=1/4): collect the frame
    into an array, left-fold the recursive update ``s = (x + 3s)/4``
    seeded with the oldest frame value. The bounded frame is what makes
    EWMA expressible as pure window algebra (unbounded EWMA is
    inherently sequential state — applyInPandasWithState territory)
    and keeps per-row cost constant.

    Determinism is by EXACT arithmetic, not rounding: inputs are
    integer-scaled (×100, 2-dp domain) so with a power-of-two alpha
    every fold intermediate is a dyadic rational within 53 mantissa
    bits (≤14 bits of value + 2 bits per step) — bit-identical on any
    engine. A ROUND(·, 6) of the double fold was NOT enough: EWMA of
    2-dp inputs lands on exact 5-at-the-7th-digit halves, where Spark
    and DuckDB round opposite ways.
    """
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    frame = F.collect_list(F.round(F.col("value") * 100, 0)).over(w)
    ewma = F.aggregate(
        F.slice(frame, 2, _EWMA_SPAN),
        F.element_at(frame, 1),
        lambda acc, x: (x + F.lit(3.0) * acc) / F.lit(4.0),
    )
    return ev.select(
        "event_id", "user_id", "ts", (ewma / F.lit(100.0)).alias("ewma")
    )
