"""Round-3 analytics surface extensions: gaps-and-islands
sessionization, fixed-width histograms, the explicit window-frame
function surface, and an order-independent table checksum.

All pure Catalyst expressions with exact DuckDB oracles under the
registry's determinism conventions. Each operator is a shape the
reference's users run in a warehouse even though the reference itself
has no equivalent (SURVEY.md §2 analytics gap-fills, same status as
plans.extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import epoch_us
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Gaps-and-islands sessionization (window algebra, not session_window)
# ---------------------------------------------------------------------------

_GAP_US = 1_800 * 1_000_000  # 30-minute inactivity gap, microseconds

_SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id, ts,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS INTEGER) AS session_idx,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM numbered
GROUP BY user_id, session_idx
"""


@register("sessionize_gaps_islands", oracle=_SESSIONIZE_ORACLE, tags=("temporal", "window", "agg"))
def sessionize_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization as pure window algebra (the gaps-and-islands
    idiom): flag rows whose gap from the previous event exceeds 30 min,
    running-sum the flags into a session index, aggregate per (user,
    session). The same semantics as the session_window operator, built
    from lag + cumulative sum instead — the form that composes with
    arbitrary extra window columns. Gap arithmetic is integral
    microseconds (epoch_us both sides), so no float conventions needed.

    Scale: one shuffle on user_id shared by both windows and the final
    aggregation (same partitioning — Catalyst reuses the exchange).
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_us("ts") - epoch_us(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0).alias("new_sess"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = flagged.select(
        "user_id", "ts", F.sum("new_sess").over(cum).alias("session_idx")
    )
    return (
        numbered.groupBy("user_id", F.col("session_idx").cast("int").alias("session_idx"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).alias(
                "duration_us"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram
# ---------------------------------------------------------------------------

_HIST_BINS = 20
_HIST_WIDTH = 25_000.0  # o_totalprice bins: [0, 500k) in 25k steps

_HIST_ORACLE = f"""
SELECT
  CAST(LEAST({_HIST_BINS - 1},
             GREATEST(0, FLOOR(o_totalprice / {_HIST_WIDTH}))) AS INTEGER)
    AS bin,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY 1
"""


@register("histogram_fixed_bins", oracle=_HIST_ORACLE, tags=("agg",))
def histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 bins of 25k, edges
    clamped): the equi-WIDTH companion to global_quantile_buckets'
    equi-DEPTH buckets. Binning is a scan-side projection (floor of a
    division — identical IEEE op both engines); one hash-agg with
    map-side partial aggregation, output bounded by bin count — the
    histogram shape that costs one scan regardless of data volume.
    """
    o = read_table(spark, sf_dir, "orders")
    bin_ = F.least(
        F.lit(_HIST_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / _HIST_WIDTH)),
    ).cast("int")
    return (
        o.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Explicit window-frame function surface
# ---------------------------------------------------------------------------

_FRAME_ORACLE = """
SELECT
  event_id,
  user_id,
  first_value(value) OVER w5 AS first_in_frame,
  last_value(value) OVER w5 AS last_in_frame,
  nth_value(value, 2) OVER w5 AS second_in_frame,
  CAST(COUNT(value) OVER w5 AS BIGINT) AS n_in_frame,
  first_value(value) OVER wrun AS first_so_far
FROM events
WINDOW
  w5 AS (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),
  wrun AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING)
"""


@register("window_frame_surface", oracle=_FRAME_ORACLE, tags=("window",))
def window_frame_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value / count over an explicit
    centered ROWS frame plus a running frame — the frame-boundary
    corner of the window surface (rank/lag/lead/ntile and frame
    aggregates are covered by the §2.5 queries; this pins the
    value-positional functions, whose defaults differ subtly across
    engines: both sides state frames explicitly so semantics are
    unambiguous). Deterministic: total order (ts, event_id) within
    every frame.
    """
    ev = read_table(spark, sf_dir, "events")
    w5 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w5).alias("first_in_frame"),
        F.last("value").over(w5).alias("last_in_frame"),
        F.nth_value("value", 2).over(w5).alias("second_in_frame"),
        F.count("value").over(w5).alias("n_in_frame"),
        F.first("value").over(wrun).alias("first_so_far"),
    )


# ---------------------------------------------------------------------------
# Order-independent table checksum
# ---------------------------------------------------------------------------

_CK_COLS_SQL = (
    "concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_returnflag, "
    "l_linestatus, CAST(CAST(l_shipdate AS DATE) AS VARCHAR))"
)

_CHECKSUM_ORACLE = f"""
WITH h AS (
  SELECT md5({_CK_COLS_SQL}) AS hx FROM lineitem
), v AS (
  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1 AS BIGINT))),
    (a, b) -> a * 16 + b) AS rowv
  FROM h
)
SELECT COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(rowv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
         AS checksum
FROM v
"""


@register("checksum_table", oracle=_CHECKSUM_ORACLE, tags=("agg", "validate"))
def checksum_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint: md5 of a canonical per-row
    string (int/string/date columns only — float formatting is not
    canonical across engines), folded to a 60-bit integer (15 hex
    nibbles, left fold acc·16+nibble — the overflow-free width), summed
    exactly in DECIMAL(38,0). Two tables match iff (n_rows, checksum)
    match, regardless of row order or partitioning — the cheap
    cross-system integrity check a 100 TB migration runs after every
    copy: one scan, map-side partial sums, a single-row result, no
    shuffle of data.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    # fan_out: the driver parquet is one row group, and the md5 fold is
    # the rare CPU-bound projection where a single partition is the
    # bottleneck (A/B at sf0.1: 24.3 s single-partition, 4.7 s fanned;
    # conv() below instead of a 15-step nibble fold: 1.2 s).
    l = fan_out(read_table(spark, sf_dir, "lineitem"))
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.col("l_shipdate").cast("date").cast("string"),
    )
    hx = F.md5(canon)
    # conv(hex, 16, 10) is the JVM fast path for the same 60-bit value
    # the oracle derives with its nibble fold (DuckDB has no conv).
    rowv = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    # String-typed on BOTH sides: a 23-digit DECIMAL(38,0) exceeds
    # float64's 15-16 significant digits, so any pandas/float transport
    # of the numeric form silently loses precision. The exact decimal
    # rendered as a string survives every canonicalizer.
    return l.select(rowv.alias("rowv")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("rowv").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Exact per-group mode
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
SELECT p_brand, p_type AS mode_type, n
FROM (
  SELECT p_brand, p_type, COUNT(*) AS n,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY COUNT(*) DESC, p_type) AS rn
  FROM part
  GROUP BY p_brand, p_type
)
WHERE rn = 1
"""


@register("mode_per_group", oracle=_MODE_ORACLE, tags=("agg", "window"))
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent p_type per brand,
    lowest-value tie-break): count agg + one row_number window over the
    counts. Deterministic by construction (explicit tie-break — an
    engine-native ``mode()`` would be free to pick either). Scale: the
    window runs over the AGGREGATED (brand, type) table, never the base
    rows, so its input is bounded by group-domain cardinality.
    """
    p = read_table(spark, sf_dir, "part")
    counts = p.groupBy("p_brand", "p_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.col("n").desc(), "p_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), "n")
    )


# ---------------------------------------------------------------------------
# 2-D Pareto frontier (skyline) per brand
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


@register("pareto_frontier_parts", oracle=_PARETO_ORACLE, tags=("window", "join"))
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand 2-D Pareto frontier (cheaper price, larger size): the
    parts no same-brand part dominates. The ORACLE states the semantics
    as the quadratic NOT EXISTS; the engine computes it as the
    O(n log n) sorted sweep — per (brand, price) level take the max
    size, running-max those levels by ascending price, and a part is
    dominated iff a STRICTLY cheaper level reaches its size (prefix
    running max shifted by one level) or a same-price part is strictly
    larger. Scale: two hash-aggs + two windows partitioned by brand —
    no self-join, no quadratic pair blowup; compare the oracle's
    EXISTS, which is the textbook formulation and the scale trap.
    """
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    # Max size at each exact price level, per brand.
    levels = p.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("level_max")
    )
    lvl_w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    run = levels.select(
        "p_brand",
        "p_retailprice",
        "level_max",
        # running max over levels up to and including this price, then
        # shifted one level back -> max size among STRICTLY cheaper rows
        F.lag(
            F.max("level_max").over(
                lvl_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        )
        .over(lvl_w)
        .alias("cheaper_max"),
    )
    return (
        p.join(run, ["p_brand", "p_retailprice"])
        .filter(
            (F.col("cheaper_max").isNull() | (F.col("cheaper_max") < F.col("p_size")))
            & (F.col("level_max") <= F.col("p_size"))
        )
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# Character-level near-dup pairs (edit distance within blocks)
# ---------------------------------------------------------------------------

_FUZZY_PREFIX = 16
_FUZZY_HEAD = 120
_FUZZY_MAXDIST = 8

_FUZZY_ORACLE = f"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
), rep AS (  -- collapse byte-identical texts first (round-1 lesson:
             -- near-dup candidate cost must track DISTINCT content)
  SELECT MIN(doc_id) AS doc_id, norm FROM n GROUP BY norm
), b AS (
  SELECT doc_id, norm,
         substr(norm, 1, {_FUZZY_PREFIX}) AS blk_prefix,
         len(norm) // 20 AS blk_len
  FROM rep
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(levenshtein(substr(a.norm, 1, {_FUZZY_HEAD}),
                        substr(c.norm, 1, {_FUZZY_HEAD})) AS INTEGER) AS edit_dist
FROM b a
JOIN b c ON a.blk_prefix = c.blk_prefix AND a.blk_len = c.blk_len
        AND a.doc_id < c.doc_id
WHERE levenshtein(substr(a.norm, 1, {_FUZZY_HEAD}),
                  substr(c.norm, 1, {_FUZZY_HEAD})) <= {_FUZZY_MAXDIST}
"""


@register("dedup_fuzzy_edit_distance", oracle=_FUZZY_ORACLE, tags=("text", "llm", "join"))
def dedup_fuzzy_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup mining: byte-identical texts collapse
    to one representative FIRST (exact dedup's job — candidate cost
    must track distinct content, the round-1 near-dup lesson), then
    candidate pairs are blocked on (16-char normalized prefix,
    length/20 bucket) — an equi-join, never all-pairs — and Levenshtein
    distance on the 120-char head filters to pairs within 8 edits. The
    character-level complement to the token-level families
    (MinHash/SimHash/Jaccard): catches small typo edits that leave
    whole tokens intact. Scale: rep-collapse bounds replicated-text
    blowup (measured 2.84x at 10x before, 1.0x after); block keys bound
    the candidate set like LSH bands; the distance (quadratic in string
    length) runs on fixed-length heads only.
    """
    d = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    rep = (
        d.select("doc_id", norm.alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    b = rep.select(
        "doc_id",
        F.substring(F.col("norm"), 1, _FUZZY_HEAD).alias("head"),
        F.substring(F.col("norm"), 1, _FUZZY_PREFIX).alias("blk_prefix"),
        F.floor(F.length(F.col("norm")) / 20).alias("blk_len"),
    )
    a = b.select(
        F.col("doc_id").alias("doc_a"),
        F.col("head").alias("head_a"),
        "blk_prefix",
        "blk_len",
    )
    c = b.select(
        F.col("doc_id").alias("doc_b"),
        F.col("head").alias("head_b"),
        F.col("blk_prefix").alias("bp2"),
        F.col("blk_len").alias("bl2"),
    )
    dist = F.levenshtein("head_a", "head_b")
    return (
        a.join(
            c,
            (F.col("blk_prefix") == F.col("bp2"))
            & (F.col("blk_len") == F.col("bl2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .filter(dist <= _FUZZY_MAXDIST)
        .select("doc_a", "doc_b", dist.cast("int").alias("edit_dist"))
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (partial-state merge)
# ---------------------------------------------------------------------------

_INC_SPLIT = "2024-01-21 00:00:00"

_INC_ORACLE = f"""
WITH state AS (  -- yesterday's materialized partial aggregate
  SELECT user_id, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events WHERE ts < TIMESTAMP '{_INC_SPLIT}'
  GROUP BY user_id
), delta AS (    -- today's increment, aggregated alone
  SELECT user_id, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events WHERE ts >= TIMESTAMP '{_INC_SPLIT}'
  GROUP BY user_id
)
SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(s) AS DOUBLE) AS sum_value
FROM (SELECT * FROM state UNION ALL SELECT * FROM delta)
GROUP BY user_id
"""


@register("incremental_agg_merge", oracle=_INC_ORACLE, tags=("agg",))
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's materialized
    partial state (count + exact-decimal sum per user) merged with
    today's delta by RE-AGGREGATING THE PARTIALS — counts add, decimal
    sums add — never by rescanning history. This is the algebraic
    property (commutative-monoid aggregation state) that makes daily
    100 TB rollups O(delta) instead of O(history); the decimal-exact
    convention doubles as the merge-correctness guarantee, since
    partial sums are order- and grouping-independent. Avg/stddev merge
    the same way from (n, sum, sum-of-squares) partials.
    """
    ev = read_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )

    state = partial(ev.filter(F.col("ts") < F.lit(_INC_SPLIT).cast("timestamp")))
    delta = partial(ev.filter(F.col("ts") >= F.lit(_INC_SPLIT).cast("timestamp")))
    return (
        state.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING / GROUPING_ID surface over CUBE
# ---------------------------------------------------------------------------

_GROUPING_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
  CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
  COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("grouping_id_surface", oracle=_GROUPING_ORACLE, tags=("agg",))
def grouping_id_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / GROUPING_ID() over a CUBE: the flags that let a
    consumer of a multi-level aggregate distinguish "NULL because
    subtotal row" from "NULL because the data is NULL" — without them
    cube/rollup outputs are ambiguous. One Expand + one hash-agg,
    same physical shape as the plain cube query.
    """
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "gid", "n"
    )


# ---------------------------------------------------------------------------
# Discrete percentiles (order statistics without interpolation)
# ---------------------------------------------------------------------------

_PDISC_ORACLE = """
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.5) AS p50_price,
       quantile_disc(o_totalprice, 0.9) AS p90_price
FROM orders
GROUP BY o_orderpriority
"""


@register("percentile_disc_surface", oracle=_PDISC_ORACLE, tags=("agg",))
def percentile_disc_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_disc: the DISCRETE order statistic — an actual data
    value, never an interpolated midpoint (percentile_prices covers the
    continuous form). The distinction matters whenever the percentile
    must be join-able back to a real row (a real order, a real
    latency). Exact disc percentiles sort within each group; at 100 TB
    the approx_percentile sketch replaces this, same as the cont form.
    """
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50_price"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p90_price"),
    )


# ---------------------------------------------------------------------------
# Higher-order map-function surface
# ---------------------------------------------------------------------------

_MAP_HO_ORACLE = """
SELECT
  event_id,
  COALESCE(array_to_string(list_sort(list_transform(json_keys(props),
    k -> upper(k) || '=' || CAST(json_extract(props, '$.' || k) AS BIGINT))),
    ','), '') AS upper_entries,
  -- COALESCE: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
  COALESCE(array_to_string(list_sort(list_transform(
    list_filter(json_keys(props),
      k -> CAST(json_extract(props, '$.' || k) AS BIGINT) % 2 = 0),
    k -> k || '=' || CAST(json_extract(props, '$.' || k) AS BIGINT))),
    ','), '') AS even_entries
FROM events
"""


@register("map_ho_functions", oracle=_MAP_HO_ORACLE, tags=("events", "map"))
def map_ho_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order MAP function surface (transform_keys /
    map_filter / map_entries), complementing map_functions' element
    access: keys uppercased, entries filtered by a value predicate.
    Map results are serialized to sorted ``k=v`` strings (atomic
    output columns rule; ASCII keys sort identically on both engines).
    All scan-side Catalyst expressions — the typed map path beats
    re-parsing JSON per derived column.
    """
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")

    def ser(mp) -> F.Column:
        return F.concat_ws(
            ",",
            F.array_sort(
                F.transform(
                    F.map_entries(mp),
                    lambda e: F.concat(
                        e["key"], F.lit("="), e["value"].cast("string")
                    ),
                )
            ),
        )

    upper_m = F.transform_keys(m, lambda k, v: F.upper(k))
    even_m = F.map_filter(m, lambda k, v: v % 2 == 0)
    return ev.select(
        "event_id",
        ser(upper_m).alias("upper_entries"),
        ser(even_m).alias("even_entries"),
    )
