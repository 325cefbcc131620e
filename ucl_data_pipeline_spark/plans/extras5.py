"""Round-5 inventory depth: time-series diagnostics, inequality /
audit statistics, deterministic weighted sampling, and graph node
similarity — operator shapes a production analytics engine is asked
for daily (growth accounting, drift monitoring, A/B reads, data-quality
audits) that the round-4 inventory still lacked.

Registry conventions apply throughout (see plans/registry.py): exact
decimal sums for cross-engine value equality, ROUND(x, 6) on
transcendental outputs, atomic output columns, BIGINT/DOUBLE/VARCHAR
oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import (
    dsum,
    register,
    sql_dsum,
)
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Cumulative distinct users (growth accounting)
# ---------------------------------------------------------------------------

_CUM_USERS_ORACLE = """
WITH firstseen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
newby AS (
  SELECT day, COUNT(*) AS new_users FROM firstseen GROUP BY day
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT d.day,
       CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT)
         AS cum_users
FROM days d LEFT JOIN newby n ON n.day = d.day
"""


@register("cumulative_distinct_users", oracle=_CUM_USERS_ORACLE, tags=("temporal", "agg"))
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily running count of distinct users ever seen — the growth
    curve every product dashboard starts with. COUNT(DISTINCT) over an
    expanding window is quadratic; the linear-state form used here is
    the standard rewrite: distinct-user first-seen dates (one user-keyed
    hash-agg), new-users-per-day (tiny agg), then a running sum over the
    calendar.

    Scale: the only fact-sized shuffle is the per-user MIN hash-agg
    (map-side combinable). The running-sum window runs over one row per
    DAY — bounded by the calendar, so the single-partition window is
    safe at any data size (this is the same bounded-window argument as
    gap_fill_daily).
    """
    ev = read_table(spark, sf_dir, "events")
    firstseen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    newby = firstseen.groupBy("day").agg(F.count("*").alias("new_users"))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    joined = days.join(F.broadcast(newby), "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    return joined.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue per nation (inequality audit)
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, r,
         ROW_NUMBER() OVER (PARTITION BY nationkey ORDER BY r, o_custkey)
           AS i
  FROM rev
)
SELECT nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(r) AS DOUBLE) AS total_revenue,
       ROUND(
         (2.0 * CAST(SUM(i * r) AS DOUBLE)
            - (COUNT(*) + 1) * CAST(SUM(r) AS DOUBLE))
         / (COUNT(*) * CAST(SUM(r) AS DOUBLE)), 6) AS gini
FROM ranked
GROUP BY nationkey
"""


@register("gini_revenue_concentration", oracle=_GINI_ORACLE, tags=("agg", "window"))
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue within each nation —
    the canonical concentration/inequality audit (is 80% of revenue
    coming from 2% of customers?), identical math to what a training-
    data pipeline runs on per-domain token counts to detect source
    imbalance. Uses the rank formula
    G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) with x ascending.

    Determinism: revenues are exact DECIMAL sums; the rank tie-break is
    (revenue, custkey); i·x_i stays in decimal until the final cast, so
    both engines divide bit-identical doubles (ROUND 6 on the ratio).

    Scale: one fact-sized hash-agg (orders→per-customer revenue), one
    within-nation sort for ROW_NUMBER (Spark shuffles by nationkey —
    the partition is per-nation customer counts, not fact rows), one
    tiny final agg. No driver collects, no cross joins.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    w = Window.partitionBy("nationkey").orderBy("r", "o_custkey")
    ranked = rev.select("nationkey", "r", F.row_number().over(w).alias("i"))
    n = F.count("*")
    s0 = F.sum("r").cast("double")
    s1 = F.sum(F.col("i") * F.col("r")).cast("double")
    return ranked.groupBy("nationkey").agg(
        n.cast("long").alias("n_customers"),
        s0.alias("total_revenue"),
        F.round((F.lit(2.0) * s1 - (n + 1) * s0) / (n * s0), 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Welch two-sample t-test (A/B read) — promo vs non-promo parts
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH flagged AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS grp,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS x
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
stats AS (
  SELECT
    COUNT(*) FILTER (WHERE grp = 1) AS n1,
    COUNT(*) FILTER (WHERE grp = 0) AS n0,
    CAST(SUM(x) FILTER (WHERE grp = 1) AS DOUBLE) AS s1,
    CAST(SUM(x) FILTER (WHERE grp = 0) AS DOUBLE) AS s0,
    CAST(SUM(x * x) FILTER (WHERE grp = 1) AS DOUBLE) AS q1,
    CAST(SUM(x * x) FILTER (WHERE grp = 0) AS DOUBLE) AS q0
  FROM flagged
)
SELECT
  CAST(n1 AS BIGINT) AS n_promo,
  CAST(n0 AS BIGINT) AS n_other,
  ROUND(s1 / n1, 6) AS mean_promo,
  ROUND(s0 / n0, 6) AS mean_other,
  ROUND(
    (s1 / n1 - s0 / n0)
    / SQRT(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
         + ((q0 - s0 * s0 / n0) / (n0 - 1)) / n0), 6) AS t_stat,
  ROUND(
    POWER(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
        + ((q0 - s0 * s0 / n0) / (n0 - 1)) / n0, 2)
    / (POWER(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1, 2) / (n1 - 1)
     + POWER(((q0 - s0 * s0 / n0) / (n0 - 1)) / n0, 2) / (n0 - 1)), 6)
    AS welch_df
FROM stats
"""


@register("welch_ttest_promo", oracle=_WELCH_ORACLE, tags=("agg", "stats"))
def welch_ttest_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: line-item price of
    PROMO-type parts vs everything else — the A/B-experiment read
    computed the distributed way, from one conditional-aggregation pass
    over the fact table (n, Σx, Σx² per arm), exactly how a metrics
    platform computes experiment stats at scale.

    Determinism: Σx and Σx² accumulate in DECIMAL (exact, order-free);
    the t statistic and Welch–Satterthwaite df are then pure double
    arithmetic on bit-identical inputs, ROUND 6.

    Scale: part is the dim side of the join (broadcast); the stats pass
    is a single map-side-combinable hash-agg with six buffers and NO
    group key — partial aggregation reduces each partition to one row
    before the 1-row exchange. This is the sufficient-statistics
    pattern: no second pass, no variance-via-subtraction per row.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    flagged = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("grp"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("x"),
    )
    g1 = F.col("grp") == 1
    g0 = F.col("grp") == 0
    stats = flagged.agg(
        F.count(F.when(g1, 1)).alias("n1"),
        F.count(F.when(g0, 1)).alias("n0"),
        F.sum(F.when(g1, F.col("x"))).cast("double").alias("s1"),
        F.sum(F.when(g0, F.col("x"))).cast("double").alias("s0"),
        F.sum(F.when(g1, F.col("x") * F.col("x"))).cast("double").alias("q1"),
        F.sum(F.when(g0, F.col("x") * F.col("x"))).cast("double").alias("q0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    s1, s0 = F.col("s1"), F.col("s0")
    q1, q0 = F.col("q1"), F.col("q0")
    v1 = ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1  # s1²/n1 (variance of mean)
    v0 = ((q0 - s0 * s0 / n0) / (n0 - 1)) / n0
    return stats.select(
        n1.cast("long").alias("n_promo"),
        n0.cast("long").alias("n_other"),
        F.round(s1 / n1, 6).alias("mean_promo"),
        F.round(s0 / n0, 6).alias("mean_other"),
        F.round((s1 / n1 - s0 / n0) / F.sqrt(v1 + v0), 6).alias("t_stat"),
        F.round(
            F.pow(v1 + v0, 2)
            / (F.pow(v1, 2) / (n1 - 1) + F.pow(v0, 2) / (n0 - 1)),
            6,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (A-ES / exponential-race, md5-seeded)
# ---------------------------------------------------------------------------

_ARES_K = 50

# u ∈ (0,1) from the first 6 md5 nibbles of the key — both engines
# compute the identical 24-bit integer, so u (and every score derived
# from it) is bit-identical cross-engine.
_SQL_U24 = """
  ((STRPOS('0123456789abcdef', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 1048576.0
 + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1) * 65536.0
 + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 3, 1)) - 1) * 4096.0
 + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 4, 1)) - 1) * 256.0
 + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 5, 1)) - 1) * 16.0
 + (STRPOS('0123456789abcdef', SUBSTR(md5(CAST(o_orderkey AS VARCHAR)), 6, 1)) - 1)
 + 0.5) / 16777216.0
"""

_ARES_ORACLE = f"""
WITH scored AS (
  SELECT o_orderkey, o_totalprice,
         {_SQL_U24} AS u,
         -LN({_SQL_U24}) / o_totalprice AS score
  FROM orders
)
SELECT o_orderkey, o_totalprice, ROUND(u, 9) AS u_hash,
       CAST(ROW_NUMBER() OVER (ORDER BY score, o_orderkey) AS BIGINT)
         AS sample_rank
FROM scored
ORDER BY score, o_orderkey
LIMIT {_ARES_K}
"""


@register("weighted_sample_ares", oracle=_ARES_ORACLE, tags=("sample",))
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES / exponential race): each row gets an exponential arrival time
    −ln(u)/w with u a pure hash of its key and w its weight
    (o_totalprice); the k smallest arrivals are the sample. Unlike
    rand()-based sampling this is reproducible row-for-row across
    re-runs, engines, and partitionings — the property a training-data
    pipeline needs for auditable weighted corpus subsampling.

    Determinism: u is built from the first 6 md5 nibbles (24-bit
    integer, exact in both engines), so scores are bit-identical; the
    top-k boundary is decided by continuous exponentials whose order
    statistics are ~1/n apart — astronomically far from the 1-ulp libm
    divergence of LN. Tie-break (score, orderkey).

    Scale: embarrassingly parallel scoring at the scan, then a TakeOrdered
    top-k (per-partition heaps → k-row merge at the driver stage), never
    a global sort. The md5 is computed once per row via a shared subexpr.
    """
    o = read_table(spark, sf_dir, "orders")
    hexes = F.lit("0123456789abcdef")
    md5c = F.md5(F.col("o_orderkey").cast("string"))
    v = None
    for i in range(6):
        nib = (F.instr(hexes, F.substring(md5c, i + 1, 1)) - 1).cast("double")
        piece = nib * float(16 ** (5 - i))
        v = piece if v is None else v + piece
    u = (v + 0.5) / float(1 << 24)
    scored = o.select(
        "o_orderkey",
        "o_totalprice",
        u.alias("u"),
        (-F.log(u) / F.col("o_totalprice")).alias("score"),
    )
    w = Window.orderBy("score", "o_orderkey")
    return (
        scored.orderBy("score", "o_orderkey")
        .limit(_ARES_K)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.round("u", 9).alias("u_hash"),
            F.row_number().over(w).alias("sample_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Graph node similarity: neighbor-set Jaccard on the trade network
# ---------------------------------------------------------------------------

_NBR_JACCARD_ORACLE = """
WITH und AS (
  SELECT DISTINCT
         LEAST(s.s_nationkey, c.c_nationkey) AS a,
         GREATEST(s.s_nationkey, c.c_nationkey) AS b
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
),
adj AS (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL
  SELECT b AS node, a AS nbr FROM und
),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
common AS (
  SELECT x.node AS u, y.node AS v, COUNT(*) AS c
  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
  GROUP BY 1, 2
)
SELECT cm.u, cm.v,
       CAST(cm.c AS BIGINT) AS n_common,
       ROUND(CAST(cm.c AS DOUBLE) / (du.d + dv.d - cm.c), 6) AS jaccard
FROM common cm
JOIN deg du ON du.node = cm.u
JOIN deg dv ON dv.node = cm.v
WHERE CAST(cm.c AS DOUBLE) / (du.d + dv.d - cm.c) >= 0.5
"""


@register("neighbor_jaccard_nodes", oracle=_NBR_JACCARD_ORACLE, tags=("graph", "join"))
def neighbor_jaccard_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural node similarity: Jaccard of neighbor sets for every
    node pair sharing ≥1 neighbor, thresholded at 0.5 — the standard
    link-prediction / role-equivalence primitive (and the node-level
    analogue of the document near-dup Jaccard in llm_ops). Same
    trade-network edge derivation as triangle_count_trade
    (extras3.py): distinct canonical (lo, hi) nation pairs.

    Scale: the fact-sized stage is the edge derivation (one pass,
    distinct-collapsed to ≤ |V|² rows). The pair enumeration joins the
    ADJACENCY list with itself on the shared-neighbor key — per-key
    blow-up is degree², the classic wedge bound; on power-law graphs
    the production guard is degree-capping / top-h hubs removal before
    the wedge join (same argument as the degree-ordered triangle
    plan). Jaccard needs no per-pair set intersection: |∩| falls out of
    the wedge count, |∪| = d(u)+d(v)−|∩| from the broadcastable degree
    table.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
    )
    adj = pairs.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        pairs.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    x = adj.alias("x")
    y = adj.alias("y")
    common = (
        x.join(y, (F.col("x.nbr") == F.col("y.nbr")) & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("u"), F.col("y.node").alias("v"))
        .agg(F.count("*").alias("c"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    jac = F.col("c").cast("double") / (F.col("du") + F.col("dv") - F.col("c"))
    return (
        common.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .filter(jac >= 0.5)
        .select(
            "u",
            "v",
            F.col("c").cast("long").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling exact median (order-statistic window frame)
# ---------------------------------------------------------------------------

_ROLL_MEDIAN_ORACLE = """
SELECT event_id, user_id,
       ROUND(MEDIAN(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS roll_median
FROM events
"""


@register("rolling_median_frame", oracle=_ROLL_MEDIAN_ORACLE, tags=("window", "stats"))
def rolling_median_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median of event value over the trailing 10 rows
    per user — the robust-smoothing counterpart of moving_avg_frame
    (outlier-resistant trend line; medians don't chase spikes the way
    means do). Spark evaluates the exact `percentile` aggregate over
    the sliding row frame; DuckDB's windowed MEDIAN is the oracle
    spelling. Even-count frames interpolate the two middle values on
    both engines; ROUND 6 absorbs the one-ulp interpolation-order
    difference.

    Scale: one shuffle on user_id then a per-user sort — the frame
    state is 10 values per row, O(frame) memory, streaming-evaluated.
    For frames of thousands of rows the production swap is an
    approx_percentile sketch (same plan shape, bounded state) — the
    exact form is the oracle-checkable witness.
    """
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile(F.col("value"), F.lit(0.5)).over(w), 6).alias(
            "roll_median"
        ),
    )


# ---------------------------------------------------------------------------
# OHLC bar resampling (hourly, per event type)
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         date_trunc('hour', ts) AS hour,
         value, ts, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM events
)
SELECT event_type, hour,
       CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE) AS open,
       CAST(MAX(value) AS DOUBLE) AS high,
       CAST(MIN(value) AS DOUBLE) AS low,
       CAST(MAX(CASE WHEN rn_z = 1 THEN value END) AS DOUBLE) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {vsum} AS sum_value
FROM ranked
GROUP BY event_type, hour
""".format(vsum=sql_dsum("value"))


@register("ohlc_resample_hourly", oracle=_OHLC_ORACLE, tags=("temporal", "window", "agg"))
def ohlc_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per event type and hour, the opening value
    (earliest row), high, low, closing value (latest row), count, and
    exact-decimal sum — the canonical time-series downsampling shape
    (market bars, sensor rollups, metric pre-aggregation).

    Determinism: open/close are picked by ROW_NUMBER over the total
    order (ts, event_id) — unique, so both engines select the same row
    even with duplicate timestamps.

    Scale: one shuffle keyed (event_type, hour) serves both the window
    (Spark co-partitions the window by the same keys) and the final
    hash-agg — Catalyst reuses the exchange. At 100 TB this is the
    pre-aggregation that makes everything downstream cheap: output
    cardinality is types × hours, independent of input row count.
    """
    ev = read_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    base = ev.select("event_type", hour.alias("hour"), "value", "ts", "event_id")
    wa = Window.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    wz = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "event_type",
        "hour",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"),
    )
    return ranked.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_z") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection over the daily revenue series
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mu FROM daily
)
SELECT day,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(rev) OVER (ORDER BY day) AS DOUBLE)
             - ROW_NUMBER() OVER (ORDER BY day)
               * ROUND((SELECT mu FROM tot), 6), 6)
         AS cusum
FROM daily
"""


def cusum_over_daily(daily: DataFrame) -> DataFrame:
    """Day-grain CUSUM math shared by the batch query and the
    streaming rollup (streaming/windows.py ``rollup_cusum``): input is
    (day, rev) with ``rev`` an exact DECIMAL daily sum; output is
    (day, revenue, cusum). ONE implementation so the stream≡batch
    parity test pins the streaming twin against exactly the arithmetic
    the driver oracle-checks — same discipline as the shared LSH
    candidate generator (llm_ops.lsh_candidate_pairs).
    """
    mu = daily.agg(
        (F.sum("rev").cast("double") / F.count("*")).alias("mu")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wr = Window.orderBy("day")
    return (
        daily.crossJoin(F.broadcast(mu))
        .select(
            "day",
            F.col("rev").cast("double").alias("revenue"),
            # i·μ uses the 6dp-ROUNDED mean: the raw division could put
            # exact_running_sum − i·μ exactly on a 6dp half-boundary
            # where the engines' ROUND disagree; i × (6dp decimal)
            # keeps the result within 1 ulp of an exact 6dp value.
            F.round(
                F.sum("rev").over(w).cast("double")
                - F.row_number().over(wr) * F.round(F.col("mu"), 6),
                6,
            ).alias("cusum"),
        )
    )


@register("cusum_drift_daily", oracle=_CUSUM_ORACLE, tags=("temporal", "stats"))
def cusum_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift statistic over daily revenue: running Σ(xᵢ − μ) —
    the classic change-point / regime-shift detector (a sustained
    level shift makes the cusum ramp; the max-|cusum| day estimates the
    break). The same statistic a data pipeline runs over daily ingest
    volumes or quality scores to catch silent upstream changes.

    Determinism: per-day revenue and its running sum stay in exact
    DECIMAL; μ is one double; cusum = exact_double − i·μ is identical
    arithmetic both sides, ROUND 6.

    Scale: the fact-sized stage is the per-day hash-agg; everything
    after runs on one row per day (bounded window, broadcast scalar μ).
    The day-grain math lives in :func:`cusum_over_daily`, shared with
    the incremental streaming twin (streaming/windows.py
    ``daily_revenue_stream`` + ``rollup_cusum``).
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    return cusum_over_daily(daily)


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily revenue series
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT CAST(rev AS DOUBLE) AS x,
         CAST(LAG(rev) OVER (ORDER BY day) AS DOUBLE) AS y
  FROM daily
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND(
    (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
    / SQRT((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
         * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))), 6)
    AS lag1_autocorr
FROM lagged
WHERE y IS NOT NULL
"""


@register("autocorr_daily_revenue", oracle=_AUTOCORR_ORACLE, tags=("temporal", "stats"))
def autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue — Pearson correlation of
    the series with its own previous day, the first diagnostic of any
    forecasting workflow (near 0 ⇒ white noise, near 1 ⇒ momentum).
    Computed from sufficient statistics over the (x_t, x_{t-1}) pairs.

    Determinism: daily revenues are exact decimal sums cast to double
    (bit-identical both engines); the Pearson sufficient stats are then
    double sums over ONE ROW PER DAY — a bounded series, so summation
    order is the single-partition window order on both engines; ROUND 6
    absorbs ulp noise.

    Scale: fact-sized work is the per-day agg; the LAG window and the
    correlation run on the bounded daily series. For an unbounded key
    (per-product autocorrelation) the same plan partitions the window
    by the key — nothing about the shape changes.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        F.col("rev").cast("double").alias("x"),
        F.lag("rev").over(w).cast("double").alias("y"),
    ).filter(F.col("y").isNotNull())
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    return lagged.agg(
        n.cast("long").alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("lag1_autocorr"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(SUBSTR(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders
  WHERE o_totalprice > 0
)
SELECT digit,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM digits), 6) AS observed_pct,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_pct
FROM digits
GROUP BY digit
"""


@register("benford_first_digit", oracle=_BENFORD_ORACLE, tags=("agg", "stats"))
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    leading-digit frequencies vs the log10(1+1/d) expectation — the
    standard fraud / synthetic-data / upstream-corruption screen a
    pipeline runs on money columns.

    Determinism: the leading digit is taken from the DECIMAL(18,2)
    string rendering (exact and identical in both engines — extracting
    it via log10/pow would put a transcendental at an exact-power-of-10
    boundary, where one-ulp divergence flips the digit).

    Scale: a single map-side-combinable hash-agg to ≤9 groups; the
    total for the share is the 1-row scalar joined back by Catalyst as
    a broadcast — two passes over digit counts, zero over the fact.
    """
    o = read_table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias(
                "observed_pct"
            ),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6).alias(
                "benford_pct"
            ),
        )
    )
