"""Round-5 inventory depth, third batch: the metrics-platform shapes —
seasonal decomposition, growth rates, confidence intervals, correlation
matrices, grouped regression, distribution-drift (PSI), weighted
medians, and a classifier-evaluation (confusion/F1) surface.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.llm_ops import _LANG_ID_ORACLE, lang_id_heuristic
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Day-of-week seasonal decomposition of daily revenue
# ---------------------------------------------------------------------------

# Portable day-of-week: days since Monday 1970-01-05 mod 7 (0=Mon..6=Sun).
# Spark's dayofweek() (1=Sun) and DuckDB's dayofweek (0=Sun) disagree;
# pure integer date arithmetic is identical everywhere.

_DOW_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
keyed AS (
  SELECT day, rev,
         (CAST(day - DATE '1970-01-05' AS INTEGER) % 7 + 7) % 7 AS dow
  FROM daily
),
seasonal AS (
  SELECT dow,
         CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS dow_mean
  FROM keyed GROUP BY dow
)
SELECT k.day,
       CAST(k.rev AS DOUBLE) AS revenue,
       CAST(k.dow AS INTEGER) AS dow,
       ROUND(s.dow_mean, 6) AS dow_mean,
       ROUND(CAST(k.rev AS DOUBLE) - ROUND(s.dow_mean, 6), 6) AS residual
FROM keyed k JOIN seasonal s ON s.dow = k.dow
"""


@register("seasonal_dow_decompose", oracle=_DOW_ORACLE, tags=("temporal", "stats"))
def seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily revenue: each day's
    value split into its weekday mean (the seasonal component) and the
    residual — the first pass of every ops/forecasting dashboard
    ("is Monday always low, or is THIS Monday anomalous?"). Residuals
    are what anomaly detectors should score; raw values conflate
    seasonality with incidents.

    Determinism: day-of-week is pure integer date arithmetic (days
    since a known Monday mod 7) — Spark's and DuckDB's dayofweek
    functions number weekdays differently, so neither is used. Daily
    revenue and the weekday means come from exact decimal sums.

    Scale: the fact-sized stage is the per-day hash-agg; the seasonal
    table is 7 rows (broadcast join back), and the output is one row
    per day — bounded by the calendar.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    keyed = daily.select(
        "day",
        "rev",
        (
            (F.datediff("day", F.lit("1970-01-05").cast("date")) % 7 + 7) % 7
        ).alias("dow"),
    )
    seasonal = keyed.groupBy("dow").agg(
        (F.sum("rev").cast("double") / F.count("*")).alias("dow_mean")
    )
    return keyed.join(F.broadcast(seasonal), "dow").select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.col("dow").cast("int").alias("dow"),
        F.round("dow_mean", 6).alias("dow_mean"),
        # residual subtracts the ROUNDED mean: rev − raw mean can land
        # exactly on a 6dp half-boundary (a 2dp value minus a /n
        # rational), where Spark's and DuckDB's ROUND disagree; rev −
        # round6(mean) stays within 1 ulp of an exact 6dp decimal,
        # where both engines agree.
        F.round(
            F.col("rev").cast("double") - F.round(F.col("dow_mean"), 6), 6
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Week-over-week revenue growth
# ---------------------------------------------------------------------------

_WOW_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT CAST(week AS DATE) AS week,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND((CAST(rev AS DOUBLE) - CAST(LAG(rev) OVER (ORDER BY week) AS DOUBLE))
             / CAST(LAG(rev) OVER (ORDER BY week) AS DOUBLE), 6) AS wow_growth
FROM weekly
"""


@register("weekly_revenue_growth", oracle=_WOW_ORACLE, tags=("temporal", "window"))
def weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth rate: weekly exact-decimal revenue
    with LAG-based percent change — the growth-accounting number every
    business review opens with. First week's growth is NULL (no prior),
    identically in both engines. ISO-Monday week truncation on both
    sides.

    Scale: one fact-sized hash-agg to weeks, then a LAG window over one
    row per week — bounded by the calendar; the single-partition window
    is safe at any data size.
    """
    o = read_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("week")
    prev = F.lag(F.col("rev")).over(w).cast("double")
    return weekly.select(
        "week",
        F.col("rev").cast("double").alias("revenue"),
        F.round((F.col("rev").cast("double") - prev) / prev, 6).alias(
            "wow_growth"
        ),
    )


# ---------------------------------------------------------------------------
# Daily conversion rate with Wilson 95% confidence interval
# ---------------------------------------------------------------------------

_WILSON_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) AS n,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS s
  FROM events GROUP BY 1
)
SELECT day,
       CAST(n AS BIGINT) AS n_events,
       CAST(s AS BIGINT) AS n_purchases,
       ROUND(CAST(s AS DOUBLE) / n, 6) AS p_hat,
       ROUND((CAST(s AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
              - 1.96 * SQRT((CAST(s AS DOUBLE) / n) * (1 - CAST(s AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS ci_lo,
       ROUND((CAST(s AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
              + 1.96 * SQRT((CAST(s AS DOUBLE) / n) * (1 - CAST(s AS DOUBLE) / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS ci_hi
FROM daily
"""


@register("conversion_wilson_ci", oracle=_WILSON_ORACLE, tags=("agg", "stats"))
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-conversion rate with a Wilson-score 95%
    confidence interval — the statistically honest way to report a
    proportion (the naive ±1.96·√(p̂(1−p̂)/n) Wald interval collapses
    to zero width at p̂∈{0,1} and escapes [0,1]; Wilson does neither).
    The shape every experiment dashboard needs per-metric, per-day.

    Determinism: counts are exact; every term is the same double
    arithmetic on both engines (z = 1.96 parses to the same double);
    only √ output is rounded.

    Scale: one map-side-combinable conditional hash-agg keyed by day;
    the interval math runs on one row per day.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("s"),
    )
    n, s = F.col("n"), F.col("s")
    p = s.cast("double") / n
    z2 = F.lit(1.96) * F.lit(1.96)
    center = p + z2 / (2 * n)
    halfw = F.lit(1.96) * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    denom = 1 + z2 / n
    return daily.select(
        "day",
        n.cast("long").alias("n_events"),
        s.cast("long").alias("n_purchases"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - halfw) / denom, 6).alias("ci_lo"),
        F.round((center + halfw) / denom, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix (single-pass sufficient stats)
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_sql() -> str:
    # DECIMAL(28,6) in DuckDB so the product runs in int128 (an 18,6
    # multiply overflows its int64 fast path); Spark keeps (18,6),
    # where (37,12) products are exact — values are identical.
    sums = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS s_{c}")
        sums.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(28,6)) * CAST({c} AS DECIMAL(28,6)))"
            f" AS DOUBLE) AS q_{c}"
        )
    for a, b in _CORR_PAIRS:
        sums.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(28,6)) * CAST({b} AS DECIMAL(28,6)))"
            f" AS DOUBLE) AS x_{a}_{b}"
        )
    rows = []
    for a, b in _CORR_PAIRS:
        corr = (
            f"(n * x_{a}_{b} - s_{a} * s_{b}) / "
            f"SQRT((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b}))"
        )
        rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, ROUND({corr}, 6) AS corr"
            " FROM stats"
        )
    return (
        "WITH stats AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
    )


@register("corr_matrix_lineitem", oracle=_corr_sql(), tags=("agg", "stats"))
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the four lineitem
    measures, computed from ONE sufficient-statistics pass (n, Σx, Σx²
    per column, Σxy per pair — 15 agg buffers) and unpivoted to
    (col_a, col_b, corr) rows — the feature-screening primitive of any
    model pipeline, in its distributed form: never per-pair passes.

    Determinism: every sum accumulates in DECIMAL (exact); the Pearson
    formula then runs identical double arithmetic, ROUND 6.

    Scale: a single map-side-combinable hash-agg with no group key —
    each partition reduces to one 15-number row before a 1-row
    exchange. The unpivot (stack) is driver-side literal wiring over
    that single row. O(k²) buffers for k columns is the only growth
    axis; at k ~ hundreds, switch to the array-typed block form.
    """
    li = read_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        d = F.col(c).cast("decimal(18,6)")
        aggs.append(F.sum(d).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(d * d).cast("double").alias(f"q_{c}"))
    for a, b in _CORR_PAIRS:
        da = F.col(a).cast("decimal(18,6)")
        db = F.col(b).cast("decimal(18,6)")
        aggs.append(F.sum(da * db).cast("double").alias(f"x_{a}_{b}"))
    stats = li.agg(*aggs)
    pieces = []
    for a, b in _CORR_PAIRS:
        pieces.append(
            f"'{a}', '{b}', ROUND((n * x_{a}_{b} - s_{a} * s_{b}) / "
            f"SQRT((n * q_{a} - s_{a} * s_{a}) * (n * q_{b} - s_{b} * s_{b})), 6)"
        )
    return stats.selectExpr(
        f"stack({len(_CORR_PAIRS)}, "
        + ", ".join(pieces)
        + ") AS (col_a, col_b, corr)"
    )


# ---------------------------------------------------------------------------
# Grouped OLS: revenue-vs-time slope per customer nation
# ---------------------------------------------------------------------------

_SLOPE_ORACLE = """
WITH pts AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
stats AS (
  SELECT nationkey,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS DOUBLE) AS sxy
  FROM pts GROUP BY nationkey
)
SELECT nationkey,
       CAST(n AS BIGINT) AS n_orders,
       ROUND((n * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS slope_per_day,
       ROUND((sy - (n * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
             / n, 6) AS intercept
FROM stats
"""


@register("ols_slope_per_nation", oracle=_SLOPE_ORACLE, tags=("agg", "stats"))
def ols_slope_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression: order value vs order date
    (days since epoch) for every customer nation, from one grouped
    sufficient-statistics pass — the distributed form of "fit a trend
    line per segment" (regr_ols_surface's grouped sibling; same
    pattern as SQL's REGR_SLOPE/REGR_INTERCEPT family).

    Determinism: Σx/Σx² are exact BIGINTs, Σy/Σxy exact decimals; the
    slope/intercept formulas are then double arithmetic on identical
    inputs, ROUND 6. (Σxy ≈ 10¹⁵ at sf1 stays under double's exact-
    integer range after the cast; beyond that, widen to DECIMAL(38,2)
    and cast once.)

    Scale: the join's dim side (customer) shuffles once; the stats pass
    is a map-side-combinable hash-agg keyed by nation — five buffers
    per group, one exchange of 25 rows. No second pass, no windows.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    pts = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nationkey"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    stats = pts.groupBy("nationkey").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, sxy = F.col("sy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (
        n.cast("double") * sxx - sx.cast("double") * sx
    )
    return stats.select(
        "nationkey",
        n.cast("long").alias("n_orders"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index (distribution drift) on order totals
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH bucketed AS (
  SELECT LEAST(9, CAST(FLOOR(o_totalprice / 50000.0) AS INTEGER)) AS bucket,
         CASE WHEN EXTRACT(YEAR FROM o_orderdate) <= 1997 THEN 1 ELSE 0 END
           AS is_ref
  FROM orders
),
counts AS (
  SELECT bucket,
         COUNT(*) FILTER (WHERE is_ref = 1) AS c_ref,
         COUNT(*) FILTER (WHERE is_ref = 0) AS c_cur
  FROM bucketed GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(c_ref) AS DOUBLE) AS n_ref,
         CAST(SUM(c_cur) AS DOUBLE) AS n_cur,
         COUNT(*) AS k
  FROM counts
)
SELECT c.bucket,
       CAST(c.c_ref AS BIGINT) AS n_ref,
       CAST(c.c_cur AS BIGINT) AS n_cur,
       ROUND((c.c_ref + 0.5) / (t.n_ref + 0.5 * t.k), 6) AS p_ref,
       ROUND((c.c_cur + 0.5) / (t.n_cur + 0.5 * t.k), 6) AS p_cur,
       ROUND(((c.c_ref + 0.5) / (t.n_ref + 0.5 * t.k)
              - (c.c_cur + 0.5) / (t.n_cur + 0.5 * t.k))
             * LN(((c.c_ref + 0.5) / (t.n_ref + 0.5 * t.k))
                  / ((c.c_cur + 0.5) / (t.n_cur + 0.5 * t.k))), 6)
         AS psi_contrib
FROM counts c CROSS JOIN tot t
"""


@register("psi_price_drift", oracle=_PSI_ORACLE, tags=("agg", "stats"))
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference period
    (order years ≤ 1997) and the current period over 10 fixed-width
    price buckets: per-bucket shares with add-half smoothing and the
    (p−q)·ln(p/q) contribution — THE standard model-input drift
    monitor; Σ psi_contrib > 0.2 is the conventional "investigate"
    threshold. Per-bucket rows keep the whole diagnostic
    driver-hashable, not just the total.

    Determinism: bucket = floor of a double division by a power-of-two-
    friendly constant on identical doubles; counts exact; smoothing
    makes every share strictly positive so LN never sees 0. LN output
    ROUND 6.

    Scale: one conditional hash-agg keyed by bucket (≤10 groups,
    map-side combinable) — the two period distributions come from a
    single fact pass, not one scan per period. Totals are a 1-row
    broadcast.
    """
    o = read_table(spark, sf_dir, "orders")
    bucketed = o.select(
        F.least(
            F.lit(9), F.floor(F.col("o_totalprice") / 50000.0).cast("int")
        ).alias("bucket"),
        F.when(F.year("o_orderdate") <= 1997, 1).otherwise(0).alias("is_ref"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.when(F.col("is_ref") == 1, 1)).alias("c_ref"),
        F.count(F.when(F.col("is_ref") == 0, 1)).alias("c_cur"),
    )
    tot = counts.agg(
        F.sum("c_ref").cast("double").alias("n_ref"),
        F.sum("c_cur").cast("double").alias("n_cur"),
        F.count("*").alias("k"),
    )
    p_ref = (F.col("c_ref") + 0.5) / (F.col("n_ref") + 0.5 * F.col("k"))
    p_cur = (F.col("c_cur") + 0.5) / (F.col("n_cur") + 0.5 * F.col("k"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("c_ref").cast("long").alias("n_ref"),
        F.col("c_cur").cast("long").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias("psi_contrib"),
    )


# ---------------------------------------------------------------------------
# Weighted median (quantity-weighted price per return flag)
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH perprice AS (
  SELECT l_returnflag AS flag,
         l_extendedprice AS price,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS wt
  FROM lineitem
  GROUP BY 1, 2
),
w AS (
  SELECT flag, price,
         SUM(wt) OVER (
           PARTITION BY flag ORDER BY price
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         SUM(wt) OVER (PARTITION BY flag) AS totw
  FROM perprice
)
SELECT flag,
       CAST(MIN(totw) AS DOUBLE) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cumw >= totw THEN price END) AS DOUBLE)
         AS weighted_median
FROM w
GROUP BY flag
"""


@register("weighted_median_price", oracle=_WMEDIAN_ORACLE, tags=("window", "stats"))
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the smallest price at which cumulative quantity
    weight reaches half the group's total — "the price of the median
    UNIT SOLD", which an unweighted median (price of the median line
    item) gets wrong whenever cheap items ship in bulk. The canonical
    order-statistic-with-weights shape (also how weighted quantile
    feature binning is built).

    Determinism: weights accumulate in exact DECIMAL; the crossing test
    2·cumw ≥ totw is exact decimal comparison — no doubles until the
    output cast.

    Scale — the few-heavy-groups trap, solved: a row-level cumulative
    window partitioned by 3 flags would sort a third of the fact table
    in ONE task (measured 7.7× at 10× data). Instead, weights are first
    hash-aggregated per (flag, price) — massively parallel, map-side
    combinable — and the cumulative window runs over DISTINCT PRICES
    only, whose count is bounded by the price domain, not the row
    count. The crossing price is provably identical: cumulative weight
    at price p equals the row-level cumulative at p's last row.
    """
    li = read_table(spark, sf_dir, "lineitem")
    perprice = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("wt"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("flag")
    w = perprice.select(
        "flag",
        "price",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(wtot).alias("totw"),
    )
    return w.groupBy("flag").agg(
        F.min("totw").cast("double").alias("total_weight"),
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("price")))
        .cast("double")
        .alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# Classifier evaluation: language-ID confusion counts + per-class F1
# ---------------------------------------------------------------------------

_LANGID_F1_ORACLE = f"""
WITH preds AS ({_LANG_ID_ORACLE}),
pairs AS (
  SELECT labeled_lang, detected_lang, COUNT(*) AS n
  FROM preds GROUP BY 1, 2
),
classes AS (
  SELECT DISTINCT labeled_lang AS cls FROM pairs
  UNION
  SELECT DISTINCT detected_lang FROM pairs
)
SELECT c.cls,
  CAST(COALESCE(SUM(CASE WHEN p.labeled_lang = c.cls
                          AND p.detected_lang = c.cls THEN p.n END), 0)
       AS BIGINT) AS tp,
  CAST(COALESCE(SUM(CASE WHEN p.detected_lang = c.cls
                          AND p.labeled_lang <> c.cls THEN p.n END), 0)
       AS BIGINT) AS fp,
  CAST(COALESCE(SUM(CASE WHEN p.labeled_lang = c.cls
                          AND p.detected_lang <> c.cls THEN p.n END), 0)
       AS BIGINT) AS fn,
  ROUND(CAST(COALESCE(SUM(CASE WHEN p.labeled_lang = c.cls
                       AND p.detected_lang = c.cls THEN p.n END), 0) AS DOUBLE)
        / NULLIF(SUM(CASE WHEN p.detected_lang = c.cls THEN p.n END), 0), 6)
    AS precision_,
  ROUND(CAST(COALESCE(SUM(CASE WHEN p.labeled_lang = c.cls
                       AND p.detected_lang = c.cls THEN p.n END), 0) AS DOUBLE)
        / NULLIF(SUM(CASE WHEN p.labeled_lang = c.cls THEN p.n END), 0), 6)
    AS recall_,
  ROUND(2.0 * CAST(COALESCE(SUM(CASE WHEN p.labeled_lang = c.cls
                             AND p.detected_lang = c.cls THEN p.n END), 0) AS DOUBLE)
        / NULLIF(SUM(CASE WHEN p.detected_lang = c.cls THEN p.n END)
                 + SUM(CASE WHEN p.labeled_lang = c.cls THEN p.n END), 0), 6)
    AS f1
FROM classes c CROSS JOIN pairs p
GROUP BY c.cls
"""


@register("langid_confusion_f1", oracle=_LANGID_F1_ORACLE, tags=("llm", "stats", "gate"))
def langid_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the language-ID heuristic against the labeled lang
    column: per-class true/false positives, false negatives, precision,
    recall, and F1 (computed as 2·TP/(pred_pos+actual_pos) — the
    division-order-free spelling). The quality gate for the engine's
    own classifier, same philosophy as the ANN-recall and MinHash-error
    gates: model QUALITY is a registered, driver-hashable query.
    Classes with no predictions get NULL precision (both engines).

    Scale: the predictions query is one scan-side pass (see
    lang_id_heuristic); the confusion matrix collapses it to ≤
    |classes|² rows before any join; per-class rollup is a broadcast
    cross of ≤6 classes × the tiny pair table.
    """
    preds = lang_id_heuristic(spark, sf_dir)
    pairs = preds.groupBy("labeled_lang", "detected_lang").agg(
        F.count("*").alias("n")
    )
    classes = (
        pairs.select(F.col("labeled_lang").alias("cls"))
        .union(pairs.select("detected_lang"))
        .distinct()
    )
    # classes derives from pairs; rename the pair columns so the cross
    # join below isn't an ambiguous self-join on shared attributes.
    pr = pairs.select(
        F.col("labeled_lang").alias("pl"),
        F.col("detected_lang").alias("pd"),
        "n",
    )
    pl, pd_ = F.col("pl"), F.col("pd")
    tp = F.sum(
        F.when((pl == F.col("cls")) & (pd_ == F.col("cls")), F.col("n"))
    )
    pred_pos = F.sum(F.when(pd_ == F.col("cls"), F.col("n")))
    actual_pos = F.sum(F.when(pl == F.col("cls"), F.col("n")))
    fp = F.sum(
        F.when((pd_ == F.col("cls")) & (pl != F.col("cls")), F.col("n"))
    )
    fn = F.sum(
        F.when((pl == F.col("cls")) & (pd_ != F.col("cls")), F.col("n"))
    )
    return (
        classes.crossJoin(F.broadcast(pr))
        .groupBy("cls")
        .agg(
            F.coalesce(tp, F.lit(0)).cast("long").alias("tp"),
            F.coalesce(fp, F.lit(0)).cast("long").alias("fp"),
            F.coalesce(fn, F.lit(0)).cast("long").alias("fn"),
            F.round(
                F.coalesce(tp, F.lit(0)).cast("double")
                / F.nullif(pred_pos, F.lit(0)),
                6,
            ).alias("precision_"),
            F.round(
                F.coalesce(tp, F.lit(0)).cast("double")
                / F.nullif(actual_pos, F.lit(0)),
                6,
            ).alias("recall_"),
            F.round(
                2.0
                * F.coalesce(tp, F.lit(0)).cast("double")
                / F.nullif(pred_pos + actual_pos, F.lit(0)),
                6,
            ).alias("f1"),
        )
    )
