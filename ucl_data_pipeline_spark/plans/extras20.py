"""Round-6 operators, fourth batch: Wald–Wolfowitz runs test,
Mann–Kendall trend test, single-changepoint detection via prefix-sum
SSE, hash-deterministic subsample confidence intervals, equi-width vs
equi-depth histogram strategy comparison, and a power-law tail fit of
user activity.

Registry conventions apply (decimal-exact aggregates, atomic output
columns, oracle dtype CASTs, ANSI-neutral arithmetic; transcendental
per-term values ROUND-6-then-decimal-summed; every division that can
see zero NULLIF-guarded on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import (
    register,
    sql_knuth_bucket,
)
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily revenue (randomness about the median)
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM orders GROUP BY 1
),
med AS (
  SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS m FROM daily
),
signed AS (
  SELECT d, CASE WHEN v > m THEN 1 ELSE 0 END AS s
  FROM daily, med WHERE v <> m
),
runs AS (
  SELECT s,
         CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                OR LAG(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS brk
  FROM signed
),
agg AS (
  SELECT COUNT(*) AS n, SUM(s) AS n1, COUNT(*) - SUM(s) AS n2,
         SUM(brk) AS r
  FROM runs
)
SELECT CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below,
       CAST(r AS BIGINT) AS n_runs,
       ROUND(2.0 * n1 * n2 / n + 1, 6) AS expected_runs,
       ROUND((r - (2.0 * n1 * n2 / n + 1))
             / NULLIF(SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                           / (1.0 * n * n * (n - 1))), 0), 6) AS z_score
FROM agg
"""


@register(
    "runs_test_daily_revenue", oracle=_RUNS_ORACLE, tags=("stats", "temporal")
)
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test: is the daily-revenue series random
    about its median, or does it cluster (trend/regimes → few long
    runs; oscillation → many short runs)? The cheap nonparametric
    sanity check before fitting any forecaster. Days equal to the
    median drop (standard treatment); the run counter is a lag window
    over the DAY grain (≈2.4k rows at any corpus size — the fact
    table only feeds one date-grain hash-agg); μ_R = 2n₁n₂/n + 1 and
    σ_R come from integer counts, NULLIF-guarded for one-sided
    degenerate series.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("v")
    )
    med = daily.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("m")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("v") != F.col("m"))
        .select("d", F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    lag_s = F.lag("s").over(Window.orderBy("d"))
    runs = signed.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1)
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.agg(
        F.count("*").alias("n"),
        F.sum("s").alias("n1"),
        (F.count("*") - F.sum("s")).alias("n2"),
        F.sum("brk").alias("r"),
    )
    n, n1, n2, r = F.col("n"), F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / n + 1
    sig = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (1.0 * n * n * (n - 1))
    )
    return agg.select(
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        r.cast("bigint").alias("n_runs"),
        F.round(mu, 6).alias("expected_runs"),
        F.round((r - mu) / F.nullif(sig, F.lit(0.0)), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test on monthly revenue
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
  FROM monthly a JOIN monthly b ON a.m < b.m
),
agg AS (
  SELECT (SELECT COUNT(*) FROM monthly) AS n,
         CAST(SUM(sg) AS BIGINT) AS s
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_periods,
       s AS mk_s,
       ROUND((s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
             / NULLIF(SQRT(n * (n - 1.0) * (2 * n + 5) / 18.0), 0), 6)
         AS z_score
FROM agg
"""


@register(
    "mann_kendall_trend", oracle=_MK_ORACLE, tags=("stats", "temporal")
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on monthly revenue — the
    nonparametric trend detector (no linearity or normality assumed)
    that complements `ols_slope_per_nation`'s parametric slope:
    S = Σ_{i<j} sign(v_j − v_i) over period pairs, z from the
    no-ties variance n(n−1)(2n+5)/18 with continuity correction. The
    quadratic pair join runs on the MONTH grain — bounded by the
    calendar domain (≈84 months → 3.5k pairs), never by data volume,
    the same grain-collapse trick as the engine's other global
    statistics. Exact-decimal monthly sums make each sign
    deterministic.
    """
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("v")
    )
    a = monthly.select(F.col("m").alias("ma"), F.col("v").alias("va"))
    b = monthly.select(F.col("m").alias("mb"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("ma") < F.col("mb")).select(
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
        .alias("sg")
    )
    s_agg = pairs.agg(F.sum("sg").cast("bigint").alias("s"))
    n_agg = monthly.agg(F.count("*").alias("n"))
    joined = s_agg.crossJoin(F.broadcast(n_agg))
    n, s = F.col("n"), F.col("s")
    cc = F.when(s > 0, 1).when(s < 0, -1).otherwise(0)
    return joined.select(
        n.cast("bigint").alias("n_periods"),
        s.alias("mk_s"),
        F.round(
            (s - cc)
            / F.nullif(
                F.sqrt(n * (n - 1.0) * (2 * n + 5) / 18.0), F.lit(0.0)
            ),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Single-changepoint detection (binary segmentation, prefix-sum SSE)
# ---------------------------------------------------------------------------

_CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS v
  FROM orders GROUP BY 1
),
pre AS (
  SELECT d,
         ROW_NUMBER() OVER (ORDER BY d) AS i,
         COUNT(*) OVER () AS n,
         CAST(SUM(v) OVER (ORDER BY d) AS DOUBLE) AS cs,
         CAST(SUM(v * v) OVER (ORDER BY d) AS DOUBLE) AS cs2,
         CAST(SUM(v) OVER () AS DOUBLE) AS ts,
         CAST(SUM(v * v) OVER () AS DOUBLE) AS ts2
  FROM daily
),
scored AS (
  SELECT d, i, n, cs, ts, ts2,
         (cs2 - cs * cs / i)
         + ((ts2 - cs2) - (ts - cs) * (ts - cs) / (n - i)) AS sse
  FROM pre WHERE i < n
),
best AS (
  SELECT * FROM scored
  QUALIFY ROW_NUMBER() OVER (ORDER BY sse, d) = 1
)
SELECT d AS split_after,
       CAST(i AS BIGINT) AS n_left,
       CAST(n - i AS BIGINT) AS n_right,
       ROUND(cs / i, 6) AS mean_left,
       ROUND((ts - cs) / (n - i), 6) AS mean_right,
       ROUND(1.0 - sse / NULLIF(ts2 - ts * ts / n, 0), 6)
         AS variance_reduction
FROM best
"""


def changepoint_over_daily(daily: DataFrame) -> DataFrame:
    """Day-grain single-changepoint math shared by the batch query and
    the streaming rollup (streaming/windows.py ``rollup_changepoint``):
    input is (d, v) with ``v`` an exact DECIMAL daily sum; output is
    the one best-split row. ONE implementation so the stream≡batch
    parity test pins the streaming twin against exactly the arithmetic
    the driver oracle-checks.
    """
    w_cum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.count("*").over(w_all).alias("n"),
        F.sum("v").over(w_cum).cast("double").alias("cs"),
        F.sum(F.col("v") * F.col("v")).over(w_cum).cast("double").alias("cs2"),
        F.sum("v").over(w_all).cast("double").alias("ts"),
        F.sum(F.col("v") * F.col("v")).over(w_all).cast("double").alias("ts2"),
    )
    i, n = F.col("i"), F.col("n")
    cs, cs2 = F.col("cs"), F.col("cs2")
    ts, ts2 = F.col("ts"), F.col("ts2")
    sse = (cs2 - cs * cs / i) + (
        (ts2 - cs2) - (ts - cs) * (ts - cs) / (n - i)
    )
    scored = pre.filter(i < n).select(
        "d", "i", "n", "cs", "ts", "ts2", sse.alias("sse")
    )
    best = (
        scored.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("sse"), F.col("d"))),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # Raw SSE magnitudes reach ~1e15, where the engines' decimal→
    # double conversions differ by a few ulp (~1e0 absolute) and
    # ROUND(x, 6) cannot mask it at ANY fixed unit as SF grows. The
    # output therefore reports only SCALE-ROBUST quantities: the two
    # segment means (divisions shrink the conversion noise by the
    # segment length) and the RELATIVE variance reduction (ulp-level
    # relative error regardless of magnitude).
    return best.select(
        F.col("d").alias("split_after"),
        F.col("i").cast("bigint").alias("n_left"),
        (F.col("n") - F.col("i")).cast("bigint").alias("n_right"),
        F.round(F.col("cs") / F.col("i"), 6).alias("mean_left"),
        F.round(
            (F.col("ts") - F.col("cs")) / (F.col("n") - F.col("i")), 6
        ).alias("mean_right"),
        F.round(
            1.0 - F.col("sse") / F.nullif(ts2 - ts * ts / n, F.lit(0.0)),
            6,
        ).alias("variance_reduction"),
    )


@register(
    "changepoint_single_split",
    oracle=_CHANGEPOINT_ORACLE,
    tags=("stats", "temporal"),
)
def changepoint_single_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detector (the first step of binary
    segmentation): the split of the daily-revenue series that
    minimizes total within-segment SSE, with the variance reduction it
    buys — the standard level-shift detector for metric monitoring.
    Every candidate split is scored from PREFIX SUMS of v and v² over
    the day grain (one cumulative window; per-candidate SSE is O(1)
    from the sufficient statistics, so all ≈2.4k candidates cost one
    pass — never a per-candidate re-scan). v and v² accumulate as
    EXACT decimals (v is a decimal(18,6) daily sum; v·v is exact at
    scale 12) and only the final SSE arithmetic runs in doubles; the
    argmin orders by (sse, date) so the winner is deterministic.

    The day-grain scoring lives in :func:`changepoint_over_daily`,
    shared with the incremental streaming twin (streaming/windows.py
    ``daily_revenue_stream`` + ``rollup_changepoint``).
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("v")
    )
    return changepoint_over_daily(daily)


# ---------------------------------------------------------------------------
# Hash-deterministic subsample confidence interval for the mean
# ---------------------------------------------------------------------------

_SUBSAMPLE_B = 20

_SUBSAMPLE_CI_ORACLE = f"""
WITH reps AS (
  SELECT o_totalprice AS v, b
  FROM orders, (SELECT unnest(generate_series(0, {_SUBSAMPLE_B - 1})) AS b)
  WHERE {sql_knuth_bucket('o_orderkey + b * 1000003', 2)} = 0
),
means AS (
  SELECT b,
         CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mv
  FROM reps GROUP BY b
),
point AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    AS pm
  FROM orders
)
SELECT CAST({_SUBSAMPLE_B} AS BIGINT) AS n_replicates,
       ROUND(point.pm, 6) AS point_mean,
       ROUND((SELECT percentile_disc(0.025) WITHIN GROUP (ORDER BY mv)
              FROM means), 6) AS ci_lo,
       ROUND((SELECT percentile_disc(0.975) WITHIN GROUP (ORDER BY mv)
              FROM means), 6) AS ci_hi
FROM point
"""


@register(
    "subsample_mean_ci_hash",
    oracle=_SUBSAMPLE_CI_ORACLE,
    tags=("stats", "sampling"),
)
def subsample_mean_ci_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence interval for mean order value via {B} DETERMINISTIC
    half-subsample replicates — resampling inference with no RNG
    state: replicate b keeps a row iff the overflow-safe Knuth hash of
    (key + b·1000003) is even, so every engine, run, and executor
    agrees on membership (the property that makes resampling usable in
    a distributed pipeline at all; RNG-based bootstrap is
    irreproducible across retries/speculative tasks). The CI is the
    2.5/97.5 percentile_disc of the replicate means (half-sampling —
    a subsampling estimator, deliberately not with-replacement
    bootstrap, which hashing cannot express). Plan: one {B}-way
    scan-side fan-out into a {B}-group decimal-exact mean agg — one
    pass over the fact table regardless of B.
    """
    from ucl_data_pipeline_spark.functions.scalar import knuth_bucket

    o = read_table(spark, sf_dir, "orders")
    reps = (
        o.select("o_totalprice", "o_orderkey")
        .withColumn(
            "b", F.explode(F.array(*[F.lit(i) for i in range(_SUBSAMPLE_B)]))
        )
        .filter(
            knuth_bucket(
                F.col("o_orderkey") + F.col("b") * 1000003, 2
            )
            == 0
        )
    )
    means = reps.groupBy("b").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("mv")
    )
    ci = means.agg(
        F.expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY mv)").alias(
            "lo"
        ),
        F.expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY mv)").alias(
            "hi"
        ),
    )
    point = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("pm")
    )
    return point.crossJoin(F.broadcast(ci)).select(
        F.lit(_SUBSAMPLE_B).cast("bigint").alias("n_replicates"),
        F.round(F.col("pm"), 6).alias("point_mean"),
        F.round(F.col("lo"), 6).alias("ci_lo"),
        F.round(F.col("hi"), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Histogram strategy comparison (equi-width vs equi-depth)
# ---------------------------------------------------------------------------

_HIST_CMP_ORACLE = """
WITH v AS (SELECT o_totalprice AS x FROM orders),
stats AS (
  SELECT MIN(x) AS lo, MAX(x) AS hi, COUNT(*) AS n FROM v
),
cuts AS (
  SELECT list(q ORDER BY q) AS qs
  FROM (SELECT unnest(quantile_disc(x,
         [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS q FROM v)
),
binned AS (
  SELECT 'equi_width' AS strategy,
         LEAST(CAST(FLOOR((x - s.lo) * 10.0 / NULLIF(s.hi - s.lo, 0))
                    AS INTEGER), 9) AS bin
  FROM v, stats s
  UNION ALL
  SELECT 'equi_depth',
         CAST(len(list_filter(c.qs, q -> x > q)) AS INTEGER)
  FROM v, cuts c
),
per_bin AS (
  SELECT strategy, bin, COUNT(*) AS c FROM binned GROUP BY strategy, bin
),
with_tot AS (
  SELECT strategy, c,
         SUM(c) OVER (PARTITION BY strategy) AS tot
  FROM per_bin
)
SELECT strategy,
       CAST(COUNT(*) AS BIGINT) AS nonempty_bins,
       ROUND(MAX(c) * 1.0 / MAX(tot), 6) AS max_bin_share,
       ROUND(CAST(SUM((10 * c - tot) * (10 * c - tot)) AS DOUBLE)
             / 100.0 / NULLIF(MAX(tot), 0), 6) AS uniformity_chi2_over_n
FROM with_tot
GROUP BY strategy
"""


@register(
    "histogram_strategy_compare",
    oracle=_HIST_CMP_ORACLE,
    tags=("layout", "agg"),
)
def histogram_strategy_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-width vs equi-depth 10-bin histograms of order value, side
    by side — the statistics-collection decision every optimizer and
    range-layout planner faces: equi-width is one scan but skew packs
    most rows into few bins (high max_bin_share / chi²); equi-depth
    costs a rank pass but flattens shares by construction (its chi²
    deviations come only from duplicate boundary values). Width bins
    use (x−lo)·10/(hi−lo) on engine-identical doubles; depth bins fold
    the broadcast decile ORDER STATISTICS per row, the
    `range_partition_boundaries` pattern. Output is two summary rows —
    the grain is (strategy, bin) throughout.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x")
    )
    stats = o.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    # ONE percentile_disc buffer for all nine deciles (the array form):
    # nine scalar percentile_disc aggs each materialize their own full
    # value buffer — same fix as quantile_sample_error (extras33),
    # measured 2.94 s → 0.94 s cold at sf0.1 for this query.
    qs_lit = "array(" + ", ".join(f"{q / 10}D" for q in range(1, 10)) + ")"
    cuts = o.agg(
        F.expr(
            f"percentile_disc({qs_lit}) WITHIN GROUP (ORDER BY x)"
        ).alias("qs")
    )
    width = o.crossJoin(F.broadcast(stats)).select(
        F.lit("equi_width").alias("strategy"),
        F.least(
            F.floor(
                (F.col("x") - F.col("lo"))
                * 10.0
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
            ).cast("int"),
            F.lit(9),
        ).alias("bin"),
    )
    depth = o.crossJoin(F.broadcast(cuts)).select(
        F.lit("equi_depth").alias("strategy"),
        F.aggregate(
            "qs",
            F.lit(0),
            lambda acc, q: acc + F.when(F.col("x") > q, 1).otherwise(0),
        )
        .cast("int")
        .alias("bin"),
    )
    per_bin = (
        width.unionByName(depth)
        .groupBy("strategy", "bin")
        .agg(F.count("*").alias("c"))
    )
    # chi²/n restated in EXACT integers: Σ(c − tot/10)² = Σ(10c−tot)²
    # /100 — a float sum of ≤10 arbitrary doubles would be
    # order-dependent across engines; the integer form is not.
    with_tot = per_bin.withColumn(
        "tot", F.sum("c").over(Window.partitionBy("strategy"))
    )
    dev = (10 * F.col("c") - F.col("tot")) * (
        10 * F.col("c") - F.col("tot")
    )
    return with_tot.groupBy("strategy").agg(
        F.count("*").cast("bigint").alias("nonempty_bins"),
        F.round(F.max("c") * 1.0 / F.max("tot"), 6).alias("max_bin_share"),
        F.round(
            F.sum(dev).cast("double")
            / 100.0
            / F.nullif(F.max("tot"), F.lit(0)),
            6,
        ).alias("uniformity_chi2_over_n"),
    )


# ---------------------------------------------------------------------------
# Power-law tail fit of user activity (discrete MLE)
# ---------------------------------------------------------------------------

_POWERLAW_XMIN = 5

_POWERLAW_ORACLE = f"""
WITH deg AS (
  SELECT user_id, COUNT(*) AS k FROM events GROUP BY user_id
),
tail AS (
  SELECT CAST(ROUND(LN(k / ({_POWERLAW_XMIN} - 0.5)), 6) AS DECIMAL(18,6))
    AS lk
  FROM deg WHERE k >= {_POWERLAW_XMIN}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
       CAST({_POWERLAW_XMIN} AS BIGINT) AS xmin,
       ROUND(1.0 + COUNT(*) / NULLIF(CAST(SUM(lk) AS DOUBLE), 0), 6)
         AS alpha
FROM tail
"""


@register(
    "powerlaw_alpha_user_activity",
    oracle=_POWERLAW_ORACLE,
    tags=("stats", "events"),
)
def powerlaw_alpha_user_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discrete power-law exponent of the per-user activity
    distribution (events per user), via the Clauset-Shalizi-Newman
    MLE α ≈ 1 + n / Σ ln(k_i / (x_min − ½)) over the tail
    k ≥ x_min — the skew summary that predicts hot-key behavior:
    α ≤ 2 means the heaviest users dominate totals and per-key state
    (watermarks, session stores, salting decisions) must plan for
    them. Per-term logs follow the ROUND-6-then-decimal-sum
    convention; everything else is integer counts. One user-grain agg
    feeds a one-row reduction.
    """
    e = read_table(spark, sf_dir, "events")
    deg = e.groupBy("user_id").agg(F.count("*").alias("k"))
    tail = deg.filter(F.col("k") >= _POWERLAW_XMIN).select(
        F.round(F.log(F.col("k") / (_POWERLAW_XMIN - 0.5)), 6)
        .cast("decimal(18,6)")
        .alias("lk")
    )
    return tail.agg(
        F.count("*").cast("bigint").alias("n_tail"),
        F.lit(_POWERLAW_XMIN).cast("bigint").alias("xmin"),
        F.round(
            1.0
            + F.count("*")
            / F.nullif(F.sum("lk").cast("double"), F.lit(0.0)),
            6,
        ).alias("alpha"),
    )
