"""Round-8 batch 22: time-series structure diagnostics —

- ``periodogram_fixed_freqs``: spectral power of the daily revenue
  series at the CALENDAR frequencies an analyst actually tests (7 /
  30 / 91 / 365-day cycles) — the Goertzel-style single-frequency DFT
  as SQL: A_p = Σ x̃_t·cos(2πt/p), B_p = Σ x̃_t·sin(2πt/p), spectral
  fraction 2(A²+B²)/(T·SST). The trick that makes it distributable
  AND deterministic: t enters only through t mod p, so the series
  first collapses to the ≤p-row RESIDUE grain (exact decimal sums per
  residue class) and the transcendental products are folded over that
  bounded grain — never over raw days.
- ``permutation_entropy_daily``: Bandt–Pompe permutation entropy of
  the daily revenue series (embedding dimension 3): encode each
  consecutive triple's ordinal pattern with three strict comparisons
  (ties fall to positional order — exact decimal comparisons, so both
  engines agree), count the ≤6 patterns, and report normalized
  entropy H/ln 6. H ≈ 1 means the series is ordinally random (white
  noise); low H means deterministic structure a forecaster could
  exploit. The standard complexity diagnostic before model selection.
- ``burstiness_interevent``: Goh–Barabási burstiness B = (σ−μ)/(σ+μ)
  and CV = σ/μ of INTER-EVENT times per event type. B ≈ 0 is Poisson
  (exponential gaps), B → 1 is bursty, B < 0 is pacemaker-regular.
  The inter-arrival companion of ``event_dispersion_index`` (which
  reads binned COUNTS): dispersion can look Poisson while arrivals
  are bursty inside bins — monitors need both.

Registry conventions (plans/registry.py): exact decimal/integer
sufficient statistics; order-pinned folds where terms are arbitrary
doubles; the VARCHAR round-trip for DuckDB's wide-DECIMAL→DOUBLE cast
(the extras52 trap); ROUND 6 outputs; NULLIF degenerate guards.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import epoch_us
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_DAILY_CTE = """
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Periodogram at fixed calendar frequencies (residue-grain Goertzel)
# ---------------------------------------------------------------------------

_PERIODS = (7, 30, 91, 365)
_PERIODS_SQL = ", ".join(str(p) for p in _PERIODS)

_PERIODOGRAM_ORACLE = f"""
WITH daily AS ({_DAILY_CTE}),
idx AS (
  SELECT day, rev,
         datediff('day', (SELECT MIN(day) FROM daily), day) AS t
  FROM daily
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS tn,
         CAST(SUM(rev) AS DOUBLE) AS s,
         CAST(CAST(SUM(rev * rev) AS VARCHAR) AS DOUBLE) AS q
  FROM idx
),
res AS (
  SELECT p.p, i.t % p.p AS m,
         CAST(SUM(i.rev) AS DOUBLE) AS sm,
         CAST(COUNT(*) AS BIGINT) AS cm
  FROM idx i CROSS JOIN (SELECT UNNEST([{_PERIODS_SQL}]) AS p) p
  GROUP BY p.p, i.t % p.p
),
ab AS (
  SELECT r.p,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list((r.sm - r.cm * t.s / t.tn) * COS(2 * PI() * r.m / r.p)
                ORDER BY r.m)), (a, b) -> a + b) AS a_p,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list((r.sm - r.cm * t.s / t.tn) * SIN(2 * PI() * r.m / r.p)
                ORDER BY r.m)), (a, b) -> a + b) AS b_p,
         MAX(t.tn) AS tn,
         MAX(t.q - t.s * t.s / t.tn) AS sst
  FROM res r CROSS JOIN tot t
  GROUP BY r.p
)
SELECT CAST(p AS INTEGER) AS period_days,
       ROUND(2.0 * (a_p * a_p + b_p * b_p) / (tn * sst), 6)
         AS spectral_frac,
       CAST(CASE WHEN 2.0 * (a_p * a_p + b_p * b_p) / (tn * sst)
                  = MAX(2.0 * (a_p * a_p + b_p * b_p) / (tn * sst))
                    OVER () THEN 1 ELSE 0 END AS INTEGER) AS is_dominant
FROM ab
ORDER BY period_days
"""


@register(
    "periodogram_fixed_freqs",
    oracle=_PERIODOGRAM_ORACLE,
    tags=("temporal", "stats"),
)
def periodogram_fixed_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT power (Goertzel read) of daily revenue at
    the calendar periods {p} days: spectral_frac = 2(A²+B²)/(T·SST),
    ≈ 1 when the series is a pure tone at that period, ≈ 0 under
    white noise — "does revenue have a weekly/monthly/quarterly/
    annual cycle" as one table, with the dominant period flagged.
    Completes the engine's time-domain reads (autocorr, seasonal
    decompose) with the frequency-domain one.

    The residue-grain trick: cos(2πt/p) depends on t only through
    t mod p, so the day series collapses FIRST to ≤p exact-decimal
    residue sums per period, and each A/B is an order-pinned fold of
    ≤p transcendental products (bounded, engine-identical chain).
    SST comes from exact Σx/Σx² (the Σx² decimal exceeds 2^53
    unscaled units → VARCHAR round-trip in the oracle, the extras52
    trap). Outputs are O(1)-magnitude fractions ROUND 6 — the cos/sin
    last-ulp engine divergence is ~1e-15 relative, far inside the
    rounding guard.

    Scale: one fact pass to day grain, one day pass to Σp residue
    rows; everything after is bounded. No global sort, no window over
    raw days.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("day", "d0").alias("t"), "rev"
    )
    tot = idx.agg(
        F.count("*").cast("long").alias("tn"),
        F.sum("rev").cast("double").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).cast("double").alias("q"),
    )
    periods = spark.createDataFrame(
        [(p,) for p in _PERIODS], "p int"
    )
    res = (
        idx.crossJoin(F.broadcast(periods))
        .groupBy("p", (F.col("t") % F.col("p")).alias("m"))
        .agg(
            F.sum("rev").cast("double").alias("sm"),
            F.count("*").cast("long").alias("cm"),
        )
    )

    def _fold(term: Column) -> Column:
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", term.alias("v")))),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    centered = F.col("sm") - F.col("cm") * F.col("s") / F.col("tn")
    ang = F.lit(2.0) * F.lit(math.pi) * F.col("m") / F.col("p")
    ab = (
        res.crossJoin(F.broadcast(tot))
        .groupBy("p")
        .agg(
            _fold(centered * F.cos(ang)).alias("a_p"),
            _fold(centered * F.sin(ang)).alias("b_p"),
            F.max("tn").alias("tn"),
            F.max(
                F.col("q") - F.col("s") * F.col("s") / F.col("tn")
            ).alias("sst"),
        )
    )
    frac = (
        F.lit(2.0)
        * (F.col("a_p") * F.col("a_p") + F.col("b_p") * F.col("b_p"))
        / (F.col("tn") * F.col("sst"))
    )
    w_all = Window.partitionBy(F.lit(1))
    return (
        ab.select(
            F.col("p").cast("int").alias("period_days"),
            frac.alias("_frac"),
        )
        .select(
            "period_days",
            F.round("_frac", 6).alias("spectral_frac"),
            F.when(F.col("_frac") == F.max("_frac").over(w_all), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_dominant"),
        )
        .orderBy("period_days")
    )


periodogram_fixed_freqs.__doc__ = periodogram_fixed_freqs.__doc__.format(
    p=_PERIODS
)


# ---------------------------------------------------------------------------
# Permutation entropy (Bandt–Pompe, d = 3) of the daily series
# ---------------------------------------------------------------------------

_PERM_ORACLE = f"""
WITH daily AS ({_DAILY_CTE}),
tri AS (
  SELECT rev AS x1,
         LEAD(rev, 1) OVER (ORDER BY day) AS x2,
         LEAD(rev, 2) OVER (ORDER BY day) AS x3
  FROM daily
),
coded AS (
  SELECT (CASE WHEN x1 > x2 THEN 4 ELSE 0 END
        + CASE WHEN x1 > x3 THEN 2 ELSE 0 END
        + CASE WHEN x2 > x3 THEN 1 ELSE 0 END) AS code
  FROM tri WHERE x3 IS NOT NULL
),
pat AS (
  SELECT code, CAST(COUNT(*) AS BIGINT) AS c FROM coded GROUP BY code
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pat),
ent AS (
  SELECT CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) / t.n)
                * LN(CAST(c AS DOUBLE) / t.n), 6) AS DECIMAL(18,6)))
              AS DOUBLE) AS neg_h,
         CAST(COUNT(*) AS BIGINT) AS n_patterns,
         MAX(t.n) AS n
  FROM pat CROSS JOIN tot t
),
top AS (
  SELECT code, c FROM pat ORDER BY c DESC, code LIMIT 1
)
SELECT e.n AS n_triples,
       e.n_patterns,
       ROUND(-e.neg_h / LN(6), 6) AS perm_entropy_norm,
       CAST(tp.code AS INTEGER) AS top_pattern_code,
       ROUND(CAST(tp.c AS DOUBLE) / e.n, 6) AS top_pattern_share
FROM ent e CROSS JOIN top tp
"""


@register(
    "permutation_entropy_daily", oracle=_PERM_ORACLE, tags=("temporal", "stats")
)
def permutation_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandt–Pompe permutation entropy (embedding dimension 3) of
    daily revenue: each consecutive triple maps to its ordinal
    pattern via three strict comparisons (the 3-bit code 4·[x1>x2] +
    2·[x1>x3] + [x2>x3]; codes 2 and 5 are transitivity-impossible,
    so ≤6 patterns appear; ties fall to the ≤ branch = positional
    order, the standard convention). Normalized entropy H/ln6 ≈ 1 ⇒
    ordinally random; ≪ 1 ⇒ exploitable temporal structure. Robust to
    any monotone transform of the series — the model-free complexity
    read that complements ``autocorr_daily_revenue`` (linear only).

    Determinism: revenues are exact decimals so every comparison is
    exact; pattern counts are BIGINTs; the ≤6 entropy terms are
    ROUND-6 then decimal-summed (the unigram_entropy pattern); the
    top pattern uses a (count DESC, code) total order.

    Scale: day-grain LEAD window (bounded series), hash-agg onto ≤6
    pattern rows, scalar entropy. The fact-sized stage is the daily
    rollup alone.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("day")
    tri = daily.select(
        F.col("rev").alias("x1"),
        F.lead("rev", 1).over(w).alias("x2"),
        F.lead("rev", 2).over(w).alias("x3"),
    ).filter(F.col("x3").isNotNull())
    code = (
        F.when(F.col("x1") > F.col("x2"), 4).otherwise(0)
        + F.when(F.col("x1") > F.col("x3"), 2).otherwise(0)
        + F.when(F.col("x2") > F.col("x3"), 1).otherwise(0)
    )
    pat = tri.select(code.alias("code")).groupBy("code").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = pat.agg(F.sum("c").cast("long").alias("n"))
    share = F.col("c").cast("double") / F.col("n")
    ent = pat.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.round(share * F.log(share), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("neg_h"),
        F.count("*").cast("long").alias("n_patterns"),
        F.max("n").alias("n"),
    )
    top = (
        pat.orderBy(F.desc("c"), "code")
        .limit(1)
        .select(F.col("code").alias("top_code"), F.col("c").alias("top_c"))
    )
    return ent.crossJoin(F.broadcast(top)).select(
        F.col("n").alias("n_triples"),
        "n_patterns",
        F.round(-F.col("neg_h") / F.lit(math.log(6.0)), 6).alias(
            "perm_entropy_norm"
        ),
        F.col("top_code").cast("int").alias("top_pattern_code"),
        F.round(F.col("top_c").cast("double") / F.col("n"), 6).alias(
            "top_pattern_share"
        ),
    )


# ---------------------------------------------------------------------------
# Goh–Barabási burstiness of inter-event times per type
# ---------------------------------------------------------------------------

_BURST_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS d
  FROM events
), st AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)))
                   AS VARCHAR) AS DOUBLE) AS q
  FROM gaps WHERE d IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       n AS n_gaps,
       ROUND(s / n / 1e6, 6) AS mean_gap_s,
       ROUND(SQRT((q - s * s / n) / (n - 1)) / (s / n), 6) AS cv,
       ROUND((SQRT((q - s * s / n) / (n - 1)) - s / n)
             / (SQRT((q - s * s / n) / (n - 1)) + s / n), 6) AS burstiness
FROM st
"""


@register(
    "burstiness_interevent", oracle=_BURST_ORACLE, tags=("events", "temporal", "stats")
)
def burstiness_interevent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) and CV = σ/μ of
    inter-event gaps per event type. B ≈ 0 ⇒ Poisson arrivals
    (exponential gaps, CV ≈ 1); B → 1 ⇒ heavy-tailed bursts; B < 0 ⇒
    pacemaker regularity. The inter-ARRIVAL companion of
    ``event_dispersion_index`` (binned counts): a stream can pass the
    hourly Fano check while bursting violently inside the hour — rate
    monitors need both reads before trusting their thresholds.

    Determinism: gaps are exact BIGINT microseconds (epoch_us; LAG
    over the (ts, event_id) total order); Σd is an exact integer sum
    cast to double; Σd² runs in DECIMAL(38,0) — unscaled units exceed
    2^53, so the oracle VARCHAR-round-trips the cast (extras52 trap);
    σ/μ/CV/B are pinned IEEE expressions over identical doubles,
    ROUND 6.

    Scale: the lag window shuffles by event_type (the standard
    sessionization partition; within-type order is the window sort),
    then one map-combined agg to the #types grain. At 100 TB the
    partition key would be (type, user) or (type, day-bucket) with
    boundary gap stitching — the sessionize_gaps_islands machinery.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = epoch_us("ts")
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    st = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("double").alias("s"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d").cast("decimal(38,0)"))
        .cast("double")
        .alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    mu = s / n
    sd = F.sqrt((q - s * s / n) / (n - 1))
    return st.select(
        "event_type",
        n.alias("n_gaps"),
        F.round(mu / F.lit(1e6), 6).alias("mean_gap_s"),
        F.round(sd / mu, 6).alias("cv"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    )
