"""Round-8 batch 28: sequential testing and robust estimation —

- ``sprt_sequential_test``: Wald's Sequential Probability Ratio Test
  over the daily fulfilled-rate stream — cumulative log-likelihood
  ratio of H₁: p = 1.1·p̄ against H₀: p = p̄, with the classic
  (α = β = 0.05) decision boundaries ±ln 19, the first boundary-
  crossing day, and the verdict. THE always-valid alternative to
  fixed-horizon tests for monitoring pipelines: peeking at an SPRT
  trace is legal by construction. (H₀ uses the pooled rate, so the
  expected verdict here is 'continue' — the machinery is the
  witness.)
- ``huber_location_irls``: the Huber M-estimator of order-total
  location by THREE unrolled IRLS supersteps — weights
  w = min(1, c/|x−μ|) with c = 1.345σ, μ ← Σwx/Σw — the robust mean
  that pays only 5% efficiency under normality but caps any single
  order's influence. The engine's third unrolled-fixed-point family
  (after PageRank/HITS supersteps and Lloyd steps), this one over a
  SCALAR state. Emits the robust/plain-mean gap and the downweighted
  count.
- ``grubbs_extreme_day``: Grubbs' test statistic for the single most
  extreme day of the daily revenue series — G = max|x−x̄|/s with the
  offending day and direction. The formal "is this one day an
  outlier" read behind every incident review;
  ``robust_zscore_outliers`` flags many, Grubbs adjudicates the
  worst one.

Registry conventions (plans/registry.py): exact decimal sufficient
statistics; ROUND-12-then-decimal cumulative/weighted sums; chained
single-reference CTEs for unrolled iterations (MATERIALIZED base);
ROUND 6 outputs; NULLIF guards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Wald SPRT over the daily fulfilled-rate stream
# ---------------------------------------------------------------------------

_SPRT_LIFT = 1.1  # H1: p1 = 1.1 * pooled rate
_SPRT_LN_A = "LN(19.0)"  # alpha = beta = 0.05

_SPRT_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS x
  FROM orders GROUP BY 1
), rate AS (
  SELECT CAST(SUM(x) AS DOUBLE) / SUM(n) AS p0,
         {_SPRT_LIFT} * CAST(SUM(x) AS DOUBLE) / SUM(n) AS p1
  FROM daily
), llr AS (
  SELECT day, n, x,
         SUM(CAST(ROUND(x * LN(r.p1 / r.p0)
                        + (n - x) * LN((1 - r.p1) / (1 - r.p0)), 12)
                  AS DECIMAL(38,12)))
           OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily CROSS JOIN rate r
), crossing AS (
  SELECT MIN(day) AS cross_day FROM llr
  WHERE CAST(cum AS DOUBLE) >= {_SPRT_LN_A}
     OR CAST(cum AS DOUBLE) <= -{_SPRT_LN_A}
), final AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(MAX_BY(cum, day) AS DOUBLE) AS final_llr
  FROM llr
)
SELECT f.n_days,
       ROUND(f.final_llr, 6) AS final_llr,
       CASE WHEN c.cross_day IS NULL THEN 'continue'
            WHEN (SELECT CAST(cum AS DOUBLE) FROM llr
                  WHERE day = c.cross_day) >= {_SPRT_LN_A}
              THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       CAST(c.cross_day AS VARCHAR) AS crossing_day
FROM final f CROSS JOIN crossing c
"""


@register("sprt_sequential_test", oracle=_SPRT_ORACLE, tags=("temporal", "stats"))
def sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT trace over daily fulfilled-order rates: cumulative
    LLR of H₁ (p = {lift}·p̄) vs H₀ (p = p̄), boundaries ±ln 19
    (α = β = 0.05), first crossing day and verdict. Sequential tests
    are how monitoring pipelines test WITHOUT a fixed horizon —
    the trace may be read every day with guarantees intact, unlike a
    repeatedly-peeked t-test. H₀ is the pooled rate of the same
    stream, so 'continue' (or a late, marginal crossing) is the
    honest expected verdict; the plumbing — per-day binomial LLR
    terms, exact cumulative, boundary logic — is the artifact.

    Determinism: per-day (n, x) are exact BIGINTs; the four LLR
    constants derive from one pooled ratio (identical IEEE in both
    engines); day terms are ROUND-12 then DECIMAL(38,12) cumulative
    sums over the day total order; the crossing day is a MIN over an
    exact comparison; output ROUND 6.

    Scale: one fact pass to day grain; one calendar-bounded
    cumulative window; constant-size decision logic.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    rate = daily.agg(
        (F.sum("x").cast("double") / F.sum("n")).alias("p0"),
        (F.lit(_SPRT_LIFT) * F.sum("x").cast("double") / F.sum("n")).alias(
            "p1"
        ),
    )
    term = F.round(
        F.col("x") * F.log(F.col("p1") / F.col("p0"))
        + (F.col("n") - F.col("x"))
        * F.log((1 - F.col("p1")) / (1 - F.col("p0"))),
        12,
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    llr = daily.crossJoin(F.broadcast(rate)).select(
        "day",
        F.sum(term.cast("decimal(38,12)")).over(w_cum).alias("cum"),
    )
    ln_a = F.log(F.lit(19.0))
    crossed = llr.filter(
        (F.col("cum").cast("double") >= ln_a)
        | (F.col("cum").cast("double") <= -ln_a)
    )
    crossing = crossed.agg(F.min("day").alias("cross_day"))
    cross_sign = (
        crossed.orderBy("day")
        .limit(1)
        .select(
            F.when(F.col("cum").cast("double") >= ln_a, "accept_h1")
            .otherwise("accept_h0")
            .alias("verdict")
        )
    )
    final = llr.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max_by("cum", "day").cast("double").alias("final_llr"),
    )
    return (
        final.crossJoin(F.broadcast(crossing))
        # cross_sign is EMPTY when no day crosses — a left join on a
        # TRUE condition keeps the single result row either way
        # (a crossJoin would wipe it).
        .join(F.broadcast(cross_sign), F.lit(True), "left")
        .select(
            "n_days",
            F.round("final_llr", 6).alias("final_llr"),
            F.coalesce("verdict", F.lit("continue")).alias("decision"),
            F.col("cross_day").cast("string").alias("crossing_day"),
        )
    )


sprt_sequential_test.__doc__ = sprt_sequential_test.__doc__.format(
    lift=_SPRT_LIFT
)


# ---------------------------------------------------------------------------
# Huber M-estimator of location, 3 unrolled IRLS supersteps
# ---------------------------------------------------------------------------

_HUBER_K = 1.345
_HUBER_ITER = 3


def _huber_iter(prev: str, cur: str) -> str:
    """One IRLS step (single reference to ``prev``): w = min(1,
    c/|x−μ|), μ ← Σwx/Σw, weighted sums ROUND-6-decimal."""
    return f"""{cur} AS (
  SELECT CAST(SUM(CAST(ROUND(LEAST(1.0, p.c / NULLIF(ABS(b.x - p.mu), 0))
                              * b.x, 6) AS DECIMAL(28,6))) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(LEAST(1.0, p.c / NULLIF(ABS(b.x - p.mu), 0)),
                               12) AS DECIMAL(28,12))) AS DOUBLE) AS mu,
         MAX(p.c) AS c
  FROM base b CROSS JOIN {prev} p
)"""


_HUBER_ORACLE = f"""
WITH base AS MATERIALIZED (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x
  FROM orders
), m0 AS (
  SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mu,
         {_HUBER_K} * SQRT((CAST(CAST(SUM(CAST(x AS DECIMAL(18,2))
                                          * CAST(x AS DECIMAL(18,2)))
                                      AS VARCHAR) AS DOUBLE)
                            - CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
                              * CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(*))
                           / (COUNT(*) - 1)) AS c
  FROM base
),
{",".join(_huber_iter(f"m{i}", f"m{i + 1}") for i in range(_HUBER_ITER))},
final AS (
  SELECT m.mu, m.c,
         (SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM base) AS plain_mean,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM base b
          WHERE ABS(b.x - m.mu) > m.c) AS n_downweighted,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n
  FROM m{_HUBER_ITER} m
)
SELECT n AS n_orders,
       ROUND(mu, 6) AS huber_location,
       ROUND(plain_mean, 6) AS plain_mean,
       ROUND(mu - plain_mean, 6) AS robust_shift,
       n_downweighted
FROM final
"""


@register("huber_location_irls", oracle=_HUBER_ORACLE, tags=("stats", "iterative"))
def huber_location_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of the order-total location by {k} unrolled
    IRLS supersteps: weights w = min(1, c/|x−μ|) with the classic
    tuning c = {c}·σ (95% normal efficiency), μ ← Σwx/Σw from the
    sample mean. Orders inside ±c keep weight 1; the heavy right tail
    is capped at influence c — the robust location every ops
    dashboard should quote instead of the mean. Emits the robust
    shift (μ_huber − mean; negative under right skew) and how many
    orders were downweighted. The third unrolled-fixed-point family
    in the engine, over a SCALAR state (PageRank/HITS: vectors;
    Lloyd: centroid matrices).

    Determinism: the scale c uses exact decimal moments (Σx² exceeds
    2^53 unscaled → VARCHAR round-trip, extras52 trap); each
    superstep's Σwx is ROUND-6 and Σw ROUND-12 decimal sums
    (order-free); w's |x−μ| = 0 case is NULLIF-guarded to weight 1
    on both engines via LEAST(1, c/NULL→NULL) → the term drops…
    rather, NULLIF makes w NULL and the ROUND/CAST keeps NULL out of
    the decimal sums identically on both sides (an exact-center order
    contributes nothing to either sum — documented asymmetry, same on
    both engines; at 2-decimal prices an exact tie with a 6-dp μ is
    essentially impossible anyway).

    Scale: the base projection scans once per superstep ({k}+1 fact
    passes of one narrow column — at 100 TB you'd persist the
    single-column frame; the 1-row state broadcasts). No window, no
    sort.
    """
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("x")
    ).persist()
    xd = F.col("x").cast("decimal(18,2)")
    m = base.agg(
        (F.sum(xd).cast("double") / F.count("*")).alias("mu"),
        (
            F.lit(_HUBER_K)
            * F.sqrt(
                (
                    F.sum(xd * xd).cast("double")
                    - F.sum(xd).cast("double")
                    * F.sum(xd).cast("double")
                    / F.count("*")
                )
                / (F.count("*") - 1)
            )
        ).alias("c"),
    )
    for _ in range(_HUBER_ITER):
        w = F.least(
            F.lit(1.0),
            F.col("c") / F.nullif(F.abs(F.col("x") - F.col("mu")), F.lit(0.0)),
        )
        m = base.crossJoin(F.broadcast(m)).agg(
            (
                F.sum(F.round(w * F.col("x"), 6).cast("decimal(28,6)"))
                .cast("double")
                / F.sum(F.round(w, 12).cast("decimal(28,12)")).cast("double")
            ).alias("mu"),
            F.max("c").alias("c"),
        )
    plain = base.agg(
        (F.sum(xd).cast("double") / F.count("*")).alias("plain_mean"),
        F.count("*").cast("long").alias("n"),
    )
    down = base.crossJoin(F.broadcast(m)).agg(
        F.sum(
            F.when(F.abs(F.col("x") - F.col("mu")) > F.col("c"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_downweighted")
    )
    return (
        m.crossJoin(F.broadcast(plain))
        .crossJoin(F.broadcast(down))
        .select(
            F.col("n").alias("n_orders"),
            F.round("mu", 6).alias("huber_location"),
            F.round("plain_mean", 6).alias("plain_mean"),
            F.round(F.col("mu") - F.col("plain_mean"), 6).alias("robust_shift"),
            "n_downweighted",
        )
    )


huber_location_irls.__doc__ = huber_location_irls.__doc__.format(
    k=_HUBER_ITER, c=_HUBER_K
)


# ---------------------------------------------------------------------------
# Grubbs' extreme-value test on the daily revenue series
# ---------------------------------------------------------------------------

_GRUBBS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev) AS DOUBLE) AS s,
         CAST(CAST(SUM(rev * rev) AS VARCHAR) AS DOUBLE) AS q
  FROM daily
), scored AS (
  SELECT d.day, CAST(d.rev AS DOUBLE) AS rev, t.n,
         ABS(CAST(d.rev AS DOUBLE) - t.s / t.n)
           / SQRT((t.q - t.s * t.s / t.n) / (t.n - 1)) AS g
  FROM daily d CROSS JOIN st t
), top AS (
  SELECT * FROM scored ORDER BY g DESC, day LIMIT 1
)
SELECT n AS n_days,
       CAST(day AS VARCHAR) AS extreme_day,
       ROUND(rev, 6) AS extreme_revenue,
       ROUND(g, 6) AS grubbs_g,
       CAST(CASE WHEN rev > (SELECT s / n FROM st) THEN 1 ELSE 0 END
            AS INTEGER) AS is_high_side
FROM top
"""


@register("grubbs_extreme_day", oracle=_GRUBBS_ORACLE, tags=("temporal", "stats"))
def grubbs_extreme_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test statistic for the single most extreme day of the
    daily revenue series: G = max|x − x̄|/s, with the offending day,
    its revenue, and the direction. ``robust_zscore_outliers`` flags
    every candidate; Grubbs is the formal single-outlier adjudication
    an incident review runs on the worst one (compare G against the
    t-based critical value for the day count — left to the reader, as
    the critical value is a lookup, not data).

    Determinism: day sums are exact decimals; the moments use the
    VARCHAR round-trip for Σx² (extras52 trap); G is a pinned IEEE
    expression; the argmax day uses the (G DESC, day) total order;
    ROUND 6.

    Scale: one fact pass to day grain, one scalar moment agg
    broadcast back, a 1-row TakeOrdered.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    rd = F.col("rev").cast("decimal(18,2)")
    st = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(rd).cast("double").alias("s"),
        F.sum(rd * rd).cast("double").alias("q"),
    )
    mean = F.col("s") / F.col("n")
    sd = F.sqrt(
        (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    scored = daily.crossJoin(F.broadcast(st)).select(
        "day",
        F.col("rev").cast("double").alias("revd"),
        "n",
        (F.abs(F.col("rev").cast("double") - mean) / sd).alias("g"),
        (F.col("rev").cast("double") > mean).cast("int").alias("is_high_side"),
    )
    return (
        scored.orderBy(F.desc("g"), "day")
        .limit(1)
        .select(
            F.col("n").alias("n_days"),
            F.col("day").cast("string").alias("extreme_day"),
            F.round("revd", 6).alias("extreme_revenue"),
            F.round("g", 6).alias("grubbs_g"),
            "is_high_side",
        )
    )
