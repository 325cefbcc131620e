"""Round-8 batch 26: experimentation depth and corpus diversity —

- ``cuped_variance_reduction``: CUPED (Controlled-experiment Using
  Pre-Experiment Data, Deng et al. 2013) on the customer panel —
  θ = cov(x,y)/var(x) from the pre-period (1996) vs experiment-period
  (1997) revenue of customers active in both years, and the variance
  the adjustment removes: var(y_adj) = var(y)·(1−ρ²). THE standard
  sensitivity boost every experimentation platform applies before
  reading an A/B test; the emitted var_reduction_pct is the
  "how much smaller can my experiment be" number.
- ``odds_ratio_gates``: the 2×2 effect-size report between being
  English-language and passing the char-length quality gate — odds
  ratio, relative risk, and the Woolf 95% CI on log-OR. Chi-square
  (``chi_square_independence``) says "associated?"; the OR/RR + CI
  row is how the association is actually REPORTED when both
  variables are binary — and the fairness read behind
  ``quality_gate_disparity``.
- ``hill_diversity_profile``: the Hill-number diversity profile of
  the corpus source mix — D₀ (richness), D₁ = exp(Shannon) and
  D₂ = 1/Simpson ("effective number of sources"), plus evenness
  D₁/D₀. One row that says whether "20 sources" is really 20 or
  effectively 3 — the number that decides if a source-stratified
  split (``stratified_kfold_assign``) is even meaningful.

Registry conventions (plans/registry.py): exact decimal sufficient
statistics; VARCHAR round-trip for wide-decimal casts (extras52
trap); transcendental terms ROUND-then-decimal-summed at bounded
grains; ROUND 6 outputs; NULLIF degenerate guards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# CUPED variance reduction (1996 pre-period -> 1997 outcome)
# ---------------------------------------------------------------------------

_PRE_YEAR, _EXP_YEAR = 1996, 1997

_CUPED_ORACLE = f"""
WITH cy AS (
  SELECT o_custkey AS cust, year(o_orderdate) AS y,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders
  WHERE year(o_orderdate) IN ({_PRE_YEAR}, {_EXP_YEAR})
  GROUP BY 1, 2
), panel AS (
  SELECT p.cust,
         CAST(p.r AS DECIMAL(18,2)) AS x,
         CAST(e.r AS DECIMAL(18,2)) AS y
  FROM cy p JOIN cy e ON e.cust = p.cust
  WHERE p.y = {_PRE_YEAR} AND e.y = {_EXP_YEAR}
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM panel
), st AS (
  SELECT n,
         (sxy - sx * sy / n) / (n - 1) AS cov_xy,
         (sxx - sx * sx / n) / (n - 1) AS var_x,
         (syy - sy * sy / n) / (n - 1) AS var_y
  FROM mom
)
SELECT n AS n_customers,
       ROUND(cov_xy / var_x, 6) AS theta,
       ROUND(cov_xy / SQRT(var_x * var_y), 6) AS corr_pre_post,
       ROUND(var_y, 6) AS var_outcome,
       ROUND(var_y - cov_xy * cov_xy / var_x, 6) AS var_cuped,
       ROUND(100.0 * (cov_xy * cov_xy / var_x) / var_y, 6)
         AS var_reduction_pct
FROM st
"""


@register("cuped_variance_reduction", oracle=_CUPED_ORACLE, tags=("stats", "agg"))
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED over the {p}→{e} customer revenue panel: the adjustment
    coefficient θ = cov(x,y)/var(x), the pre/post correlation, and
    the variance identity var(y − θ(x−x̄)) = var(y)(1−ρ²) — emitted
    as var_reduction_pct, the fraction of outcome variance the
    pre-period covariate removes before an experiment is even read.
    ρ² is the whole story: at this fixture's weak year-to-year
    correlation the reduction is honest-small; on a real panel it is
    routinely 30-50%, halving required sample sizes. Pairs with
    ``diff_in_diff_promo`` (bias correction) and ``welch_ttest_promo``
    (the read CUPED sharpens).

    Determinism: the panel is customers with revenue in BOTH years
    (matched-model rule); all five moments are exact decimal sums —
    the three second-order moments exceed 2^53 unscaled units, so the
    oracle VARCHAR-round-trips their casts (extras52 trap);
    covariance/variances/θ/ρ are pinned IEEE expressions, ROUND 6.

    Scale: one year-filtered fact pass to (customer, year) grain, a
    customer-keyed self-join (co-partitioned), one scalar moment agg.
    Nothing quadratic, nothing collected.
    """
    o = read_table(spark, sf_dir, "orders")
    cy = (
        o.filter(F.year("o_orderdate").isin(_PRE_YEAR, _EXP_YEAR))
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    pre = cy.filter(F.col("y") == _PRE_YEAR).select(
        "cust", F.col("r").alias("x")
    )
    post = cy.filter(F.col("y") == _EXP_YEAR).select(
        "cust", F.col("r").alias("y2")
    )
    panel = pre.join(post, "cust")
    x, y = F.col("x"), F.col("y2")
    mom = panel.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    vx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    vy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    return mom.select(
        n.alias("n_customers"),
        F.round(cov / vx, 6).alias("theta"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr_pre_post"),
        F.round(vy, 6).alias("var_outcome"),
        F.round(vy - cov * cov / vx, 6).alias("var_cuped"),
        F.round(F.lit(100.0) * (cov * cov / vx) / vy, 6).alias(
            "var_reduction_pct"
        ),
    )


# ---------------------------------------------------------------------------
# Odds ratio / relative risk with Woolf CI (lang=en vs length gate)
# ---------------------------------------------------------------------------

_OR_ORACLE = """
WITH flags AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS x,
         CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END AS y
  FROM documents
), cells AS (
  SELECT CAST(COUNT(*) FILTER (WHERE x = 1 AND y = 1) AS BIGINT) AS a,
         CAST(COUNT(*) FILTER (WHERE x = 1 AND y = 0) AS BIGINT) AS b,
         CAST(COUNT(*) FILTER (WHERE x = 0 AND y = 1) AS BIGINT) AS c,
         CAST(COUNT(*) FILTER (WHERE x = 0 AND y = 0) AS BIGINT) AS d
  FROM flags
)
SELECT a AS n_en_pass, b AS n_en_fail, c AS n_other_pass, d AS n_other_fail,
       ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
         AS odds_ratio,
       ROUND((CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d)),
             6) AS relative_risk,
       ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.959964 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
         AS or_ci_lo,
       ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.959964 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
         AS or_ci_hi
FROM cells
"""


@register("odds_ratio_gates", oracle=_OR_ORACLE, tags=("stats", "text"))
def odds_ratio_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and relative risk of passing the char-length
    quality gate for English vs non-English documents, with the
    Woolf (log-OR) 95% CI — the standard 2×2 effect REPORT behind the
    engine's fairness reads: ``chi_square_independence`` tests
    association, ``quality_gate_disparity`` lists per-group rates;
    this row says "en docs have OR× the odds of passing, CI [lo,hi]"
    — significant iff the CI excludes 1. A CI spanning 1 on this
    fixture is the expected null read; the machinery is the witness.

    Determinism: four exact BIGINT cells from one map-combined pass;
    OR/RR are pinned ratios; the CI uses the literal 1.959964
    (z_{{0.975}} to 6 dp, same constant both sides) over LN/SQRT/EXP
    of identical doubles, ROUND 6. Degenerate zero cells would NULL
    the CI identically in both engines (LN/division of zero →
    NULL-guarded by the data's non-empty cells; asserted in pytest).

    Scale: one corpus pass to 4 cells; all math on one row.
    """
    d = read_table(spark, sf_dir, "documents")
    flags = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("x"),
        F.when(F.col("n_chars") >= 128, 1).otherwise(0).alias("y"),
    )
    cells = flags.agg(
        F.sum(F.when((F.col("x") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("x") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("x") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("x") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    a, b, c, dd = (F.col(k).cast("double") for k in ("a", "b", "c", "d"))
    orr = a * dd / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)
    z = F.lit(1.959964)
    return cells.select(
        F.col("a").alias("n_en_pass"),
        F.col("b").alias("n_en_fail"),
        F.col("c").alias("n_other_pass"),
        F.col("d").alias("n_other_fail"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round((a / (a + b)) / (c / (c + dd)), 6).alias("relative_risk"),
        F.round(F.exp(F.log(orr) - z * se), 6).alias("or_ci_lo"),
        F.round(F.exp(F.log(orr) + z * se), 6).alias("or_ci_hi"),
    )


# ---------------------------------------------------------------------------
# Hill-number diversity profile of the source mix
# ---------------------------------------------------------------------------

_HILL_ORACLE = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS d0
  FROM per
), terms AS (
  SELECT t.n, t.d0,
         ROUND((CAST(c AS DOUBLE) / t.n) * LN(CAST(c AS DOUBLE) / t.n), 6)
           AS hterm,
         ROUND((CAST(c AS DOUBLE) / t.n) * (CAST(c AS DOUBLE) / t.n), 12)
           AS sterm
  FROM per CROSS JOIN tot t
), st AS (
  SELECT MAX(n) AS n, MAX(d0) AS d0,
         CAST(SUM(CAST(hterm AS DECIMAL(18,6))) AS DOUBLE) AS neg_h,
         CAST(SUM(CAST(sterm AS DECIMAL(18,12))) AS DOUBLE) AS simpson
  FROM terms
)
SELECT n AS n_docs,
       d0 AS hill_d0,
       ROUND(EXP(-neg_h), 6) AS hill_d1,
       ROUND(1.0 / simpson, 6) AS hill_d2,
       ROUND(EXP(-neg_h) / d0, 6) AS evenness
FROM st
"""


@register("hill_diversity_profile", oracle=_HILL_ORACLE, tags=("llm", "agg", "stats"))
def hill_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hill-number diversity profile of the corpus source mix:
    D₀ = source richness, D₁ = exp(Shannon entropy) ("effective
    number of equally-common sources"), D₂ = 1/Simpson (dominance-
    weighted effective number), and evenness D₁/D₀. D₀ ≫ D₂ means a
    few sources dominate — the one-row read that decides whether
    source-stratified machinery (``stratified_kfold_assign``,
    ``domain_mixture_weights``) has anything real to stratify over.
    D₀ ≥ D₁ ≥ D₂ always (Hill numbers are monotone in q); asserted
    in pytest.

    Determinism: source counts are exact BIGINTs; the ≤|sources|
    entropy terms are ROUND-6-then-decimal-summed (unigram_entropy
    pattern) and the Simpson terms ROUND-12 (p² values are tiny);
    EXP/division over identical doubles, ROUND 6.

    Scale: one corpus hash-agg to source grain; profile math on one
    row of bounded sums.
    """
    d = read_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count("*").cast("long").alias("c"))
    tot = per.agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("d0"),
    )
    p = F.col("c").cast("double") / F.col("n")
    st = per.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("d0").alias("d0"),
        F.sum(F.round(p * F.log(p), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("neg_h"),
        F.sum(F.round(p * p, 12).cast("decimal(18,12)"))
        .cast("double")
        .alias("simpson"),
    )
    return st.select(
        F.col("n").alias("n_docs"),
        F.col("d0").alias("hill_d0"),
        F.round(F.exp(-F.col("neg_h")), 6).alias("hill_d1"),
        F.round(F.lit(1.0) / F.col("simpson"), 6).alias("hill_d2"),
        F.round(F.exp(-F.col("neg_h")) / F.col("d0"), 6).alias("evenness"),
    )
