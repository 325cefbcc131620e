"""Round-8 batch 13: allocation, projection, and forecast-evaluation
audits —

- ``neyman_allocation_sample``: variance-optimal (Neyman) stratified
  sampling allocation — n_h ∝ N_h·S_h — from one sufficient-stats
  pass (n, Σx, Σx² per stratum, the welch_ttest pattern), integerized
  by the largest-remainder rule (the Hamilton allocator extras9
  registers for proportional quotas, here driven by N·S weights).
  Completes the sampling family: ``stratified_sample`` applies FIXED
  rates; this derives the rates the estimator-variance-minimizing way.
- ``jl_projection_distortion``: Johnson-Lindenstrauss audit — project
  the 64-dim embeddings to 16 dims through a FIXED ±1 sign matrix
  (module literal, md5-derived — both engines read the same
  constants) and measure squared-distance distortion over the exact
  top-10 neighbor pairs of the 5 standard probe queries. The
  "how much geometry survives the cheap projection" number that
  justifies (or forbids) running ANN on projected vectors.
- ``forecast_mase_seasonal``: MASE-style forecast evaluation on the
  daily-revenue series — seasonal-naive (t−7) vs the naive (t−1)
  scaling baseline, mean absolute errors computed EXACTLY in decimal
  money. The evaluation half of the forecasting surface
  (holt_linear_forecast is the model half).

Registry conventions (plans/registry.py): decimal-exact money sums;
sufficient-stats double algebra on bit-identical inputs; ROUND 6 at
output; bounded-grain windows only (strata ≤5, day grain ≤2.4k rows,
probe pairs ≤50).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.plans.extras8 import _NDCG_QUERIES
from ucl_data_pipeline_spark.plans.llm_ops import brute_force_topk
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Neyman allocation over order-priority strata
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 500

_NEYMAN_ORACLE = f"""
WITH st AS (
  SELECT o_orderpriority AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s_x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s_xx
  FROM orders GROUP BY o_orderpriority
), wgt AS (
  SELECT stratum, n_h,
         ROUND(s_x / n_h, 6) AS mean_price,
         ROUND(sqrt((s_xx - s_x * s_x / n_h) / (n_h - 1)), 6) AS sd_price,
         CAST(ROUND(n_h * ROUND(sqrt((s_xx - s_x * s_x / n_h) / (n_h - 1)), 6),
                    6) AS DECIMAL(28,6)) AS w_h
  FROM st
), tot AS (
  SELECT CAST(SUM(w_h) AS DOUBLE) AS w_tot FROM wgt
), shares AS (
  SELECT w.stratum, w.n_h, w.mean_price, w.sd_price,
         FLOOR({_NEYMAN_BUDGET} * CAST(w.w_h AS DOUBLE) / t.w_tot) AS fl,
         {_NEYMAN_BUDGET} * CAST(w.w_h AS DOUBLE) / t.w_tot
           - FLOOR({_NEYMAN_BUDGET} * CAST(w.w_h AS DOUBLE) / t.w_tot) AS rem
  FROM wgt w CROSS JOIN tot t
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk,
         SUM(fl) OVER () AS fl_tot
  FROM shares
)
SELECT stratum, n_h AS n_rows, mean_price, sd_price,
       CAST(fl + CASE WHEN rk <= {_NEYMAN_BUDGET} - fl_tot THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_n,
       ROUND(CAST(fl + CASE WHEN rk <= {_NEYMAN_BUDGET} - fl_tot
                            THEN 1 ELSE 0 END AS DOUBLE)
             / CAST(n_h AS DOUBLE), 6) AS samp_rate
FROM ranked
"""


@register(
    "neyman_allocation_sample",
    oracle=_NEYMAN_ORACLE,
    tags=("sample", "stats", "agg"),
)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (variance-optimal) stratified-sample allocation of a
    {B}-row budget across order-priority strata: n_h ∝ N_h·S_h, which
    minimizes the variance of the stratified mean estimator for a
    fixed total sample size — the survey-sampling optimum a metrics
    platform should use instead of proportional allocation whenever
    stratum variances differ. Integerization by the largest-remainder
    rule (floors + top-up by fractional remainder, tie-broken by
    stratum), so allocations sum to the budget exactly.

    Determinism: per-stratum (n, Σx, Σx²) accumulate in DECIMAL
    (exact, order-free) and cast to double ONCE; S_h is the standard
    sufficient-stats variance (the welch_ttest spelling) with sqrt
    ROUND 6; weights N_h·S_h re-enter exact DECIMAL(28,6) for the
    order-free total; shares/floors/remainders are then pure IEEE
    doubles on bit-identical inputs, ranked by a total order.

    Scale: ONE map-side-combinable hash-agg over the fact table to 5
    stratum rows; everything after is bounded-grain (the keyless
    ranking window runs on ≤5 rows — the adjudicated pattern). This
    is the sufficient-statistics shape: no second pass, no per-row
    variance updates.
    """
    o = read_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    st = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum(x).cast("double").alias("s_x"),
        F.sum(x * x).cast("double").alias("s_xx"),
    )
    n_h, s_x, s_xx = F.col("n_h"), F.col("s_x"), F.col("s_xx")
    sd = F.round(F.sqrt((s_xx - s_x * s_x / n_h) / (n_h - 1)), 6)
    wgt = st.select(
        "stratum",
        "n_h",
        F.round(s_x / n_h, 6).alias("mean_price"),
        sd.alias("sd_price"),
        F.round(n_h * sd, 6).cast("decimal(28,6)").alias("w_h"),
    )
    tot = wgt.agg(F.sum("w_h").cast("double").alias("w_tot"))
    share = (
        F.lit(_NEYMAN_BUDGET) * F.col("w_h").cast("double") / F.col("w_tot")
    )
    shares = wgt.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        "mean_price",
        "sd_price",
        F.floor(share).alias("fl"),
        (share - F.floor(share)).alias("rem"),
    )
    w_all = Window.partitionBy(F.lit(1))
    ranked = shares.select(
        "stratum",
        "n_h",
        "mean_price",
        "sd_price",
        "fl",
        F.row_number()
        .over(w_all.orderBy(F.col("rem").desc(), "stratum"))
        .alias("rk"),
        F.sum("fl").over(w_all).alias("fl_tot"),
    )
    alloc = F.col("fl") + F.when(
        F.col("rk") <= F.lit(_NEYMAN_BUDGET) - F.col("fl_tot"), 1
    ).otherwise(0)
    return ranked.select(
        "stratum",
        F.col("n_h").alias("n_rows"),
        "mean_price",
        "sd_price",
        alloc.cast("long").alias("alloc_n"),
        F.round(alloc.cast("double") / F.col("n_h").cast("double"), 6).alias(
            "samp_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection distortion audit
# ---------------------------------------------------------------------------

_JL_D = 64
_JL_K = 16
_JL_PAIR_K = 10


def _jl_sign(i: int, j: int) -> float:
    """Deterministic ±1 from md5 — computed ONCE here in Python; both
    engines consume the resulting literals."""
    h = int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


_JL_ROWS = [[_jl_sign(i, j) for i in range(_JL_D)] for j in range(_JL_K)]

_SQL_JL_ROWS = [
    "[" + ", ".join(repr(v) for v in row) + "]" for row in _JL_ROWS
]

_SQL_JL_D2P = " + ".join(
    f"(list_dot_product(diff, {_SQL_JL_ROWS[j]}) / 4.0)"
    f" * (list_dot_product(diff, {_SQL_JL_ROWS[j]}) / 4.0)"
    for j in range(_JL_K)
)

_JL_ORACLE = f"""
WITH topk AS (
  SELECT q.vec_id AS query_id, q.embedding AS qe,
         c.vec_id AS neighbor_id, c.embedding AS ce,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                     CAST(c.embedding AS DOUBLE[]))
             / nullif(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[]))),
                      0.0) DESC,
             c.vec_id) AS rnk
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _NDCG_QUERIES}
   AND c.vec_id <> q.vec_id
  QUALIFY rnk <= {_JL_PAIR_K}
), diffd AS (
  SELECT query_id, neighbor_id,
         list_transform(generate_series(1, {_JL_D}),
                        i -> CAST(qe[i] AS DOUBLE) - CAST(ce[i] AS DOUBLE))
           AS diff
  FROM topk
), ratio AS (
  SELECT query_id,
         ROUND(({_SQL_JL_D2P})
               / NULLIF(list_dot_product(diff, diff), 0.0), 6) AS r
  FROM diffd
)
SELECT query_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_ratio,
       MIN(r) AS min_ratio,
       MAX(r) AS max_ratio
FROM ratio GROUP BY query_id
"""


@register(
    "jl_projection_distortion",
    oracle=_JL_ORACLE,
    tags=("vector", "sketch", "gate"),
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit: squared distances of
    the 5 probe queries' exact top-{k} neighbor pairs, before vs after
    projecting 64-dim embeddings to {p} dims through a fixed ±1 sign
    matrix scaled by 1/√{p} (the database-friendly JL construction —
    Achlioptas 2003: ±1 entries preserve the lemma's guarantees while
    the projection is pure dot products). Per query: mean/min/max of
    the distance-squared ratio. The JL lemma predicts concentration
    near 1 at ε ≈ √(ln n / k); this artifact measures what the {p}-dim
    ANN index would actually do to THESE vectors' geometry — run it
    before trading 4× bandwidth for recall.

    Determinism: the sign matrix is a module literal (md5-derived in
    Python once — neither engine hashes anything); all distances are
    the engine's sequential-fold dot products (bit-compatible with
    list_dot_product); the 16-term projected distance sums in pinned
    written order; per-pair ratios ROUND 6 then decimal-mean.

    Scale: the bounded probe shape (brute_force_topk's structurally
    capped 5-query broadcast) — the audit touches ≤50 pairs no matter
    the corpus; the projection matrix is 1 KB of literals in the
    plan. Auditing a full corpus sample instead would be one
    hash-bucketed sample scan; the shape stays scan → project.
    """
    e = read_table(spark, sf_dir, "embeddings")
    queries = e.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 100 * _NDCG_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    topk = brute_force_topk(
        e.select("vec_id", "embedding"), queries, _JL_PAIR_K, _NDCG_QUERIES
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    diffd = (
        topk.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.zip_with(
                VX.as_double("qe"), VX.as_double("ce"), lambda a, b: a - b
            ).alias("diff"),
        )
    )
    jl_rows = [
        F.array(*[F.lit(v) for v in row]) for row in _JL_ROWS
    ]
    proj_terms = None
    for row in jl_rows:
        t = VX.dot(F.col("diff"), row) / F.lit(4.0)
        sq = t * t
        proj_terms = sq if proj_terms is None else proj_terms + sq
    ratio = F.round(
        proj_terms / F.nullif(VX.dot("diff", "diff"), F.lit(0.0)), 6
    )
    return (
        diffd.select("query_id", ratio.alias("r"))
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (
                F.sum(F.col("r").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mean_ratio"),
            F.min("r").alias("min_ratio"),
            F.max("r").alias("max_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# MASE forecast evaluation on the daily revenue series
# ---------------------------------------------------------------------------

_MASE_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_orderdate
), lagged AS (
  SELECT d, rev,
         LAG(rev, 1) OVER (ORDER BY d) AS l1,
         LAG(rev, 7) OVER (ORDER BY d) AS l7
  FROM daily
), ev AS (
  SELECT ABS(rev - l1) AS e1, ABS(rev - l7) AS e7
  FROM lagged WHERE l7 IS NOT NULL
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
  CAST(COUNT(*) AS BIGINT) AS n_eval,
  ROUND(CAST(SUM(e1) AS DOUBLE) / COUNT(*), 6) AS mae_naive,
  ROUND(CAST(SUM(e7) AS DOUBLE) / COUNT(*), 6) AS mae_seasonal,
  ROUND((CAST(SUM(e7) AS DOUBLE) / COUNT(*))
        / (CAST(SUM(e1) AS DOUBLE) / COUNT(*)), 6) AS mase_seasonal
FROM ev
"""


@register(
    "forecast_mase_seasonal",
    oracle=_MASE_ORACLE,
    tags=("temporal", "stats", "window"),
)
def forecast_mase_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style forecast evaluation on daily revenue: the
    seasonal-naive forecast (value 7 observed days back) scored as
    mean absolute error relative to the naive baseline (previous
    observed day) over the same evaluation span — the scale-free
    forecast-accuracy read (Hyndman & Koehler 2006) that tells a
    monitoring pipeline whether weekly seasonality is real signal
    (MASE < 1) or noise (≥ 1). Lags run over OBSERVED days — the
    series' native grain; calendar gaps would need a generate-series
    spine, which this fixture's dense dates don't.

    Determinism: revenue and both error columns stay in exact
    DECIMAL end-to-end (money in, |difference| out — no float until
    the final MAE divisions); the two MAEs and their ratio are three
    IEEE ops on bit-identical inputs, ROUND 6.

    Scale: one fact-table hash-agg to the ≤2.4k-row day grain, one
    bounded-grain ordered window for both lags (the adjudicated
    single-partition-on-derived-grain pattern), one singleton agg.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "rev",
        F.lag("rev", 1).over(w).alias("l1"),
        F.lag("rev", 7).over(w).alias("l7"),
    )
    ev = lagged.filter(F.col("l7").isNotNull()).select(
        F.abs(F.col("rev") - F.col("l1")).alias("e1"),
        F.abs(F.col("rev") - F.col("l7")).alias("e7"),
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    mae1 = F.sum("e1").cast("double") / F.count("*")
    mae7 = F.sum("e7").cast("double") / F.count("*")
    return (
        ev.agg(
            F.count("*").cast("long").alias("n_eval"),
            F.round(mae1, 6).alias("mae_naive"),
            F.round(mae7, 6).alias("mae_seasonal"),
            F.round(mae7 / mae1, 6).alias("mase_seasonal"),
        )
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days", "n_eval", "mae_naive", "mae_seasonal", "mase_seasonal"
        )
    )
