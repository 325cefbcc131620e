"""Round-8 batch 29: audit sampling and data valuation —

- ``monetary_unit_sample``: systematic PPS ("monetary unit") sampling
  of orders — the auditor's technique: walk the cumulative money
  column with a fixed interval I = total/n, pick every order whose
  cumulative range [cum−x, cum) straddles a multiple of I. Selection
  probability ∝ order value, large orders certain, one deterministic
  pass — the sample an (internal) audit actually pulls against a
  100 TB ledger.
- ``jackknife_group_influence``: leave-one-NATION-out influence on
  the global mean customer revenue — Δmean per deleted group, plus
  the grouped-jackknife standard error of the mean. The cheapest
  honest answer to "which data source is moving my metric" (the
  group-level cousin of influence functions / data-valuation
  scores), entirely from per-group sufficient statistics.
- ``capture_recapture_ndv``: the Lincoln–Petersen (and Chapman
  bias-corrected) population estimate from two independent
  deterministic hash-samples of the customers appearing in orders —
  the survey-statistics NDV estimator next to the sketch family
  (``ndv_kmv_sketch_error`` / ``hll_distinct_error_gate``): two
  cheap marked samples instead of one full pass, with the exact true
  NDV alongside as the built-in audit.

Registry conventions (plans/registry.py): exact decimal cumulative
sums; the width-safe Knuth hash for sample membership
(sql_knuth_bucket); exact BIGINT counts; ROUND 6 outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import (
    bucketed_running_sum,
    register,
)
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Monetary-unit (systematic PPS) sampling of orders
# ---------------------------------------------------------------------------

_MUS_N = 40  # target sample size

_MUS_ORACLE = f"""
WITH ordered AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS cum
  FROM orders
), tot AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS t
  FROM orders
), sel AS (
  SELECT o.o_orderkey, CAST(o.x AS DOUBLE) AS price,
         FLOOR(CAST(o.cum AS DOUBLE) / (t.t / {_MUS_N}))
           - FLOOR(CAST(o.cum - o.x AS DOUBLE) / (t.t / {_MUS_N}))
           AS n_hits
  FROM ordered o CROSS JOIN tot t
)
SELECT o_orderkey, price,
       CAST(n_hits AS BIGINT) AS n_sampling_hits
FROM sel
WHERE n_hits > 0
ORDER BY o_orderkey
"""


@register("monetary_unit_sample", oracle=_MUS_ORACLE, tags=("sample", "window"))
def monetary_unit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS / monetary-unit sampling: with interval
    I = total/{n}, select every order whose cumulative-money range
    straddles a multiple of I — selection probability proportional to
    value, orders above I selected with certainty (n_sampling_hits
    counts multiple straddles for jumbo orders). The audit-sampling
    classic (and the dollar-weighted complement of the engine's
    uniform ``deterministic_sample`` and weighted-without-replacement
    ``weighted_sample_ares``).

    Determinism: the cumulative walk runs in exact DECIMAL over the
    o_orderkey total order; hit counts are floor-divisions of
    identical doubles (exact decimal casts; the interval is one
    pooled ratio) — no randomness anywhere, rerunnable bit-identical.

    Scale: the cumulative walk is range-partitioned
    (registry.bucketed_running_sum): per-bucket cumulative
    sums with exclusive bucket-subtotal offsets computed on the
    bounded bucket grain — exact decimal addition makes the bucketed
    walk bit-identical to a global window, with no single-partition
    sort; selection itself is a stateless filter.
    """
    o = read_table(spark, sf_dir, "orders")
    xd = F.col("o_totalprice").cast("decimal(18,2)")
    # Global cumulative walk WITHOUT a single-partition window
    # (registry.bucketed_running_sum): per-bucket cumulative sums —
    # each task scans only its o_orderkey range — plus each bucket's
    # exclusive prefix subtotal from the bounded bucket grain.
    # Decimal addition is exact and associative, so the bucketed walk
    # is bit-identical to the global one.
    # Offsets AND the grand total both come from the same per-bucket
    # subtotal frame (bucketed_running_sum's second return): the total
    # is the sum of the bucket subtotals — exact decimal addition,
    # identical to a direct SUM over orders — so the walk needs one
    # fewer full fact scan (r10: the ×100 smoke's residual cost was
    # pure pass count).
    walked, subs = bucketed_running_sum(
        o.select("o_orderkey", xd.alias("x")),
        "o_orderkey",
        ["o_orderkey"],
        F.col("x"),
        out="cum",
    )
    ordered = walked.select("o_orderkey", "x", "cum")
    tot = subs.agg(F.sum("__sub").cast("double").alias("t"))
    interval = F.col("t") / _MUS_N
    hits = F.floor(F.col("cum").cast("double") / interval) - F.floor(
        (F.col("cum") - F.col("x")).cast("double") / interval
    )
    return (
        ordered.crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            F.col("x").cast("double").alias("price"),
            hits.cast("long").alias("n_sampling_hits"),
        )
        .filter(F.col("n_sampling_hits") > 0)
        .orderBy("o_orderkey")
    )


monetary_unit_sample.__doc__ = monetary_unit_sample.__doc__.format(n=_MUS_N)


# ---------------------------------------------------------------------------
# Grouped jackknife: leave-one-nation-out influence on the mean
# ---------------------------------------------------------------------------

_JACK_ORACLE = """
WITH cust AS (
  SELECT c.c_nationkey AS g,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o.o_custkey, c.c_nationkey
), grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         SUM(CAST(x AS DECIMAL(18,2))) AS s_g
  FROM cust GROUP BY g
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS DOUBLE) AS s,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM grp
), loo AS (
  SELECT g.g, g.n_g,
         t.s / t.n AS mean_full,
         (t.s - CAST(g.s_g AS DOUBLE)) / (t.n - g.n_g) AS mean_loo,
         t.k
  FROM grp g CROSS JOIN tot t
), mbar AS (
  SELECT CAST(SUM(CAST(ROUND(mean_loo, 6) AS DECIMAL(28,6))) AS DOUBLE)
           / MAX(k) AS mb,
         MAX(k) AS k
  FROM loo
), se AS (
  SELECT SQRT((m.k - 1.0) / m.k
              * CAST(SUM(CAST(ROUND((l.mean_loo - m.mb)
                                    * (l.mean_loo - m.mb), 6)
                             AS DECIMAL(28,6))) AS DOUBLE)) AS jse
  FROM loo l CROSS JOIN mbar m
  GROUP BY m.k
)
SELECT l.g AS nationkey,
       l.n_g AS n_customers,
       ROUND(l.mean_loo, 6) AS mean_without_group,
       ROUND(l.mean_loo - l.mean_full, 6) AS influence_on_mean,
       ROUND((SELECT jse FROM se), 6) AS jackknife_se
FROM loo l
ORDER BY nationkey
"""


@register(
    "jackknife_group_influence", oracle=_JACK_ORACLE, tags=("stats", "agg")
)
def jackknife_group_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped (delete-one-nation) jackknife over mean customer
    revenue: for each nation, the global mean WITHOUT that nation's
    customers, its influence Δmean, and the grouped-jackknife
    standard error √((k−1)/k · Σ(θ₋g − θ̄₋)²). The cheap data-
    valuation read — "which source is moving my metric, and is the
    metric stable under source deletion" — entirely from per-group
    sufficient statistics (no refits, no resampling).

    Determinism: per-group counts and sums are exact decimals; every
    leave-one-out mean is a pinned division of identical doubles; the
    SE's squared deviations are ROUND-6-then-decimal-summed over the
    bounded group grain; outputs ROUND 6.

    Scale: one fact pass to customer grain, one to nation grain; the
    jackknife itself is O(k) arithmetic on a broadcast total.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", F.col("c_nationkey").alias("g"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    grp = cust.groupBy("g").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.col("x").cast("decimal(18,2)")).alias("s_g"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("double").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    loo = grp.crossJoin(F.broadcast(tot)).select(
        "g",
        "n_g",
        (F.col("s") / F.col("n")).alias("mean_full"),
        (
            (F.col("s") - F.col("s_g").cast("double"))
            / (F.col("n") - F.col("n_g"))
        ).alias("mean_loo"),
        "k",
    )
    mbar = loo.agg(
        (
            F.sum(F.round(F.col("mean_loo"), 6).cast("decimal(28,6)"))
            .cast("double")
            / F.max("k")
        ).alias("mb"),
        F.max("k").alias("kk"),
    )
    dev = F.col("mean_loo") - F.col("mb")
    se = (
        loo.crossJoin(F.broadcast(mbar))
        .agg(
            F.sqrt(
                (F.max("kk") - 1.0)
                / F.max("kk")
                * F.sum(F.round(dev * dev, 6).cast("decimal(28,6)")).cast(
                    "double"
                )
            ).alias("jse")
        )
    )
    return (
        loo.crossJoin(F.broadcast(se))
        .select(
            F.col("g").alias("nationkey"),
            F.col("n_g").alias("n_customers"),
            F.round("mean_loo", 6).alias("mean_without_group"),
            F.round(F.col("mean_loo") - F.col("mean_full"), 6).alias(
                "influence_on_mean"
            ),
            F.round("jse", 6).alias("jackknife_se"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Capture-recapture (Lincoln-Petersen / Chapman) NDV estimate
# ---------------------------------------------------------------------------

# Each sample captures keys whose seeded md5 prefix is below '33'
# (= 51/256 ≈ 19.9%). Two DIFFERENT md5 seeds give independent
# samples — a single linear hash (knuth_bucket) with shifted keys
# does NOT: multiplicative hashing is linear, so bucket(k+c) is a
# deterministic function of bucket(k) and the overlap collapses
# (measured: 28 recaptured vs 59 expected → a 2.1x overestimate).
_CR_THRESH = "33"
_CR_RATE = 51 / 256

_CR_ORACLE = f"""
WITH seen AS (
  SELECT DISTINCT o_custkey AS ck FROM orders
), marks AS (
  SELECT ck,
         CASE WHEN substr(md5('cr1:' || CAST(ck AS VARCHAR)), 1, 2)
                   < '{_CR_THRESH}' THEN 1 ELSE 0 END AS s1,
         CASE WHEN substr(md5('cr2:' || CAST(ck AS VARCHAR)), 1, 2)
                   < '{_CR_THRESH}' THEN 1 ELSE 0 END AS s2
  FROM seen
), st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_ndv,
         CAST(SUM(s1) AS BIGINT) AS n1,
         CAST(SUM(s2) AS BIGINT) AS n2,
         CAST(SUM(s1 * s2) AS BIGINT) AS m_both
  FROM marks
)
SELECT true_ndv, n1 AS n_sample1, n2 AS n_sample2, m_both AS n_recaptured,
       ROUND(CAST(n1 AS DOUBLE) * n2 / NULLIF(m_both, 0), 6)
         AS lincoln_petersen,
       ROUND((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m_both + 1) - 1, 6)
         AS chapman,
       ROUND(((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m_both + 1) - 1
              - true_ndv) / true_ndv, 6) AS chapman_rel_error
FROM st
"""


@register(
    "capture_recapture_ndv", oracle=_CR_ORACLE, tags=("sample", "stats", "gate")
)
def capture_recapture_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen capture-recapture estimate of the number of
    distinct ordering customers, from two INDEPENDENT deterministic
    hash-samples (two md5 seeds, each capturing ≈19.9% of keys —
    NOT one linear hash with shifted keys, which stays correlated;
    see the module constant's note): N̂ = n₁n₂/m, plus the Chapman
    bias-corrected variant and its relative error against the exact
    NDV computed alongside — the survey-statistics member of the NDV
    audit family (``ndv_kmv_sketch_error``: order statistics;
    ``hll_distinct_error_gate``: stochastic averaging; here: marked
    samples). In a pipeline this estimates a join's distinct-key
    cardinality from two cheap samples before paying for the full
    distinct.

    Determinism: sample membership compares a seeded md5 hex prefix
    against a literal (md5 is identical in every engine — the minhash
    convention, functions/text.py:115); all capture counts are exact
    BIGINTs; the estimators are pinned expressions ROUND 6,
    NULLIF-guarded for the zero-recapture degenerate case.

    Scale: one DISTINCT collapse (map-combinable) and one scan of the
    key set with two hash predicates — both samples come from the
    SAME pass; nothing is materialized per sample.
    """
    o = read_table(spark, sf_dir, "orders")
    seen = o.select(F.col("o_custkey").alias("ck")).distinct()

    def _mark(seed: str):
        h = F.substring(
            F.md5(F.concat(F.lit(seed), F.col("ck").cast("string"))), 1, 2
        )
        return F.when(h < _CR_THRESH, 1).otherwise(0)

    s1, s2 = _mark("cr1:"), _mark("cr2:")
    st = seen.agg(
        F.count("*").cast("long").alias("true_ndv"),
        F.sum(s1).cast("long").alias("n1"),
        F.sum(s2).cast("long").alias("n2"),
        F.sum(s1 * s2).cast("long").alias("m_both"),
    )
    n1, n2, m = (
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("m_both"),
    )
    chapman = ((n1 + 1) * (n2 + 1)) / (m + 1) - 1
    return st.select(
        "true_ndv",
        F.col("n1").alias("n_sample1"),
        F.col("n2").alias("n_sample2"),
        F.col("m_both").alias("n_recaptured"),
        F.round(n1 * n2 / F.nullif(m.cast("double"), F.lit(0.0)), 6).alias(
            "lincoln_petersen"
        ),
        F.round(chapman, 6).alias("chapman"),
        F.round(
            (chapman - F.col("true_ndv")) / F.col("true_ndv"), 6
        ).alias("chapman_rel_error"),
    )
