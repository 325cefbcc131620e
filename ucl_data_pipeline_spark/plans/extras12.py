"""Round-5 inventory depth, ninth batch: categorical dependence tests
(chi-square / Cramér's V, mutual information), lifecycle analytics
(churn & resurrection), privacy depth (l-diversity), and the
out-of-order lateness audit that sizes streaming watermarks.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import epoch_us
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Chi-square independence test + Cramér's V (returnflag × linestatus)
# ---------------------------------------------------------------------------

# (O−E)²/E per cell is ROUND-6 then decimal-summed (the house rule for
# order-independent float totals); E = row·col/n is a division of exact
# integers, identical in both engines.
_CHI2_ORACLE = """
WITH obs AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS o
  FROM lineitem GROUP BY 1, 2
),
margins AS (
  SELECT rf, ls, o,
         SUM(o) OVER (PARTITION BY rf) AS r_tot,
         SUM(o) OVER (PARTITION BY ls) AS c_tot,
         SUM(o) OVER () AS n
  FROM obs
),
dims AS (
  SELECT COUNT(DISTINCT rf) AS n_r, COUNT(DISTINCT ls) AS n_c FROM obs
),
terms AS (
  SELECT n,
         ROUND(POWER(o - CAST(r_tot AS DOUBLE) * c_tot / n, 2)
               / (CAST(r_tot AS DOUBLE) * c_tot / n), 6) AS term
  FROM margins
)
SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
       CAST((MAX(dims.n_r) - 1) * (MAX(dims.n_c) - 1) AS INTEGER) AS dof,
       ROUND(SQRT(CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE)
                  / (MAX(n) * LEAST(MAX(dims.n_r) - 1, MAX(dims.n_c) - 1))),
             6) AS cramers_v
FROM terms, dims
"""


@register("chi_square_independence", oracle=_CHI2_ORACLE, tags=("stats", "agg"))
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of returnflag ×
    linestatus, with Cramér's V as the normalized effect size — the
    categorical counterpart of corr_matrix_lineitem (is this pair of
    dimensions worth crossing in a report, or statistically
    independent?). All inputs are one contingency hash-agg (cell,
    row, column and grand totals are INTEGER); expected counts are
    divisions of exact integers; each (O−E)²/E term is ROUND-6 +
    decimal-summed so the 6-cell total is order-independent; the
    final SQRT runs on identical doubles.

    Scale: one map-combined fact pass to the contingency table; all
    test math runs on |rf|×|ls| = 6 rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count("*").alias("o"))
    w_all = Window.partitionBy(F.lit(1))
    margins = obs.select(
        "rf",
        "ls",
        "o",
        F.sum("o").over(Window.partitionBy("rf")).alias("r_tot"),
        F.sum("o").over(Window.partitionBy("ls")).alias("c_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("r_tot").cast("double") * F.col("c_tot") / F.col("n")
    terms = margins.select(
        "n",
        F.round(F.pow(F.col("o") - e, 2) / e, 6).alias("term"),
        F.size(F.collect_set("rf").over(w_all)).alias("n_r"),
        F.size(F.collect_set("ls").over(w_all)).alias("n_c"),
    )
    chi2 = F.sum(F.col("term").cast("decimal(18,6)")).cast("double")
    return terms.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        chi2.alias("chi2"),
        ((F.max("n_r") - 1) * (F.max("n_c") - 1)).cast("int").alias("dof"),
        F.round(
            F.sqrt(
                chi2
                / (F.max("n") * F.least(F.max("n_r") - 1, F.max("n_c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Mutual information between the two status dimensions
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH obs AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS o
  FROM lineitem GROUP BY 1, 2
),
margins AS (
  SELECT o,
         SUM(o) OVER (PARTITION BY rf) AS r_tot,
         SUM(o) OVER (PARTITION BY ls) AS c_tot,
         SUM(o) OVER () AS n
  FROM obs
)
SELECT CAST(SUM(CAST(
         ROUND((CAST(o AS DOUBLE) / n)
               * LN(CAST(o AS DOUBLE) * n
                    / (CAST(r_tot AS DOUBLE) * c_tot)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS mutual_info_nats
FROM margins
"""


@register("mutual_information_flags", oracle=_MI_ORACLE, tags=("stats", "agg"))
def mutual_information_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(returnflag; linestatus) in nats — the
    information-theoretic dependence measure (0 ⟺ independent) that
    feature-selection pipelines rank candidate columns by, companion
    to the chi-square test (same contingency pass, different
    statistic). Each cell term (p_xy · ln(p_xy / p_x p_y)) takes its
    LN on a ratio of exact integers (identical doubles both engines),
    is ROUND-6 against last-ulp libm drift, and decimal-sums
    order-independently. One map-combined fact pass; math on 6 rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count("*").alias("o"))
    w_all = Window.partitionBy(F.lit(1))
    margins = obs.select(
        "o",
        F.sum("o").over(Window.partitionBy("rf")).alias("r_tot"),
        F.sum("o").over(Window.partitionBy("ls")).alias("c_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    term = F.round(
        (F.col("o").cast("double") / F.col("n"))
        * F.log(
            F.col("o").cast("double")
            * F.col("n")
            / (F.col("r_tot").cast("double") * F.col("c_tot"))
        ),
        6,
    )
    return margins.agg(
        F.sum(term.cast("decimal(18,6)")).cast("double").alias("mutual_info_nats")
    )


# ---------------------------------------------------------------------------
# Churn & resurrection lifecycle stats
# ---------------------------------------------------------------------------

_CHURN_DAYS = 14
_RESURRECT_DAYS = 7

_CHURN_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
per_user AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         MAX(ts) AS last_seen,
         SUM(CASE WHEN prev_ts IS NOT NULL
                  AND ts - prev_ts > INTERVAL {_RESURRECT_DAYS} DAY
                  THEN 1 ELSE 0 END) AS n_resurrections
  FROM gaps GROUP BY user_id
),
horizon AS (SELECT MAX(ts) AS max_ts FROM events)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_resurrections AS BIGINT) AS n_resurrections,
       last_seen < max_ts - INTERVAL {_CHURN_DAYS} DAY AS churned
FROM per_user, horizon
"""


@register("churn_resurrection_stats", oracle=_CHURN_ORACLE, tags=("events", "window"))
def churn_resurrection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifecycle states from the event stream: per user, activity
    volume, RESURRECTION count (activity gaps > {R} days — the user
    left and came back), and a CHURNED flag (silent for the last {C}
    days of the observation window) — the growth-accounting trio
    behind every retention dashboard. One per-user window pass
    computes the gaps; the churn horizon is a 1-row broadcast MAX;
    all comparisons are integer microsecond arithmetic.
    """
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gaps = e.select(
        "user_id",
        "ts",
        F.when(
            prev.isNotNull()
            & (
                epoch_us("ts") - epoch_us(prev)
                > _RESURRECT_DAYS * 86_400 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_resurrection"),
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("ts").alias("last_seen"),
        F.sum("is_resurrection").cast("bigint").alias("n_resurrections"),
    )
    horizon = e.agg(F.max("ts").alias("max_ts"))
    return per_user.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        "n_events",
        "n_resurrections",
        (
            epoch_us("last_seen")
            < epoch_us("max_ts") - _CHURN_DAYS * 86_400 * 1_000_000
        ).alias("churned"),
    )


# ---------------------------------------------------------------------------
# l-diversity privacy audit
# ---------------------------------------------------------------------------

_L_DIVERSITY = 3

_L_DIV_ORACLE = f"""
SELECT c_nationkey,
       CAST(FLOOR(c_acctbal / 2000) AS INTEGER) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT c_mktsegment) >= {_L_DIVERSITY} AS l_diverse
FROM customer
GROUP BY 1, 2
"""


@register("l_diversity_check", oracle=_L_DIV_ORACLE, tags=("agg", "validate"))
def l_diversity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k_anonymity_check's stronger sibling: a
    quasi-identifier group (nation × balance band) can be large yet
    still leak if every member shares the SENSITIVE attribute, so the
    gate is distinct-sensitive-values ≥ l (market segment, l={L}),
    not group size. Groups failing it need suppression or
    generalization before release/training. Same scale shape as
    k-anonymity: one hash-agg keyed by the QI tuple with a
    COUNT(DISTINCT) over the bounded sensitive domain; output is QI-
    domain-sized, constant in row count.
    """
    c = read_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_band"),
        )
        .agg(
            F.count("*").alias("group_size"),
            F.count_distinct("c_mktsegment").alias("n_sensitive"),
        )
        .select(
            "c_nationkey",
            "bal_band",
            "group_size",
            "n_sensitive",
            (F.col("n_sensitive") >= _L_DIVERSITY).alias("l_diverse"),
        )
    )


# ---------------------------------------------------------------------------
# Out-of-order lateness audit (watermark sizing input)
# ---------------------------------------------------------------------------

_OOO_ORACLE = """
WITH arr AS (
  SELECT event_type, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts < high_water THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(COALESCE(MAX(CASE WHEN ts < high_water
                 THEN (epoch_us(high_water) - epoch_us(ts)) // 1000000 END),
                 0) AS BIGINT)
         AS max_late_seconds
FROM arr GROUP BY event_type
"""


@register("out_of_order_stats", oracle=_OOO_ORACLE, tags=("events", "streaming"))
def out_of_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit: treating event_id as ARRIVAL order,
    how often does an event's timestamp fall behind its user's
    running high-water mark, and by how much — exactly the statistic
    that sizes a Structured Streaming WATERMARK (streaming/windows.py
    ops): the watermark must exceed max_late_seconds or late rows are
    dropped. The running max rides a per-USER window (never a
    per-type one — 5 type partitions would single-thread the fact
    table; user keys scale), then rolls up per type. All integer
    microsecond arithmetic.
    """
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = e.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("high_water"),
    )
    late = F.col("ts") < F.col("high_water")
    late_s = (
        (epoch_us("high_water") - epoch_us("ts")) / F.lit(1_000_000)
    ).cast("bigint")
    return arr.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("n_late"),
        F.coalesce(F.max(F.when(late, late_s)), F.lit(0))
        .cast("bigint")
        .alias("max_late_seconds"),
    )
