"""Round-5 inventory depth, eleventh batch: planner-statistics join
cardinality prediction, market-concentration indices, generated
calendar dimensions, and hierarchical share-of-parent rollups.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register, sql_dsum
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Join cardinality from per-key histograms (planner-statistics surface)
# ---------------------------------------------------------------------------

_JOINSIZE_ORACLE = """
WITH ha AS (
  SELECT o_custkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1
),
hb AS (
  SELECT c_custkey AS k, COUNT(*) AS cb FROM customer GROUP BY 1
),
pred AS (
  SELECT SUM(ca * cb) AS predicted FROM ha JOIN hb USING (k)
),
act AS (
  SELECT COUNT(*) AS actual
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT CAST(pred.predicted AS BIGINT) AS predicted_rows,
       CAST(act.actual AS BIGINT) AS actual_rows,
       pred.predicted = act.actual AS histogram_exact
FROM pred, act
"""


@register(
    "join_size_from_histograms", oracle=_JOINSIZE_ORACLE, tags=("scale", "stats")
)
def join_size_from_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join cardinality predicted from per-key frequency
    histograms — Σₖ count_A(k)·count_B(k), the exact formula a
    cost-based planner approximates with bucketized histograms — next
    to the executed join's actual count. On full (unbucketized)
    histograms the prediction is exact, which the boolean asserts;
    production planners trade that exactness for O(buckets) stats,
    and this query is the shape that calibrates how much a given
    bucketization gives up. The prediction path never executes the
    join: two map-combined per-key aggs and a key-grain product-sum —
    at 100 TB that is the difference between estimating a blowup and
    suffering one.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    ha = o.groupBy(F.col("o_custkey").alias("k")).agg(F.count("*").alias("ca"))
    hb = c.groupBy(F.col("c_custkey").alias("k")).agg(F.count("*").alias("cb"))
    pred = ha.join(hb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("predicted")
    )
    act = o.join(c, o["o_custkey"] == c["c_custkey"]).agg(
        F.count("*").alias("actual")
    )
    return pred.crossJoin(F.broadcast(act)).select(
        F.col("predicted").cast("bigint").alias("predicted_rows"),
        F.col("actual").cast("bigint").alias("actual_rows"),
        (F.col("predicted") == F.col("actual")).alias("histogram_exact"),
    )


# ---------------------------------------------------------------------------
# Market concentration: HHI + CR4 of supplier revenue
# ---------------------------------------------------------------------------

_HHI_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {sql_dsum("l_extendedprice")} AS r FROM lineitem GROUP BY 1
),
tot AS (SELECT {sql_dsum("l_extendedprice")} AS t FROM lineitem),
shares AS (
  SELECT ROUND(r / tot.t, 6) AS s,
         ROW_NUMBER() OVER (ORDER BY r DESC, l_suppkey) AS rnk
  FROM rev, tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(ROUND(s * s, 6) AS DECIMAL(18,6))) AS DOUBLE) AS hhi,
       CAST(SUM(CASE WHEN rnk <= 4 THEN CAST(s AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS cr4
FROM shares
"""


@register("market_concentration_hhi", oracle=_HHI_ORACLE, tags=("agg", "stats"))
def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration indices over supplier revenue: the
    Herfindahl–Hirschman index (Σ share², the antitrust-standard
    0→1/n..1 scale) and CR4 (top-4 concentration ratio) — the
    dependency-risk numbers a supply-chain dashboard tracks. Shares
    are exact-decimal revenue ratios ROUND-6 BEFORE squaring/summing
    (shared 6dp inputs → identical products), per-term decimal sums
    for order independence. One fact-grain hash-agg + a supplier-grain
    rank window; everything after runs on |suppliers| rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,6)")
    rev = li.groupBy("l_suppkey").agg(F.sum(dec).cast("double").alias("r"))
    tot = li.agg(F.sum(dec).cast("double").alias("t"))
    w = Window.partitionBy(F.lit(1)).orderBy(F.col("r").desc(), "l_suppkey")
    shares = rev.crossJoin(F.broadcast(tot)).select(
        F.round(F.col("r") / F.col("t"), 6).alias("s"),
        F.row_number().over(w).alias("rnk"),
    )
    return shares.agg(
        F.count("*").alias("n_suppliers"),
        F.sum(F.round(F.col("s") * F.col("s"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("hhi"),
        F.sum(
            F.when(F.col("rnk") <= 4, F.col("s").cast("decimal(18,6)")).otherwise(
                F.lit(0).cast("decimal(18,6)")
            )
        )
        .cast("double")
        .alias("cr4"),
    )


# ---------------------------------------------------------------------------
# Generated calendar dimension + coverage audit
# ---------------------------------------------------------------------------

_CALENDAR_ORACLE = """
WITH span AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
         CAST(MAX(o_orderdate) AS DATE) AS d1
  FROM orders
),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
od AS (
  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders
)
SELECT CAST(date_part('year', cal.day) AS INTEGER) AS year,
       CAST(date_part('month', cal.day) AS INTEGER) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN date_part('isodow', cal.day) >= 6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend_days,
       CAST(COUNT(od.day) AS BIGINT) AS n_days_with_orders
FROM cal LEFT JOIN od ON od.day = cal.day
GROUP BY 1, 2
"""


@register("calendar_dim_coverage", oracle=_CALENDAR_ORACLE, tags=("temporal", "agg"))
def calendar_dim_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension + coverage audit: synthesize the
    full day spine over the fact table's date span (the warehouse
    date-dimension build — `sequence` explode from a 1-row span
    aggregate, no source table needed), stamp weekday/weekend
    attributes, and left-join the observed order days to report
    per-month coverage — the gap detector that catches silently
    missing ingest days (gap_fill_daily's reporting-side companion).
    The spine is generated from a broadcast 1-row span; the only
    fact-scale work is one distinct-days projection.
    """
    o = read_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    cal = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    od = o.select(F.to_date("o_orderdate").alias("oday")).distinct()
    return (
        cal.join(od, cal["day"] == od["oday"], "left")
        .groupBy(
            F.year("day").alias("year"), F.month("day").alias("month")
        )
        .agg(
            F.count("*").alias("n_days"),
            F.sum(
                F.when(F.dayofweek("day").isin(1, 7), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_weekend_days"),
            F.count("oday").alias("n_days_with_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchical share-of-parent rollup
# ---------------------------------------------------------------------------

_SHARE_PARENT_ORACLE = """
WITH nrev AS (
  SELECT n.n_regionkey AS region, s.s_nationkey AS nation,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS rev_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
)
SELECT region, nation, CAST(rev_dec AS DOUBLE) AS revenue,
       ROUND(CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE), 6)
         AS pct_of_region,
       ROUND(CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER () AS DOUBLE), 6) AS pct_of_total
FROM nrev
"""


@register("share_of_parent_rollup", oracle=_SHARE_PARENT_ORACLE, tags=("agg", "window"))
def share_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical percent-of-parent: each nation's supplier revenue
    as a share of its region and of the world — the two-level drill
    ratio every hierarchy report renders (and the windowed alternative
    to joining three separately-aggregated grains). Revenue is the
    exact decimal sum (identical cross-engine), so the two window
    totals sum the SAME doubles in decimal on both sides; shares are
    ROUND 6. Both windows run on the nation-grain aggregate (≤25
    rows), after the single fact-side hash-agg.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    dec = F.col("l_extendedprice").cast("decimal(18,6)")
    nrev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy(
            F.col("n_regionkey").alias("region"),
            F.col("s_nationkey").alias("nation"),
        )
        .agg(F.sum(dec).alias("rev_dec"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy(F.lit(1))
    return nrev.select(
        "region",
        "nation",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w_region).cast("double"),
            6,
        ).alias("pct_of_region"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w_all).cast("double"),
            6,
        ).alias("pct_of_total"),
    )
