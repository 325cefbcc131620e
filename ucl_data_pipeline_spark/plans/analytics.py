"""Aggregation & window-function inventory (SURVEY.md §2.4-2.5, §7
Phase 3): hash aggregates, distinct, rollup/cube/grouping-sets, ranking,
lag/lead analytics and frame aggregates.

The reference has no groupby and no window functions at all (§2.4-2.5);
these are the engine capabilities the driver harness exercises over the
synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from ucl_data_pipeline_spark.sources.io import read_table

_GROUP_AGG_ORACLE = f"""
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_dsum('o_totalprice')} AS sum_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  {sql_davg('o_totalprice')} AS avg_price,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderpriority
"""


@register("group_agg_basic", oracle=_GROUP_AGG_ORACLE, tags=("agg",))
def group_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with count/sum/min/max/avg over one key.
    Partial aggregation (map-side combine) means the shuffle carries
    one row per (partition, key) — safe at any scale.
    """
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            davg("o_totalprice").alias("avg_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


_COUNT_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_suppkey) AS n_suppliers,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""


@register("count_distinct_agg", oracle=_COUNT_DISTINCT_ORACLE, tags=("agg",))
def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) (expand + two-phase agg under
    the hood). For 100 TB cardinality estimation the engine also exposes
    approx_count_distinct (see approx_distinct_suppliers, rows-only
    check — HLL sketches differ across engines by design).
    """
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_lines"),
        )
    )


_APPROX_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_suppkey) AS exact_suppliers,
  COUNT(DISTINCT l_partkey) AS exact_parts,
  TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "approx_distinct_suppliers", oracle=_APPROX_DISTINCT_ORACLE, tags=("agg", "approx")
)
def approx_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=1%) — the scale path
    for cardinality at 100 TB. The raw sketch estimate is
    engine-specific, so the oracle-anchored surface is the exact
    distinct counts plus the HLL's bounded-error CLAIM
    (|approx−exact|/exact ≤ 5% for both columns — deterministic for a
    fixed dataset, and the property a user of the approx path actually
    relies on). Round 1 recorded this rows-only; this form gets a full
    schema+rows+value hash.
    """
    # Plan shape: one groupBy with two exact DISTINCTs + two HLLs
    # compiles to a 4x Expand of the fact — measured ~7 s at sf0.1.
    # Instead each key deduplicates to (flag, key) pairs first (the
    # partial agg collapses map-side), and both the exact count and the
    # HLL run over the distinct pairs in one pass — HLL estimates
    # depend only on the value SET, so the estimate is identical.
    l = read_table(spark, sf_dir, "lineitem")

    def per_key(key: str, exact_alias: str, approx_alias: str) -> DataFrame:
        return (
            l.select("l_returnflag", key)
            .distinct()
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias(exact_alias),
                F.approx_count_distinct(key, 0.01).alias(approx_alias),
            )
        )

    sup = per_key("l_suppkey", "exact_suppliers", "approx_suppliers")
    par = per_key("l_partkey", "exact_parts", "approx_parts")
    within = (
        (
            F.abs(F.col("approx_suppliers") - F.col("exact_suppliers"))
            / F.col("exact_suppliers")
            <= 0.05
        )
        & (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.05
        )
    )
    return sup.join(par, "l_returnflag").select(
        "l_returnflag",
        "exact_suppliers",
        "exact_parts",
        within.alias("approx_within_5pct"),
    )


_ROLLUP_ORACLE = f"""
SELECT
  r.r_name,
  n.n_name,
  COUNT(*) AS n_customers,
  {sql_dsum('c.c_acctbal')} AS sum_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("rollup_region_nation", oracle=_ROLLUP_ORACLE, tags=("agg",))
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("sum_bal"),
    )


_CUBE_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_status_priority", oracle=_CUBE_ORACLE, tags=("agg",))
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of two dimensions."""
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


_GROUPING_SETS_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register("grouping_sets_status_priority", oracle=_GROUPING_SETS_ORACLE, tags=("agg",))
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (the engine exposes
    both DataFrame and SQL entry points; Catalyst plans them
    identically).
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(f"""
        SELECT
          o_orderstatus,
          o_orderpriority,
          COUNT(*) AS n_orders,
          {sql_dsum('o_totalprice')} AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


# ---------------------------------------------------------------------------
# Window functions (§2.5)
# ---------------------------------------------------------------------------

_REST_DAYS_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  date_diff('day',
    lag(CAST(o_orderdate AS DATE)) OVER w,
    CAST(o_orderdate AS DATE)) AS rest_days
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("rest_days_lag", oracle=_REST_DAYS_ORACLE, tags=("window",))
def rest_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days since the previous order per customer — the
    principled version of the reference's hard-coded rest_days=4 default
    (scripts/fetch_football_data.py:48; SURVEY.md §2.5 showcase).
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(d, F.lag(d).over(w)).alias("rest_days"),
    )


_MOVING_AVG_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / COUNT(o_totalprice)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_price
FROM orders
"""


@register("moving_avg_frame", oracle=_MOVING_AVG_ORACLE, tags=("window",))
def moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec aggregate: 3-row trailing mean per customer
    (rowsBetween −2..0), exact-decimal sum for cross-engine equality.
    """
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,6)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(price_dec).over(w).cast("double")
            / F.count("o_totalprice").over(w)
        ).alias("moving_avg_price"),
    )


_RANKS_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  c_acctbal,
  rank() OVER w AS bal_rank,
  dense_rank() OVER w AS bal_dense_rank,
  row_number() OVER (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey) AS bal_row_number
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
"""


@register("rank_customers_by_balance", oracle=_RANKS_ORACLE, tags=("window",))
def rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per nation by balance."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wrn = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.row_number().over(wrn).alias("bal_row_number"),
    )


_LEAD_SHARE_ORACLE = f"""
WITH nation_bal AS (
  SELECT c_nationkey, {sql_dsum('c_acctbal')} AS nation_bal
  FROM customer GROUP BY c_nationkey
)
SELECT
  c.c_custkey,
  c.c_nationkey,
  c.c_acctbal,
  lead(c.c_acctbal) OVER (PARTITION BY c.c_nationkey
                          ORDER BY c.c_acctbal DESC, c.c_custkey) AS next_bal,
  c.c_acctbal / nb.nation_bal AS bal_share
FROM customer c
JOIN nation_bal nb ON c.c_nationkey = nb.c_nationkey
WHERE nb.nation_bal <> 0
"""


@register("lead_and_share_of_total", oracle=_LEAD_SHARE_ORACLE, tags=("window", "agg"))
def lead_and_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() + share-of-group-total (window/agg composition)."""
    c = read_table(spark, sf_dir, "customer")
    nb = c.groupBy("c_nationkey").agg(dsum("c_acctbal").alias("nation_bal"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(nb.filter(F.col("nation_bal") != 0)), "c_nationkey")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.lead("c_acctbal").over(w).alias("next_bal"),
            (F.col("c_acctbal") / F.col("nation_bal")).alias("bal_share"),
        )
    )


_COND_AGG_ORACLE = """
SELECT
  l_returnflag,
  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big_qty,
  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_heavy_disc,
  CAST(SUM(CASE WHEN l_discount > 0.05
       THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE)
    AS heavy_disc_revenue,
  CAST(SUM(CASE WHEN l_tax = 0.0
       THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE)
    AS taxfree_revenue,
  CAST(COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS DOUBLE)
    / COUNT(*) AS big_qty_share
FROM lineitem
GROUP BY l_returnflag
"""


@register("conditional_agg", oracle=_COND_AGG_ORACLE, tags=("agg",))
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / filtered aggregation (count-if, sum-where,
    conditional share) — one pass over the fact, every predicate a
    branch inside the same partial aggregate; never N scans or a
    self-join per condition.
    """
    li = read_table(spark, sf_dir, "lineitem")
    big = F.when(F.col("l_quantity") > 25, 1)
    heavy = F.col("l_discount") > 0.05
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.count(big).alias("n_big_qty"),
        F.count(F.when(heavy, 1)).alias("n_heavy_disc"),
        F.sum(F.when(heavy, dec("l_extendedprice"))).cast("double").alias(
            "heavy_disc_revenue"
        ),
        F.sum(F.when(F.col("l_tax") == 0.0, dec("l_extendedprice")))
        .cast("double")
        .alias("taxfree_revenue"),
        (F.count(big).cast("double") / F.count("*")).alias("big_qty_share"),
    )


_ZSCORE_ORACLE = """
WITH s AS (
  SELECT
    o_orderpriority,
    COUNT(*) AS n,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
             * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx
  FROM orders
  GROUP BY o_orderpriority
)
SELECT
  o.o_orderkey,
  o.o_orderpriority,
  o.o_totalprice,
  ROUND((o.o_totalprice - s.sx / s.n)
    / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)), 6) AS price_z
FROM orders o JOIN s USING (o_orderpriority)
"""


@register("zscore_by_group", oracle=_ZSCORE_ORACLE, tags=("agg", "feature"))
def zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (the feature-scaling pass of a
    training pipeline): tiny exact-sum stats aggregate, broadcast back
    onto the fact — two scan passes and zero wide shuffles, instead of
    the window-function formulation that would sort every partition.
    Exact-sum moments keep both engines bit-identical.
    """
    o = read_table(spark, sf_dir, "orders")
    xd = F.col("o_totalprice").cast("decimal(12,2)")
    s = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    stats = s.select(
        "o_orderpriority",
        (sx / n).alias("mean_price"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("std_price"),
    )
    return o.join(F.broadcast(stats), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(
            (F.col("o_totalprice") - F.col("mean_price")) / F.col("std_price"), 6
        ).alias("price_z"),
    )


_RANK_FNS_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  c_acctbal,
  CAST(dense_rank() OVER w AS INTEGER) AS bal_dense_rank,
  CASE WHEN (count(*) OVER p) = 1 THEN 0.0
       ELSE CAST(((rank() OVER w - 1) * 2000000 + (count(*) OVER p - 1))
                 // (2 * (count(*) OVER p - 1)) AS DOUBLE) / 1000000
  END AS bal_pct_rank,
  CAST((row_number() OVER w * 2000000 + count(*) OVER p)
       // (2 * count(*) OVER p) AS DOUBLE) / 1000000 AS bal_cume_dist,
  first_value(c_custkey) OVER w AS richest_in_nation,
  nth_value(c_custkey, 2) OVER (
    PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS runner_up
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
       p AS (PARTITION BY c_nationkey)
"""


@register("rank_function_surface", oracle=_RANK_FNS_ORACLE, tags=("window",))
def rank_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/distribution window functions in one
    shuffle: dense_rank, percent_rank, cume_dist (6dp-rounded),
    first_value, and nth_value with an explicit full-partition frame.
    Deterministic via the unique-key tiebreak.

    percent_rank/cume_dist are NOT rounded as doubles: ROUND((rk-1)/
    (n-1), 6) hits halfway cases at sf0.1 (e.g. 41/640 = .0640625)
    where Spark rounds the shortest decimal representation HALF_UP
    (.064063) while DuckDB rounds the true binary value (.064062) —
    found by the r9 full-registry sf0.1 sweep. Both engines instead
    compute round-half-up exactly in INTEGER arithmetic:
    ((a·2·10⁶ + b) DIV (2b)) / 10⁶ — bit-identical at any SF. With the
    unique tiebreak, rank = row_number, so cume_dist = rk/n exactly.
    """
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("c_nationkey")
    base = c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.rank().over(w).alias("_rk"),
        F.count("*").over(wp).alias("_nn"),
        F.first("c_custkey").over(w).alias("richest_in_nation"),
        F.nth_value("c_custkey", 2).over(wfull).alias("runner_up"),
    )
    return base.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        "bal_dense_rank",
        # CAST to BIGINT first: Spark's rank() is IntegerType and
        # rk * 2e6 overflows int32 already at sf0.1 partition sizes.
        F.when(F.col("_nn") == 1, F.lit(0.0))
        .otherwise(
            F.expr(
                "CAST(((CAST(_rk AS BIGINT) - 1) * 2000000 + (_nn - 1))"
                " DIV (2 * (_nn - 1)) AS DOUBLE) / 1000000"
            )
        )
        .alias("bal_pct_rank"),
        F.expr(
            "CAST((CAST(_rk AS BIGINT) * 2000000 + _nn) DIV (2 * _nn)"
            " AS DOUBLE) / 1000000"
        ).alias("bal_cume_dist"),
        "richest_in_nation",
        "runner_up",
    )
