"""Round-2 TPC-H-shaped queries: Q2 / Q4 / Q11 / Q14 / Q16 / Q20
patterns adapted to the driver's synthetic star schema (which has no
partsupp table — the part↔supplier relationship is derived from
lineitem, and comment/date columns absent from the testdata are
replaced by equivalent predicates on existing columns).

Together with plans.tpch (Q1/Q3/Q5/Q7/Q8/Q10/Q18/Q21 shapes) this
covers the canonical decision-support plan shapes: correlated EXISTS
(Q4), per-group argmin via window (Q2), HAVING against a scalar
aggregate of the same relation (Q11), conditional-share aggregation
(Q14), multi-key distinct-count with exclusion anti-joins (Q16), and
nested semi-join reduction (Q20).

Scale: same policy as plans.tpch — only guaranteed-small dims carry
broadcast hints; fact-fact joins shuffle on the orderkey/partkey spine
under AQE; aggregates are decimal-exact where summed doubles cross the
oracle (registry docstring conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
  FROM cost
)
SELECT
  p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
  b.unit_cost, s.s_acctbal
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE b.unit_cost = b.best_cost AND p.p_size = 7
ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_suppkey
LIMIT 100
"""


@register("min_cost_supplier", oracle=_Q2_ORACLE, tags=("tpch", "join", "window"))
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each part (of one size class), the supplier(s)
    offering the minimum unit cost — per-group argmin via a window min
    over a pre-aggregated part↔supplier cost table (derived from
    lineitem; the testdata has no partsupp), then dimension joins.

    Unit cost is a single IEEE division per row — deterministic
    cross-engine without rounding. Scale: the cost agg shuffles once on
    (partkey, suppkey); the window re-shuffles on partkey only; the
    part filter prunes BEFORE the dimension joins via the semi-join on
    the filtered part side.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") == 7)
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    return (
        best.join(p, best["l_partkey"] == p["p_partkey"])
        .join(s, best["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            "unit_cost",
            "s_acctbal",
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 shape — order priority with correlated EXISTS
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("order_priority_check", oracle=_Q4_ORACLE, tags=("tpch", "join", "agg"))
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders per priority having at least one slow line
    (shipped > 60 days after order date — the testdata's stand-in for
    commit<receipt). The correlated EXISTS is a LEFT SEMI join on the
    orderkey spine with the correlated date predicate evaluated inside
    the join condition; the year filter prunes orders at the scan.
    """
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    slow = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        # interval add, not date_add: date_add truncates to DATE
        # (midnight), which only matches the oracle's
        # o_orderdate + INTERVAL 60 DAY because testdata orderdates
        # happen to be midnight — the interval form is exact always.
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        slow.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q11 shape — important stock: HAVING vs scalar aggregate
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH scoped AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(18,6)) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
)
SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING SUM(val) > (SELECT SUM(val) * 0.001 FROM scoped)
ORDER BY part_value DESC, l_partkey
"""


@register("important_part_value", oracle=_Q11_ORACLE, tags=("tpch", "agg", "subquery"))
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts representing a significant share of one
    nation's traded value — a grouped aggregate filtered against a
    scalar aggregate of the SAME relation (HAVING > total·fraction).

    The scoped relation is computed once and reused for both the
    per-part agg and the grand total; Spark evaluates the scalar as a
    subquery-broadcast, no driver round-trip. Decimal-exact sums both
    sides (registry convention).
    """
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    scoped = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "l_partkey", F.col("l_extendedprice").cast("decimal(18,6)").alias("val")
        )
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("val").alias("val_dec"))
    total = scoped.agg((F.sum("val") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_dec") > F.col("threshold"))
        .select(
            "l_partkey", F.col("val_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue share
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT
  CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
        THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - l.l_discount AS DECIMAL(4,2))
        ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
    AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("promo_revenue_share", oracle=_Q14_ORACLE, tags=("tpch", "agg", "join"))
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: one month's revenue share of a promoted part class —
    conditional aggregation over a fact↔dim join, both sums
    decimal-exact and divided once in double (a single IEEE op, so no
    rounding needed). The month filter prunes the lineitem scan; part
    is left to AQE (row-scaling side, no hard-coded broadcast).
    """
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier count by part attributes with exclusions
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type NOT LIKE 'SMALL%'
  AND p.p_size IN (1, 4, 7)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("supplier_count_by_part", oracle=_Q16_ORACLE, tags=("tpch", "agg", "join"))
def supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per part attribute group, with a
    brand/type/size exclusion on the dim side and a NOT IN supplier
    blacklist (testdata stand-in: negative account balance) as a LEFT
    ANTI join. The part-side predicates push to the part scan; the
    anti join's build side (blacklisted suppliers) is small and
    broadcast by AQE.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("SMALL"))
        & (F.col("p_size").isin(1, 4, 7))
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(bad, l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape — suppliers with excess share of a part's volume
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH per_supp AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM per_supp GROUP BY l_partkey
), heavy AS (
  SELECT DISTINCT ps.l_suppkey
  FROM per_supp ps
  JOIN per_part pp ON pp.l_partkey = ps.l_partkey
  JOIN part p ON p.p_partkey = ps.l_partkey AND p.p_name LIKE 'small%'
  WHERE ps.qty > pp.total_qty * 0.2
)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN heavy h ON h.l_suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_name
"""


@register("excess_share_suppliers", oracle=_Q20_ORACLE, tags=("tpch", "join", "agg"))
def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers that dominate (>20% of shipped volume of)
    some part in a name class — nested aggregate reduction (per
    part×supplier, then per part) feeding a semi-join chain up to the
    supplier dimension. Both aggs reuse the same shuffle key prefix
    (partkey), decimal-exact quantities; the name-class filter prunes
    parts before the share check.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    per_supp = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty")
    )
    per_part = per_supp.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    heavy = (
        per_supp.join(per_part, "l_partkey")
        .join(p, per_supp["l_partkey"] == p["p_partkey"], "left_semi")
        .filter(F.col("qty") > F.col("total_qty") * 0.2)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )
