"""Round-2 TPC-H-shaped queries, part 3: Q9 / Q13 / Q17 / Q19 / Q22
patterns — with plans.tpch and plans.tpch2 this makes the engine's
decision-support coverage near-complete (every TPC-H plan shape that
the synthetic schema can express has a registered, oracle-checked
variant).

Shapes covered here: multi-fact profit rollup (Q9), outer-join
histogram over the join's fan-in (Q13), window-average correlated
filter (Q17), disjunctive multi-column predicates evaluated inside one
join (Q19), and anti-join + scalar-aggregate threshold (Q22).
Adaptations for the synthetic schema are noted per query (no partsupp
/ phone / container columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Q9 shape — product-class profit by nation and year
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT
  n.n_name AS nation,
  CAST(YEAR(l.l_shipdate) AS INTEGER) AS o_year,
  CAST(SUM(
    CAST(l.l_extendedprice AS DECIMAL(12,2))
      * CAST(1 - l.l_discount AS DECIMAL(4,2))
    - CAST(p.p_retailprice * 0.05 AS DECIMAL(12,2))
      * CAST(l.l_quantity AS DECIMAL(12,2))
  ) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, YEAR(l.l_shipdate)
ORDER BY nation, o_year DESC
"""


@register("product_profit_by_nation", oracle=_Q9_ORACLE, tags=("tpch", "join", "agg"))
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on a part-name class rolled up by supplier
    nation and ship year. Supply cost is synthesized as 5% of the
    part's retail price (the schema has no partsupp); the name filter
    prunes part before the fact join. Decimal-exact profit terms.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)") - (F.col("p_retailprice") * 0.05).cast(
        "decimal(12,2)"
    ) * F.col("l_quantity").cast("decimal(12,2)")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'P'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("order_count_distribution", oracle=_Q13_ORACLE, tags=("tpch", "join", "agg"))
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: histogram of per-customer order counts INCLUDING
    zero-order customers — a left outer join whose preserved side
    feeds a second aggregation (COUNT of a nullable key counts only
    matches; the join predicate carries the status exclusion so the
    outer rows survive it).
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity revenue (window-average correlated filter)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH flagged AS (
  SELECT l.l_extendedprice,
         AVG(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty,
         l.l_quantity
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#21'
)
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
       AS DOUBLE) AS avg_yearly
FROM flagged
WHERE l_quantity < 0.5 * avg_qty
"""


@register("small_quantity_revenue", oracle=_Q17_ORACLE, tags=("tpch", "window", "agg"))
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lineitems whose quantity is below half
    the part's average — the correlated per-part AVG subquery expressed
    as ONE window over the partkey partition (the textbook form
    re-scans lineitem for the inner aggregate; the window computes it
    in the same shuffle that the filter consumes). avg is an exact
    integer-sum / count division, deterministic cross-engine.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#21")
    w = Window.partitionBy("l_partkey")
    flagged = (
        l.join(p, l["l_partkey"] == p["p_partkey"], "left_semi")
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    )
    return flagged.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            / 7.0
        )
        .cast("double")
        .alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive multi-column join predicates
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
     AND l.l_quantity BETWEEN 1 AND 11)
  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
     AND l.l_quantity BETWEEN 10 AND 20)
  OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
     AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("disjunctive_predicate_revenue", oracle=_Q19_ORACLE, tags=("tpch", "join"))
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity
    predicate combinations — the disjunction references BOTH join
    sides, so it evaluates inside the join (one pass); Catalyst still
    derives the common single-side conjuncts (brand IN set, size >= 1)
    and pushes them to the part scan.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    joined = l.join(p, l["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    return joined.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q22 shape — dormant high-balance customers by code
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT
  CAST(c.c_custkey % 7 AS INTEGER) AS cntrycode,
  COUNT(*) AS numcust,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_custkey % 7 IN (1, 3, 5)
  AND c.c_acctbal > avg_bal.a
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
  )
GROUP BY c.c_custkey % 7
ORDER BY cntrycode
"""


@register("dormant_rich_customers", oracle=_Q22_ORACLE, tags=("tpch", "join", "agg"))
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers in selected code groups (synthesized as
    custkey mod 7 — the schema has no phone column) with above-average
    positive balances and NO orders — scalar-aggregate threshold
    (broadcast, computed once) + LEFT ANTI join against the fact,
    grouped into a code histogram.

    The threshold mean is decimal-exact (registry convention), so the
    gated row set is bit-identical across engines; aggregated outputs
    are decimal-exact too.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000.0
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("a")
    )
    code = (F.col("c_custkey") % 7).cast("int")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .join(F.broadcast(avg_bal))
        .filter(code.isin(1, 3, 5) & (F.col("c_acctbal") > F.col("a")))
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
