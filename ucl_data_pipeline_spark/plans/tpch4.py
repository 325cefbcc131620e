"""Round-5 TPC-H-shaped queries, part 4: Q6 / Q12 / Q15 patterns —
the last three shapes of the decision-support sweep. With plans.tpch,
tpch2, and tpch3 this completes 22/22: every TPC-H plan shape the
synthetic schema can express now has a registered, oracle-checked
variant.

Shapes covered here: pure scan filter-aggregate with fully pushable
predicates (Q6), join + two-way conditional aggregation (Q12), and
view-then-top-1 via a scalar-aggregate threshold on the view (Q15).
Adaptations for the synthetic schema are noted per query (no shipmode
/ commitdate / receiptdate columns — Q12's lateness test and mode
grouping are synthesized from the columns that exist).

Scale notes (100 TB): Q6 is the canonical pushdown showcase — every
predicate reaches the parquet scan (PushedFilters) and the aggregate
is a map-side-combinable single pass with no shuffle beyond the final
1-row combine. Q12 shuffles once on the join key with both predicates
applied scan-side first. Q15 aggregates the fact once, derives the
global max as a 1-row broadcast (no global window, no second fact
scan), and joins the small per-supplier view to the supplier dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Q6 shape — forecast revenue change (pure filter-aggregate)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(l_discount AS DECIMAL(4,2))
  ) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""


@register("forecast_revenue_change", oracle=_Q6_ORACLE, tags=("tpch", "agg", "scan"))
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue that would be gained by eliminating discounts
    in a band — a single-table filter-aggregate where EVERY predicate
    (ship-year range, discount band, quantity cap) is pushable to the
    parquet scan and the sum is decimal-exact (registry convention).

    The discount band bounds are the exact float64 values 0.05/0.07 on
    both engines, so the comparison set is bit-identical; the product
    is computed in DECIMAL so partial-aggregation order cannot perturb
    the result.

    Reference parity: the classic TPC-H Q6 filter-agg shape
    (reference scripts express equivalent single-frame filtered sums,
    e.g. scripts/build_feature_table.py aggregate steps).
    """
    l = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q12 shape — shipping groups and order priority (two-way conditional agg)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT
  l.l_returnflag AS ship_group,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
ORDER BY ship_group
"""


@register("late_shipment_priority", oracle=_Q12_ORACLE, tags=("tpch", "join", "agg"))
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per-group counts of high- vs low-priority orders
    among late shipments — a fact-fact join whose aggregate is a pair
    of conditional sums (the two-way CASE pivot).

    Schema adaptation: the synthetic lineitem has no l_shipmode /
    l_commitdate / l_receiptdate, so the mode group is synthesized as
    l_returnflag and "late" as shipped ≥ 60 days after the order date
    (the same shape: a row-level date predicate spanning both join
    sides, evaluated post-join, plus a scan-side ship-year window).

    The ship-year range prunes lineitem at the scan; only the
    cross-table lateness predicate waits for the join. Counts are
    integers — no float determinism concern.
    """
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_group")
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier by quarterly revenue (view + scalar max)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue0 AS (
  SELECT
    l_suppkey AS supplier_no,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT
  s.s_suppkey,
  s.s_name,
  CAST(r.rev_dec AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.rev_dec = (SELECT MAX(rev_dec) FROM revenue0)
ORDER BY s.s_suppkey
"""


@register("top_supplier_revenue", oracle=_Q15_ORACLE, tags=("tpch", "agg", "join"))
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) achieving maximum revenue in a
    quarter — the CREATE VIEW + scalar-max-subquery pattern. The view
    is ONE hash-aggregate over the quarter's lineitems; the global max
    is a 1-row aggregate of that (small) view, broadcast back as a
    filter — no global window (which would single-partition the view)
    and no second fact scan.

    The max-equality filter compares DECIMAL sums (exact on both
    engines), so ties and the winner are bit-deterministic; the output
    revenue is cast to double only at the end.
    """
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    revenue0 = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("rev_dec"))
    )
    mx = revenue0.agg(F.max("rev_dec").alias("mx"))
    return (
        s.join(
            revenue0.join(F.broadcast(mx)).filter(
                F.col("rev_dec") == F.col("mx")
            ),
            s["s_suppkey"] == F.col("supplier_no"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
