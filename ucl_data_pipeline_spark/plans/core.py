"""Core relational queries: scans, filters, projections, joins, unions,
sorts, dedup — the reference's operator backbone (SURVEY.md §2.1-2.3,
§2.6-2.7) re-expressed over the driver's TPC-H-ish tables.

Each query registers a Spark callable + DuckDB oracle SQL. Design rule:
declarative DataFrame ops only, broadcast hints on dimension joins, and
the cross-engine float convention from plans.registry.
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


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_PRICING_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_ORACLE, tags=("agg", "flagship"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→hash-aggregate. Exercises S2 parquet scan
    with predicate pushdown, P4 filter, and partial+final hash agg
    (map-side combine — one shuffle of 4 groups, not 6M rows).
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    # fan_out: the driver testdata is a single row group → one scan
    # split; decimal partial-aggregation is the CPU cost here, so
    # spread it. On a real multi-split 100 TB table this exchange is
    # dropped — partial agg before any shuffle is strictly better.
    li = fan_out(read_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    charge = disc_price * (F.lit(1) + F.col("l_tax")).cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projections & filters (P3/P4/P7)
# ---------------------------------------------------------------------------

_FILTER_PROJECT_ORACLE = """
SELECT
  o_orderkey AS order_id,
  o_orderstatus AS status,
  o_totalprice AS total_price,
  CAST(year(o_orderdate) AS INTEGER) AS order_year
FROM orders
WHERE o_custkey IS NOT NULL AND o_totalprice > 100000.0
"""


@register("filter_project", oracle=_FILTER_PROJECT_ORACLE, tags=("project",))
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 null-key drop + predicate, P3 rename-project, derived column.
    Both the filter and the 4-column ReadSchema reach the parquet scan.
    """
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull() & (F.col("o_totalprice") > 100000.0))
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total_price"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
    )


_COALESCE_ORACLE = """
SELECT
  o_orderkey,
  COALESCE(
    CASE WHEN o_orderstatus = 'O' THEN o_totalprice END,
    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 0.5 END,
    0.0) AS chosen_price
FROM orders
"""


@register("coalesce_candidates", oracle=_COALESCE_ORACLE, tags=("project",))
def coalesce_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/F9: first-non-null candidate-column selection with a constant
    fallback (reference: odds column candidates,
    scripts/fetch_football_data.py:33-35; coalesce family,
    scripts/enrich_features.py:26-34).
    """
    o = read_table(spark, sf_dir, "orders")
    cand1 = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
    cand2 = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice") * 0.5)
    return o.select(
        "o_orderkey",
        F.coalesce(cand1, cand2, F.lit(0.0)).alias("chosen_price"),
    )


_CONFORM_ORACLE = """
SELECT
  s_suppkey,
  s_name,
  s_acctbal,
  'EU' AS region_code,
  0 AS priority_flag,
  CAST(NULL AS DOUBLE) AS discount_rate
FROM supplier
"""


@register("conform_defaults", oracle=_CONFORM_ORACLE, tags=("project",))
def conform_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6/S7: conform a table onto a declared schema — missing
    columns default-stamped or NULL-typed, canonical order (reference:
    ensure_cols scripts/enrich_features.py:20-24, default stamping
    scripts/fetch_football_data.py:48-52).
    """
    from pyspark.sql import types as T

    from ucl_data_pipeline_spark.sources.io import conform

    target = T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_acctbal", T.DoubleType()),
        T.StructField("region_code", T.StringType()),
        T.StructField("priority_flag", T.IntegerType()),
        T.StructField("discount_rate", T.DoubleType()),
    ])
    return conform(
        read_table(spark, sf_dir, "supplier"),
        target,
        defaults={"region_code": "EU", "priority_flag": 0},
    )


# ---------------------------------------------------------------------------
# Joins (J1-J8)
# ---------------------------------------------------------------------------

_ENRICH_JOIN_ORACLE = """
SELECT
  o.o_orderkey,
  c.c_name,
  n.n_name,
  r.r_name,
  COALESCE(c.c_mktsegment, 'UNKNOWN') AS mktsegment,
  o.o_totalprice
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("enrich_broadcast_join", oracle=_ENRICH_JOIN_ORACLE, tags=("join",))
def enrich_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J6 pattern: fact spine left-joined through a chain of
    broadcast dimensions with default fill (reference enrich chain,
    scripts/enrich_features.py:171-176). All dims broadcast → zero
    shuffles; the fact table never moves.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "o_orderkey",
            "c_name",
            "n_name",
            "r_name",
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("mktsegment"),
            "o_totalprice",
        )
    )


_DICT_LOOKUP_ORACLE = """
WITH name_map AS (
  SELECT n_name AS raw, n_name || '_CANON' AS canonical
  FROM nation WHERE n_nationkey % 3 = 0
)
SELECT
  COALESCE(m.canonical, n.n_name) AS canonical_nation,
  COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN name_map m ON n.n_name = m.raw
GROUP BY 1
"""


@register("dict_lookup_join", oracle=_DICT_LOOKUP_ORACLE, tags=("join",))
def dict_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: dictionary-lookup normalization join with identity fallback
    (reference name map, scripts/enrich_features.py:37-43 — a broadcast
    join + coalesce, never a per-row dict UDF).
    """
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    name_map = (
        n.filter(F.col("n_nationkey") % 3 == 0)
        .select(
            F.col("n_name").alias("raw"),
            F.concat(F.col("n_name"), F.lit("_CANON")).alias("canonical"),
        )
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(name_map), F.col("n_name") == F.col("raw"), "left")
        .select(F.coalesce("canonical", "n_name").alias("canonical_nation"))
        .groupBy("canonical_nation")
        .agg(F.count("*").alias("n_customers"))
    )


_OUTER_HYBRID_ORACLE = f"""
WITH cust AS (
  SELECT c_nationkey AS nationkey, {sql_davg('c_acctbal')} AS cust_avg_bal
  FROM customer GROUP BY 1
), supp AS (
  SELECT s_nationkey AS nationkey, {sql_davg('s_acctbal')} AS supp_avg_bal
  FROM supplier GROUP BY 1
)
SELECT
  COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
  cust.cust_avg_bal,
  supp.supp_avg_bal,
  CASE WHEN cust.cust_avg_bal IS NOT NULL AND supp.supp_avg_bal IS NOT NULL
       THEN 0.6 * cust.cust_avg_bal + 0.4 * supp.supp_avg_bal
       ELSE COALESCE(cust.cust_avg_bal, supp.supp_avg_bal)
  END AS hybrid_bal
FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
"""


@register("outer_join_hybrid", oracle=_OUTER_HYBRID_ORACLE, tags=("join", "agg"))
def outer_join_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 + A2: full-outer join of two aggregates + weighted-hybrid
    combine degrading to the non-null side (reference: cur-vs-last
    season outer join scripts/fetch_fbr_team_xg.py:104-106 and 0.6/0.4
    hybrid weighting :113-123).
    """
    from ucl_data_pipeline_spark.functions.scalar import weighted_hybrid

    c = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(davg("c_acctbal").alias("cust_avg_bal"))
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(davg("s_acctbal").alias("supp_avg_bal"))
    )
    joined = c.join(s, "nationkey", "full_outer")
    return joined.select(
        "nationkey",
        "cust_avg_bal",
        "supp_avg_bal",
        weighted_hybrid("cust_avg_bal", "supp_avg_bal", 0.60).alias("hybrid_bal"),
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


@register("semi_join_big_spenders", oracle=_SEMI_ORACLE, tags=("join",))
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (inventory beyond the reference, SURVEY.md §7
    Phase 3): customers having at least one large order.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("anti_join_no_orders", oracle=_ANTI_ORACLE, tags=("join",))
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Dedup / sort / limit / top-k (A1, O1-O3)
# ---------------------------------------------------------------------------

_DEDUP_FIRST_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
"""


@register("dedup_first_wins", oracle=_DEDUP_FIRST_ORACLE, tags=("dedup", "window"))
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: deterministic distinct-by-key, first-wins (reference:
    drop_duplicates("team") scripts/bootstrap_team_priors.py:35 — made
    deterministic via an explicit ordering, SURVEY.md §2.4). One shuffle
    on the key; window instead of self-join.
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
"""


@register("sort_limit_topn", oracle=_SORT_LIMIT_ORACLE, tags=("sort",))
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3: global top-N. Spark executes ORDER BY + LIMIT as
    TakeOrderedAndProject — per-partition heaps, no total sort/shuffle —
    exactly the scale-safe plan (SURVEY.md §4.2).
    """
    return (
        read_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


_TOP2_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) <= 2
"""


@register("window_top2_per_key", oracle=_TOP2_ORACLE, tags=("window",))
def window_top2_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: latest-2-per-group via ranking window (reference: top-2
    seasons by sort + positional pick, scripts/fetch_fbr_team_xg.py:
    32-34,83-88 → Window.row_number ≤ 2, SURVEY.md §2.5).
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations (U1 + inventory)
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT c_custkey AS entity_id, c_name AS entity_name, 'customer' AS kind, c_acctbal AS acctbal
FROM customer
UNION ALL
SELECT s_suppkey AS entity_id, s_name AS entity_name, 'supplier' AS kind, s_acctbal AS acctbal
FROM supplier
"""


@register("union_all_entities", oracle=_UNION_ORACLE, tags=("set",))
def union_all_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: schema-aligned union-all (reference: pd.concat of per-league
    frames, scripts/fetch_football_data.py:56-69 → unionByName).
    """
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("intersect_nations", oracle=_INTERSECT_ORACLE, tags=("set",))
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("except_nations", oracle=_EXCEPT_ORACLE, tags=("set",))
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)  # subtract == EXCEPT DISTINCT
