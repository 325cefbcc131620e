"""Inventory extensions: order statistics, moment statistics (exact-sum
formulations), pivot, SQL subqueries (correlated EXISTS / scalar), and
the string-function surface — rounding out the engine capabilities
beyond the reference (SURVEY.md §7 Phase 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.plans.registry import (
    davg,
    register,
    sql_davg,
    sql_dsum,
    sql_knuth_bucket,
)
from ucl_data_pipeline_spark.sources.io import read_table

_PERCENTILE_ORACLE = """
SELECT
  o_orderpriority,
  quantile_cont(o_totalprice, 0.5) AS median_price,
  quantile_cont(o_totalprice, 0.9) AS p90_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


@register("percentile_prices", oracle=_PERCENTILE_ORACLE, tags=("agg",))
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics (median / p90, linear interpolation) per
    group. At 100 TB the approx_percentile sketch replaces this
    (exact percentile needs a per-group sort); both are exposed.
    """
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# Moment statistics from EXACT decimal sums: variance/stddev/corr
# computed by explicit formula over Σx, Σx², Σxy so both engines do the
# identical double arithmetic at the end (built-in stddev/corr use
# engine-specific streaming algorithms whose results differ in the last
# bits — same reason we avoid avg() directly).
_MOMENTS_ORACLE = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
  ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
  ROUND((sxy - sx * sy / n)
    / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6)
    AS corr_qty_price
FROM s
"""


@register("stats_moments", oracle=_MOMENTS_ORACLE, tags=("agg",))
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation per group via exact-sum
    formulation — bit-identical across engines, and at scale a single
    shuffle carrying five partial sums per group (the same shape the
    built-in streaming moments use).
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    li = fan_out(
        read_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        )
    )
    qd = F.col("l_quantity").cast("decimal(12,2)")
    pd_ = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qd).cast("double").alias("sx"),
        F.sum(qd * qd).cast("double").alias("sxx"),
        F.sum(pd_).cast("double").alias("sy"),
        F.sum(pd_ * pd_).cast("double").alias("syy"),
        F.sum(qd * pd_).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    var_q = (sxx - sx * sx / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(var_q, 6).alias("var_qty"),
        F.round(F.sqrt(var_q), 6).alias("stddev_qty"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            6,
        ).alias("corr_qty_price"),
    )


_PIVOT_ORACLE = """
SELECT
  o_orderpriority,
  COALESCE(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS status_f,
  COALESCE(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS status_o,
  COALESCE(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS status_p
FROM orders
GROUP BY o_orderpriority
"""


@register("pivot_status_counts", oracle=_PIVOT_ORACLE, tags=("agg",))
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — the
    explicit list matters at scale: it avoids the extra
    distinct-values job and bounds output width.
    """
    o = read_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


_EXISTS_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
)
AND c.c_acctbal > 1000.0
"""


@register("correlated_exists", oracle=_EXISTS_ORACLE, tags=("join", "sql"))
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface — Catalyst decorrelates
    to a left-semi hash join (no per-row subquery execution); asserted
    in tests/test_plans.py.
    """
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql("""
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer_sq c
        WHERE EXISTS (
          SELECT 1 FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
        )
        AND c.c_acctbal > 1000.0
    """)


_SCALAR_SUBQ_ORACLE = f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT {sql_davg('o_totalprice')} FROM orders)
"""


@register("scalar_subquery_filter", oracle=_SCALAR_SUBQ_ORACLE, tags=("sql", "agg"))
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 1.5× the global
    mean): Catalyst executes the subquery once and broadcasts the
    scalar; exact-decimal mean for cross-engine equality.
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice
        FROM orders_ssq
        WHERE o_totalprice > 1.5 * (SELECT {sql_davg('o_totalprice')} FROM orders_ssq)
    """)


_STRINGS_ORACLE = """
SELECT
  p_partkey,
  concat_ws('|', p_brand, p_type) AS brand_type,
  substring(p_name, 1, 8) AS name_head,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  replace(p_type, ' ', '_') AS type_snake,
  split_part(p_type, ' ', 1) AS type_first_word,
  strpos(p_type, 'BRUSHED') AS brushed_pos,
  reverse(p_brand) AS brand_rev,
  translate(p_brand, '#', '-') AS brand_dashed,
  CAST(length(p_name) AS INTEGER) AS name_len,
  CASE WHEN p_type LIKE '%STEEL%' THEN 1 ELSE 0 END AS is_steel
FROM part
"""


_SAMPLE_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE {sql_knuth_bucket('o_orderkey', 20)} = 0
"""


@register("deterministic_sample", oracle=_SAMPLE_ORACLE, tags=("sample",))
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~5% sample via a multiplicative key hash (Knuth
    constant, mod 2^32, width-safe split multiply — see
    functions.scalar.knuth_bucket) — the pattern for stable train/eval
    splits: membership is a pure function of the key, so re-runs,
    backfills, and different engines agree row-for-row for every
    64-bit key. ``df.sample()`` is partition-layout-dependent and
    ``F.xxhash64`` engine-specific; neither can be cross-checked.
    Scale: embarrassingly parallel filter, pushed to the scan, no
    shuffle.
    """
    o = read_table(spark, sf_dir, "orders")
    return o.filter(knuth_bucket("o_orderkey", 20) == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_COLLECT_ORACLE = """
SELECT
  s_nationkey,
  COUNT(*) AS n_suppliers,
  array_to_string(list_sort(list(s_name)), '|') AS supplier_names
FROM supplier
GROUP BY s_nationkey
"""


@register("collect_sorted_list", oracle=_COLLECT_ORACLE, tags=("agg", "array"))
def collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped list aggregation (collect_list → sorted, then joined to
    one delimited string: registered outputs must be atomic columns).
    The explicit ``sort_array`` matters: distributed collect order is
    partition-dependent, so any downstream hash/compare needs the
    canonical ordering imposed here. Scale: list size is bounded by
    group fan-in — for unbounded groups prefer top-N-per-group
    (window) or a sketch, never an unbounded collect.
    """
    s = read_table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.concat_ws("|", F.sort_array(F.collect_list("s_name"))).alias("supplier_names"),
    )


_JSON_RT_ORACLE = """
WITH j AS (
  SELECT
    o_orderkey,
    to_json(struct_pack(
      o_orderkey := o_orderkey,
      o_orderstatus := o_orderstatus,
      o_totalprice := o_totalprice
    )) AS js
  FROM orders
)
SELECT
  o_orderkey,
  json_extract_string(js, '$.o_orderstatus') AS status_rt,
  CAST(json_extract(js, '$.o_totalprice') AS DOUBLE) AS price_rt
FROM j
"""


@register("json_roundtrip", oracle=_JSON_RT_ORACLE, tags=("scalar", "json"))
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize row structs to JSON strings and parse them back
    (``to_json`` / ``from_json`` with an explicit schema) — the
    columnar JSON codec path used at ingest/egress boundaries (S3/F12
    in SURVEY.md §2). Doubles survive exactly: both engines print
    shortest round-trippable representations. All JVM-side, codegen'd.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    o = fan_out(
        read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    js = F.to_json(F.struct("o_orderkey", "o_orderstatus", "o_totalprice"))
    parsed = F.from_json(
        js, "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    return o.select(
        "o_orderkey",
        parsed["o_orderstatus"].alias("status_rt"),
        parsed["o_totalprice"].alias("price_rt"),
    )


_SALTED_ORACLE = f"""
SELECT
  s.s_suppkey,
  s.s_name,
  COUNT(*) AS n_items,
  {sql_dsum('l.l_extendedprice')} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
"""


@register("salted_skew_join", oracle=_SALTED_ORACLE, tags=("join", "skew", "agg"))
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated shuffle join: the fact side is salted
    (key → (key, salt)) and the dimension side replicated ×SALT, so one
    hot key spreads over SALT reducers instead of straggling on one.
    Results are identical to the plain join (oracle is the plain SQL).

    Demonstrated with a deterministic salt and a forced sort-merge join
    (a broadcast would hide the shuffle this technique exists to fix).
    In production AQE's skewedJoin handles moderate skew; explicit
    salting is for the pathological keys AQE can't split (single-key
    hot partitions in the map output).
    """
    from ucl_data_pipeline_spark.plans.registry import dsum

    n_salt = 8
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey"), F.lit(n_salt)).cast("int")
    )
    sup = (
        read_table(spark, sf_dir, "supplier")
        .crossJoin(
            spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
        )
    )
    joined = li.hint("merge").join(
        sup,
        (li["l_suppkey"] == sup["s_suppkey"]) & (li["salt"] == sup["salt"]),
    )
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.count("*").alias("n_items"),
        dsum("l_extendedprice").alias("revenue"),
    )


@register("string_functions", oracle=_STRINGS_ORACLE, tags=("scalar", "text"))
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar string surface: concat_ws / substring / pad / replace
    / split_part / strpos / reverse / translate / length / LIKE — all
    codegen'd JVM expressions.
    """
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.instr(F.col("p_type"), "BRUSHED").alias("brushed_pos"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dashed"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_type").like("%STEEL%"), 1).otherwise(0).alias("is_steel"),
    )


_UNPIVOT_ORACLE = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
FROM part
UNION ALL
SELECT p_partkey, 'retailprice', p_retailprice FROM part
"""


@register("unpivot_metrics", oracle=_UNPIVOT_ORACLE, tags=("project", "reshape"))
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns → long (key, metric, value)
    rows via the native ``unpivot`` operator — the reshape between
    feature matrices and long-format stores. Columnar expansion, no
    shuffle; the inverse of pivot_status_counts.
    """
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return p.unpivot("p_partkey", ["size", "retailprice"], "metric", "metric_value")


_GLOBAL_QB_ORACLE = """
WITH cut AS (
  SELECT
    ROUND(quantile_cont(o_totalprice, 0.25), 2) AS q1,
    ROUND(quantile_cont(o_totalprice, 0.50), 2) AS q2,
    ROUND(quantile_cont(o_totalprice, 0.75), 2) AS q3
  FROM orders
)
SELECT
  o.o_orderkey,
  o.o_totalprice,
  CASE WHEN o.o_totalprice < c.q1 THEN 1
       WHEN o.o_totalprice < c.q2 THEN 2
       WHEN o.o_totalprice < c.q3 THEN 3
       ELSE 4 END AS bucket
FROM orders o CROSS JOIN cut c
"""


@register("global_quantile_buckets", oracle=_GLOBAL_QB_ORACLE, tags=("agg", "feature"))
def global_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL quantile bucketing without a global sort: exact quartile
    cutpoints from one aggregate (3 doubles), broadcast back, each row
    classified by comparison — the scale path the per-group ntile
    docstring promises (a window over one partition would funnel the
    whole table through a single task). Cutpoints rounded to 2dp on
    both engines to absorb interpolation-arithmetic ulps.
    """
    o = read_table(spark, sf_dir, "orders")
    cut = o.agg(
        F.round(F.percentile("o_totalprice", 0.25), 2).alias("q1"),
        F.round(F.percentile("o_totalprice", 0.50), 2).alias("q2"),
        F.round(F.percentile("o_totalprice", 0.75), 2).alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") < F.col("q1"), 1)
        .when(F.col("o_totalprice") < F.col("q2"), 2)
        .when(F.col("o_totalprice") < F.col("q3"), 3)
        .otherwise(4)
    )
    return o.crossJoin(F.broadcast(cut)).select(
        "o_orderkey", "o_totalprice", bucket.alias("bucket")
    )


_DQ_ORACLE = f"""
SELECT
  COUNT(*) AS n_rows,
  COUNT(DISTINCT o_orderkey) AS n_distinct_keys,
  COUNT(*) - COUNT(o_custkey) AS null_custkeys,
  COUNT(*) - COUNT(o_totalprice) AS null_prices,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  {sql_davg('o_totalprice')} AS mean_price,
  MIN(o_orderdate) AS min_date,
  MAX(o_orderdate) AS max_date,
  COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS nonpositive_prices
FROM orders
"""


@register("data_quality_profile", oracle=_DQ_ORACLE, tags=("validate", "agg"))
def data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality profile (row/key counts, null counts,
    ranges, violation counts) — the expectation-check aggregate every
    pipeline stage gates on (V1/V2 generalized from warn-only prints to
    a queryable contract). One scan, partial-aggregated; at 100 TB this
    is the cheap pre-flight before expensive stages.
    """
    o = read_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct_keys"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkeys"),
        (F.count("*") - F.count("o_totalprice")).alias("null_prices"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        davg("o_totalprice").alias("mean_price"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_prices"),
    )


_UPSERT_ORACLE = """
WITH v1 AS (
  SELECT c_custkey, c_name, c_acctbal, 1 AS version FROM customer
),
v2 AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, 2 AS version
  FROM customer WHERE c_custkey % 3 = 0
),
unioned AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2
)
SELECT c_custkey, c_name, c_acctbal, version FROM (
  SELECT *, row_number() OVER (
    PARTITION BY c_custkey ORDER BY version DESC
  ) AS rn FROM unioned
) WHERE rn = 1
"""


@register("snapshot_upsert_latest", oracle=_UPSERT_ORACLE, tags=("pipeline", "window"))
def snapshot_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/merge without a table format: union the base snapshot
    with a (deterministically derived) delta carrying a higher version,
    keep the latest row per key via a ranking window — the
    keep-latest-wins merge every incremental pipeline needs. At scale
    this is one shuffle on the key; with Delta/Iceberg it becomes MERGE
    INTO, but the logical semantics are exactly this window.
    """
    c = read_table(spark, sf_dir, "customer")
    v1 = c.select("c_custkey", "c_name", "c_acctbal", F.lit(1).alias("version"))
    v2 = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit(2).alias("version"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("c_custkey").orderBy(F.col("version").desc())
    return (
        v1.unionByName(v2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_name", "c_acctbal", "version")
    )


_STRAT_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sql_knuth_bucket('doc_id', 100)} <
  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 10 END
"""


@register("stratified_sample", oracle=_STRAT_SAMPLE_ORACLE, tags=("sample", "llm"))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language sampling rates
    (en 50%, de 20%, rest 10%) applied via the multiplicative key hash
    — how training mixtures are rebalanced reproducibly (downsample
    over-represented languages, keep membership a pure function of the
    key). Unlike ``sampleBy``, re-runs and engines agree row-for-row.
    Pure scan-side filter: no shuffle, prunes to three columns.
    """
    d = read_table(spark, sf_dir, "documents")
    h = knuth_bucket("doc_id", 100)
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "de", 20)
        .otherwise(10)
    )
    return d.filter(h < rate).select("doc_id", "lang", "source")


_APPROX_PERCENTILE_ORACLE = """
SELECT
  o_orderpriority,
  quantile_cont(o_totalprice, 0.5) AS exact_p50,
  quantile_cont(o_totalprice, 0.9) AS exact_p90,
  TRUE AS approx_within_2pct
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "approx_percentile_bounded",
    oracle=_APPROX_PERCENTILE_ORACLE,
    tags=("agg", "approx"),
)
def approx_percentile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy=10000 →
    rank error <= 0.01%) — the 100 TB quantile path (exact percentile
    sorts every group; the sketch is one mergeable pass). Raw sketch
    output is engine-specific, so the oracle-anchored surface is the
    exact quantiles plus the sketch's bounded-error CLAIM
    (|approx - exact| / exact <= 2% at p50/p90 — deterministic for a
    fixed dataset; the property the approx path's user relies on).
    Mirrors approx_distinct_suppliers' treatment of HLL.
    """
    o = read_table(spark, sf_dir, "orders")
    exact50 = F.percentile("o_totalprice", 0.5)
    exact90 = F.percentile("o_totalprice", 0.9)
    approx = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9)), 10000
    )
    within = (
        (F.abs(approx.getItem(0) - exact50) / exact50 <= 0.02)
        & (F.abs(approx.getItem(1) - exact90) / exact90 <= 0.02)
    )
    return o.groupBy("o_orderpriority").agg(
        exact50.alias("exact_p50"),
        exact90.alias("exact_p90"),
        within.alias("approx_within_2pct"),
    )


_SCD2_ORACLE = """
WITH v1 AS (
  SELECT c_custkey, c_name, c_acctbal, 1 AS version FROM customer
),
v2 AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, 2 AS version
  FROM customer WHERE c_custkey % 3 = 0
),
unioned AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2
)
SELECT
  c_custkey, c_name, c_acctbal, version AS valid_from_version,
  COALESCE(
    LEAD(version) OVER (PARTITION BY c_custkey ORDER BY version) - 1,
    2147483647
  ) AS valid_to_version,
  LEAD(version) OVER (PARTITION BY c_custkey ORDER BY version) IS NULL
    AS is_current
FROM unioned
"""


@register("scd2_history", oracle=_SCD2_ORACLE, tags=("pipeline", "window"))
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2: every key keeps its FULL
    version history with [valid_from, valid_to) validity ranges and an
    is_current flag — the warehouse-standard dimension history build
    (contrast snapshot_upsert_latest, which is SCD-1 keep-latest).
    One LEAD window over the same (key, version) shuffle; open-ended
    current rows carry a sentinel high version.
    """
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer")
    v1 = c.select("c_custkey", "c_name", "c_acctbal", F.lit(1).alias("version"))
    v2 = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit(2).alias("version"),
    )
    w = Window.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return v1.unionByName(v2).select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.col("version").alias("valid_from_version"),
        F.coalesce(nxt - 1, F.lit(2147483647)).alias("valid_to_version"),
        nxt.isNull().alias("is_current"),
    )


_CDC_DIFF_ORACLE = """
WITH old AS (
  SELECT c_custkey, c_acctbal FROM customer
),
new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 7 <> 0
)
SELECT
  COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
  o.c_acctbal AS old_bal,
  n.c_acctbal AS new_bal,
  CASE
    WHEN o.c_custkey IS NULL THEN 'inserted'
    WHEN n.c_custkey IS NULL THEN 'deleted'
    WHEN o.c_acctbal <> n.c_acctbal THEN 'updated'
    ELSE 'unchanged'
  END AS change_type
FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
"""


@register("snapshot_diff_cdc", oracle=_CDC_DIFF_ORACLE, tags=("pipeline", "join"))
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff of two snapshot versions: one full
    outer join on the key classifying every row inserted / deleted /
    updated / unchanged — how a pipeline without database change
    streams derives its delta feed (the input to SCD builds and
    incremental downstream refreshes). One shuffle on the key; at
    scale both snapshots are bucketed on it and the join is
    exchange-free.
    """
    c = read_table(spark, sf_dir, "customer")
    old = c.select("c_custkey", "c_acctbal")
    new = c.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        # +100.0 in pure IEEE double, NOT round(bal*1.1, 2): the
        # rounded product hits 6dp/2dp halfway cases at sf0.1 where
        # Spark (shortest-repr HALF_UP) and DuckDB (true-binary round)
        # disagree by one cent — found by the r9 full-registry sf0.1
        # sweep. Addition is bit-identical across engines.
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    change = (
        F.when(F.col("o.c_custkey").isNull(), F.lit("inserted"))
        .when(F.col("n.c_custkey").isNull(), F.lit("deleted"))
        .when(F.col("o.c_acctbal") != F.col("n.c_acctbal"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
        F.col("o.c_acctbal").alias("old_bal"),
        F.col("n.c_acctbal").alias("new_bal"),
        change.alias("change_type"),
    )
