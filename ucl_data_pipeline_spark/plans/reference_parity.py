"""Reference-parity queries: the reference pipeline's signature scalar
functions and its enrich-join chain (SURVEY.md §2.8, §3), exercised over
the driver's synthetic tables so every one is oracle-checked.

Synthetic inputs are derived deterministically from table keys with
identical expressions on the Spark and DuckDB sides (the testdata has no
lat/lon or odds strings; the reference's domain columns are synthesized
from keys — the OPERATORS are what is under test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import (
    clamp_with_midpoint,
    fractional_to_decimal_odds,
    haversine_km,
    parse_date_multi,
    ratio_with_floor,
    sign_score,
    weighted_hybrid,
)
from ucl_data_pipeline_spark.plans.registry import r6, register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# F10 — haversine travel distance (pure column expression, no UDF)
# ---------------------------------------------------------------------------

_HAVERSINE_ORACLE = """
WITH pts AS (
  SELECT
    c_custkey,
    (c_custkey % 17000) / 100.0 - 85.0 AS lat1,
    ((c_custkey * 7) % 36000) / 100.0 - 180.0 AS lon1,
    (c_nationkey * 651) % 17000 / 100.0 - 85.0 AS lat2,
    ((c_nationkey * 4517) % 36000) / 100.0 - 180.0 AS lon2
  FROM customer
)
SELECT
  c_custkey,
  ROUND(2.0 * 6371.0 * asin(sqrt(
    pow(sin(radians(lat2 - lat1) / 2.0), 2)
    + cos(radians(lat1)) * cos(radians(lat2))
      * pow(sin(radians(lon2 - lon1) / 2.0), 2))), 6) AS travel_km
FROM pts
"""


@register("haversine_travel", oracle=_HAVERSINE_ORACLE, tags=("scalar",))
def haversine_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: great-circle distance as a native column expression
    (reference: row-wise ``df.apply(haversine, axis=1)``
    scripts/enrich_features.py:8-15,114-119 — here fully codegen'd;
    output rounded to 6 dp for cross-libm determinism).
    """
    c = read_table(spark, sf_dir, "customer")
    lat1 = (F.col("c_custkey") % 17000) / 100.0 - 85.0
    lon1 = ((F.col("c_custkey") * 7) % 36000) / 100.0 - 180.0
    lat2 = (F.col("c_nationkey") * 651) % 17000 / 100.0 - 85.0
    lon2 = ((F.col("c_nationkey") * 4517) % 36000) / 100.0 - 180.0
    return c.select(
        "c_custkey",
        r6(haversine_km(lat1, lon1, lat2, lon2)).alias("travel_km"),
    )


# ---------------------------------------------------------------------------
# F4 — fractional odds conversion
# ---------------------------------------------------------------------------

_ODDS_ORACLE = """
WITH odds AS (
  SELECT
    l_orderkey,
    l_linenumber,
    CASE l_linenumber % 4
      WHEN 0 THEN CAST(l_suppkey % 9 + 1 AS VARCHAR) || '/' || CAST(l_partkey % 4 + 1 AS VARCHAR)
      WHEN 1 THEN CAST(l_quantity AS VARCHAR)
      WHEN 2 THEN 'evens'
      ELSE CAST(l_suppkey % 5 AS VARCHAR) || '/' || CAST(l_partkey % 3 AS VARCHAR)
    END AS odds_str
  FROM lineitem
)
SELECT
  l_orderkey,
  l_linenumber,
  odds_str,
  CASE WHEN contains(odds_str, '/')
       THEN CASE WHEN len(string_split(odds_str, '/')) = 2
            THEN 1.0 + TRY_CAST(string_split(odds_str, '/')[1] AS DOUBLE)
                 / nullif(TRY_CAST(string_split(odds_str, '/')[2] AS DOUBLE), 0.0)
            END
       ELSE TRY_CAST(odds_str AS DOUBLE)
  END AS odds_dec
FROM odds
"""


@register("fractional_odds", oracle=_ODDS_ORACLE, tags=("scalar",))
def fractional_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: fractional→decimal odds ("5/2"→3.5), numeric passthrough,
    garbage→NULL, zero denominator→NULL (reference:
    scripts/utils.py:10-17).
    """
    li = read_table(spark, sf_dir, "lineitem")
    odds_str = (
        F.when(
            F.col("l_linenumber") % 4 == 0,
            F.concat(
                (F.col("l_suppkey") % 9 + 1).cast("string"),
                F.lit("/"),
                (F.col("l_partkey") % 4 + 1).cast("string"),
            ),
        )
        .when(F.col("l_linenumber") % 4 == 1, F.col("l_quantity").cast("string"))
        .when(F.col("l_linenumber") % 4 == 2, F.lit("evens"))
        .otherwise(
            F.concat(
                (F.col("l_suppkey") % 5).cast("string"),
                F.lit("/"),
                (F.col("l_partkey") % 3).cast("string"),
            )
        )
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        odds_str.alias("odds_str"),
        fractional_to_decimal_odds(odds_str).alias("odds_dec"),
    )


# ---------------------------------------------------------------------------
# F11/F13/F14 — bootstrap team priors (clamp, sign score, ratio floor)
# ---------------------------------------------------------------------------

_PRIORS_ORACLE = """
SELECT
  s_suppkey,
  greatest(0.55, least(0.90, COALESCE(s_acctbal / 10000.0, 0.725)))
    AS gk_rating,
  0.55 + 0.10 * CAST(sign(COALESCE(s_acctbal - 5000.0, 0.0)) AS DOUBLE)
    AS setpiece_rating,
  0.80 - 0.15 * greatest(0.0, COALESCE(s_acctbal / 34000.0, 0.0)) AS gk_floor,
  CAST(0.70 AS DOUBLE) AS crowd_index
FROM supplier
"""


@register("bootstrap_priors", oracle=_PRIORS_ORACLE, tags=("scalar",))
def bootstrap_priors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11+F13+F14: the reference's priors bootstrap row-loop
    (scripts/bootstrap_team_priors.py:24-34) as pure column expressions:
    clamp-with-midpoint, sign-based score, ratio-with-floor, constant
    crowd index.
    """
    s = read_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        clamp_with_midpoint(F.col("s_acctbal") / 10000.0, 0.55, 0.90).alias(
            "gk_rating"
        ),
        sign_score(F.col("s_acctbal") - 5000.0).alias("setpiece_rating"),
        ratio_with_floor("s_acctbal", base=0.80, step=0.15, denom=34000.0).alias(
            "gk_floor"
        ),
        F.lit(0.70).alias("crowd_index"),
    )


# ---------------------------------------------------------------------------
# P1 — column-NAME case conformance
# ---------------------------------------------------------------------------

_CONFORM_NAMES_ORACLE = """
SELECT
  n_nationkey AS N_NATIONKEY,
  n_name AS N_NAME,
  n_regionkey AS N_REGIONKEY
FROM nation
"""


@register("conform_column_names_upper", oracle=_CONFORM_NAMES_ORACLE, tags=("scalar",))
def conform_column_names_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: uppercase every column NAME (values untouched) — the
    reference's header normalization ``df.columns = [c.upper() ...]``
    (scripts/fetch_football_data.py:31-32). Metadata-only rename: free
    at any scale.
    """
    from ucl_data_pipeline_spark.sources.io import conform_column_names

    n = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return conform_column_names(n, case="upper")


# ---------------------------------------------------------------------------
# F1/F3 — trim + regex strip of trailing parenthetical
# ---------------------------------------------------------------------------

_REGEX_STRIP_ORACLE = r"""
SELECT
  c_custkey,
  trim(regexp_replace(c_name || ' (' || c_mktsegment || ')', '\s+\(.*\)$', ''))
    AS clean_name,
  upper(c_mktsegment) AS segment_upper
FROM customer
"""


@register("name_regex_strip", oracle=_REGEX_STRIP_ORACLE, tags=("scalar", "text"))
def name_regex_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3: trim + strip trailing " (…)" suffix + upper (reference:
    scripts/fetch_fbr_team_xg.py:46,61 — team names carry a strippable
    parenthetical).
    """
    c = read_table(spark, sf_dir, "customer")
    noisy = F.concat(F.col("c_name"), F.lit(" ("), F.col("c_mktsegment"), F.lit(")"))
    return c.select(
        "c_custkey",
        F.trim(F.regexp_replace(noisy, r"\s+\(.*\)$", "")).alias("clean_name"),
        F.upper("c_mktsegment").alias("segment_upper"),
    )


# ---------------------------------------------------------------------------
# F5 — multi-format dayfirst date parsing
# ---------------------------------------------------------------------------

_DATE_PARSE_ORACLE = """
WITH raw AS (
  SELECT
    o_orderkey,
    CASE o_orderkey % 3
      WHEN 0 THEN strftime(o_orderdate, '%-d/%-m/%Y')
      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
      ELSE 'not-a-date'
    END AS date_str
  FROM orders
)
SELECT
  o_orderkey,
  date_str,
  CAST(COALESCE(try_strptime(date_str, '%d/%m/%Y'),
                try_strptime(date_str, '%Y-%m-%d')) AS DATE) AS parsed_date
FROM raw
"""


@register("date_parse_multi", oracle=_DATE_PARSE_ORACLE, tags=("scalar",))
def date_parse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: UK dayfirst date parsing over candidate formats, unparseable
    → NULL (reference: pd.to_datetime(dayfirst=True),
    scripts/fetch_football_data.py:45).
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    o = fan_out(
        read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    )
    date_str = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.date_format("o_orderdate", "d/M/yyyy"),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        .otherwise(F.lit("not-a-date"))
    )
    return o.select(
        "o_orderkey",
        date_str.alias("date_str"),
        parse_date_multi(date_str, formats=("d/M/yyyy", "yyyy-MM-dd")).alias(
            "parsed_date"
        ),
    )


# ---------------------------------------------------------------------------
# The reference's relational core: the enrich-join chain as one lazy DAG
# ---------------------------------------------------------------------------

_ENRICH_PIPELINE_ORACLE = """
WITH fact AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, o_orderstatus
  FROM orders
  WHERE o_custkey IS NOT NULL
), prev AS (
  SELECT
    fact.*,
    date_diff('day',
      lag(CAST(o_orderdate AS DATE))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      CAST(o_orderdate AS DATE)) AS rest_days_raw
  FROM fact
)
SELECT
  p.o_orderkey,
  p.o_orderdate,
  p.o_totalprice,
  COALESCE(c.c_name, 'UNKNOWN') AS customer_name,
  COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
  COALESCE(p.rest_days_raw, 4) AS rest_days,
  COALESCE(c.c_acctbal, 0.0) AS acct_bal,
  greatest(0.55, least(0.90, COALESCE(c.c_acctbal / 10000.0, 0.725)))
    AS customer_prior
FROM prev p
LEFT JOIN customer c ON p.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


@register("enrich_pipeline", oracle=_ENRICH_PIPELINE_ORACLE, tags=("join", "pipeline"))
def enrich_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-point-2 analog (SURVEY.md §3): the reference's
    read→filter→window→broadcast-enrich→default-fill chain
    (scripts/enrich_features.py:151-179) as ONE lazy DataFrame DAG —
    Catalyst sees the whole lineage; no per-stage materialization.
    Defaults fill last, existing values win (enrich-don't-clobber).
    """
    fact = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
                "o_orderstatus")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    fact = fact.withColumn("rest_days_raw", F.datediff(d, F.lag(d).over(w)))
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        fact.join(F.broadcast(c), fact.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.coalesce("c_name", F.lit("UNKNOWN")).alias("customer_name"),
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce("rest_days_raw", F.lit(4)).alias("rest_days"),
            F.coalesce("c_acctbal", F.lit(0.0)).alias("acct_bal"),
            clamp_with_midpoint(F.col("c_acctbal") / 10000.0, 0.55, 0.90).alias(
                "customer_prior"
            ),
        )
    )


# ---------------------------------------------------------------------------
# A2 applied as in the reference: hybrid xG analog over two "seasons"
# ---------------------------------------------------------------------------

_HYBRID_SEASONS_ORACLE = """
WITH seasons AS (
  SELECT
    o_custkey,
    CAST(year(o_orderdate) AS INTEGER) AS season,
    COUNT(*) AS n_orders
  FROM orders
  GROUP BY 1, 2
), ranked AS (
  SELECT
    *,
    row_number() OVER (PARTITION BY o_custkey ORDER BY season DESC) AS rn
  FROM seasons
), cur AS (
  SELECT o_custkey, CAST(n_orders AS DOUBLE) AS cur_orders
  FROM ranked WHERE rn = 1
), last AS (
  SELECT o_custkey, CAST(n_orders AS DOUBLE) AS last_orders
  FROM ranked WHERE rn = 2
)
SELECT
  cur.o_custkey,
  cur.cur_orders,
  last.last_orders,
  CASE WHEN cur.cur_orders IS NOT NULL AND last.last_orders IS NOT NULL
       THEN 0.6 * cur.cur_orders + 0.4 * last.last_orders
       ELSE COALESCE(cur.cur_orders, last.last_orders)
  END AS hybrid_orders
FROM cur LEFT JOIN last ON cur.o_custkey = last.o_custkey
"""


@register("hybrid_two_seasons", oracle=_HYBRID_SEASONS_ORACLE, tags=("window", "agg"))
def hybrid_two_seasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2+A2 composition exactly as the reference uses them: pick the
    latest two seasons per key via ranking window (scripts/
    fetch_fbr_team_xg.py:32-34,83-88), then 0.6/0.4 hybrid-weight with
    null degradation (:113-123).
    """
    seasons = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").cast("int").alias("season"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("season").desc())
    ranked = seasons.withColumn("rn", F.row_number().over(w))
    cur = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("n_orders").cast("double").alias("cur_orders")
    )
    last = ranked.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("n_orders").cast("double").alias("last_orders")
    )
    joined = cur.join(last, "o_custkey", "left")
    return joined.select(
        "o_custkey",
        "cur_orders",
        "last_orders",
        weighted_hybrid("cur_orders", "last_orders", 0.60).alias("hybrid_orders"),
    )
