"""Round-8 batch 30: temporal-structure depth —

- ``esd_outlier_sequence``: the generalized ESD (Rosner) outlier
  sequence on daily revenue — THREE unrolled Grubbs steps, each
  flagging the most extreme remaining day and recomputing mean/std
  without it. The multi-outlier extension of ``grubbs_extreme_day``
  (a single Grubbs test suffers masking when two outliers shadow
  each other; ESD is the fix, and the core of Twitter's S-H-ESD
  anomaly detector). Emits the flagged day and R-statistic per step.
- ``allen_interval_census``: Allen's 13 interval relations between
  each user's VIEW activity span and PURCHASE activity span — the
  formal census of "does buying happen inside, after, or straddling
  browsing". Exact timestamp comparisons classify every user into
  exactly one relation; the census emits counts and shares per
  relation. The temporal-logic read underneath every funnel/session
  assumption.
- ``acf_table_daily``: the autocorrelation function table of daily
  revenue at lags 1..14, each with the Bartlett ±1.96/√n significance
  band and a flag — ``autocorr_daily_revenue`` is the lag-1 scalar;
  model identification (AR? MA? weekly echo at lag 7?) needs the
  table. Lagged pairs come from a day-index equi-join against a
  broadcast lag list — no per-lag windows, one join.

Registry conventions (plans/registry.py): exact decimal sufficient
statistics; MATERIALIZED chained CTEs for unrolled elimination steps;
(statistic DESC, key) total-order argmax; ROUND 6 outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Generalized ESD (Rosner) outlier sequence, 3 unrolled steps
# ---------------------------------------------------------------------------

_ESD_STEPS = 3

_DAILY_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(19,2))
           AS rev
  FROM orders GROUP BY 1
"""
# rev is DECIMAL(19,2), not (18,2): the ESD steps square it, and DuckDB
# multiplies DECIMAL(18)s on the int64 path — daily revenue's unscaled
# value passes sqrt(int64 max) already at sf0.1 (observed overflow);
# a 19-digit operand forces the exact int128 path. Spark's side is
# width-agnostic (same exact values), so hashes are unchanged.


def _esd_step(rem_prev: str, k: int) -> str:
    """One Rosner elimination: stats over the remaining set, flag the
    (R DESC, day) argmax, subtract it. Each frame is MATERIALIZED —
    rem{k} is referenced by the next step AND the final union."""
    return f"""st{k} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev) AS DOUBLE) AS s,
         CAST(CAST(SUM(rev * rev) AS VARCHAR) AS DOUBLE) AS q
  FROM {rem_prev}
), f{k} AS MATERIALIZED (
  SELECT day, CAST(rev AS DOUBLE) AS revd,
         ABS(CAST(rev AS DOUBLE) - t.s / t.n)
           / SQRT((t.q - t.s * t.s / t.n) / (t.n - 1)) AS r
  FROM {rem_prev} CROSS JOIN st{k} t
  ORDER BY r DESC, day LIMIT 1
), rem{k} AS MATERIALIZED (
  SELECT p.* FROM {rem_prev} p
  WHERE p.day <> (SELECT day FROM f{k})
)"""


_ESD_ORACLE = f"""
WITH rem0 AS MATERIALIZED ({_DAILY_SQL}),
{",".join(_esd_step(f"rem{i}", i + 1) for i in range(_ESD_STEPS))}
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT {k} AS step, CAST(day AS VARCHAR) AS day,"
      f" ROUND(revd, 6) AS revenue, ROUND(r, 6) AS esd_r FROM f{k}"
      for k in range(1, _ESD_STEPS + 1)
  )}
) ORDER BY step
"""


@register("esd_outlier_sequence", oracle=_ESD_ORACLE, tags=("temporal", "stats", "iterative"))
def esd_outlier_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner) outlier sequence over daily revenue:
    {k} unrolled elimination steps — flag the most extreme remaining
    day by R = |x−x̄|/s, remove it, recompute. A single Grubbs test
    (``grubbs_extreme_day``) is masked when a second outlier inflates
    s; the ESD sequence is the standard multi-outlier protocol (each
    step's R would be compared to its own critical value λ_k — a
    lookup, not data). Step 1 reproduces Grubbs exactly; the next
    steps are the unmasked follow-ups an incident review walks.

    Determinism: each step's moments are exact decimal sums (Σx² via
    the VARCHAR round-trip, extras52 trap); R is a pinned expression;
    each argmax uses the (R DESC, day) total order; the elimination
    chain is MATERIALIZED per step in the oracle (single-reference
    discipline) and localCheckpointed on the Spark side (day-grain
    frames; the iterative-chain discipline).

    Scale: ONE fact pass to day grain; each elimination step is one
    scalar agg + 1-row TakeOrdered + anti-filter on the calendar-
    bounded day frame.
    """
    o = read_table(spark, sf_dir, "orders")
    rem = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
        .localCheckpoint()
    )
    out = []
    for k in range(1, _ESD_STEPS + 1):
        rd = F.col("rev").cast("decimal(18,2)")
        st = rem.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(rd).cast("double").alias("s"),
            F.sum(rd * rd).cast("double").alias("q"),
        )
        r = F.abs(F.col("rev").cast("double") - F.col("s") / F.col("n")) / F.sqrt(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        )
        flagged = (
            rem.crossJoin(F.broadcast(st))
            .select("day", F.col("rev").cast("double").alias("revd"), r.alias("r"))
            .orderBy(F.desc("r"), "day")
            .limit(1)
            .localCheckpoint()
        )
        out.append(
            flagged.select(
                F.lit(k).alias("step"),
                F.col("day").cast("string").alias("day"),
                F.round("revd", 6).alias("revenue"),
                F.round("r", 6).alias("esd_r"),
            )
        )
        rem = (
            rem.join(
                flagged.select(F.col("day").alias("fday")),
                rem["day"] == F.col("fday"),
                "left_anti",
            )
            .localCheckpoint()
        )
    res = out[0]
    for f in out[1:]:
        res = res.unionByName(f)
    return res.orderBy("step")


esd_outlier_sequence.__doc__ = esd_outlier_sequence.__doc__.format(
    k=_ESD_STEPS
)


# ---------------------------------------------------------------------------
# Allen interval-relation census (view span vs purchase span per user)
# ---------------------------------------------------------------------------

_ALLEN_ORACLE = """
WITH spans AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = 'view') AS a1,
         MAX(ts) FILTER (WHERE event_type = 'view') AS a2,
         MIN(ts) FILTER (WHERE event_type = 'purchase') AS b1,
         MAX(ts) FILTER (WHERE event_type = 'purchase') AS b2
  FROM events GROUP BY user_id
), rel AS (
  SELECT CASE
    WHEN a1 = b1 AND a2 = b2 THEN 'equals'
    WHEN a2 < b1 THEN 'before'
    WHEN b2 < a1 THEN 'after'
    WHEN a2 = b1 THEN 'meets'
    WHEN b2 = a1 THEN 'met_by'
    WHEN a1 = b1 AND a2 < b2 THEN 'starts'
    WHEN a1 = b1 AND a2 > b2 THEN 'started_by'
    WHEN a2 = b2 AND a1 > b1 THEN 'finishes'
    WHEN a2 = b2 AND a1 < b1 THEN 'finished_by'
    WHEN a1 > b1 AND a2 < b2 THEN 'during'
    WHEN a1 < b1 AND a2 > b2 THEN 'contains'
    WHEN a1 < b1 AND a2 > b1 AND a2 < b2 THEN 'overlaps'
    ELSE 'overlapped_by' END AS relation
  FROM spans
  WHERE a1 IS NOT NULL AND b1 IS NOT NULL
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rel)
SELECT relation,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(COUNT(*) AS DOUBLE) / t.n, 6) AS share
FROM rel CROSS JOIN tot t
GROUP BY relation, t.n
ORDER BY relation
"""


@register("allen_interval_census", oracle=_ALLEN_ORACLE, tags=("events", "temporal"))
def allen_interval_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval-algebra census between each user's VIEW
    activity span [first view, last view] and PURCHASE span [first
    purchase, last purchase]: every user with both event types falls
    into exactly one of the 13 relations (equals / before / after /
    meets / met_by / starts / started_by / finishes / finished_by /
    during / contains / overlaps / overlapped_by); the census reports
    counts and shares. 'contains' dominating means purchases happen
    inside ongoing browsing; a fat 'before' means browse-then-buy
    sessions — the formal temporal-logic read behind funnel
    assumptions (``funnel_analysis`` counts orderings; this
    classifies span TOPOLOGY).

    Determinism: spans are exact MIN/MAX timestamps; the CASE ladder
    is a sequence of exact comparisons ordered so each user matches
    exactly one branch (degenerate point-intervals fall into the
    equality branches first — the standard convention); counts exact
    BIGINTs, shares ROUND 6.

    Scale: one map-combined pass to user-grain spans, a stateless
    classification, a ≤13-row census agg.
    """
    ev = read_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("a1"),
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).alias("a2"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("b1"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("b2"),
    )
    a1, a2, b1, b2 = (F.col(c) for c in ("a1", "a2", "b1", "b2"))
    relation = (
        F.when((a1 == b1) & (a2 == b2), "equals")
        .when(a2 < b1, "before")
        .when(b2 < a1, "after")
        .when(a2 == b1, "meets")
        .when(b2 == a1, "met_by")
        .when((a1 == b1) & (a2 < b2), "starts")
        .when((a1 == b1) & (a2 > b2), "started_by")
        .when((a2 == b2) & (a1 > b1), "finishes")
        .when((a2 == b2) & (a1 < b1), "finished_by")
        .when((a1 > b1) & (a2 < b2), "during")
        .when((a1 < b1) & (a2 > b2), "contains")
        .when((a1 < b1) & (a2 > b1) & (a2 < b2), "overlaps")
        .otherwise("overlapped_by")
    )
    rel = spans.filter(a1.isNotNull() & b1.isNotNull()).select(
        relation.alias("relation")
    )
    tot = rel.agg(F.count("*").cast("long").alias("n"))
    return (
        rel.groupBy("relation")
        .agg(F.count("*").cast("long").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "relation",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
        .orderBy("relation")
    )


# ---------------------------------------------------------------------------
# ACF table (lags 1..14) with Bartlett significance bands
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 14

_ACF_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, CAST(rev AS DOUBLE) AS x
  FROM daily
),
lags AS (SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS k),
pairs AS (
  SELECT l.k, a.x AS x, b.x AS y
  FROM idx a CROSS JOIN lags l
  JOIN idx b ON b.t = a.t - l.k
),
st AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(19,2))
                       * CAST(ROUND(y, 2) AS DECIMAL(19,2))) AS VARCHAR)
              AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(19,2))
                       * CAST(ROUND(x, 2) AS DECIMAL(19,2))) AS VARCHAR)
              AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(19,2))
                       * CAST(ROUND(y, 2) AS DECIMAL(19,2))) AS VARCHAR)
              AS DOUBLE) AS syy
  FROM pairs GROUP BY k
)
SELECT CAST(k AS INTEGER) AS lag,
       n AS n_pairs,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf,
       ROUND(1.959964 / SQRT(n), 6) AS bartlett_band,
       CAST(CASE WHEN ABS((n * sxy - sx * sy)
                  / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)))
                  > 1.959964 / SQRT(n) THEN 1 ELSE 0 END AS INTEGER)
         AS significant
FROM st
ORDER BY lag
"""


@register("acf_table_daily", oracle=_ACF_ORACLE, tags=("temporal", "stats"))
def acf_table_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The autocorrelation function table of daily revenue at lags
    1..{m}, each with the Bartlett ±1.96/√n band and a significance
    flag — the model-identification table behind every ARIMA/seasonal
    decision (``autocorr_daily_revenue`` is its lag-1 scalar; a spike
    at lag 7 inside an otherwise-flat table is the weekly signature).
    Pearson-on-lagged-pairs convention (each lag's own moments), the
    same spelling as the lag-1 query.

    Determinism: lagged pairs come from an exact day-index equi-join;
    per-lag moments are exact decimal sums of the 2-dp day revenues
    (second-order moments exceed 2^53 unscaled → VARCHAR round-trip,
    extras52 trap); r and the band are pinned expressions ROUND 6
    with the literal z = 1.959964.

    Scale: one fact pass to the calendar-bounded day grain; the
    day×lag join is bounded (|days|·{m} rows); per-lag hash-aggs.
    No per-lag windows, no repeated scans.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.col("rev").cast("double").alias("x"),
    )
    lags = spark.createDataFrame(
        [(k,) for k in range(1, _ACF_MAX_LAG + 1)], "k int"
    )
    a = idx.crossJoin(F.broadcast(lags)).select(
        "k", (F.col("t") - F.col("k")).alias("bt"), F.col("x")
    )
    b = idx.select(F.col("t").alias("bt"), F.col("x").alias("y"))
    pairs = a.join(b, "bt")
    xd = F.round(F.col("x"), 2).cast("decimal(18,2)")
    yd = F.round(F.col("y"), 2).cast("decimal(18,2)")
    st = pairs.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    band = F.lit(1.959964) / F.sqrt(n)
    return st.select(
        F.col("k").cast("int").alias("lag"),
        n.alias("n_pairs"),
        F.round(r, 6).alias("acf"),
        F.round(band, 6).alias("bartlett_band"),
        (F.abs(r) > band).cast("int").alias("significant"),
    ).orderBy("lag")


acf_table_daily.__doc__ = acf_table_daily.__doc__.format(m=_ACF_MAX_LAG)
