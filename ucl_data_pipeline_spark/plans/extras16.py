"""Round-5 inventory depth, fourteenth batch: correlated LATERAL
top-n, time-interval RANGE window frames, cross-corpus duplicated-span
profiling (the ExactSubstr dedup diagnostic), Kaplan–Meier survival,
and the two workhorse nonparametric tests (Mann–Whitney U rank-sum,
Kolmogorov–Smirnov two-sample drift).

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Correlated LATERAL subquery top-n (SQL surface)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.c_nationkey, t.c_custkey, t.c_acctbal
FROM (SELECT DISTINCT c_nationkey FROM {customer}) n,
LATERAL (SELECT c_custkey, c_acctbal FROM {customer} c
         WHERE c.c_nationkey = n.c_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""


@register(
    "lateral_topn_surface",
    oracle=_LATERAL_SQL.format(customer="customer"),
    tags=("sql", "join"),
)
def lateral_topn_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL-standard spelling of
    per-group top-n (top-2 customers by balance per nation), new as a
    SQL surface in Spark 3.2+ and the idiom migrating users reach for
    before they learn window functions. Catalyst decorrelates the
    LATERAL into a ranked window under the hood (DomainJoin rewrite),
    so the physical plan is the same single-shuffle rank-filter as
    `window_top2_per_key` — this row pins that the surface agrees with
    the window spelling's semantics AND with DuckDB's LATERAL. Ties
    broken by custkey so the LIMIT is deterministic. At 100 TB the
    decorrelation matters: a naive nested-loop LATERAL would rescan
    the fact table per outer row; Catalyst's rewrite keeps it one scan.
    """
    c = read_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("lateral_customer")
    return spark.sql(_LATERAL_SQL.format(customer="lateral_customer"))


# ---------------------------------------------------------------------------
# Time-interval RANGE window frame (SQL surface)
# ---------------------------------------------------------------------------

_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS rev_7d,
       CAST(COUNT(*) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n_7d
FROM {orders}
"""


@register(
    "range_interval_frame",
    oracle=_RANGE_FRAME_SQL.format(orders="orders"),
    tags=("window", "sql"),
)
def range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame bounded by a calendar INTERVAL — trailing
    7-day revenue and order count per customer, anchored on the ORDER
    BY timestamp's VALUE rather than a row offset. This is the frame
    `rows_between` cannot express when events are irregularly spaced
    (a 3-rows-preceding frame is 3 orders, not 7 days), and the SQL
    surface the DataFrame API lacks (rangeBetween takes longs, not
    intervals — the engine's other spelling casts to epoch seconds).
    RANGE frames include value-peers, so duplicate timestamps
    aggregate identically regardless of physical row order —
    deterministic by construction. Decimal window sums keep the money
    column exact. One shuffle on the partition key; the frame itself
    is evaluated with a sliding two-pointer over each sorted
    partition, O(rows) not O(rows × frame).
    """
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("range_frame_orders")
    return spark.sql(_RANGE_FRAME_SQL.format(orders="range_frame_orders"))


# ---------------------------------------------------------------------------
# Cross-corpus duplicated-span fraction (ExactSubstr dedup diagnostic)
# ---------------------------------------------------------------------------

_DUP_SPAN_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT doc_id,
         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS span
  FROM toks, UNNEST(range(0, len(t) // 10)) AS u(i)
),
df AS (
  SELECT span, COUNT(DISTINCT doc_id) AS span_df FROM spans GROUP BY 1
),
per_doc AS (
  SELECT s.doc_id,
         COUNT(*) AS n_spans,
         SUM(CASE WHEN f.span_df > 1 THEN 1 ELSE 0 END) AS dup_spans
  FROM spans s JOIN df f USING (span)
  GROUP BY 1
)
SELECT doc_id,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(dup_spans AS BIGINT) AS dup_spans,
       ROUND(dup_spans * 1.0 / n_spans, 6) AS dup_ratio
FROM per_doc
"""


@register("dup_span_fraction", oracle=_DUP_SPAN_ORACLE, tags=("llm", "dedup"))
def dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction — for each doc, the share
    of its non-overlapping 10-token spans that also occur in at least
    one OTHER document. This is the corpus diagnostic behind
    exact-substring deduplication (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): docs with a high cross-corpus
    span fraction are boilerplate/mirror candidates that near-dup
    MinHash misses when the shared text is a sub-span rather than the
    whole doc. Pipeline: scan-side span construction (transform over a
    0..n/10 index sequence + array slice — no Python), one hash-agg
    computing span document-frequency, one join back. Cross-doc
    distinct-count (not raw occurrences) so a doc repeating its own
    span doesn't self-flag. Spans are shuffled as 8-byte
    xxhash64 digests (they are pure equality keys; the string-keyed
    oracle is the collision check) and the span-df agg is map-side
    combinable; there is no pairwise
    stage at all — this profile costs two shuffles regardless of the
    duplicate rate, unlike pair-enumerating dedup.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    # Docs with <10 tokens must yield ZERO spans. An unguarded
    # sequence(0, floor(size/10)-1) becomes sequence(0, -1), which
    # Spark evaluates as the DESCENDING list [0, -1] (not empty!) and
    # the i=-1 branch would slice from the array's end — while the
    # oracle's range(0, 0) is empty. Guard the index list explicitly.
    idx = F.when(
        F.size("t") >= 10,
        F.sequence(F.lit(0), F.floor(F.size("t") / 10) - 1),
    ).otherwise(F.array().cast("array<bigint>"))
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.slice("t", i * 10 + 1, F.lit(10))
                ),
            )
        ).alias("span"),
    ).select("doc_id", F.xxhash64("span").alias("span"))
    span_df = spans.groupBy("span").agg(
        F.count_distinct("doc_id").alias("span_df")
    )
    per_doc = (
        spans.join(span_df, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("span_df") > 1, 1).otherwise(0)).alias(
                "dup_spans"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_spans").cast("bigint").alias("n_spans"),
        F.col("dup_spans").cast("bigint").alias("dup_spans"),
        F.round(F.col("dup_spans") * 1.0 / F.col("n_spans"), 6).alias(
            "dup_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival estimator over user lifetimes
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH users AS (
  SELECT user_id,
         MIN(ts) AS first_ts,
         MAX(ts) AS last_ts,
         MIN(CASE WHEN value > 200 THEN ts END) AS hit_ts
  FROM events GROUP BY user_id
),
durs AS (
  SELECT user_id,
         epoch_us(COALESCE(hit_ts, last_ts)) // 3600000000
           - epoch_us(first_ts) // 3600000000 AS dur,
         CASE WHEN hit_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM users
),
by_dur AS (
  SELECT dur,
         SUM(observed) AS d,
         COUNT(*) - SUM(observed) AS c
  FROM durs GROUP BY dur
),
risk AS (
  SELECT dur, d, c,
         (SELECT COUNT(*) FROM durs)
           - (SUM(d + c) OVER (ORDER BY dur) - (d + c)) AS n_risk
  FROM by_dur
),
km AS (
  SELECT dur, d, c, n_risk,
         EXP(SUM(LN((n_risk - d) * 1.0 / n_risk)) OVER (ORDER BY dur))
           AS surv
  FROM risk
  WHERE n_risk > d
)
SELECT CAST(dur AS BIGINT) AS duration_hours,
       CAST(n_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(c AS BIGINT) AS n_censored,
       ROUND(surv, 6) AS survival
FROM km
WHERE d > 0
"""


@register("kaplan_meier_survival", oracle=_KM_ORACLE, tags=("stats", "window"))
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-high-value-event —
    hours from a user's first event until their first event with
    value > 200, right-CENSORED at the user's last observed event for
    users who never cross the threshold. The censoring-aware estimate
    a naive "mean hours to conversion over converters" biases low
    (it silently drops exactly the users with the longest times).
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with the standard
    censored-after-death tie convention. Durations are hour-bucket
    diffs (floor(epoch_us/3.6e9) deltas — boundary-crossing
    semantics, identical integer arithmetic on both engines; Spark's
    timestampdiff counts COMPLETE hours and DuckDB's date_diff counts
    boundaries, so neither raw builtin is used). Three bounded
    stages: per-user agg (fact-grain, one shuffle), duration-grain
    agg (≤ observation-window hours — tiny, single-partition window
    is safe at any corpus scale), ordered cumulative product via
    exp∘Σln (ROUND 6; ln is last-ulp libm-dependent). Rows are the
    event times (d > 0), the curve's support.
    """
    from ucl_data_pipeline_spark.functions.scalar import epoch_us

    e = read_table(spark, sf_dir, "events")
    hour = lambda c: F.floor(epoch_us(c) / F.lit(3_600_000_000))  # noqa: E731
    users = e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(F.when(F.col("value") > 200, F.col("ts"))).alias("hit_ts"),
    )
    durs = users.select(
        (
            hour(F.coalesce("hit_ts", "last_ts")) - hour("first_ts")
        ).alias("dur"),
        F.when(F.col("hit_ts").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    by_dur = durs.groupBy("dur").agg(
        F.sum("observed").alias("d"),
        (F.count("*") - F.sum("observed")).alias("c"),
    )
    total = durs.agg(F.count("*").alias("n_total"))
    w = Window.orderBy("dur")
    risk = by_dur.crossJoin(F.broadcast(total)).select(
        "dur",
        "d",
        "c",
        (
            F.col("n_total")
            - (
                F.sum(F.col("d") + F.col("c")).over(w)
                - (F.col("d") + F.col("c"))
            )
        ).alias("n_risk"),
    )
    km = risk.filter(F.col("n_risk") > F.col("d")).select(
        "dur",
        "d",
        "c",
        "n_risk",
        F.exp(
            F.sum(
                F.log((F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk"))
            ).over(w)
        ).alias("surv"),
    )
    return km.filter(F.col("d") > 0).select(
        F.col("dur").cast("bigint").alias("duration_hours"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.round("surv", 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Mann–Whitney U rank-sum test (tie-corrected normal approximation)
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH sample AS (
  SELECT o_totalprice AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp_a
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
ranked AS (
  SELECT v, grp_a,
         RANK() OVER (ORDER BY v)
           + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS avg_rank
  FROM sample
),
ties AS (
  SELECT SUM(t * t * t - t) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM sample GROUP BY v)
),
stats AS (
  SELECT SUM(CASE WHEN grp_a = 1
                  THEN CAST(avg_rank AS DECIMAL(18,1))
                  ELSE CAST(0 AS DECIMAL(18,1)) END) AS ra,
         SUM(grp_a) AS na,
         COUNT(*) - SUM(grp_a) AS nb
  FROM ranked
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(ra - CAST(na * (na + 1) AS DECIMAL(18,1)) / 2 AS DOUBLE) AS u_a,
       ROUND(
         (CAST(ra AS DOUBLE) - na * (na + 1) / 2.0 - na * nb / 2.0)
         / NULLIF(SQRT(na * 1.0 * nb / 12.0
                * ((na + nb + 1)
                   - tie_term * 1.0
                     / NULLIF((na + nb) * (na + nb - 1), 0))), 0),
         6) AS z_score
FROM stats, ties
"""


@register(
    "mann_whitney_u", oracle=_MWU_ORACLE, tags=("stats", "window", "baseline")
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test — do URGENT orders carry different
    totals than LOW-priority ones? — the nonparametric complement to
    `welch_ttest_promo` that makes no normality assumption (rank-based,
    robust to the heavy right tail money columns always have).
    Value-grain midranks (the ``kruskal_wallis_h`` spelling): sample
    rows collapse to (value, group) cells first, midrank(v) =
    (#rows below v) + (t_v + 1)/2 comes from ONE cumulative window
    over DISTINCT values (value grain ≪ row grain; at 100 TB bucket
    values first — the cells agg is the hook), and the group-A rank
    sum is Σ cnt·midrank in exact DECIMAL (ranks are half-integers,
    so decimal sums are exact and order-independent) — no ranking
    window ever touches sample-row grain. The oracle's row-grain
    RANK() spelling computes the identical exact scalars, which is
    the cross-engine check that the cell collapse is lossless.
    Finally the tie-corrected normal approximation
    z = (U − n_a·n_b/2) / σ_ties. U is emitted exactly; z is ROUND 6
    (sqrt is IEEE-correctly-rounded, but the division chain warrants
    the engine's standard transcendental guard).
    """
    o = read_table(spark, sf_dir, "orders")
    cells = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(
            F.col("o_totalprice").alias("v"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("grp_a"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    vals = cells.groupBy("v").agg(F.sum("cnt").cast("long").alias("t"))
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    mid = vals.select("v", "t", F.sum("t").over(w_cum).alias("below"))
    midrank = (
        F.coalesce(F.col("below"), F.lit(0)) + (F.col("t") + 1) / 2.0
    ).cast("decimal(18,1)")
    ties = vals.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_term"
        )
    )
    stats = (
        cells.join(mid, "v")
        .agg(
            F.sum(
                F.when(
                    F.col("grp_a") == 1,
                    F.col("cnt").cast("decimal(28,1)") * midrank,
                ).otherwise(F.lit(0).cast("decimal(28,1)"))
            ).alias("ra"),
            F.sum(
                F.when(F.col("grp_a") == 1, F.col("cnt")).otherwise(0)
            ).alias("na"),
            F.sum(
                F.when(F.col("grp_a") == 0, F.col("cnt")).otherwise(0)
            ).alias("nb"),
        )
    )
    joined = stats.crossJoin(F.broadcast(ties))
    na, nb, ra = F.col("na"), F.col("nb"), F.col("ra")
    # The tie-correction divisor is 0 when only one row survives the
    # priority filter (na+nb=1): ANSI-on Spark would raise
    # DIVIDE_BY_ZERO there while DuckDB yields NULL — NULLIF on both
    # sides keeps the engines agreeing (NULL z) on the degenerate
    # input, matching the sigma=0 guard below.
    sigma = F.sqrt(
        na * 1.0 * nb / 12.0
        * (
            (na + nb + 1)
            - F.col("tie_term")
            * 1.0
            / F.nullif((na + nb) * (na + nb - 1), F.lit(0))
        )
    )
    return joined.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (ra - (na * (na + 1)).cast("decimal(18,1)") / 2)
        .cast("double")
        .alias("u_a"),
        # sigma is 0 when every sampled value is identical (full tie
        # correction): an ANSI-on Spark session raises DIVIDE_BY_ZERO
        # where DuckDB/non-ANSI Spark yield NULL, so both sides null
        # the degenerate case explicitly (NULLIF in the oracle).
        F.round(
            (ra.cast("double") - na * (na + 1) / 2.0 - na * nb / 2.0)
            / F.nullif(sigma, F.lit(0.0)),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample drift statistic
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH sample AS (
  SELECT l_extendedprice AS v,
         CASE WHEN l_shipdate < TIMESTAMP '1998-07-01' THEN 1 ELSE 0 END
           AS grp_a
  FROM lineitem
),
counts AS (
  SELECT v, SUM(grp_a) AS ca, COUNT(*) - SUM(grp_a) AS cb
  FROM sample GROUP BY v
),
totals AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts
),
ecdf AS (
  SELECT SUM(ca) OVER (ORDER BY v) * 1.0 / NULLIF(totals.na, 0) AS fa,
         SUM(cb) OVER (ORDER BY v) * 1.0 / NULLIF(totals.nb, 0) AS fb
  FROM counts, totals
)
SELECT CAST(totals.na AS BIGINT) AS n_a,
       CAST(totals.nb AS BIGINT) AS n_b,
       ROUND(MAX(ABS(fa - fb)), 6) AS ks_d,
       ROUND(1.358 * SQRT((totals.na + totals.nb) * 1.0
                          / NULLIF(totals.na * totals.nb, 0)), 6) AS crit_05,
       MAX(ABS(fa - fb))
         > 1.358 * SQRT((totals.na + totals.nb) * 1.0
                        / NULLIF(totals.na * totals.nb, 0)) AS drifted
FROM ecdf, totals
GROUP BY totals.na, totals.nb
"""


@register(
    "ks_two_sample_drift",
    oracle=_KS_ORACLE,
    tags=("stats", "window", "baseline"),
)
def ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic — the max vertical gap
    between the price ECDFs of early (pre-1998H2) vs late shipments —
    the distribution-drift test that, unlike `psi_price_drift`'s
    binned PSI, is binning-free and sensitive to shifts anywhere in
    the distribution. Pre-aggregates to value-grain counts FIRST (one
    map-combinable hash-agg), so the ordered ECDF window runs over
    distinct values, not raw rows — the standard trick that makes a
    global-ordering statistic tractable at fact scale (distinct prices
    ≪ rows; at 100 TB you'd quantize values to fix the grain). All
    arithmetic is rational (integer cumsums, one division) plus one
    IEEE-exact sqrt for the 5%-level critical value D_crit =
    1.358·√((n_a+n_b)/(n_a·n_b)); the drifted flag compares UNROUNDED
    values so it cannot disagree across engines with the displayed
    ROUND-6 pair.
    """
    li = read_table(spark, sf_dir, "lineitem")
    sample = li.select(
        F.col("l_extendedprice").alias("v"),
        F.when(F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"), 1)
        .otherwise(0)
        .alias("grp_a"),
    )
    counts = sample.groupBy("v").agg(
        F.sum("grp_a").alias("ca"),
        (F.count("*") - F.sum("grp_a")).alias("cb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    # One empty shipdate group makes na (or nb, or na*nb) zero: Spark
    # x/0 is NULL while DuckDB raises / yields inf — NULLIF-guard every
    # division on both sides so degenerate inputs agree (both NULL).
    w = Window.orderBy("v")
    ecdf = counts.crossJoin(F.broadcast(totals)).select(
        "na",
        "nb",
        (F.sum("ca").over(w) * 1.0 / F.nullif(F.col("na"), F.lit(0)))
        .alias("fa"),
        (F.sum("cb").over(w) * 1.0 / F.nullif(F.col("nb"), F.lit(0)))
        .alias("fb"),
    )
    gap = F.max(F.abs(F.col("fa") - F.col("fb")))
    crit = 1.358 * F.sqrt(
        (F.col("na") + F.col("nb"))
        * 1.0
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0))
    )
    return ecdf.groupBy("na", "nb").agg(gap.alias("_d")).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(F.col("_d"), 6).alias("ks_d"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("_d") > crit).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# Bucket-first KS twin: the 100 TB spelling, self-auditing vs exact
# ---------------------------------------------------------------------------

_KSB_WIDTH_CENTS = 10_000  # $100-wide buckets: price span / 100 ≈ 1.1k buckets

_KSB_ORACLE = f"""
WITH sample AS (
  SELECT l_extendedprice AS v,
         CASE WHEN l_shipdate < TIMESTAMP '1998-07-01' THEN 1 ELSE 0 END
           AS grp_a
  FROM lineitem
),
counts AS (
  SELECT v, SUM(grp_a) AS ca, COUNT(*) - SUM(grp_a) AS cb
  FROM sample GROUP BY v
),
totals AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts
),
ecdf AS (
  SELECT SUM(ca) OVER (ORDER BY v) * 1.0 / NULLIF(totals.na, 0) AS fa,
         SUM(cb) OVER (ORDER BY v) * 1.0 / NULLIF(totals.nb, 0) AS fb
  FROM counts, totals
),
dex AS (SELECT MAX(ABS(fa - fb)) AS d_exact FROM ecdf),
bcounts AS (
  SELECT CAST(v * 100 AS BIGINT) // {_KSB_WIDTH_CENTS} AS b,
         SUM(ca) AS ba, SUM(cb) AS bb
  FROM counts GROUP BY 1
),
becdf AS (
  SELECT SUM(ba) OVER (ORDER BY b) * 1.0 / NULLIF(totals.na, 0) AS fa,
         SUM(bb) OVER (ORDER BY b) * 1.0 / NULLIF(totals.nb, 0) AS fb,
         ba * 1.0 / NULLIF(totals.na, 0)
           + bb * 1.0 / NULLIF(totals.nb, 0) AS mass
  FROM bcounts, totals
),
bagg AS (
  SELECT MAX(ABS(fa - fb)) AS d_hat, MAX(mass) AS bound,
         CAST(COUNT(*) AS BIGINT) AS nbk
  FROM becdf
)
SELECT CAST(t.na AS BIGINT) AS n_a,
       CAST(t.nb AS BIGINT) AS n_b,
       b.nbk AS n_buckets,
       ROUND(d.d_exact, 6) AS ks_d_exact,
       ROUND(b.d_hat, 6) AS ks_d_bucketed,
       ROUND(b.bound, 6) AS gap_bound,
       (d.d_exact >= b.d_hat AND d.d_exact <= b.d_hat + b.bound)
         AS within_bound,
       ((d.d_exact > 1.358 * SQRT((t.na + t.nb) * 1.0
                                  / NULLIF(t.na * t.nb, 0)))
        = (b.d_hat > 1.358 * SQRT((t.na + t.nb) * 1.0
                                  / NULLIF(t.na * t.nb, 0))))
         AS decision_agrees
FROM totals t, dex d, bagg b
"""


@register("ks_bucketed_drift", oracle=_KSB_ORACLE, tags=("stats", "audit"))
def ks_bucketed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-first KS drift twin with its own substitution audit —
    the executable version of ``ks_two_sample_drift``'s "at 100 TB
    you'd quantize values first" docstring promise (the
    percentile_sketch_error pattern applied to a rank statistic).

    The exact two-sample D runs at value grain (distinct prices ≈ row
    grain for a continuous money column — fine at test SF, the thing
    being replaced at 100 TB). The production spelling buckets prices
    into fixed $100 cells FIRST (pure integer cents DIV — the bucket
    count is bounded by the price RANGE, not the corpus), computes D̂
    over the ~1.1k bucket boundaries, and carries its analytic error
    bound: evaluating the ECDF gap only at bucket edges misses at
    most one bucket's combined probability mass, so
    D̂ ≤ D ≤ D̂ + max_b(ca_b/n_a + cb_b/n_b). Both the bound
    (within_bound) and the downstream DECISION (drifted at the 5%
    critical value — a sketch inside tolerance can still flip a
    threshold decision, so the decision is audited separately) are
    emitted as booleans the driver hashes.

    Determinism: integer cumsums over exact counts; every ECDF value
    is one division of exact integers (identical IEEE doubles both
    engines); D̂'s candidate gaps are a SUBSET of the exact D's (the
    bucket-edge ECDF equals the value-grain ECDF at the last value in
    the bucket — same integer sum, same division), so d_hat ≤ d_exact
    holds bitwise, not just analytically; comparisons use UNROUNDED
    doubles; displayed stats ROUND 6.

    Scale: one map-combinable hash-agg to value grain (shared with
    the exact side), one to the bounded bucket grain; the bucket-
    grain cumulative window is ~1.1k rows regardless of corpus size.
    At 100 TB only the bucketed side ships; the exact side is the
    audit harness.
    """
    li = read_table(spark, sf_dir, "lineitem")
    sample = li.select(
        F.col("l_extendedprice").alias("v"),
        F.when(F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"), 1)
        .otherwise(0)
        .alias("grp_a"),
    )
    counts = sample.groupBy("v").agg(
        F.sum("grp_a").alias("ca"),
        (F.count("*") - F.sum("grp_a")).alias("cb"),
    )
    totals = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w_v = Window.orderBy("v")
    ecdf = counts.crossJoin(F.broadcast(totals)).select(
        (F.sum("ca").over(w_v) * 1.0 / F.nullif(F.col("na"), F.lit(0)))
        .alias("fa"),
        (F.sum("cb").over(w_v) * 1.0 / F.nullif(F.col("nb"), F.lit(0)))
        .alias("fb"),
    )
    dex = ecdf.agg(F.max(F.abs(F.col("fa") - F.col("fb"))).alias("d_exact"))
    bcounts = counts.groupBy(
        F.expr(f"CAST(v * 100 AS BIGINT) DIV {_KSB_WIDTH_CENTS}").alias("b")
    ).agg(F.sum("ca").alias("ba"), F.sum("cb").alias("bb"))
    w_b = Window.orderBy("b")
    becdf = bcounts.crossJoin(F.broadcast(totals)).select(
        (F.sum("ba").over(w_b) * 1.0 / F.nullif(F.col("na"), F.lit(0)))
        .alias("fa"),
        (F.sum("bb").over(w_b) * 1.0 / F.nullif(F.col("nb"), F.lit(0)))
        .alias("fb"),
        (
            F.col("ba") * 1.0 / F.nullif(F.col("na"), F.lit(0))
            + F.col("bb") * 1.0 / F.nullif(F.col("nb"), F.lit(0))
        ).alias("mass"),
    )
    bagg = becdf.agg(
        F.max(F.abs(F.col("fa") - F.col("fb"))).alias("d_hat"),
        F.max("mass").alias("bound"),
        F.count("*").cast("long").alias("nbk"),
    )
    crit = 1.358 * F.sqrt(
        (F.col("na") + F.col("nb"))
        * 1.0
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0))
    )
    return (
        totals.crossJoin(F.broadcast(dex))
        .crossJoin(F.broadcast(bagg))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.col("nbk").alias("n_buckets"),
            F.round("d_exact", 6).alias("ks_d_exact"),
            F.round("d_hat", 6).alias("ks_d_bucketed"),
            F.round("bound", 6).alias("gap_bound"),
            (
                (F.col("d_exact") >= F.col("d_hat"))
                & (F.col("d_exact") <= F.col("d_hat") + F.col("bound"))
            ).alias("within_bound"),
            (
                (F.col("d_exact") > crit) == (F.col("d_hat") > crit)
            ).alias("decision_agrees"),
        )
    )


# ---------------------------------------------------------------------------
# Bucket-first Mann–Whitney U twin: the 100 TB spelling, self-auditing
# ---------------------------------------------------------------------------

_MWUB_WIDTH_CENTS = 10_000  # $100-wide cells: price span / 100 ≈ 5k buckets

_MWUB_ORACLE = f"""
WITH sample AS (
  SELECT o_totalprice AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp_a
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
cells AS (
  SELECT v, SUM(grp_a) AS ca, COUNT(*) - SUM(grp_a) AS cb
  FROM sample GROUP BY v
),
mid AS (
  SELECT ca, ca + cb AS t,
         SUM(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS below
  FROM cells
),
ex AS (
  SELECT SUM(CAST(ca AS DECIMAL(28,1))
             * CAST(COALESCE(below, 0) + (t + 1) / 2.0
                    AS DECIMAL(18,1))) AS ra,
         CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(t - ca) AS BIGINT) AS nb,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_ex
  FROM mid
),
bcells AS (
  SELECT CAST(v * 100 AS BIGINT) // {_MWUB_WIDTH_CENTS} AS b,
         SUM(ca) AS ca, SUM(cb) AS cb
  FROM cells GROUP BY 1
),
bmid AS (
  SELECT ca, cb, ca + cb AS t,
         SUM(ca + cb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS below
  FROM bcells
),
bx AS (
  SELECT SUM(CAST(ca AS DECIMAL(28,1))
             * CAST(COALESCE(below, 0) + (t + 1) / 2.0
                    AS DECIMAL(18,1))) AS ra_hat,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_hat,
         SUM(CAST(ca AS DECIMAL(28,1)) * cb) AS cross_pairs,
         CAST(COUNT(*) AS BIGINT) AS nbk
  FROM bmid
)
SELECT na AS n_a,
       nb AS n_b,
       nbk AS n_buckets,
       CAST(ra - CAST(na * (na + 1) AS DECIMAL(18,1)) / 2 AS DOUBLE)
         AS u_exact,
       CAST(ra_hat - CAST(na * (na + 1) AS DECIMAL(18,1)) / 2 AS DOUBLE)
         AS u_bucketed,
       CAST(cross_pairs AS DOUBLE) / 2 AS u_bound,
       (ABS(CAST(ra - ra_hat AS DOUBLE)) * 2
          <= CAST(cross_pairs AS DOUBLE)) AS within_bound,
       ROUND((CAST(ra AS DOUBLE) - na * (na + 1) / 2.0 - na * nb / 2.0)
             / NULLIF(SQRT(na * 1.0 * nb / 12.0
                    * ((na + nb + 1)
                       - tie_ex * 1.0
                         / NULLIF((na + nb) * (na + nb - 1), 0))), 0),
             6) AS z_exact,
       ROUND((CAST(ra_hat AS DOUBLE) - na * (na + 1) / 2.0 - na * nb / 2.0)
             / NULLIF(SQRT(na * 1.0 * nb / 12.0
                    * ((na + nb + 1)
                       - tie_hat * 1.0
                         / NULLIF((na + nb) * (na + nb - 1), 0))), 0),
             6) AS z_bucketed,
       ((ABS((CAST(ra AS DOUBLE) - na * (na + 1) / 2.0 - na * nb / 2.0)
             / NULLIF(SQRT(na * 1.0 * nb / 12.0
                    * ((na + nb + 1)
                       - tie_ex * 1.0
                         / NULLIF((na + nb) * (na + nb - 1), 0))), 0)) > 1.96)
        = (ABS((CAST(ra_hat AS DOUBLE) - na * (na + 1) / 2.0
                - na * nb / 2.0)
             / NULLIF(SQRT(na * 1.0 * nb / 12.0
                    * ((na + nb + 1)
                       - tie_hat * 1.0
                         / NULLIF((na + nb) * (na + nb - 1), 0))), 0)) > 1.96))
         AS decision_agrees
FROM ex CROSS JOIN bx
"""


@register(
    "mann_whitney_u_bucketed", oracle=_MWUB_ORACLE, tags=("stats", "audit")
)
def mann_whitney_u_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-first Mann–Whitney U twin with its own substitution audit
    — the ``ks_bucketed_drift`` pattern (bound + decision agreement)
    ported to the rank-sum test, executing the bucket hook that
    ``mann_whitney_u``'s docstring promises in prose.

    The exact U runs at value grain (distinct prices ≈ row grain for a
    continuous money column — the thing being replaced at 100 TB).
    The production spelling quantizes prices into fixed $100 cells
    FIRST (pure integer cents DIV — bucket count bounded by the price
    RANGE, not the corpus), computes midranks over the ~5k bucket
    boundaries, and carries an analytic error bound derived from the
    pair formulation U = Σ_pairs [1(a>b) + ½·1(a=b)]: quantization can
    only move SAME-bucket cross-group pairs, each by at most ½, so
    |U − Û| ≤ ½·Σ_b ca_b·cb_b — computable from the BUCKET side alone
    (at 100 TB only the bucketed side ships; the exact side here is
    the audit harness). Both the bound (within_bound) and the
    downstream DECISION (|z| > 1.96 at the 5% level — a sketch inside
    tolerance can still flip a threshold decision, so the decision is
    audited separately, the engine's sampling-audit convention) are
    emitted as booleans the driver hashes.

    Determinism: midranks are exact .5-step decimals on both grains
    (rank sums order-free in DECIMAL); U values and the bound are
    half-integers compared UNROUNDED via exact doubles; tie terms are
    exact BIGINTs; z's division chain is NULLIF-guarded like the
    exact query (degenerate inputs agree as NULL) and displayed
    ROUND 6.

    Scale: one map-combinable hash-agg to value grain (shared with
    the exact side), one to the bounded bucket grain; the bucket-
    grain cumulative window is ~5k rows regardless of corpus size.
    """
    o = read_table(spark, sf_dir, "orders")
    cells = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("ca"),
            F.sum(
                F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)
            )
            .cast("long")
            .alias("cb"),
        )
    )

    def _ranksum(grain: DataFrame, order_col: str):
        # (ca, cb, order) -> one row: decimal rank-sum of group A,
        # exact tie term, plus pass-through count sums. The midrank
        # machinery shared by both grains — value and bucket.
        w_cum = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        mid = grain.select(
            "ca",
            "cb",
            (F.col("ca") + F.col("cb")).alias("t"),
            F.sum(F.col("ca") + F.col("cb")).over(w_cum).alias("below"),
        )
        midrank = (
            F.coalesce(F.col("below"), F.lit(0)) + (F.col("t") + 1) / 2.0
        ).cast("decimal(18,1)")
        return mid, midrank

    mid, midrank = _ranksum(cells, "v")
    ex = mid.agg(
        F.sum(F.col("ca").cast("decimal(28,1)") * midrank).alias("ra"),
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_ex"),
    )
    bcells = cells.groupBy(
        F.expr(f"CAST(v * 100 AS BIGINT) DIV {_MWUB_WIDTH_CENTS}").alias("b")
    ).agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    bmid, bmidrank = _ranksum(bcells, "b")
    bx = bmid.agg(
        F.sum(F.col("ca").cast("decimal(28,1)") * bmidrank).alias("ra_hat"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_hat"),
        F.sum(F.col("ca").cast("decimal(28,1)") * F.col("cb")).alias(
            "cross_pairs"
        ),
        F.count("*").cast("long").alias("nbk"),
    )
    na, nb = F.col("na"), F.col("nb")

    def _z(r_col: str, tie_col: str):
        sigma = F.sqrt(
            na * 1.0 * nb / 12.0
            * (
                (na + nb + 1)
                - F.col(tie_col)
                * 1.0
                / F.nullif((na + nb) * (na + nb - 1), F.lit(0))
            )
        )
        return (
            F.col(r_col).cast("double") - na * (na + 1) / 2.0 - na * nb / 2.0
        ) / F.nullif(sigma, F.lit(0.0))

    half_na = F.col("na") * (F.col("na") + 1)
    u_of = lambda r: (  # noqa: E731
        F.col(r) - half_na.cast("decimal(18,1)") / 2
    ).cast("double")
    return ex.crossJoin(F.broadcast(bx)).select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.col("nbk").alias("n_buckets"),
        u_of("ra").alias("u_exact"),
        u_of("ra_hat").alias("u_bucketed"),
        (F.col("cross_pairs").cast("double") / 2).alias("u_bound"),
        (
            F.abs((F.col("ra") - F.col("ra_hat")).cast("double")) * 2
            <= F.col("cross_pairs").cast("double")
        ).alias("within_bound"),
        F.round(_z("ra", "tie_ex"), 6).alias("z_exact"),
        F.round(_z("ra_hat", "tie_hat"), 6).alias("z_bucketed"),
        (
            (F.abs(_z("ra", "tie_ex")) > 1.96)
            == (F.abs(_z("ra_hat", "tie_hat")) > 1.96)
        ).alias("decision_agrees"),
    )
