"""Round-8 batch 19: the k-group hypothesis-testing completion —

- ``oneway_anova_f``: one-way ANOVA F across the five order
  priorities on order totals — the k-group generalization of
  ``welch_ttest_promo``'s two-group read. Pure sufficient statistics
  (n, Σx, Σx² per group in exact DECIMAL), SSB/SSW assembled from
  group-grain terms by the round-then-decimal-sum rule, plus the η²
  effect size ("what fraction of total variance does the grouping
  explain" — the number an experimenter actually reports).
- ``kruskal_wallis_h``: the rank-based k-group test (the
  ``mann_whitney_u`` generalization) with tie correction — but
  spelled at VALUE grain: midranks come from a cumulative count over
  DISTINCT prices, and per-group rank sums are Σ cnt·midrank, so the
  global-order window rides the deduplicated value grain instead of
  the fact rows (the registry's value-grain discipline; MWU's
  docstring promises this refactor at scale — this query performs
  it).
- ``cochran_armitage_trend``: the trend-in-proportions test across
  ORDERED groups (is the fulfilled-rate monotone in order priority?)
  — chi-square sees any deviation; Cochran–Armitage spends its single
  degree of freedom on the monotone alternative, the right test for
  ordinal factors. Every input is an exact BIGINT count; the z
  statistic is one pinned IEEE expression over five integer-exact
  group rows.

Registry conventions (plans/registry.py): decimal sufficient stats,
ROUND 6 on divisions/transcendentals, round-then-decimal-sum for
order-free float totals, BIGINT/DOUBLE oracle casts, atomic outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# One-way ANOVA F across order priorities
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH g AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s_g,
         -- VARCHAR round-trip: DuckDB's wide-DECIMAL -> DOUBLE cast is
         -- not correctly rounded once the unscaled value exceeds 2^53
         -- (Spark's is); string -> double parsing IS correctly rounded
         -- in both engines, so the round-trip pins the identical double.
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                       * CAST(o_totalprice AS DECIMAL(18,2)))
                   AS VARCHAR) AS DOUBLE) AS q_g
  FROM orders GROUP BY o_orderpriority
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s_g) AS DOUBLE) AS s
  FROM g
), terms AS (
  SELECT t.n, t.k, grp,
         n_g * (CAST(s_g AS DOUBLE) / n_g - s / t.n)
             * (CAST(s_g AS DOUBLE) / n_g - s / t.n) AS bt,
         q_g - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g AS wt
  FROM g CROSS JOIN tot t
), ss AS (
  SELECT MAX(n) AS n, MAX(k) AS k,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(bt ORDER BY grp)),
                     (a, b) -> a + b) AS ssb,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(wt ORDER BY grp)),
                     (a, b) -> a + b) AS ssw
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS n_groups,
       ssb AS ss_between,
       ssw AS ss_within,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
       ROUND(ssb / (ssb + ssw), 6) AS eta_sq
FROM ss
"""


@register("oneway_anova_f", oracle=_ANOVA_ORACLE, tags=("stats", "agg"))
def oneway_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of order totals across the five order
    priorities — does the grouping explain any of the money variance?
    F = MS_between / MS_within from exact per-group sufficient
    statistics, plus η² = SSB/(SSB+SSW), the variance-explained
    effect size. The k-group generalization of ``welch_ttest_promo``
    (same sufficient-stats discipline; equal-variance pooled form, as
    classic ANOVA specifies).

    Determinism: prices are exact 2-decimal values, so n/Σx/Σx² per
    group are exact DECIMAL aggregates in both engines. Two traps hit
    and fixed here: (1) Σx² ≈ 2.5e14 at scale 4 exceeds 2^53 unscaled
    units, where DuckDB's DECIMAL→DOUBLE cast is NOT correctly rounded
    (Spark's is) — the oracle round-trips through VARCHAR, whose
    string→double parse is correctly rounded in both engines; (2) the
    SSB/SSW terms are ~1e10–1e13 doubles where ROUND-6-then-decimal
    is meaningless, so the 5 group terms are summed by the ORDER-
    PINNED FOLD (grp-sorted list, sequential fold — the extras18
    pattern), giving a bit-identical addition chain. F and η² are
    pinned IEEE expressions over identical doubles, ROUND 6.

    Scale: one map-combined fact pass to the |priorities|=5 group
    grain; the grand totals are an aggregate OF that grain (broadcast
    back); all test math runs on 5 rows. Nothing touches fact rows
    twice.
    """
    o = read_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(x).alias("s_g"),
        F.sum(x * x).alias("q_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum("s_g").cast("double").alias("s"),
    )
    dev = F.col("s_g").cast("double") / F.col("n_g") - F.col("s") / F.col("n")
    terms = g.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        "grp",
        (F.col("n_g") * dev * dev).alias("bt"),
        (
            F.col("q_g").cast("double")
            - F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g")
        ).alias("wt"),
    )

    def _fold(col: str) -> Column:
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("grp", F.col(col).alias("v")))),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    ssb, ssw = _fold("bt"), _fold("wt")
    n, k = F.max("n"), F.max("k")
    return terms.agg(
        n.cast("bigint").alias("n_rows"),
        k.cast("bigint").alias("n_groups"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Kruskal–Wallis H (value-grain midranks, tie-corrected)
# ---------------------------------------------------------------------------

_KW_ORACLE = """
WITH cells AS (
  SELECT o_totalprice AS v, o_orderpriority AS grp,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
), vals AS (
  SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM cells GROUP BY v
), mid AS (
  SELECT v, t,
         SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS below
  FROM vals
), ranksum AS (
  SELECT c.grp,
         CAST(SUM(c.cnt) AS BIGINT) AS n_g,
         SUM(CAST(c.cnt AS DECIMAL(28,1))
             * CAST(COALESCE(m.below, 0) + (m.t + 1) / 2.0
                    AS DECIMAL(18,1))) AS r_g
  FROM cells c JOIN mid m ON m.v = c.v
  GROUP BY c.grp
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
  FROM ranksum
), ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term FROM vals
), hterm AS (
  SELECT t.n, t.k, grp,
         CAST(r_g AS DOUBLE) * CAST(r_g AS DOUBLE) / n_g AS rterm
  FROM ranksum CROSS JOIN tot t
), h AS (
  SELECT MAX(n) AS n, MAX(k) AS k,
         12.0 / (MAX(n) * (MAX(n) + 1.0))
           * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(rterm ORDER BY grp)),
                         (a, b) -> a + b)
           - 3.0 * (MAX(n) + 1) AS h_raw
  FROM hterm
)
SELECT CAST(h.n AS BIGINT) AS n_rows,
       CAST(h.k AS BIGINT) AS n_groups,
       ROUND(h_raw, 6) AS h_stat,
       ROUND(h_raw / (1.0 - CAST(tie_term AS DOUBLE)
                            / (CAST(h.n AS DOUBLE) * h.n * h.n - h.n)), 6)
         AS h_tie_corrected,
       ROUND((h_raw - h.k + 1) / (h.n - h.k), 6) AS epsilon_sq
FROM h CROSS JOIN ties
"""


@register(
    "kruskal_wallis_h", oracle=_KW_ORACLE, tags=("stats", "window", "baseline")
)
def kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the five order priorities on order
    totals — the rank-based k-group test (``mann_whitney_u``'s
    generalization), tie-corrected, with the ε² effect size. H is the
    nonparametric cross-check on ``oneway_anova_f``: agreement means
    the ANOVA read isn't an artifact of the money column's heavy tail.

    Value-grain midranks: instead of ranking fact rows (MWU's global
    sort window over the sample), counts collapse to (value, group)
    cells, midrank(v) = (#rows below v) + (t_v + 1)/2 from ONE
    cumulative window over DISTINCT values, and per-group rank sums
    are Σ cnt·midrank — exact half-integer arithmetic in
    DECIMAL(28,1), so rank sums are order-free in both engines.

    Determinism: midranks are exact .5-step decimals; the R_g²/n_g
    terms are ~1e12 doubles (decimal-cast unsafe), so the 5 group
    terms are summed by the order-pinned fold (grp-sorted list,
    sequential fold); the tie term Σ(t³−t) is exact BIGINT; H /
    correction / ε² are pinned IEEE expressions, ROUND 6.

    Scale: one map-combined pass to (value, group) cells, one
    value-grain cumulative window (distinct values ≪ fact rows; at
    100 TB bucket values first — the cells CTE is already the hook),
    one 5-row group agg. The fact table is scanned once.
    """
    o = read_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").alias("grp"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    vals = cells.groupBy("v").agg(F.sum("cnt").cast("long").alias("t"))
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    mid = vals.select(
        "v", "t", F.sum("t").over(w_cum).alias("below")
    )
    midrank = (
        F.coalesce(F.col("below"), F.lit(0)) + (F.col("t") + 1) / 2.0
    ).cast("decimal(18,1)")
    ranksum = (
        cells.join(mid, "v")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(F.col("cnt").cast("decimal(28,1)") * midrank).alias("r_g"),
        )
    )
    tot = ranksum.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    ties = vals.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_term")
    )
    hterm = ranksum.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        "grp",
        (
            F.col("r_g").cast("double")
            * F.col("r_g").cast("double")
            / F.col("n_g")
        ).alias("rterm"),
    )
    n, k = F.max("n"), F.max("k")
    rsum = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("grp", F.col("rterm").alias("v")))),
            lambda s: s["v"],
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    h_raw = (
        F.lit(12.0) / (n * (n + F.lit(1.0))) * rsum - F.lit(3.0) * (n + 1)
    )
    h = hterm.agg(
        n.cast("bigint").alias("n_rows"),
        k.cast("bigint").alias("n_groups"),
        F.round(h_raw, 6).alias("h_stat"),
        h_raw.alias("_h"),
        n.alias("_n"),
        k.alias("_k"),
    )
    nn = F.col("_n").cast("double")
    return h.crossJoin(F.broadcast(ties)).select(
        "n_rows",
        "n_groups",
        "h_stat",
        F.round(
            F.col("_h")
            / (
                F.lit(1.0)
                - F.col("tie_term").cast("double")
                / (nn * F.col("_n") * F.col("_n") - F.col("_n"))
            ),
            6,
        ).alias("h_tie_corrected"),
        F.round(
            (F.col("_h") - F.col("_k") + 1) / (F.col("_n") - F.col("_k")), 6
        ).alias("epsilon_sq"),
    )


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test (fulfilled-rate vs ordinal priority)
# ---------------------------------------------------------------------------

_CA_ORACLE = """
WITH g AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS r_g
  FROM orders GROUP BY 1
), st AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(r_g) AS BIGINT) AS r,
         CAST(SUM(s * r_g) AS BIGINT) AS sr,
         CAST(SUM(s * n_g) AS BIGINT) AS sn,
         CAST(SUM(s * s * n_g) AS BIGINT) AS ssn
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(r AS BIGINT) AS n_success,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS pooled_rate,
       ROUND((CAST(sr AS DOUBLE) - CAST(r AS DOUBLE) * sn / n)
             / SQRT(CAST(r AS DOUBLE) / n * (1.0 - CAST(r AS DOUBLE) / n)
                    * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n)),
             6) AS z_trend
FROM st
"""


@register("cochran_armitage_trend", oracle=_CA_ORACLE, tags=("stats", "agg"))
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage test for trend in the fulfilled-order rate
    across ORDERED priorities (scores 1..5 parsed from the priority
    label). Chi-square burns k−1 degrees of freedom on ANY deviation;
    Cochran–Armitage spends one df on the monotone alternative —
    the correct test when the factor is ordinal (dose-response,
    severity tiers, priority ladders). z = Σs(r_g − n_g·p̄) /
    √(p̄(1−p̄)(Σn_g s² − (Σn_g s)²/N)).

    Determinism: every sufficient statistic (N, R, Σs·r, Σs·n,
    Σs²·n) is an exact BIGINT from one group-grain agg; z is a single
    pinned IEEE expression over them, ROUND 6. Nothing floats until
    the final formula.

    Scale: one map-combined fact pass to the 5-row score grain; the
    test statistic is an aggregate of 5 integer rows.
    """
    o = read_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("s")
    ).agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("r_g"),
    )
    st = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("r_g").cast("long").alias("r"),
        F.sum(F.col("s") * F.col("r_g")).cast("long").alias("sr"),
        F.sum(F.col("s") * F.col("n_g")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_g"))
        .cast("long")
        .alias("ssn"),
    )
    n, r = F.col("n"), F.col("r")
    p = r.cast("double") / n
    return st.select(
        n.cast("bigint").alias("n_rows"),
        r.cast("bigint").alias("n_success"),
        F.round(p, 6).alias("pooled_rate"),
        F.round(
            (F.col("sr").cast("double") - r.cast("double") * F.col("sn") / n)
            / F.sqrt(
                p
                * (F.lit(1.0) - p)
                * (
                    F.col("ssn").cast("double")
                    - F.col("sn").cast("double") * F.col("sn") / n
                )
            ),
            6,
        ).alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# Bucket-first Kruskal–Wallis twin: the 100 TB spelling, self-auditing
# ---------------------------------------------------------------------------

_KWB_WIDTH_CENTS = 10_000  # $100-wide cells: price span / 100 ≈ 5k buckets
_KWB_CHI2_CRIT = 9.487729  # chi-square 0.95 quantile at df = k-1 = 4

_KWB_ORACLE = f"""
WITH cells AS (
  SELECT o_totalprice AS v, o_orderpriority AS grp,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
), vals AS (
  SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM cells GROUP BY v
), mid AS (
  SELECT v, t,
         SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS below
  FROM vals
), rs_ex AS (
  SELECT c.grp,
         CAST(SUM(c.cnt) AS BIGINT) AS n_g,
         SUM(CAST(c.cnt AS DECIMAL(28,1))
             * CAST(COALESCE(m.below, 0) + (m.t + 1) / 2.0
                    AS DECIMAL(18,1))) AS r_g
  FROM cells c JOIN mid m ON m.v = c.v
  GROUP BY c.grp
), tie_ex AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie FROM vals
), bcells AS (
  SELECT CAST(v * 100 AS BIGINT) // {_KWB_WIDTH_CENTS} AS b, grp,
         CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2
), bvals AS (
  SELECT b, CAST(SUM(cnt) AS BIGINT) AS t FROM bcells GROUP BY b
), bmid AS (
  SELECT b, t,
         SUM(t) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS below
  FROM bvals
), rs_hat AS (
  SELECT c.grp,
         SUM(CAST(c.cnt AS DECIMAL(28,1))
             * CAST(COALESCE(m.below, 0) + (m.t + 1) / 2.0
                    AS DECIMAL(18,1))) AS r_g_hat,
         CAST(SUM(c.cnt * (m.t - 1)) AS BIGINT) AS bound2
  FROM bcells c JOIN bmid m ON m.b = c.b
  GROUP BY c.grp
), tie_hat AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie,
         CAST(COUNT(*) AS BIGINT) AS nbk
  FROM bvals
), per AS (
  SELECT e.grp, e.n_g, e.r_g, h.r_g_hat, h.bound2
  FROM rs_ex e JOIN rs_hat h ON h.grp = e.grp
), agg AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(CAST(r_g AS DOUBLE) * CAST(r_g AS DOUBLE) / n_g
                  ORDER BY grp)), (a, b) -> a + b) AS rsum_ex,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(CAST(r_g_hat AS DOUBLE) * CAST(r_g_hat AS DOUBLE) / n_g
                  ORDER BY grp)), (a, b) -> a + b) AS rsum_hat,
         MIN(CASE WHEN ABS(CAST(r_g - r_g_hat AS DOUBLE)) * 2
                       <= CAST(bound2 AS DOUBLE) THEN 1 ELSE 0 END)
           AS all_ok,
         MAX(CAST(bound2 AS DOUBLE)) / 2 AS bound_max
  FROM per
), h2 AS (
  SELECT n, k, all_ok, bound_max, tie_hat.nbk,
         (12.0 / (n * (n + 1.0)) * rsum_ex - 3.0 * (n + 1))
           / (1.0 - CAST(tie_ex.tie AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n * n - n)) AS h_ex,
         (12.0 / (n * (n + 1.0)) * rsum_hat - 3.0 * (n + 1))
           / (1.0 - CAST(tie_hat.tie AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n * n - n)) AS h_hat
  FROM agg CROSS JOIN tie_ex CROSS JOIN tie_hat
)
SELECT n AS n_rows,
       k AS n_groups,
       nbk AS n_buckets,
       ROUND(h_ex, 6) AS h_exact,
       ROUND(h_hat, 6) AS h_bucketed,
       ROUND(bound_max, 6) AS ranksum_bound_max,
       (all_ok = 1) AS within_bound,
       ((h_ex > {_KWB_CHI2_CRIT}) = (h_hat > {_KWB_CHI2_CRIT}))
         AS decision_agrees
FROM h2
"""


@register(
    "kruskal_wallis_h_bucketed", oracle=_KWB_ORACLE, tags=("stats", "audit")
)
def kruskal_wallis_h_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-first Kruskal–Wallis twin with its own substitution audit
    — the ``ks_bucketed_drift`` pattern ported to the k-group rank
    test, executing the bucket hook ``kruskal_wallis_h``'s docstring
    promises in prose ("at 100 TB bucket values first").

    The exact H runs at value grain (distinct prices ≈ row grain for a
    continuous money column). The production spelling quantizes prices
    into fixed $100 cells FIRST (integer cents DIV — bucket count
    bounded by the price RANGE, not the corpus), computes midranks
    over the bounded bucket grain, and carries an analytic PER-GROUP
    rank-sum bound derived from midrank geometry: within a bucket of
    t_b pooled rows the exact midranks span at most (t_b−1)/2 around
    the bucket midrank, so |R_g − R̂_g| ≤ Σ_b cnt_gb·(t_b−1)/2 —
    computable from the BUCKET side alone (at 100 TB only the
    bucketed side ships; the exact side here is the audit harness).
    The audit emits both the bound check (within_bound, ANDed over
    all k groups) and the downstream DECISION agreement (tie-corrected
    H against the chi-square df=4 5% critical value 9.487729 — a
    sketch inside rank tolerance can still flip a threshold decision,
    so the decision is audited separately).

    Determinism: midranks are exact .5-step decimals on both grains;
    per-group rank sums are order-free DECIMAL; the k R²/n terms are
    ~1e12 doubles summed by the order-pinned fold on BOTH sides (grp-
    sorted list, sequential fold — the exact query's convention); tie
    terms exact BIGINT; H ROUND 6; the bound check compares exact
    integers (2·|ΔR| ≤ Σ cnt·(t−1)).

    Scale: one map-combined pass to (value, group) cells shared with
    the exact side, one to the bounded (bucket, group) grain; the
    bucket-grain cumulative window is ~5k rows at any corpus size.
    """
    o = read_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").alias("grp"),
    ).agg(F.count("*").cast("long").alias("cnt"))

    def _midrank_frame(grain: DataFrame, order_col: str):
        vals = grain.groupBy(order_col).agg(
            F.sum("cnt").cast("long").alias("t")
        )
        w_cum = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        mid = vals.select(
            order_col, "t", F.sum("t").over(w_cum).alias("below")
        )
        midrank = (
            F.coalesce(F.col("below"), F.lit(0)) + (F.col("t") + 1) / 2.0
        ).cast("decimal(18,1)")
        tie = vals.agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie"),
            F.count("*").cast("long").alias("nbk"),
        )
        return mid, midrank, tie

    mid, midrank, ties_ex = _midrank_frame(cells, "v")
    rs_ex = (
        cells.join(mid, "v")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(F.col("cnt").cast("decimal(28,1)") * midrank).alias("r_g"),
        )
    )
    bcells = cells.groupBy(
        F.expr(f"CAST(v * 100 AS BIGINT) DIV {_KWB_WIDTH_CENTS}").alias("b"),
        "grp",
    ).agg(F.sum("cnt").cast("long").alias("cnt"))
    bmid, bmidrank, ties_hat = _midrank_frame(bcells, "b")
    rs_hat = (
        bcells.join(bmid, "b")
        .groupBy("grp")
        .agg(
            F.sum(F.col("cnt").cast("decimal(28,1)") * bmidrank).alias(
                "r_g_hat"
            ),
            F.sum(F.col("cnt") * (F.col("t") - 1))
            .cast("long")
            .alias("bound2"),
        )
    )
    per = rs_ex.join(rs_hat, "grp")

    def _fold(r_col: str) -> Column:
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "grp",
                            (
                                F.col(r_col).cast("double")
                                * F.col(r_col).cast("double")
                                / F.col("n_g")
                            ).alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    agg = per.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        _fold("r_g").alias("rsum_ex"),
        _fold("r_g_hat").alias("rsum_hat"),
        F.min(
            F.when(
                F.abs((F.col("r_g") - F.col("r_g_hat")).cast("double")) * 2
                <= F.col("bound2").cast("double"),
                1,
            ).otherwise(0)
        ).alias("all_ok"),
        (F.max(F.col("bound2").cast("double")) / 2).alias("bound_max"),
    )
    n = F.col("n")

    def _h(rsum_col: str, tie_col: Column) -> Column:
        h_raw = (
            F.lit(12.0) / (n * (n + F.lit(1.0))) * F.col(rsum_col)
            - F.lit(3.0) * (n + 1)
        )
        return h_raw / (
            F.lit(1.0)
            - tie_col.cast("double")
            / (n.cast("double") * n * n - n)
        )

    h_ex = _h("rsum_ex", F.col("tie_ex"))
    h_hat = _h("rsum_hat", F.col("tie_hat"))
    return (
        agg.crossJoin(
            F.broadcast(
                ties_ex.select(F.col("tie").alias("tie_ex"))
            )
        )
        .crossJoin(
            F.broadcast(
                ties_hat.select(
                    F.col("tie").alias("tie_hat"), F.col("nbk")
                )
            )
        )
        .select(
            n.alias("n_rows"),
            F.col("k").alias("n_groups"),
            F.col("nbk").alias("n_buckets"),
            F.round(h_ex, 6).alias("h_exact"),
            F.round(h_hat, 6).alias("h_bucketed"),
            F.round("bound_max", 6).alias("ranksum_bound_max"),
            (F.col("all_ok") == 1).alias("within_bound"),
            (
                (h_ex > F.lit(_KWB_CHI2_CRIT))
                == (h_hat > F.lit(_KWB_CHI2_CRIT))
            ).alias("decision_agrees"),
        )
    )
