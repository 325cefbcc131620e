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


@register("kruskal_wallis_h", oracle=_KW_ORACLE, tags=("stats", "window"))
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
