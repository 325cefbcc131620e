"""Round-8 batch 21: model-evaluation completion — the three readouts
an experimentation/serving pipeline still lacked:

- ``decile_lift_table``: the marketing-science lift & gains chart as
  a table — score customers by account balance, split into NTILE(10)
  deciles over a total order, and report per-decile response rate
  (responder = customer with ≥1 returned lineitem), lift vs the base
  rate, and cumulative capture. THE standard readout for "is this
  score worth targeting with" — AUC's business-facing sibling
  (``auc_quality_langid`` covers the ROC read).
- ``mcnemar_paired_gates``: McNemar's test on the SAME two document-
  quality raters as ``cohens_kappa_quality`` (char-length ≥ 128 vs
  token-count ≥ 24). Kappa answers "do they agree"; McNemar answers
  the different question "is one systematically stricter" — it reads
  ONLY the discordant cells, the paired-classifier comparison test
  (Dietterich). Both plain and continuity-corrected statistics.
- ``cliffs_delta_priority``: Cliff's δ between URGENT and LOW order
  totals — the nonparametric effect size companion to
  ``mann_whitney_u`` (same two samples; MWU says "significant?", δ
  says "how big?"). Spelled EXACTLY: dominance pair counts n_gt /
  n_eq / n_lt come from value-grain cell counts and one cumulative
  window over distinct values — all BIGINT until the final division
  (no midranks, no doubles, no global fact-row sort).

Registry conventions (plans/registry.py): exact BIGINT counts, ROUND
6 on ratios, NULLIF degenerate guards both sides, atomic outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import (
    bucketed_running_sum,
    register,
)
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Decile lift & gains table (score: acctbal; response: any return)
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH resp AS (
  SELECT DISTINCT o.o_custkey AS custkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
), scored AS (
  SELECT c.c_custkey,
         CASE WHEN r.custkey IS NULL THEN 0 ELSE 1 END AS y,
         NTILE(10) OVER (ORDER BY c.c_acctbal DESC, c.c_custkey) AS decile
  FROM customer c LEFT JOIN resp r ON r.custkey = c.c_custkey
), per AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(y) AS BIGINT) AS n_responders
  FROM scored GROUP BY decile
), tot AS (
  SELECT CAST(SUM(n_customers) AS BIGINT) AS n,
         CAST(SUM(n_responders) AS BIGINT) AS r
  FROM per
)
SELECT CAST(decile AS INTEGER) AS decile,
       n_customers,
       n_responders,
       ROUND(CAST(n_responders AS DOUBLE) / n_customers, 6) AS resp_rate,
       ROUND((CAST(n_responders AS DOUBLE) / n_customers)
             / (CAST(t.r AS DOUBLE) / t.n), 6) AS lift,
       ROUND(CAST(SUM(n_responders) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.r, 6)
         AS cum_capture
FROM per CROSS JOIN tot t
ORDER BY decile
"""


@register("decile_lift_table", oracle=_LIFT_ORACLE, tags=("stats", "window"))
def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift & gains table: customers scored by account balance
    (descending — the "model score"), cut into NTILE(10) deciles, and
    read against a behavioral response (placed ≥1 order with a
    returned lineitem). Per decile: response rate, lift vs the base
    rate, and cumulative responder capture — the table behind every
    "top-2-deciles capture X% of responders" targeting decision. A
    flat lift column ≈ 1 means the score carries no signal (the
    expected read on this synthetic fixture — the value is the
    machinery, witnessed end-to-end).

    Determinism: NTILE over the (acctbal DESC, custkey) TOTAL order
    assigns identical deciles in both engines (both split N rows into
    ⌈N/10⌉-then-⌊N/10⌋ runs in order); all counts exact BIGINT; the
    three ratios are single divisions ROUND 6; cumulative capture
    rides the 10-row decile grain.

    Scale: the response set is a semi-join-shaped DISTINCT on the
    fact table (map-combinable); the decile cut is the range-bucketed
    exact global rank (registry.bucketed_running_sum —
    per-bucket sorts + bounded offsets, never a single-partition sort
    of the customer table) folded through the SQL-standard NTILE
    formula; all lift math runs on 10 rows.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    resp = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    # Exact NTILE(10) over (acctbal DESC, custkey) WITHOUT a global
    # sort window: range-bucket the NEGATED score (equal scores share
    # a bucket, so bucket id is monotone in the DESC order), running
    # count within each bucket plus bounded bucket offsets for the
    # exact global rank, then the SQL-standard NTILE formula (first
    # N%10 tiles get ⌈N/10⌉ rows) in pure integer arithmetic —
    # identical tile assignment to both engines' NTILE over the same
    # total order.
    cust = c.select(
        F.col("c_custkey").alias("ck"), (-F.col("c_acctbal")).alias("neg")
    )
    # A running COUNT over the (neg, ck) total order IS the global
    # row_number (registry.bucketed_running_sum with val=1).
    walked, _subs = bucketed_running_sum(
        cust, "neg", ["neg", "ck"], F.lit(1), out="__rk"
    )
    ranked = walked.select("ck", F.col("__rk").cast("long").alias("rk"))
    ntot = cust.agg(F.count("*").cast("long").alias("n"))
    dec = (
        ranked.crossJoin(F.broadcast(ntot))
        .select(
            "ck",
            F.expr(
                "CASE WHEN rk <= (n % 10) * (n DIV 10 + 1)"
                " THEN (rk + n DIV 10) DIV (n DIV 10 + 1)"
                " ELSE n % 10"
                "  + (rk - (n % 10) * (n DIV 10 + 1) + n DIV 10 - 1)"
                "    DIV (n DIV 10) END"
            ).alias("decile"),
        )
    )
    scored = dec.join(resp, dec["ck"] == resp["custkey"], "left").select(
        "decile",
        F.when(F.col("custkey").isNull(), 0).otherwise(1).alias("y"),
    )
    per = scored.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("y").cast("long").alias("n_responders"),
    )
    tot = per.agg(
        F.sum("n_customers").cast("long").alias("n"),
        F.sum("n_responders").cast("long").alias("r"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            "n_responders",
            F.round(
                F.col("n_responders").cast("double") / F.col("n_customers"), 6
            ).alias("resp_rate"),
            F.round(
                (F.col("n_responders").cast("double") / F.col("n_customers"))
                / (F.col("r").cast("double") / F.col("n")),
                6,
            ).alias("lift"),
            F.round(
                F.sum("n_responders").over(w_cum).cast("double") / F.col("r"),
                6,
            ).alias("cum_capture"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# McNemar's test on the two paired quality gates
# ---------------------------------------------------------------------------

_MCNEMAR_ORACLE = """
WITH rated AS (
  SELECT CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(string_split(text, ' ')) >= 24 THEN 1 ELSE 0 END AS b
  FROM documents
), counts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE a = 1 AND b = 0) AS BIGINT) AS n10,
         CAST(COUNT(*) FILTER (WHERE a = 0 AND b = 1) AS BIGINT) AS n01
  FROM rated
)
SELECT n AS n_docs,
       n10 AS a_only,
       n01 AS b_only,
       ROUND(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
             / NULLIF(n10 + n01, 0), 6) AS chi2,
       ROUND(POWER(ABS(CAST(n10 AS DOUBLE) - n01) - 1, 2)
             / NULLIF(n10 + n01, 0), 6) AS chi2_cc
FROM counts
"""


@register("mcnemar_paired_gates", oracle=_MCNEMAR_ORACLE, tags=("stats", "text"))
def mcnemar_paired_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test between the engine's two document-quality
    raters — the SAME paired gates ``cohens_kappa_quality`` scores
    (char-length ≥ 128 vs token-count ≥ 24), asking the OTHER
    question: not "do they agree" but "is one gate systematically
    stricter than the other". Only the discordant cells matter:
    χ² = (b−c)²/(b+c), plus Edwards' continuity-corrected variant —
    the standard paired-classifier comparison (Dietterich 1998) for
    two models evaluated on one test set.

    Determinism: the 2×2 paired table is one map-combinable hash-agg
    of exact BIGINTs; both statistics are single pinned expressions
    over two integers, ROUND 6, NULLIF-guarded for the no-discordance
    degenerate case on both engines.

    Scale: one corpus pass to four cells; test math on one row.
    """
    d = read_table(spark, sf_dir, "documents")
    rated = d.select(
        F.when(F.col("n_chars") >= 128, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ")) >= 24, 1).otherwise(0).alias("b"),
    )
    counts = rated.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
    )
    b, c = F.col("n10"), F.col("n01")
    denom = F.nullif((b + c).cast("double"), F.lit(0.0))
    return counts.select(
        F.col("n").alias("n_docs"),
        b.alias("a_only"),
        c.alias("b_only"),
        F.round(((b - c) * (b - c)).cast("double") / denom, 6).alias("chi2"),
        F.round(
            F.pow(F.abs(b.cast("double") - c) - 1, 2) / denom, 6
        ).alias("chi2_cc"),
    )


# ---------------------------------------------------------------------------
# Cliff's delta (exact, value-grain dominance counts)
# ---------------------------------------------------------------------------

_CLIFFS_ORACLE = """
WITH cells AS (
  SELECT o_totalprice AS v,
         CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
              AS BIGINT) AS ca,
         CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW')
              AS BIGINT) AS cb
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_totalprice
), cum AS (
  SELECT v, ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                PRECEDING AND 1 PRECEDING), 0) AS cb_below
  FROM cells
), st AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(SUM(ca * cb_below) AS BIGINT) AS n_gt,
         CAST(SUM(ca * cb) AS BIGINT) AS n_eq
  FROM cum
)
SELECT na AS n_urgent,
       nb AS n_low,
       n_gt AS n_urgent_gt,
       CAST(na * nb - n_gt - n_eq AS BIGINT) AS n_urgent_lt,
       n_eq AS n_ties,
       ROUND((CAST(n_gt AS DOUBLE) - (na * nb - n_gt - n_eq))
             / (CAST(na AS DOUBLE) * nb), 6) AS cliffs_delta,
       CASE
         WHEN ABS((CAST(n_gt AS DOUBLE) - (na * nb - n_gt - n_eq))
                  / (CAST(na AS DOUBLE) * nb)) < 0.147 THEN 'negligible'
         WHEN ABS((CAST(n_gt AS DOUBLE) - (na * nb - n_gt - n_eq))
                  / (CAST(na AS DOUBLE) * nb)) < 0.33 THEN 'small'
         WHEN ABS((CAST(n_gt AS DOUBLE) - (na * nb - n_gt - n_eq))
                  / (CAST(na AS DOUBLE) * nb)) < 0.474 THEN 'medium'
         ELSE 'large'
       END AS magnitude
FROM st
"""


@register(
    "cliffs_delta_priority",
    oracle=_CLIFFS_ORACLE,
    tags=("stats", "window", "baseline"),
)
def cliffs_delta_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's δ between URGENT and LOW order totals — the
    nonparametric effect size for ``mann_whitney_u``'s two samples:
    δ = P(X > Y) − P(X < Y), read with the Romano bands (negligible /
    small / medium / large). MWU's z answers "detectable?"; δ answers
    "does it matter?" — the pair every A/B readout should report.

    Spelled EXACTLY, with no midranks and no doubles until the final
    division: collapse to (value, per-group count) cells, one
    cumulative window over distinct values gives #B-below-v, and the
    dominance counts n_gt = Σ ca·cb_below, n_eq = Σ ca·cb, n_lt =
    n_a·n_b − n_gt − n_eq are exact BIGINTs. δ is one division ROUND
    6; the band is a CASE over the same expression.

    Scale: one map-combined pass to value cells, one value-grain
    cumulative window (distinct values ≪ fact rows), one scalar agg.
    Identical shuffle shape to kruskal_wallis_h; O(V) not O(n²) —
    the naive dominance definition is a quadratic pair count.
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
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = cells.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w_below), F.lit(0)).alias("cb_below"),
    )
    st = cum.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") * F.col("cb_below")).cast("long").alias("n_gt"),
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("n_eq"),
    )
    na, nb = F.col("na"), F.col("nb")
    n_lt = na * nb - F.col("n_gt") - F.col("n_eq")
    delta = (F.col("n_gt").cast("double") - n_lt) / (na.cast("double") * nb)
    return st.select(
        na.alias("n_urgent"),
        nb.alias("n_low"),
        F.col("n_gt").alias("n_urgent_gt"),
        n_lt.cast("long").alias("n_urgent_lt"),
        F.col("n_eq").alias("n_ties"),
        F.round(delta, 6).alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# ---------------------------------------------------------------------------
# Bucket-first Cliff's delta twin: self-auditing quantized dominance
# ---------------------------------------------------------------------------

_CDB_WIDTH_CENTS = 10_000  # $100-wide cells: price span / 100 ≈ 5k buckets

_CDB_BAND = """CASE
         WHEN ABS({d}) < 0.147 THEN 'negligible'
         WHEN ABS({d}) < 0.33 THEN 'small'
         WHEN ABS({d}) < 0.474 THEN 'medium'
         ELSE 'large' END"""

_CDB_ORACLE = f"""
WITH cells AS (
  SELECT o_totalprice AS v,
         CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
              AS BIGINT) AS ca,
         CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW')
              AS BIGINT) AS cb
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_totalprice
),
cum AS (
  SELECT ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                PRECEDING AND 1 PRECEDING), 0) AS cb_below
  FROM cells
),
ex AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(SUM(ca * cb_below) AS BIGINT) AS n_gt,
         CAST(SUM(ca * cb) AS BIGINT) AS n_eq
  FROM cum
),
bcells AS (
  SELECT CAST(v * 100 AS BIGINT) // {_CDB_WIDTH_CENTS} AS b,
         SUM(ca) AS ca, SUM(cb) AS cb
  FROM cells GROUP BY 1
),
bcum AS (
  SELECT ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                PRECEDING AND 1 PRECEDING), 0) AS cb_below
  FROM bcells
),
bx AS (
  SELECT CAST(SUM(ca * cb_below) AS BIGINT) AS n_gt_hat,
         CAST(SUM(ca * cb) AS BIGINT) AS n_eq_hat,
         CAST(COUNT(*) AS BIGINT) AS nbk
  FROM bcum
),
d AS (
  SELECT na, nb, nbk,
         (CAST(n_gt AS DOUBLE) - (na * nb - n_gt - n_eq))
           / (CAST(na AS DOUBLE) * nb) AS d_ex,
         (CAST(n_gt_hat AS DOUBLE) - (na * nb - n_gt_hat - n_eq_hat))
           / (CAST(na AS DOUBLE) * nb) AS d_hat,
         CAST(n_eq_hat AS DOUBLE) / (CAST(na AS DOUBLE) * nb) AS bound,
         -- exact-integer audit: |δ−δ̂|·na·nb = |2Δn_gt + Δn_eq|,
         -- compared against n_eq_hat BEFORE any division (the other
         -- three twins' convention — no post-division ulp can flip
         -- the driver-hashed boolean on a tight bound)
         (ABS(2 * (n_gt - n_gt_hat) + (n_eq - n_eq_hat))
            <= n_eq_hat) AS wb
  FROM ex CROSS JOIN bx
)
SELECT na AS n_urgent,
       nb AS n_low,
       nbk AS n_buckets,
       ROUND(d_ex, 6) AS delta_exact,
       ROUND(d_hat, 6) AS delta_bucketed,
       ROUND(bound, 6) AS delta_bound,
       wb AS within_bound,
       {_CDB_BAND.format(d="d_ex")} AS magnitude_exact,
       {_CDB_BAND.format(d="d_hat")} AS magnitude_bucketed,
       ({_CDB_BAND.format(d="d_ex")} = {_CDB_BAND.format(d="d_hat")})
         AS decision_agrees
FROM d
"""


@register(
    "cliffs_delta_bucketed", oracle=_CDB_ORACLE, tags=("stats", "audit")
)
def cliffs_delta_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-first Cliff's δ twin with its own substitution audit —
    the ``ks_bucketed_drift`` pattern ported to the dominance effect
    size, executing the bucket hook ``cliffs_delta_priority``'s
    allowlist entry documents in prose.

    The exact δ runs at value grain. The production spelling quantizes
    prices into fixed $100 cells FIRST (integer cents DIV — bucket
    count bounded by the price RANGE, not the corpus) and counts
    dominance over cell boundaries. Quantization only moves SAME-CELL
    cross-group pairs (each flips its ±1/0 contribution to a bucket
    tie), and the bucket side counts exactly those pairs as its own
    tie count, so |δ − δ̂| ≤ n_eq_hat/(n_a·n_b) — the bound is
    computable from the BUCKET side alone (at 100 TB only the
    bucketed side ships; the exact side here is the audit harness).
    The downstream DECISION is the Romano magnitude band (negligible /
    small / medium / large) — band agreement is audited separately
    from the bound, per the engine's sampling-audit convention.

    Determinism: dominance counts are exact BIGINTs on both grains
    (one cumulative window each, value grain vs bounded cell grain);
    δ, δ̂ and the bound are single divisions of exact integers
    (identical IEEE doubles both engines), displayed ROUND 6; bands
    are CASE over the same doubles. The within_bound audit compares
    the EXACT INTEGERS (|2Δn_gt + Δn_eq| ≤ n_eq_hat) before any
    division — a bound met with equality cannot flip by one ulp of
    the divided doubles (the other three twins' convention).

    Scale: one map-combined pass to value cells shared with the exact
    side, one to the bounded cell grain; the cell-grain cumulative
    window is ~5k rows at any corpus size. O(V) + O(cells), never the
    O(n²) naive pair count.
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

    def _dominance(grain: DataFrame, order_col: str) -> DataFrame:
        w_below = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        cum = grain.select(
            "ca",
            "cb",
            F.coalesce(F.sum("cb").over(w_below), F.lit(0)).alias(
                "cb_below"
            ),
        )
        return cum.agg(
            F.sum("ca").cast("long").alias("na"),
            F.sum("cb").cast("long").alias("nb"),
            F.sum(F.col("ca") * F.col("cb_below")).cast("long").alias("n_gt"),
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("n_eq"),
            F.count("*").cast("long").alias("nbk"),
        )

    ex = _dominance(cells, "v").select("na", "nb", "n_gt", "n_eq")
    # Exact-integer substitution audit (matches the oracle's `wb`):
    # |δ−δ̂|·na·nb == |2·(n_gt−n_gt_hat) + (n_eq−n_eq_hat)| — compare
    # BIGINTs before any division, so a bound met with equality can
    # never read false by one ulp of the divided doubles.
    wb = (
        F.abs(
            2 * (F.col("n_gt") - F.col("n_gt_hat"))
            + (F.col("n_eq") - F.col("n_eq_hat"))
        )
        <= F.col("n_eq_hat")
    )
    bcells = cells.groupBy(
        F.expr(f"CAST(v * 100 AS BIGINT) DIV {_CDB_WIDTH_CENTS}").alias("b")
    ).agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    bx = _dominance(bcells, "b").select(
        F.col("n_gt").alias("n_gt_hat"),
        F.col("n_eq").alias("n_eq_hat"),
        F.col("nbk"),
    )
    na, nb = F.col("na"), F.col("nb")

    def _delta(gt_col: str, eq_col: str):
        n_lt = na * nb - F.col(gt_col) - F.col(eq_col)
        return (F.col(gt_col).cast("double") - n_lt) / (
            na.cast("double") * nb
        )

    def _band(d):
        return (
            F.when(F.abs(d) < 0.147, "negligible")
            .when(F.abs(d) < 0.33, "small")
            .when(F.abs(d) < 0.474, "medium")
            .otherwise("large")
        )

    d_ex = _delta("n_gt", "n_eq")
    d_hat = _delta("n_gt_hat", "n_eq_hat")
    bound = F.col("n_eq_hat").cast("double") / (na.cast("double") * nb)
    return ex.crossJoin(F.broadcast(bx)).select(
        na.alias("n_urgent"),
        nb.alias("n_low"),
        F.col("nbk").alias("n_buckets"),
        F.round(d_ex, 6).alias("delta_exact"),
        F.round(d_hat, 6).alias("delta_bucketed"),
        F.round(bound, 6).alias("delta_bound"),
        wb.alias("within_bound"),
        _band(d_ex).alias("magnitude_exact"),
        _band(d_hat).alias("magnitude_bucketed"),
        (_band(d_ex) == _band(d_hat)).alias("decision_agrees"),
    )
