"""Round-6 operators, second batch: the value-grain Spearman (the
100 TB spelling of the rank statistic, proven equal to the window
spelling), temperature-scaled mixture weights with an ORDER-PINNED
float fold, stratified k-fold assignment, Wilcoxon signed-rank,
ANN hard-negative mining, winsorized robust means, duplicated-span
PAIR generation (the actionable output behind dup_span_fraction), and
a difference-in-differences estimator.

Registry conventions apply (decimal-exact aggregates, atomic output
columns, oracle dtype CASTs, ANSI-neutral arithmetic). New pattern
introduced here (mixture_temperature_weights): when a statistic needs
a SUM OF ARBITRARY DOUBLES (where the decimal-cast trick is unsafe —
the engines' double→decimal roundings can disagree at half-ulp
boundaries, see brier_calibration_bins' docstring), pin the fold
order instead: collect the per-group terms into a key-sorted array
and fold sequentially — both engines then execute the identical
floating-point addition chain and produce bit-identical sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.extras17 import _SPEARMAN_ORACLE
from ucl_data_pipeline_spark.plans.llm_ops import (
    _SQL_COS,
    _TOPK_MAX_QUERIES,
)
from ucl_data_pipeline_spark.plans.registry import (
    register,
    sql_knuth_bucket,
)
from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Spearman via value-grain midrank reconstruction (the scale path)
# ---------------------------------------------------------------------------


@register(
    "spearman_rank_via_grain",
    oracle=_SPEARMAN_ORACLE,
    tags=("stats", "agg", "scale"),
)
def spearman_rank_via_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation computed the way a 100 TB engine
    would: midranks are RECONSTRUCTED from value-grain counts instead
    of ranking raw rows. For value v in a group, midrank =
    (#rows < v) + (cnt_v + 1)/2 — algebraically identical to
    RANK + (peers−1)/2 over raw rows (RANK = #rows<v + 1), so this
    registers against the SAME oracle as the window spelling
    ``spearman_price_qty`` and must hash-match it exactly. The two
    ordered windows now run over the (flag, value) GRAIN (≈50 distinct
    quantities; distinct prices ≪ rows), raw rows are only touched by
    two equi-joins and one moment hash-agg — no global row sort
    anywhere, which is what removed the raw-sort ×10 hotspot the
    window spelling shows in SCALE_NOTES (5.66 ratio → grain-bound).
    Moment sums stay exact in DECIMAL(38,2) (midranks are
    half-integers).
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def grain_ranks(col: str) -> DataFrame:
        g = li.groupBy("flag", col).agg(F.count("*").alias("cnt"))
        w = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return g.select(
            "flag",
            col,
            (
                F.sum("cnt").over(w)
                - F.col("cnt")
                + (F.col("cnt") + 1) / 2.0
            )
            .cast("decimal(38,2)")
            .alias(f"r{col}"),
        )

    r = (
        li.join(grain_ranks("x"), ["flag", "x"])
        .join(grain_ranks("y"), ["flag", "y"])
        .select("flag", F.col("rx"), F.col("ry"))
    )
    m = r.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return m.select(
        "flag",
        n.cast("bigint").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / F.nullif(
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                F.lit(0.0),
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (alpha-sampling, order-pinned fold)
# ---------------------------------------------------------------------------

_TEMP_ORACLE = """
WITH per_source AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
),
denom AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list(SQRT(n_s) ORDER BY source)),
           (a, b) -> a + b) AS z
  FROM per_source
)
SELECT source,
       CAST(n_s AS BIGINT) AS n_docs,
       ROUND(SQRT(n_s) / z, 6) AS weight,
       ROUND(SQRT(n_s) / z - n_s * 1.0 /
             (SELECT SUM(n_s) FROM per_source), 6) AS shift_vs_proportional
FROM per_source, denom
"""


@register(
    "mixture_temperature_weights", oracle=_TEMP_ORACLE, tags=("llm", "agg")
)
def mixture_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled source sampling weights w_s ∝ n_s^α with
    α = 0.5 — the multilingual/multi-source rebalancing rule (upsample
    rare sources, damp dominant ones) used by mBERT/XLM-R-style
    pipelines; α=0.5 keeps the power a single IEEE-exact SQRT.
    shift_vs_proportional shows each source's gain/loss vs plain
    proportional sampling. The normalizer Σ√n_s is a sum of ARBITRARY
    doubles, where the engine's decimal-cast trick is unsafe — instead
    the per-source terms are collected into a source-SORTED list and
    folded sequentially on both engines (order-pinned fold, see module
    docstring): the identical addition chain is bit-identical. S is
    source-cardinality-sized, so the fold is a driver-free scalar
    regardless of corpus size.
    """
    d = read_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count("*").alias("n_s"))
    denom = per_source.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("source", F.sqrt("n_s").alias("sq")))
                ),
                lambda s: s["sq"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("z"),
        F.sum("n_s").alias("n_total"),
    )
    return (
        per_source.crossJoin(F.broadcast(denom))
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_docs"),
            F.round(F.sqrt("n_s") / F.col("z"), 6).alias("weight"),
            F.round(
                F.sqrt("n_s") / F.col("z")
                - F.col("n_s") * 1.0 / F.col("n_total"),
                6,
            ).alias("shift_vs_proportional"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (deterministic CV folds, balance audit)
# ---------------------------------------------------------------------------

_KFOLD_K = 5

_KFOLD_ORACLE = f"""
WITH assigned AS (
  SELECT o_orderpriority AS stratum,
         {sql_knuth_bucket('o_orderkey', _KFOLD_K)} AS fold
  FROM orders
),
tot AS (
  SELECT stratum, COUNT(*) AS n_stratum FROM assigned GROUP BY stratum
)
SELECT a.stratum,
       CAST(a.fold AS INTEGER) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) * 1.0 / t.n_stratum, 6) AS share_of_stratum
FROM assigned a JOIN tot t USING (stratum)
GROUP BY a.stratum, a.fold, t.n_stratum
"""


@register(
    "stratified_kfold_assign", oracle=_KFOLD_ORACLE, tags=("llm", "sampling")
)
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified {K}-fold cross-validation assignment:
    fold = overflow-safe Knuth multiplicative hash of the row key mod
    K (``knuth_bucket`` — reproducible on any engine, no RNG state),
    audited per (stratum, fold) with each fold's share of its stratum
    — the balance table that justifies using hash folds instead of
    shuffled splits. Pure projection + two hash-aggs; at 100 TB the
    assignment is a scan-side column (no shuffle at all) and only the
    audit aggregates.
    """
    o = read_table(spark, sf_dir, "orders")
    assigned = o.select(
        F.col("o_orderpriority").alias("stratum"),
        knuth_bucket("o_orderkey", _KFOLD_K).alias("fold"),
    )
    tot = assigned.groupBy("stratum").agg(F.count("*").alias("n_stratum"))
    return (
        assigned.groupBy("stratum", "fold")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(tot), "stratum")
        .select(
            "stratum",
            F.col("fold").cast("int").alias("fold"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("n_stratum"), 6).alias(
                "share_of_stratum"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test (paired, tie-corrected normal approximation)
# ---------------------------------------------------------------------------

_WILCOXON_ORACLE = """
WITH pairs AS (
  SELECT n.n_name,
         CAST(SUM(CASE WHEN l.l_shipdate < TIMESTAMP '1997-07-01'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
              AS DOUBLE)
           - CAST(SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-07-01'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
                  AS DOUBLE) AS d
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY n.n_name
),
nz AS (SELECT d FROM pairs WHERE d <> 0),
ranked AS (
  SELECT d,
         RANK() OVER (ORDER BY ABS(d))
           + (COUNT(*) OVER (PARTITION BY ABS(d)) - 1) / 2.0 AS r
  FROM nz
),
ties AS (
  SELECT SUM(t * t * t - t) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM nz GROUP BY ABS(d))
),
stats AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN d > 0 THEN CAST(r AS DECIMAL(18,1))
                  ELSE CAST(0 AS DECIMAL(18,1)) END) AS wp
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(wp AS DOUBLE) AS w_plus,
       ROUND((CAST(wp AS DOUBLE) - n * (n + 1) / 4.0)
             / NULLIF(SQRT(n * (n + 1.0) * (2 * n + 1) / 24.0
                           - tie_term / 48.0), 0), 6) AS z_score
FROM stats, ties
"""


@register(
    "wilcoxon_signed_rank",
    oracle=_WILCOXON_ORACLE,
    tags=("stats", "window", "baseline"),
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED observations — did per-
    nation supplier revenue shift between 1997H1 and 1997H2? — the
    paired complement to ``mann_whitney_u`` (which compares two
    independent samples): each nation contributes one signed
    difference, zero differences drop (standard Pratt-less handling),
    |d| gets midranks, and W⁺ sums the ranks of positive shifts, with
    the tie-corrected normal approximation. Per-pair differences come
    from exact-decimal revenue sums (bit-identical doubles), rank sums
    are exact DECIMAL(18,1) half-integers; the ranking window runs
    over ONE ROW PER NATION — pair-grain, never fact-grain, so the
    global window is 25 rows at any corpus size and the fact table
    only feeds one map-combinable conditional agg.
    """
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    mid = F.lit("1997-07-01").cast("timestamp")
    pairs = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            (
                F.sum(F.when(F.col("l_shipdate") < mid, rev).otherwise(zero))
                .cast("double")
                - F.sum(
                    F.when(F.col("l_shipdate") >= mid, rev).otherwise(zero)
                ).cast("double")
            ).alias("d")
        )
    )
    nz = pairs.filter(F.col("d") != 0).select("d")
    r = (
        F.rank().over(Window.orderBy(F.abs("d")))
        + (F.count("*").over(Window.partitionBy(F.abs("d"))) - 1) / 2.0
    )
    ranked = nz.select("d", r.alias("r"))
    ties = (
        nz.groupBy(F.abs("d").alias("ad"))
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
                "tie_term"
            )
        )
    )
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("d") > 0, F.col("r").cast("decimal(18,1)")).otherwise(
                F.lit(0).cast("decimal(18,1)")
            )
        ).alias("wp"),
    )
    nn = F.col("n")
    return stats.crossJoin(F.broadcast(ties)).select(
        nn.cast("bigint").alias("n_pairs"),
        F.col("wp").cast("double").alias("w_plus"),
        F.round(
            (F.col("wp").cast("double") - nn * (nn + 1) / 4.0)
            / F.nullif(
                F.sqrt(
                    nn * (nn + 1.0) * (2 * nn + 1) / 24.0
                    - F.col("tie_term") / 48.0
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# ANN hard-negative mining (top cross-label neighbor per query)
# ---------------------------------------------------------------------------

_HARDNEG_ORACLE = f"""
SELECT q.vec_id AS query_id,
       q.label AS q_label,
       c.vec_id AS hard_negative_id,
       c.label AS neg_label,
       {_SQL_COS} AS cos_sim
FROM embeddings q
JOIN embeddings c
  ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _TOPK_MAX_QUERIES}
 AND c.vec_id <> q.vec_id AND c.label <> q.label
QUALIFY row_number() OVER (
  PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) = 1
"""


@register(
    "hard_negative_mining", oracle=_HARDNEG_ORACLE, tags=("vector", "llm")
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the single most-similar vector with a DIFFERENT label —
    the near-miss that contrastive/embedding losses learn the most
    from (easy negatives are already far away). Query side is
    structurally bounded exactly like the brute-force baseline
    (sampling predicate + id ceiling — llm_ops.py:634's cap rationale
    applies verbatim); in production the candidate scan is replaced by
    the IVF/LSH index probes, with the label-inequality as a cheap
    post-filter on the probed lists. One broadcast of ≤64 queries
    against a candidate scan, top-1 window per query.
    """
    e = read_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(
            (F.col("vec_id") % 100 == 0)
            & (F.col("vec_id") < 100 * _TOPK_MAX_QUERIES)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_emb"),
        )
    )
    from ucl_data_pipeline_spark.functions import vector as VX
    from ucl_data_pipeline_spark.sources.io import fan_out

    c = fan_out(
        e.select(
            F.col("vec_id").alias("hard_negative_id"),
            F.col("label").alias("neg_label"),
            F.col("embedding").alias("c_emb"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("hard_negative_id")
    )
    return (
        c.join(
            F.broadcast(q),
            (F.col("hard_negative_id") != F.col("query_id"))
            & (F.col("neg_label") != F.col("q_label")),
        )
        .select(
            "query_id",
            "q_label",
            "hard_negative_id",
            "neg_label",
            VX.cosine("q_emb", "c_emb").alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Winsorized robust means (order-statistic clamp per group)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH cuts AS (
  SELECT l_returnflag AS flag,
         percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS p05,
         percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95
  FROM lineitem GROUP BY l_returnflag
)
SELECT c.flag,
       c.p05, c.p95,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(*) AS mean_raw,
       CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, c.p05), c.p95)
                     AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         AS mean_winsorized
FROM lineitem l JOIN cuts c ON l.l_returnflag = c.flag
GROUP BY c.flag, c.p05, c.p95
"""


@register("winsorize_prices", oracle=_WINSOR_ORACLE, tags=("stats", "agg"))
def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag: clamp prices into their
    group's [p05, p95] order-statistic band, then average — the
    robust-mean treatment for heavy-tailed money columns (cheaper and
    more interpretable than trimming, keeps n constant). Cut points
    are percentile_disc ORDER STATISTICS (actual data values at rank
    ⌈q·n⌉, spelled identically in both engines — never interpolated),
    so the clamped values are still ≤2-decimal money values and the
    decimal-exact mean convention applies unchanged. Two passes: one
    per-group rank pass for the cuts (a 2-value broadcast per group),
    one map-combinable clamped agg — at 100 TB the cuts come from a
    sampled sketch and the clamp stays scan-side.
    """
    li = read_table(spark, sf_dir, "lineitem")
    # one percentile_disc buffer per group for BOTH cuts (array form —
    # scalar percentile_disc aggs each keep their own full value
    # buffer; extras33 precedent)
    cuts = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr(
            "percentile_disc(array(0.05D, 0.95D)) WITHIN GROUP "
            "(ORDER BY l_extendedprice)"
        ).alias("pp")
    ).select(
        "flag",
        F.col("pp").getItem(0).alias("p05"),
        F.col("pp").getItem(1).alias("p95"),
    )
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    return (
        li.join(F.broadcast(cuts), li.l_returnflag == cuts.flag)
        .groupBy("flag", "p05", "p95")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("mean_raw"),
            (
                F.sum(clamped.cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mean_winsorized"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicated-span PAIRS (actionable ExactSubstr dedup candidates)
# ---------------------------------------------------------------------------

_SPAN_DF_CAP = 20
_SPAN_MIN_SHARED = 2

_DUP_SPAN_PAIRS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS span
  FROM toks, UNNEST(range(0, len(t) // 10)) AS u(i)
),
df AS (
  SELECT span, COUNT(*) AS span_df FROM spans GROUP BY span
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_spans
  FROM spans a
  JOIN df f ON f.span = a.span AND f.span_df BETWEEN 2 AND {_SPAN_DF_CAP}
  JOIN spans b ON b.span = a.span AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, CAST(n_shared_spans AS BIGINT) AS n_shared_spans
FROM pairs WHERE n_shared_spans >= {_SPAN_MIN_SHARED}
"""


@register(
    "dup_span_pairs", oracle=_DUP_SPAN_PAIRS_ORACLE, tags=("llm", "dedup")
)
def dup_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document PAIRS sharing ≥{M} non-overlapping 10-token spans —
    the actionable output behind ``dup_span_fraction``'s per-doc
    diagnostic: these are the ExactSubstr dedup candidates (Lee et
    al.) where the shared text is a sub-span rather than the whole
    doc, which whole-doc MinHash misses. Pair generation is an
    inverted-index self-join on the span key, BOUNDED the same way
    ``jaccard_shingle_pairs`` bounds shingles: spans with document
    frequency > {C} are boilerplate (stop-spans) and are excluded
    from pairing, so no hot span can form a quadratic bucket — the
    100 TB guard, inert at bench SF. Distinct (doc, span) first so a
    doc repeating its own span can't inflate the pair count; spans
    shuffle as 8-byte xxhash64 digests (pure equality keys — the
    string-keyed oracle is the collision check).
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
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
    ).select("doc_id", F.xxhash64("span").alias("span")).distinct()
    df = (
        spans.groupBy("span")
        .agg(F.count("*").alias("span_df"))
        .filter(
            (F.col("span_df") >= 2) & (F.col("span_df") <= _SPAN_DF_CAP)
        )
        .select("span")
    )
    keyed = spans.join(df, "span")
    a = keyed.select("span", F.col("doc_id").alias("doc_a"))
    b = keyed.select("span", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "span")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_spans"))
        .filter(F.col("n_shared_spans") >= _SPAN_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# Difference-in-differences estimator (promo parts, pre/post 1995)
# ---------------------------------------------------------------------------

_DID_ORACLE = """
WITH cells AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
         CASE WHEN l.l_shipdate >= TIMESTAMP '1995-01-01' THEN 1 ELSE 0 END
           AS post,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
)
SELECT
  MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_rev END) AS treated_pre,
  MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_rev END) AS treated_post,
  MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_rev END) AS control_pre,
  MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_rev END) AS control_post,
  (MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_rev END)
   - MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_rev END))
  - (MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_rev END)
     - MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_rev END)) AS did
FROM cells
"""


@register("diff_in_diff_promo", oracle=_DID_ORACLE, tags=("stats", "agg"))
def diff_in_diff_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the PROMO effect on
    per-lineitem revenue: (treated_post − treated_pre) −
    (control_post − control_pre), with treatment = PROMO part types
    and the 1995-01-01 shipdate cut as the event — the standard
    quasi-experimental readout when randomization isn't available,
    differencing out both the group baseline and the common time
    trend. All four cell means use the exact-decimal convention, so
    the estimator is a fixed double expression over bit-identical
    inputs. One broadcast dim join + one 4-cell hash-agg — nothing
    here grows with the fact table beyond the scan.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    cells = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.when(F.col("p_type").like("PROMO%"), 1)
            .otherwise(0)
            .alias("treated"),
            F.when(
                F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("post"),
        )
        .agg((F.sum(rev).cast("double") / F.count("*")).alias("mean_rev"))
    )

    def cell(t: int, post: int):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == post),
                F.col("mean_rev"),
            )
        )

    return cells.agg(
        cell(1, 0).alias("treated_pre"),
        cell(1, 1).alias("treated_post"),
        cell(0, 0).alias("control_pre"),
        cell(0, 1).alias("control_post"),
        (
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# Bucket-first Wilcoxon signed-rank twin: self-auditing quantization
# ---------------------------------------------------------------------------

_WXB_WIDTH = 10_000.0  # $10k-wide |d| cells: bounded by the diff RANGE

_WXB_ORACLE = f"""
WITH pairs AS (
  SELECT n.n_name,
         CAST(SUM(CASE WHEN l.l_shipdate < TIMESTAMP '1997-07-01'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
              AS DOUBLE)
           - CAST(SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-07-01'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
                  AS DOUBLE) AS d
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY n.n_name
),
cells AS (
  SELECT ABS(d) AS v, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(*) FILTER (WHERE d > 0) AS BIGINT) AS cp
  FROM pairs WHERE d <> 0 GROUP BY ABS(d)
),
mid AS (
  SELECT v, t, cp,
         SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS below
  FROM cells
),
ex AS (
  SELECT SUM(CAST(cp AS DECIMAL(28,1))
             * CAST(COALESCE(below, 0) + (t + 1) / 2.0
                    AS DECIMAL(18,1))) AS wp,
         CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_ex
  FROM mid
),
bcells AS (
  SELECT CAST(FLOOR(v / {_WXB_WIDTH}) AS BIGINT) AS b,
         SUM(t) AS t, SUM(cp) AS cp
  FROM cells GROUP BY 1
),
bmid AS (
  SELECT b, t, cp,
         SUM(t) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS below
  FROM bcells
),
bx AS (
  SELECT SUM(CAST(cp AS DECIMAL(28,1))
             * CAST(COALESCE(below, 0) + (t + 1) / 2.0
                    AS DECIMAL(18,1))) AS wp_hat,
         CAST(SUM(cp * (t - 1)) AS BIGINT) AS bound2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_hat,
         CAST(COUNT(*) AS BIGINT) AS nbk
  FROM bmid
),
z AS (
  SELECT n, nbk,
         CAST(wp AS DOUBLE) AS wpd, CAST(wp_hat AS DOUBLE) AS wphd,
         CAST(bound2 AS DOUBLE) / 2 AS bound,
         (ABS(CAST(wp - wp_hat AS DOUBLE)) * 2 <= CAST(bound2 AS DOUBLE))
           AS ok,
         (CAST(wp AS DOUBLE) - n * (n + 1) / 4.0)
           / NULLIF(SQRT(n * (n + 1.0) * (2 * n + 1) / 24.0
                         - tie_ex / 48.0), 0) AS z_ex,
         (CAST(wp_hat AS DOUBLE) - n * (n + 1) / 4.0)
           / NULLIF(SQRT(n * (n + 1.0) * (2 * n + 1) / 24.0
                         - tie_hat / 48.0), 0) AS z_hat
  FROM ex CROSS JOIN bx
)
SELECT n AS n_pairs,
       nbk AS n_buckets,
       wpd AS w_plus_exact,
       wphd AS w_plus_bucketed,
       bound AS w_bound,
       ok AS within_bound,
       ROUND(z_ex, 6) AS z_exact,
       ROUND(z_hat, 6) AS z_bucketed,
       ((ABS(z_ex) > 1.96) = (ABS(z_hat) > 1.96)) AS decision_agrees
FROM z
"""


@register(
    "wilcoxon_signed_rank_bucketed",
    oracle=_WXB_ORACLE,
    tags=("stats", "audit"),
)
def wilcoxon_signed_rank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-first Wilcoxon signed-rank twin with its own
    substitution audit — the ``ks_bucketed_drift`` pattern ported to
    the paired rank test. The pair grain here is nations (bounded at
    25), so unlike the MWU/KW twins the exact side is already cheap —
    the twin exists because the |d| DOMAIN is continuous money: at a
    finer pair grain (customer, part, document) exact |d| midranks
    revert to corpus grain, and THIS spelling — quantize |d| into
    fixed $10k cells (bucket count bounded by the diff RANGE), midrank
    the bounded cell grain, carry the analytic bound — is what ships.

    Bound: within a cell of t_b pooled diffs the exact midranks span
    at most (t_b−1)/2 around the cell midrank and only positive diffs
    contribute to W⁺, so |W⁺ − Ŵ⁺| ≤ Σ_b cp_b·(t_b−1)/2 — computable
    from the bucket side alone. The decision (|z| > 1.96, tie-
    corrected normal approximation) is audited separately from the
    bound, per the engine's sampling-audit convention.

    Determinism: per-pair diffs are differences of exact decimal sums
    (bit-identical doubles both engines); FLOOR(|d|/10000) is exact
    IEEE (floor, never a halfway fork); midranks exact .5-step
    decimals; the bound check compares exact integers
    (2·|ΔW| ≤ Σ cp·(t−1)); z NULLIF-guarded, ROUND 6.

    Scale: the fact table feeds ONE map-combinable conditional agg to
    pair grain (shared with the exact side); both midrank windows run
    on bounded grains (pairs / $-range cells).
    """
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    mid_ts = F.lit("1997-07-01").cast("timestamp")
    pairs = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            (
                F.sum(
                    F.when(F.col("l_shipdate") < mid_ts, rev).otherwise(zero)
                ).cast("double")
                - F.sum(
                    F.when(F.col("l_shipdate") >= mid_ts, rev).otherwise(zero)
                ).cast("double")
            ).alias("d")
        )
    )
    cells = (
        pairs.filter(F.col("d") != 0)
        .groupBy(F.abs("d").alias("v"))
        .agg(
            F.count("*").cast("long").alias("t"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
            .cast("long")
            .alias("cp"),
        )
    )

    def _wsum(grain: DataFrame, order_col: str) -> DataFrame:
        w_cum = Window.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        mid = grain.select(
            "t",
            "cp",
            F.sum("t").over(w_cum).alias("below"),
        )
        midrank = (
            F.coalesce(F.col("below"), F.lit(0)) + (F.col("t") + 1) / 2.0
        ).cast("decimal(18,1)")
        return mid.agg(
            F.sum(F.col("cp").cast("decimal(28,1)") * midrank).alias("wp"),
            F.sum("t").cast("long").alias("n"),
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie"),
            F.sum(F.col("cp") * (F.col("t") - 1)).cast("long").alias(
                "bound2"
            ),
            F.count("*").cast("long").alias("nbk"),
        )

    ex = _wsum(cells, "v").select(
        F.col("wp"), F.col("n"), F.col("tie").alias("tie_ex")
    )
    bcells = cells.groupBy(
        F.floor(F.col("v") / _WXB_WIDTH).cast("long").alias("b")
    ).agg(F.sum("t").alias("t"), F.sum("cp").alias("cp"))
    bx = _wsum(bcells, "b").select(
        F.col("wp").alias("wp_hat"),
        F.col("tie").alias("tie_hat"),
        F.col("bound2"),
        F.col("nbk"),
    )
    nn = F.col("n")

    def _z(wp_col: str, tie_col: str):
        return (
            F.col(wp_col).cast("double") - nn * (nn + 1) / 4.0
        ) / F.nullif(
            F.sqrt(
                nn * (nn + 1.0) * (2 * nn + 1) / 24.0
                - F.col(tie_col) / 48.0
            ),
            F.lit(0.0),
        )

    return ex.crossJoin(F.broadcast(bx)).select(
        nn.cast("bigint").alias("n_pairs"),
        F.col("nbk").alias("n_buckets"),
        F.col("wp").cast("double").alias("w_plus_exact"),
        F.col("wp_hat").cast("double").alias("w_plus_bucketed"),
        (F.col("bound2").cast("double") / 2).alias("w_bound"),
        (
            F.abs((F.col("wp") - F.col("wp_hat")).cast("double")) * 2
            <= F.col("bound2").cast("double")
        ).alias("within_bound"),
        F.round(_z("wp", "tie_ex"), 6).alias("z_exact"),
        F.round(_z("wp_hat", "tie_hat"), 6).alias("z_bucketed"),
        (
            (F.abs(_z("wp", "tie_ex")) > 1.96)
            == (F.abs(_z("wp_hat", "tie_hat")) > 1.96)
        ).alias("decision_agrees"),
    )
