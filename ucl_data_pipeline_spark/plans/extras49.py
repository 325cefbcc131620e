"""Round-8 batch 16: automatic threshold selection, unseen-species
estimation, and the smoothing-knob frontier —

- ``otsu_quality_threshold``: Otsu's method (1979) on the quality
  score — the histogram-based threshold that maximizes between-class
  variance, i.e. the data-derived answer to "where should the quality
  gate cut?" that the curation pipeline currently takes as a
  constant. Emits the full candidate curve (one row per bin
  boundary) with the argmax flagged, from ONE doc-grain histogram.
- ``chao1_vocab_estimate``: Chao1 unseen-species estimation + Good-
  Turing coverage per source — from the frequency-of-frequency
  profile (how many tokens occur once, twice), estimate the TRUE
  vocabulary size and the probability mass of unseen tokens. The
  "will another crawl yield new vocabulary?" number a corpus-growth
  decision needs; the f1/f2 profile is also the input Good-Turing /
  Kneser-Ney smoothing theory is built on.
- ``jm_smoothing_frontier``: Jelinek-Mercer interpolated bigram LM at
  λ ∈ {{0.25, 0.5, 0.75}} — corpus cross-entropy per λ, all three
  evaluated from ONE bigram-count pass (the frontier discipline:
  one generation, many knob readings). The companion smoothing
  family to ``kneser_ney_bigram_lm`` (absolute discounting): the
  λ-curve says which interpolation weight this corpus wants.

Registry conventions (plans/registry.py): histogram/frequency counts
exact BIGINT; class means are exact integer ratios; log₂ terms
ROUND 6 → DECIMAL(18,6) sums; argmax orders total (variance DESC then
bin ASC); bounded-grain windows only (≤32 bins, ≤3 λ rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.extras44 import _KN_PAIR_SQL, kn_bigrams
from ucl_data_pipeline_spark.plans.llm_ops import (
    _QUALITY_ORACLE,
    _SQL_TOKS,
    text_quality_score,
)
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Otsu threshold selection on the quality-score histogram
# ---------------------------------------------------------------------------

_OTSU_B = 32

_OTSU_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
h AS (
  SELECT CAST(FLOOR(quality_score * {_OTSU_B}) AS INTEGER) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM q WHERE quality_score IS NOT NULL GROUP BY b
), pre AS (
  SELECT b, c,
         SUM(c) OVER w AS cw,
         SUM(b * c) OVER w AS sw
  FROM h WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
), tot AS (
  SELECT MAX(cw) AS n, MAX(sw) AS s FROM pre
), curve AS (
  SELECT p.b + 1 AS t,
         CAST((p.b + 1) AS DOUBLE) / {_OTSU_B} AS thr_value,
         p.cw AS w0, t.n - p.cw AS w1,
         CASE WHEN p.cw > 0 AND t.n - p.cw > 0 THEN
           (CAST(p.cw AS DOUBLE) / t.n) * (CAST(t.n - p.cw AS DOUBLE) / t.n)
           * (CAST(p.sw AS DOUBLE) / p.cw
              - CAST(t.s - p.sw AS DOUBLE) / (t.n - p.cw))
           * (CAST(p.sw AS DOUBLE) / p.cw
              - CAST(t.s - p.sw AS DOUBLE) / (t.n - p.cw))
         ELSE 0.0 END AS sigma_b
  FROM pre p CROSS JOIN tot t
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sigma_b DESC, t) AS rk FROM curve
)
SELECT CAST(t AS INTEGER) AS t, thr_value,
       CAST(w0 AS BIGINT) AS w0, CAST(w1 AS BIGINT) AS w1,
       ROUND(sigma_b, 6) AS sigma_b,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_best
FROM ranked
"""


@register(
    "otsu_quality_threshold",
    oracle=_OTSU_ORACLE,
    tags=("stats", "llm", "gate"),
)
def otsu_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu threshold selection on the text quality score: quantize
    to {B} bins, and for every candidate cut t emit the class sizes
    and the between-class variance σ²_b(t) = ω₀ω₁(μ₀−μ₁)², with the
    argmax flagged — the histogram-shape-derived split that a
    curation pipeline should prefer to a hand-picked constant when
    the score is bimodal (and that DEGRADES gracefully to "no strong
    split" when it isn't — σ²_b stays flat, which the curve shows).
    Class means use bin indices as class values (exact integer
    sums), the standard discrete-Otsu formulation.

    Determinism: bin counts and index-weighted sums are exact
    BIGINTs via prefix windows over the ≤{B}-bin grain; each σ²_b is
    one pinned IEEE expression over exact ratios; the argmax order
    (σ²_b DESC, t ASC) is total.

    Scale: ONE corpus-grain hash-agg to ≤{B} bins; the cumulative
    window, candidate curve, and argmax all run on the bounded
    derived grain (the adjudicated pattern). Otsu at 100 TB is free:
    it rides the histogram every profiling pass already computes.
    """
    q = (
        text_quality_score(spark, sf_dir)
        .select("quality_score")
        .filter(F.col("quality_score").isNotNull())
    )
    h = q.select(
        F.floor(F.col("quality_score") * _OTSU_B).cast("int").alias("b")
    ).groupBy("b").agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pre = h.select(
        "b",
        "c",
        F.sum("c").over(w).alias("cw"),
        F.sum(F.col("b") * F.col("c")).over(w).alias("sw"),
    )
    tot = pre.agg(F.max("cw").alias("n"), F.max("sw").alias("s"))
    n, s = F.col("n"), F.col("s")
    cw, sw = F.col("cw"), F.col("sw")
    mu_diff = sw.cast("double") / cw - (s - sw).cast("double") / (n - cw)
    sigma_b = F.when(
        (cw > 0) & (n - cw > 0),
        (cw.cast("double") / n) * ((n - cw).cast("double") / n)
        * mu_diff
        * mu_diff,
    ).otherwise(F.lit(0.0))
    curve = pre.crossJoin(F.broadcast(tot)).select(
        (F.col("b") + 1).alias("t"),
        ((F.col("b") + 1).cast("double") / _OTSU_B).alias("thr_value"),
        cw.alias("w0"),
        (n - cw).alias("w1"),
        sigma_b.alias("sigma_b"),
    )
    w_all = Window.orderBy(F.col("sigma_b").desc(), "t")
    return curve.withColumn("rk", F.row_number().over(w_all)).select(
        F.col("t").cast("int").alias("t"),
        "thr_value",
        F.col("w0").cast("long").alias("w0"),
        F.col("w1").cast("long").alias("w1"),
        F.round("sigma_b", 6).alias("sigma_b"),
        F.when(F.col("rk") == 1, 1).otherwise(0).cast("int").alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Chao1 unseen-vocabulary estimate + Good-Turing coverage per source
# ---------------------------------------------------------------------------

_CHAO_ORACLE = rf"""
WITH tk AS (
  SELECT source, unnest({_SQL_TOKS}) AS tok FROM documents
), tc AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM tk GROUP BY source, tok
), ff AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM tc GROUP BY source
)
SELECT source, n_tokens, vocab, f1, f2,
       ROUND(CAST(vocab AS DOUBLE)
             + CAST(f1 * (f1 - 1) AS DOUBLE)
               / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS chao1_vocab,
       ROUND(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS gt_coverage
FROM ff
"""


@register(
    "chao1_vocab_estimate",
    oracle=_CHAO_ORACLE,
    tags=("llm", "text", "stats", "sketch"),
)
def chao1_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-species estimation per source: from the frequency-of-
    frequency profile (f1 = singleton tokens, f2 = doubletons), the
    bias-corrected Chao1 vocabulary estimate V + f1(f1−1)/(2(f2+1))
    and the Good-Turing coverage 1 − f1/N (the probability that the
    NEXT token drawn is already in the vocabulary). The corpus-growth
    decision number — a source with low coverage still yields new
    vocabulary per crawl; one with coverage ≈ 1 is lexically
    exhausted — and the same f1/f2 statistics smoothing theory
    (Good-Turing, Kneser-Ney discounts) estimates from.

    Determinism: the whole computation is exact integers until two
    final ROUND-6 expressions (one division each).

    Scale: one (source, token) hash-agg — map-side combinable — then
    a source-grain conditional aggregation of the count column. The
    frequency-of-frequency profile never materializes token rows
    twice; at 100 TB this is the vocabulary profiling pass with two
    extra conditional sums.
    """
    tc = (
        read_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(TX.tokens("text")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ff = tc.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    )
    return ff.select(
        "source",
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        F.round(
            F.col("vocab").cast("double")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (F.lit(2.0) * (F.col("f2") + 1).cast("double")),
            6,
        ).alias("chao1_vocab"),
        F.round(
            F.lit(1.0)
            - F.col("f1").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("gt_coverage"),
    )


# ---------------------------------------------------------------------------
# Jelinek-Mercer smoothing frontier
# ---------------------------------------------------------------------------

_JM_LAMBDAS = (0.25, 0.5, 0.75)

_JM_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), bg AS (
  SELECT s.v AS v, s.w AS w
  FROM (SELECT {_KN_PAIR_SQL} FROM tok)
), cvw AS (
  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS c_vw FROM bg GROUP BY v, w
), ctx AS (
  SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v FROM cvw GROUP BY v
), uni AS (
  SELECT w, CAST(SUM(c_vw) AS BIGINT) AS c_w FROM cvw GROUP BY w
), tot AS (
  SELECT CAST(SUM(c_vw) AS BIGINT) AS m FROM cvw
), terms AS (
  SELECT m.c_vw,
{",".join(f'''         ROUND(CAST(m.c_vw AS DOUBLE) * log2(
           {lam} * (CAST(m.c_vw AS DOUBLE) / CAST(x.c_v AS DOUBLE))
           + {1 - lam} * (CAST(u.c_w AS DOUBLE) / CAST(t.m AS DOUBLE))), 6)
           AS term_{i}''' for i, lam in enumerate(_JM_LAMBDAS))}
  FROM cvw m
  JOIN ctx x ON m.v = x.v
  JOIN uni u ON m.w = u.w
  CROSS JOIN tot t
), sums AS (
  SELECT CAST(SUM(c_vw) AS BIGINT) AS n_bigrams,
{",".join(f'''         CAST(SUM(CAST(term_{i} AS DECIMAL(18,6))) AS DOUBLE) AS s_{i}'''
          for i in range(len(_JM_LAMBDAS)))}
  FROM terms
)
{" UNION ALL ".join(f'''
SELECT {lam} AS lam, n_bigrams,
       ROUND(-(s_{i}) / CAST(n_bigrams AS DOUBLE), 6) AS cross_entropy_bits,
       ROUND(POWER(2.0, ROUND(-(s_{i}) / CAST(n_bigrams AS DOUBLE), 6)), 6)
         AS perplexity
FROM sums''' for i, lam in enumerate(_JM_LAMBDAS))}
"""


@register(
    "jm_smoothing_frontier",
    oracle=_JM_ORACLE,
    tags=("llm", "text", "stats", "frontier"),
)
def jm_smoothing_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer smoothing frontier: corpus bigram cross-entropy
    under p_λ(w|v) = λ·p_ML(w|v) + (1−λ)·p_ML(w) for λ ∈ {{0.25,
    0.5, 0.75}} — all three λ readings from ONE bigram-count pass
    (every per-type term computes the three λ-scores side by side in
    one projection; the frontier discipline of ann_recall_frontier /
    minhash_size_frontier applied to the smoothing knob). Read next
    to ``kneser_ney_bigram_lm``: JM interpolates with the unigram,
    KN discounts absolutely and backs off to continuation counts —
    the λ-curve's argmin says how much interpolation THIS corpus
    wants. (Self-evaluation on training counts, like the KN query —
    the number is a fit diagnostic, not held-out perplexity.)

    Determinism: probabilities are pinned IEEE expressions over
    exact-integer ratios; weighted log₂ terms ROUND 6 →
    DECIMAL(18,6) sums, one per λ, in one aggregation; the final
    −S/M and 2^H are single ops on rounded values.

    Scale: one corpus explode → bigram-TYPE-grain hash-aggs (the KN
    shape); the three λ columns add zero passes — they share every
    join and the one aggregation. The UNION pivot at the end runs on
    a single 1-row frame.
    """
    bg = kn_bigrams(spark, sf_dir).select("v", "w")
    cvw = (
        bg.groupBy("v", "w")
        .agg(F.count("*").cast("long").alias("c_vw"))
        .localCheckpoint()
    )
    ctx = cvw.groupBy("v").agg(F.sum("c_vw").cast("long").alias("c_v"))
    uni = cvw.groupBy("w").agg(F.sum("c_vw").cast("long").alias("c_w"))
    tot = cvw.agg(F.sum("c_vw").cast("long").alias("m"))
    joined = (
        cvw.join(ctx, "v").join(uni, "w").crossJoin(F.broadcast(tot))
    )
    term_cols = []
    for i, lam in enumerate(_JM_LAMBDAS):
        p = F.lit(lam) * (
            F.col("c_vw").cast("double") / F.col("c_v").cast("double")
        ) + F.lit(1 - lam) * (
            F.col("c_w").cast("double") / F.col("m").cast("double")
        )
        term_cols.append(
            F.round(F.col("c_vw").cast("double") * F.log2(p), 6).alias(
                f"term_{i}"
            )
        )
    terms = joined.select("c_vw", *term_cols)
    sums = terms.agg(
        F.sum("c_vw").cast("long").alias("n_bigrams"),
        *[
            F.sum(F.col(f"term_{i}").cast("decimal(18,6)"))
            .cast("double")
            .alias(f"s_{i}")
            for i in range(len(_JM_LAMBDAS))
        ],
        # the 1-row stats frame feeds three UNION branches — pin it so
        # the type-grain agg runs once (iterative-chain rule)
    ).localCheckpoint()
    out = None
    for i, lam in enumerate(_JM_LAMBDAS):
        h = F.round(
            -F.col(f"s_{i}") / F.col("n_bigrams").cast("double"), 6
        )
        row = sums.select(
            F.lit(lam).alias("lam"),
            "n_bigrams",
            h.alias("cross_entropy_bits"),
            F.round(F.pow(F.lit(2.0), h), 6).alias("perplexity"),
        )
        out = row if out is None else out.unionAll(row)
    return out
