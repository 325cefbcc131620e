"""Round-8 batch 10: calibration and retrieval-evaluation audits —
the model-quality counterparts of the engine's data-quality gates:

- ``isotonic_calibration_bins``: isotonic (monotone) calibration of
  P(lang='en' | quality_score) over bounded score bins, via the
  MINIMAX closed form of isotonic regression — fit(i) = max_{j≤i}
  min_{k≥i} mean(y over bins j..k) — so the PAV loop becomes three
  bounded-grain relational steps (prefix sums → pair means → triple
  min/max) with no iteration at all.
- ``conformal_split_coverage``: Mondrian (per-language) split
  conformal prediction on the quality score — median predictor from
  a TRAIN split, |residual| nonconformity on a CALIBRATION split,
  q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration residual, coverage
  audited on a held-out TEST split. The distribution-free coverage
  guarantee (Vovk; Lei et al.) as a driver-checkable row per group.
- ``retrieval_map_mrr``: MAP@10 and MRR@10 of exact cosine retrieval
  judged by label agreement — the order-sensitive companions of
  ``ann_ndcg_at_10`` (extras8): AP integrates precision at every
  relevant hit, MRR scores the first hit only.

Registry conventions (plans/registry.py): exact-integer counts;
divisions of exact integers ROUND 6; the AP sum adds ROUND-6 terms in
DECIMAL(18,6) (unigram_entropy pattern); splits use the width-safe
Knuth bucket (functions.scalar.knuth_bucket ≡ sql_knuth_bucket);
order statistics are selected by rank (row_number / percentile_disc
pick actual data values — no interpolation, no float summation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.plans.extras8 import _NDCG_QUERIES
from ucl_data_pipeline_spark.plans.llm_ops import (
    _QUALITY_ORACLE,
    _SQL_COS,
    brute_force_topk,
    text_quality_score,
)
from ucl_data_pipeline_spark.plans.registry import register, sql_knuth_bucket
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Isotonic calibration over bounded score bins (minimax form)
# ---------------------------------------------------------------------------

_ISO_BINS = 16

_ISO_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
base AS (
  SELECT CAST(FLOOR(q.quality_score * {_ISO_BINS}) AS INTEGER) AS b,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM q JOIN documents d ON q.doc_id = d.doc_id
  WHERE q.quality_score IS NOT NULL
), bins AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sum_y
  FROM base GROUP BY b
), pre AS (
  SELECT b, n, sum_y,
         SUM(n) OVER w AS cn, SUM(sum_y) OVER w AS cy
  FROM bins
  WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
), pairs AS (
  SELECT j.b AS bj, k.b AS bk,
         CAST(k.cy - (j.cy - j.sum_y) AS DOUBLE)
           / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
  FROM pre j JOIN pre k ON j.b <= k.b
), inner_min AS (
  SELECT i.b AS b, p.bj AS bj, MIN(p.m) AS g
  FROM bins i JOIN pairs p ON p.bj <= i.b AND p.bk >= i.b
  GROUP BY i.b, p.bj
), iso AS (
  SELECT b, MAX(g) AS fit FROM inner_min GROUP BY b
)
SELECT bins.b, bins.n, bins.sum_y,
       ROUND(CAST(bins.sum_y AS DOUBLE) / CAST(bins.n AS DOUBLE), 6)
         AS raw_rate,
       ROUND(iso.fit, 6) AS iso_rate
FROM bins JOIN iso ON bins.b = iso.b
"""


@register(
    "isotonic_calibration_bins",
    oracle=_ISO_ORACLE,
    tags=("stats", "llm", "agg"),
)
def isotonic_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration curve of the 'is English' rate against the
    text quality score, over {B} bounded score bins: the L2 isotonic
    fit via its MINIMAX closed form fit(i) = max_{{j≤i}} min_{{k≥i}}
    mean(y | bins j..k) — provably equal to what the
    pool-adjacent-violators loop computes, but expressed as pure
    relational algebra: per-bin counts, prefix sums, a (j,k) pair
    frame of range means, and a bounded triple join for the min/max.
    The monotone-calibration step every score-gated sampler needs
    before treating 'quality 0.7' as a probability.

    Determinism: bin means are single divisions of exact BIGINT range
    sums (prefix-sum differences); min/max comparisons run on those
    exact-ratio doubles (IEEE-identical in both engines); ROUND 6 at
    output only.

    Scale: ONE corpus-grain hash-agg quantizes docs to ≤{B}+1 bins;
    everything after runs on the bounded derived grain — the pair
    frame is ≤B², the triple join ≤B³ rows, constants independent of
    corpus size (the adjudicated bounded-grain pattern: histogram
    walks, day-grain series). The unbounded-alternative PAV loop
    would be a driver iteration; the minimax form needs none.
    """
    q = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "quality_score")
        .filter(F.col("quality_score").isNotNull())
    )
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    base = q.join(d, "doc_id").select(
        F.floor(F.col("quality_score") * _ISO_BINS).cast("int").alias("b"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    bins = base.groupBy("b").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "b",
        "n",
        "sum_y",
        F.sum("n").over(w).alias("cn"),
        F.sum("sum_y").over(w).alias("cy"),
    )
    j = pre.select(
        F.col("b").alias("bj"),
        (F.col("cy") - F.col("sum_y")).alias("cy_lt"),
        (F.col("cn") - F.col("n")).alias("cn_lt"),
    )
    k = pre.select(
        F.col("b").alias("bk"), F.col("cy").alias("cy_le"), F.col("cn").alias("cn_le")
    )
    pairs = (
        j.join(F.broadcast(k), F.col("bj") <= F.col("bk"))
        .select(
            "bj",
            "bk",
            (
                (F.col("cy_le") - F.col("cy_lt")).cast("double")
                / (F.col("cn_le") - F.col("cn_lt")).cast("double")
            ).alias("m"),
        )
    )
    i_frame = bins.select(F.col("b").alias("bi"))
    iso = (
        pairs.join(
            F.broadcast(i_frame),
            (F.col("bj") <= F.col("bi")) & (F.col("bk") >= F.col("bi")),
        )
        .groupBy("bi", "bj")
        .agg(F.min("m").alias("g"))
        .groupBy("bi")
        .agg(F.max("g").alias("fit"))
    )
    return (
        bins.join(F.broadcast(iso), bins.b == iso.bi)
        .select(
            "b",
            "n",
            "sum_y",
            F.round(
                F.col("sum_y").cast("double") / F.col("n").cast("double"), 6
            ).alias("raw_rate"),
            F.round("fit", 6).alias("iso_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Mondrian split-conformal coverage audit
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.2  # 80% target coverage
_CONF_M = 10  # knuth buckets: 0-3 train, 4-6 cal, 7-9 test

_CONF_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
keyed AS (
  SELECT q.doc_id, d.lang, q.quality_score AS score,
         {sql_knuth_bucket("q.doc_id", _CONF_M)} AS bkt
  FROM q JOIN documents d ON q.doc_id = d.doc_id
  WHERE q.quality_score IS NOT NULL
), mu AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY score) AS mu
  FROM keyed WHERE bkt <= 3 GROUP BY lang
), cal AS (
  SELECT k.lang, ABS(k.score - mu.mu) AS r, k.doc_id
  FROM keyed k JOIN mu ON k.lang = mu.lang
  WHERE k.bkt BETWEEN 4 AND 6
), calstat AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cal,
         LEAST(CAST(CEIL((COUNT(*) + 1) * {1 - _CONF_ALPHA}) AS BIGINT),
               COUNT(*)) AS k_rank
  FROM cal GROUP BY lang
), qhat AS (
  SELECT c.lang, s.n_cal, s.k_rank, c.r AS qhat
  FROM (SELECT lang, r,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY r, doc_id) AS rn
        FROM cal) c
  JOIN calstat s ON c.lang = s.lang AND c.rn = s.k_rank
), test AS (
  SELECT k.lang,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN ABS(k.score - mu.mu) <= qh.qhat
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM keyed k
  JOIN mu ON k.lang = mu.lang
  JOIN qhat qh ON k.lang = qh.lang
  WHERE k.bkt >= 7
  GROUP BY k.lang
)
SELECT mu.lang, mu.n_train, qh.n_cal, qh.k_rank,
       ROUND(qh.qhat, 6) AS qhat_r,
       t.n_test, t.n_covered,
       ROUND(CAST(t.n_covered AS DOUBLE) / CAST(t.n_test AS DOUBLE), 6)
         AS coverage
FROM mu JOIN qhat qh ON mu.lang = qh.lang
JOIN test t ON mu.lang = t.lang
"""


@register(
    "conformal_split_coverage",
    oracle=_CONF_ORACLE,
    tags=("stats", "llm", "sample"),
)
def conformal_split_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian (group-conditional) split-conformal prediction audit
    on the text quality score, per language: TRAIN buckets fit a
    median predictor μ(lang); CALIBRATION buckets' absolute residuals
    give q̂ = the ⌈(n_cal+1)·(1−α)⌉-th smallest (α={a}); TEST buckets
    report empirical coverage of the interval μ ± q̂. Exchangeability
    gives the distribution-free guarantee P(cover) ≥ 1−α; this query
    turns that guarantee into a driver-checkable number — the audit a
    quality-score-based curation gate needs before its thresholds are
    trusted as probabilistic bounds.

    Determinism: the split is the width-safe Knuth hash bucket (exact
    integer algebra both engines); μ is percentile_disc — an ACTUAL
    data value selected by rank, no interpolation or summation; q̂ is
    a rank-selected residual (row_number over (r, doc_id), the k-th
    ORDER STATISTIC — same value cross-engine regardless of tie
    layout); residual comparisons are IEEE-identical doubles; the
    tiny-group guard clamps k to n_cal (degrades to max-residual,
    the practical convention). ROUND 6 at output only.

    Scale: three disjoint hash-bucket scans of one doc-grain frame;
    per-lang aggregates; μ/q̂ frames are #langs-sized BROADCASTs back
    onto the test scan. The percentile buffer runs per (lang) on the
    TRAIN subset only — bounded by the documented approx-percentile
    substitution if a group ever outgrows memory.
    """
    q = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "quality_score")
        .filter(F.col("quality_score").isNotNull())
    )
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    keyed = q.join(d, "doc_id").select(
        "doc_id",
        "lang",
        F.col("quality_score").alias("score"),
        knuth_bucket("doc_id", _CONF_M).alias("bkt"),
    )
    mu = (
        keyed.filter(F.col("bkt") <= 3)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY score)"
            ).alias("mu"),
        )
    )
    cal = (
        keyed.filter(F.col("bkt").between(4, 6))
        .join(F.broadcast(mu.select("lang", "mu")), "lang")
        .select("lang", F.abs(F.col("score") - F.col("mu")).alias("r"), "doc_id")
    )
    calstat = cal.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_cal"),
        F.least(
            F.ceil((F.count("*") + 1) * (1 - _CONF_ALPHA)).cast("long"),
            F.count("*"),
        ).alias("k_rank"),
    )
    w = Window.partitionBy("lang").orderBy("r", "doc_id")
    qhat = (
        cal.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(calstat), "lang")
        .filter(F.col("rn") == F.col("k_rank"))
        .select("lang", "n_cal", "k_rank", F.col("r").alias("qhat"))
    )
    test = (
        keyed.filter(F.col("bkt") >= 7)
        .join(F.broadcast(mu.select("lang", "mu")), "lang")
        .join(F.broadcast(qhat.select("lang", "qhat")), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("score") - F.col("mu")) <= F.col("qhat"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        mu.select("lang", "n_train")
        .join(qhat, "lang")
        .join(test, "lang")
        .select(
            "lang",
            "n_train",
            "n_cal",
            "k_rank",
            F.round("qhat", 6).alias("qhat_r"),
            "n_test",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation: MAP@10 / MRR@10 by label relevance
# ---------------------------------------------------------------------------

_MAP_K = 10

_MAP_ORACLE = f"""
WITH topk AS (
  SELECT q.vec_id AS query_id, q.label AS q_label,
         c.vec_id AS neighbor_id, c.label AS c_label,
         row_number() OVER (
           PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) AS rnk
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _NDCG_QUERIES}
   AND c.vec_id <> q.vec_id
  QUALIFY rnk <= {_MAP_K}
), lab AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label FROM embeddings GROUP BY label
), hits AS (
  SELECT query_id, rnk,
         CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS rel,
         SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id ORDER BY rnk
                 ROWS UNBOUNDED PRECEDING) AS n_hits
  FROM topk
), perq AS (
  SELECT h.query_id,
         CAST(SUM(h.rel) AS BIGINT) AS n_rel10,
         CAST(SUM(CASE WHEN h.rel = 1
                       THEN CAST(ROUND(CAST(h.n_hits AS DOUBLE) / h.rnk, 6)
                                 AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS ap_num,
         MIN(CASE WHEN h.rel = 1 THEN h.rnk END) AS first_hit
  FROM hits h GROUP BY h.query_id
)
SELECT p.query_id,
       l.n_label - 1 AS r_total,
       p.n_rel10,
       ROUND(p.ap_num / LEAST(CAST(l.n_label - 1 AS DOUBLE), {_MAP_K}.0), 6)
         AS ap_at_10,
       ROUND(COALESCE(1.0 / p.first_hit, 0.0), 6) AS rr_at_10
FROM perq p
JOIN embeddings e ON e.vec_id = p.query_id
JOIN lab l ON l.label = e.label
"""


@register(
    "retrieval_map_mrr", oracle=_MAP_ORACLE, tags=("vector", "llm", "gate")
)
def retrieval_map_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP@10 and MRR@10 of exact cosine retrieval judged by label
    agreement — the rank-position-sensitive retrieval metrics next to
    ``ann_ndcg_at_10``: AP@10 = Σ_(relevant hits) P@rank / min(R, 10)
    integrates precision at every relevant position (R = the query's
    corpus-wide relevant count), MRR scores only the first hit. NDCG
    rewards graded position via log discounts; AP/MRR are the binary-
    relevance numbers retrieval papers and embedding leaderboards
    report — together the three give the full ranking-quality story
    for the embedding space the dedup/ANN family runs on.

    Determinism: precision terms n_hits/rank are ROUND-6 divisions of
    exact integers, summed in DECIMAL(18,6) (order-free, the
    unigram_entropy pattern); the final AP division and the 1/rank
    MRR are single IEEE ops ROUND 6; ranking ties break on
    neighbor_id (total order).

    Scale: identical bounded shape to the NDCG/recall gates — 5
    structurally-capped broadcast query rows against one corpus scan
    (brute_force_topk), per-query windows over ≤ k rows, label
    totals from one hash-agg joined back at #queries grain.
    """
    e = read_table(spark, sf_dir, "embeddings")
    queries = e.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 100 * _NDCG_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    topk = brute_force_topk(
        e.select("vec_id", "embedding"), queries, _MAP_K, _NDCG_QUERIES
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    qlab = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    clab = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("c_label")
    )
    ranked = (
        topk.withColumn("rnk", F.row_number().over(w_rank))
        .join(F.broadcast(qlab), "query_id")
        .join(clab, "neighbor_id")
        .withColumn(
            "rel",
            F.when(F.col("c_label") == F.col("q_label"), 1).otherwise(0),
        )
    )
    w_hits = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = ranked.withColumn("n_hits", F.sum("rel").over(w_hits))
    perq = hits.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel10"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.round(
                    F.col("n_hits").cast("double") / F.col("rnk"), 6
                ).cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("ap_num"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_hit"),
    )
    lab = e.groupBy("label").agg(F.count("*").cast("long").alias("n_label"))
    qside = e.select(F.col("vec_id").alias("query_id"), "label")
    return (
        perq.join(F.broadcast(qside), "query_id")
        .join(F.broadcast(lab), "label")
        .select(
            "query_id",
            (F.col("n_label") - 1).alias("r_total"),
            "n_rel10",
            F.round(
                F.col("ap_num")
                / F.least(
                    (F.col("n_label") - 1).cast("double"), F.lit(float(_MAP_K))
                ),
                6,
            ).alias("ap_at_10"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("first_hit"), F.lit(0.0)
                ),
                6,
            ).alias("rr_at_10"),
        )
    )
