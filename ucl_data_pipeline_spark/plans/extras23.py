"""Round-7 batch 3: corpus-mixture divergence and rank fusion — two
retrieval/curation operators a training-data platform runs daily:

- ``source_jsd_matrix``: pairwise Jensen-Shannon divergence between
  per-source unigram distributions — THE data-mixture diagnostic (are
  two sources near-duplicates of each other's distribution? is a new
  crawl actually adding diversity?). Symmetric, bounded [0, 1] in
  base 2, defined even when supports differ.
- ``ann_rrf_fusion``: reciprocal-rank fusion (RRF, k=60) of the two
  registered ANN rankings (sign-bit LSH and IVF nprobe=1) — the
  standard way hybrid retrieval combines rankers without score
  calibration, fused from the SAME registered candidate generators so
  the fusion can never drift from its inputs.

Registry conventions (plans/registry.py) apply. Transcendental
per-term values are rounded to 12 dp and summed exactly in decimal
(the pagerank discipline — a thousands-term double sum differs in
order across engines), final outputs ROUND 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import fan_out, read_table

# ---------------------------------------------------------------------------
# Pairwise Jensen-Shannon divergence between source unigram mixtures
# ---------------------------------------------------------------------------

_JSD_ORACLE = rf"""
WITH tok AS (
  SELECT source, unnest({_SQL_TOKS}) AS tok FROM documents
),
cnt AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
),
j AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.c AS ca, b.c AS cb, ta.n AS na, tb.n AS nb
  FROM cnt a
  JOIN cnt b ON a.tok = b.tok AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
),
terms AS (
  SELECT source_a, source_b, ca, cb, na, nb,
    CAST(ROUND(
      (CAST(ca AS DOUBLE) / na)
        * log2(2 * (CAST(ca AS DOUBLE) / na)
               / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
      + (CAST(cb AS DOUBLE) / nb)
        * log2(2 * (CAST(cb AS DOUBLE) / nb)
               / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb)),
      12) AS DECIMAL(38,12)) AS t12
  FROM j
),
g AS (
  SELECT source_a, source_b,
    CAST(COUNT(*) AS BIGINT) AS n_common_terms,
    CAST(SUM(t12) AS DOUBLE) AS s,
    CAST(SUM(ca) AS BIGINT) AS sca,
    CAST(SUM(cb) AS BIGINT) AS scb,
    MAX(na) AS na, MAX(nb) AS nb
  FROM terms GROUP BY 1, 2
)
SELECT source_a, source_b, n_common_terms,
  ROUND((s + (1 - CAST(sca AS DOUBLE) / na)
           + (1 - CAST(scb AS DOUBLE) / nb)) / 2, 6) AS jsd
FROM g
"""


@register("source_jsd_matrix", oracle=_JSD_ORACLE, tags=("llm", "stats", "agg"))
def source_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions — the mixture diagnostic behind data-mixing
    decisions (DoReMi-style reweighting, dedup-across-sources
    triage): JSD(P,Q) = ½Σ[p·log₂(2p/(p+q)) + q·log₂(2q/(p+q))],
    symmetric and bounded [0,1] in base 2.

    The union-support sum decomposes so NO full-outer join is needed:
    tokens exclusive to one source contribute p·log₂2 = p, so
    JSD = ½[Σ_inter terms + (1−P_inter) + (1−Q_inter)] where P_inter
    is the probability mass each source puts on the SHARED vocabulary
    — exact BIGINT count sums divided once. Only the intersection is
    ever joined.

    Determinism: per-term transcendental values are rounded to 12 dp
    and summed exactly in decimal (the pagerank discipline); the
    exclusive-mass corrections are exact integer ratios; final ROUND 6.

    Scale: token counts hash-agg to the (source, term) grain with
    map-side combine; the pair join is keyed on an 8-byte xxhash64
    term digest (the round-7 shuffle convention — the string-keyed
    oracle doubles as the collision check) and fans out only 190
    source pairs per shared term. Source count is the bounded axis;
    vocabulary is the long tail, and it flows through ONE shuffle.
    """
    d = fan_out(
        read_table(spark, sf_dir, "documents").select("source", "text")
    )
    cnt = (
        d.select("source", F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("source", F.xxhash64("tok").alias("g"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    a = (
        cnt.join(F.broadcast(tot), "source")
        .select(
            F.col("source").alias("source_a"),
            "g",
            F.col("c").alias("ca"),
            F.col("n").alias("na"),
        )
    )
    b = (
        cnt.join(F.broadcast(tot), "source")
        .select(
            F.col("source").alias("source_b"),
            F.col("g").alias("gb"),
            F.col("c").alias("cb"),
            F.col("n").alias("nb"),
        )
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    term = pa * F.log2(2 * pa / (pa + pb)) + pb * F.log2(2 * pb / (pa + pb))
    pairs = a.join(
        b,
        (F.col("g") == F.col("gb")) & (F.col("source_a") < F.col("source_b")),
    ).select(
        "source_a",
        "source_b",
        "ca",
        "cb",
        "na",
        "nb",
        F.round(term, 12).cast("decimal(38,12)").alias("t12"),
    )
    g = pairs.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_common_terms"),
        F.sum("t12").cast("double").alias("s"),
        F.sum("ca").cast("long").alias("sca"),
        F.sum("cb").cast("long").alias("scb"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return g.select(
        "source_a",
        "source_b",
        "n_common_terms",
        F.round(
            (
                F.col("s")
                + (1 - F.col("sca").cast("double") / F.col("na"))
                + (1 - F.col("scb").cast("double") / F.col("nb"))
            )
            / 2,
            6,
        ).alias("jsd"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of the LSH and IVF ANN rankings
# ---------------------------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    # Compose the two registered ANN oracles verbatim as CTE bodies —
    # the same no-drift discipline the Spark side gets by calling the
    # registered query functions directly.
    from ucl_data_pipeline_spark.plans.llm_ops import (
        _IVF_ORACLE,
        _LSH_TOPK_ORACLE,
    )

    return f"""
WITH lsh_q AS ({_LSH_TOPK_ORACLE}),
ivf_q AS ({_IVF_ORACLE}),
lr AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS r
  FROM lsh_q
),
ir AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS r
  FROM ivf_q
),
u AS (
  SELECT query_id, neighbor_id, 1.0 / ({_RRF_K} + r) AS contrib FROM lr
  UNION ALL
  SELECT query_id, neighbor_id, 1.0 / ({_RRF_K} + r) AS contrib FROM ir
),
s AS (
  SELECT query_id, neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_lists,
         CAST(SUM(contrib) AS DOUBLE) AS score
  FROM u GROUP BY 1, 2
)
SELECT query_id, neighbor_id, n_lists,
       ROUND(score, 6) AS rrf_score,
       CAST(rank AS BIGINT) AS fused_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM s
)
WHERE rank <= 5
"""


@register("ann_rrf_fusion", oracle=_rrf_oracle(), tags=("vector", "llm"))
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of the two registered ANN
    rankings — sign-bit LSH (``embedding_lsh_topk``) and IVF nprobe=1
    (``embedding_ivf_topk``): score(n) = Σ_rankers 1/(60+rankᵣ(n)),
    fused top-5 per query. RRF is how hybrid retrieval combines
    rankers whose scores are not calibrated against each other
    (Cormack et al. 2009) — rank positions, not raw similarities, so a
    cosine ranker and a BM25 ranker fuse identically.

    No-drift discipline: the Spark side CALLS the two registered query
    functions and the oracle inlines their oracle SQL verbatim as
    CTEs, so the fusion's candidate sets are definitionally the ones
    the driver already checks (the ``lsh_candidate_pairs`` shared-
    generator precedent).

    Determinism: both input rankings order by bit-identical cosine
    doubles with neighbor_id tie-breaks; each fused score is a sum of
    ≤2 identical doubles (two-term IEEE addition is order-exact);
    final ROUND 6 on output only.

    Scale: each ranker is already bucket/list-bounded; fusion itself
    is one hash-agg + one per-query top-5 window over ≤ 2·k·|queries|
    rows — negligible at any corpus size. Adding a third ranker is a
    UNION ALL branch.
    """
    from ucl_data_pipeline_spark.plans.llm_ops import (
        embedding_ivf_topk,
        embedding_lsh_topk,
    )

    def ranked(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return df.select(
            "query_id",
            "neighbor_id",
            (1.0 / (_RRF_K + F.row_number().over(w))).alias("contrib"),
        )

    u = ranked(embedding_lsh_topk(spark, sf_dir)).unionAll(
        ranked(embedding_ivf_topk(spark, sf_dir))
    )
    s = u.groupBy("query_id", "neighbor_id").agg(
        F.count("*").cast("long").alias("n_lists"),
        F.sum("contrib").cast("double").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        s.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "n_lists",
            F.round("score", 6).alias("rrf_score"),
            "fused_rank",
        )
    )
