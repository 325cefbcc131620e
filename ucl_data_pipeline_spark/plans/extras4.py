"""Round-5 operators: ANN recall gates for every index variant,
sketch-based high-cardinality robust z-scores, and companions.

Populated incrementally this round; each registration follows the
registry conventions (decimal-exact aggregates, atomic output
columns, oracle dtype CASTs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# ANN recall gates — every index variant graded against the same exact
# baseline (ann_recall_at_3 covers LSH in extras3; these close the set)
# ---------------------------------------------------------------------------

from ucl_data_pipeline_spark.plans.llm_ops import (  # noqa: E402
    _IVF_ORACLE,
    _SQL_COS,
    _TOPK_MAX_QUERIES,
)
from ucl_data_pipeline_spark.plans.llm_ops3 import _SQ8_ORACLE  # noqa: E402
from ucl_data_pipeline_spark.plans.llm_ops4 import _PQ_ORACLE  # noqa: E402

# Exact-top-3 spelling, literally in sync with the bounded brute-force
# baseline (same sampling predicate + id ceiling).
_EXACT3_SQL = f"""
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _TOPK_MAX_QUERIES}
   AND c.vec_id <> q.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) <= 3
"""


def _recall_oracle(approx_sql: str) -> str:
    """Recall@3 oracle template: the graded index's OWN registered
    oracle is nested verbatim as the approx side (nested WITH — DuckDB
    scopes it to the CTE), so the gate can never drift from the query
    it grades.
    """
    return f"""
WITH exact3 AS ({_EXACT3_SQL}
), approx_full AS (
  {approx_sql}
), approx3 AS (
  SELECT query_id, neighbor_id FROM approx_full
)
SELECT e.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       ROUND(COUNT(a.neighbor_id) / 3.0, 6) AS recall_at_3
FROM exact3 e
LEFT JOIN approx3 a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


def _recall_vs_exact(
    spark: SparkSession, sf_dir: str, approx: DataFrame
) -> DataFrame:
    """Engine-side recall@3: exact top-3 (sliced from the registered
    bounded brute-force top-5) left-joined against the index's top-3.
    Both sides are ≤3 rows per query over a bounded query sample, so
    the gate costs one exact pass per index build — never a production
    path. COUNT over the preserved left side makes recall 0 (not a
    dropped row) for queries the index misses entirely.
    """
    from ucl_data_pipeline_spark.plans.llm_ops import embedding_topk_cosine

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    exact3 = (
        embedding_topk_cosine(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    approx3 = approx.select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact3.join(approx3, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / 3.0, 6).alias("recall_at_3"),
        )
    )


@register(
    "ann_recall_ivf_at_3",
    oracle=_recall_oracle(_IVF_ORACLE),
    tags=("vector", "llm", "agg"),
)
def ann_recall_ivf_at_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF (nprobe=1) index vs the exact baseline —
    the quality gate for ``embedding_ivf_topk``, composing the two
    registered queries so the measurement can't drift from what it
    grades. With ann_recall_at_3 (LSH) and the SQ8/PQ gates, every
    ANN index variant's quality is driver-visible, not just its speed.
    """
    from ucl_data_pipeline_spark.plans.llm_ops import embedding_ivf_topk

    return _recall_vs_exact(spark, sf_dir, embedding_ivf_topk(spark, sf_dir))


@register(
    "ann_recall_sq8_at_3",
    oracle=_recall_oracle(_SQ8_ORACLE),
    tags=("vector", "llm", "agg"),
)
def ann_recall_sq8_at_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF+SQ8 index (quantized first pass, exact
    re-rank) vs the exact baseline — quality gate for
    ``embedding_sq8_topk``."""
    from ucl_data_pipeline_spark.plans.llm_ops3 import embedding_sq8_topk

    return _recall_vs_exact(spark, sf_dir, embedding_sq8_topk(spark, sf_dir))


@register(
    "ann_recall_pq_at_3",
    oracle=_recall_oracle(_PQ_ORACLE),
    tags=("vector", "llm", "agg"),
)
def ann_recall_pq_at_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF+PQ index (product-quantized first pass,
    exact re-rank) vs the exact baseline — quality gate for
    ``embedding_pq_topk``."""
    from ucl_data_pipeline_spark.plans.llm_ops4 import embedding_pq_topk

    return _recall_vs_exact(spark, sf_dir, embedding_pq_topk(spark, sf_dir))

# ---------------------------------------------------------------------------
# Robust z-score outliers, high-cardinality sketch variant
# ---------------------------------------------------------------------------

_ROBUST_APPROX_ORACLE = """
WITH med AS (
  SELECT user_id,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM events GROUP BY user_id
), mad AS (
  SELECT e.user_id,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med))
           AS mad
  FROM events e JOIN med m USING (user_id)
  GROUP BY e.user_id
)
SELECT e.event_id, e.user_id,
       ROUND((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z
FROM events e
JOIN med m USING (user_id)
JOIN mad d USING (user_id)
WHERE d.mad > 0
  AND abs((e.value - m.med) / (1.4826 * d.mad)) > 2.5
"""


@register(
    "robust_zscore_outliers_approx",
    oracle=_ROBUST_APPROX_ORACLE,
    tags=("agg", "stats", "sketch"),
)
def robust_zscore_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``robust_zscore_outliers``'s promised high-cardinality sibling:
    the same median/MAD outlier score keyed by user_id (an unbounded
    key domain at production scale, vs event_type's 5 values), with the
    exact per-key medians swapped for ``approx_percentile``
    Greenwald-Khanna sketches. An exact grouped median must hold each
    group's full value multiset through the aggregation; the GK sketch
    is a bounded-size, MERGEABLE buffer (map-side partials combine),
    so memory per key is O(accuracy), not O(group size) — the 100 TB
    shape. The med/mad joins are keyed by user_id (co-partitioned
    shuffle joins, not broadcasts — the side tables scale with the key
    domain).

    Oracle exactness: GK at accuracy 1e6 returns the true discrete
    percentile whenever a group's distinct-value count is below the
    accuracy bound — verified equal to DuckDB ``percentile_disc`` per
    user at every test SF — so the driver's hash check is exact here
    while the SAME plan degrades gracefully (1e-6 rank error) at scale.
    MAD-degenerate groups (mad = 0) are excluded on both sides, as in
    the exact variant.
    """
    e = read_table(spark, sf_dir, "events")
    med = e.groupBy("user_id").agg(
        F.expr("approx_percentile(value, 0.5, 1000000)").alias("med")
    )
    with_med = e.join(med, "user_id")
    mad = with_med.groupBy("user_id").agg(
        F.expr(
            "approx_percentile(abs(value - med), 0.5, 1000000)"
        ).alias("mad")
    )
    z = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        with_med.join(mad, "user_id")
        .filter((F.col("mad") > 0) & (F.abs(z) > 2.5))
        .select("event_id", "user_id", F.round(z, 6).alias("robust_z"))
    )
