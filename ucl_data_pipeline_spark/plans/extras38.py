"""Round-8 batch 5: duplicate-cluster canonicalization —

- ``cc_canonical_selection``: for every multi-member near-duplicate
  component (the connected components of the LSH near-dup graph,
  shared edge set with ``dedup_connected_components``), choose the
  ONE document to keep by quality-argmax — highest
  ``text_quality_score``, ties broken by smallest doc_id — and report
  the component's size, the kept doc, its quality, and how many
  copies drop. This is the curation decision the dedup family was
  building toward: CC tells you WHICH documents are the same content;
  this operator decides WHICH COPY survives, by the same quality
  signals the pre-training filter uses, instead of the min-doc_id
  proxy pairwise dedup defaults to. Composes two registered
  operators' exact spellings (CC's recursive closure, the quality
  score's length/diversity/stopword/punct mix) on BOTH engines, so
  the composition cannot drift from its inputs — the
  curation_pipeline / ann_rrf_fusion composition discipline.

Registry conventions (plans/registry.py): the quality score is an
IEEE expression of exact integer counts — bit-identical cross-engine
(hash-proven since r1 for text_quality_score) — so ORDER BY
(quality DESC, doc_id) is a deterministic total order; byte-identical
copies tie on quality and fall to the doc_id tie-break identically.
Output quality is ROUND 6; counts exact BIGINTs.

Scale: component labels are the CC output (edge-bounded iterative
join); quality is one document scan; the argmax is a window over
COMPONENT-sized partitions (near-dup clusters are tiny by
construction — the corpus-sized "component" does not exist after
dedup gating) followed by a component-grain agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.llm_ops import (
    CC_EDGES_SQL_CTES,
    _QUALITY_ORACLE,
    dedup_connected_components,
    text_quality_score,
)
from ucl_data_pipeline_spark.plans.registry import register

_CANON_ORACLE = rf"""
WITH RECURSIVE {CC_EDGES_SQL_CTES}, reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst
), comp AS (
  SELECT doc_id, MIN(r) AS component_id FROM reach GROUP BY doc_id
), q AS (
  SELECT doc_id, quality_score FROM ({_QUALITY_ORACLE})
), ranked AS (
  SELECT c.component_id, c.doc_id, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
                            ORDER BY q.quality_score DESC, c.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.component_id) AS n_members
  FROM comp c JOIN q USING (doc_id)
)
SELECT component_id,
       CAST(n_members AS BIGINT) AS n_members,
       doc_id AS kept_doc,
       ROUND(quality_score, 6) AS kept_quality,
       CAST(n_members - 1 AS BIGINT) AS n_dropped
FROM ranked
WHERE rn = 1 AND n_members >= 2
"""


@register(
    "cc_canonical_selection",
    oracle=_CANON_ORACLE,
    tags=("dedup", "llm", "iterative"),
)
def cc_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-argmax canonical document per multi-member near-dup
    component: one row per component with ≥2 members — its size, the
    kept doc (highest quality, then smallest doc_id), the kept doc's
    quality, and the number of copies dropped. See the module
    docstring for why this replaces min-doc_id keeper selection and
    how determinism is earned.

    The Spark side composes the registered operators directly:
    component labels from dedup_connected_components (shared edge
    set, same propagation), quality from text_quality_score — then
    one window argmax inside component partitions and the rn=1
    projection. No re-derivation of either input.
    """
    comp = dedup_connected_components(spark, sf_dir)
    q = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    joined = comp.join(q, "doc_id")
    w = Window.partitionBy("component_id")
    ranked = (
        joined.withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.col("quality_score").desc(), "doc_id")
            ),
        )
        .withColumn("n_members", F.count("*").over(w))
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("n_members") >= 2)
    ).select(
        "component_id",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("doc_id").alias("kept_doc"),
        F.round("quality_score", 6).alias("kept_quality"),
        (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
    )
