"""Round-7 batch 7: corpus-level source overlap —

- ``source_minhash_overlap``: pairwise source-vs-source content
  overlap estimated from MinHash signatures of each source's shingle
  UNION. The corpus-curation question this answers — "which sources
  are re-hosting each other's content?" — is what decides whether
  per-source mixture weights (``mixture_weights``,
  ``source_jsd_matrix``) double-count: two sources with high overlap
  contribute near-identical gradients, so their combined weight must
  be discounted before training. Doc-level dedup
  (``dedup_minhash_lsh``) removes the copies; this diagnostic tells
  you WHERE they came from, at a cost that never touches doc pairs.

The signature trick: a source's MinHash over the union of its docs'
shingle sets is the MIN over docs of the per-doc MinHash values
(min-of-mins = min over the union), so the per-doc signatures the
dedup family already computes aggregate straight to source grain with
one hash-agg — no source-level re-shingling pass.

Reference scope anchor: the reference's per-source fetch scripts
(scripts/fetch_*.py) treat each feed as independent; overlap between
feeds is exactly the blind spot this operator closes.

Registry conventions (plans/registry.py): exact integer counts as
BIGINT, final doubles ROUND 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import (
    _SQL_SHINGLES,
    _SQL_TOKS,
    _doc_features,
    _sql_minhash,
)
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table, stats_barrier

# 16 permutations: agreement granularity 1/16 — enough to rank source
# pairs (the decision is "audit this pair or not", not a tight
# estimate); the std error of the estimate is sqrt(J(1-J)/16) <= 0.125.
_N_PERM = 16

_SIG_COLS_SQL = ",\n  ".join(
    f"MIN({_sql_minhash(s)}) AS sig_{s}" for s in range(_N_PERM)
)
_AGREE_SQL = " + ".join(
    f"(CASE WHEN a.sig_{s} IS NOT DISTINCT FROM b.sig_{s} "
    "THEN 1 ELSE 0 END)"
    for s in range(_N_PERM)
)

_SOURCE_OVERLAP_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
), feat AS (
  SELECT doc_id, source, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), sig AS (
  SELECT source,
  COUNT(*) AS n_docs,
  {_SIG_COLS_SQL}
  FROM feat GROUP BY source
)
SELECT
  a.source AS source_a,
  b.source AS source_b,
  a.n_docs AS n_docs_a,
  b.n_docs AS n_docs_b,
  CAST({_AGREE_SQL} AS BIGINT) AS n_agree,
  ROUND(CAST({_AGREE_SQL} AS DOUBLE) / {_N_PERM}, 6) AS jaccard_est
FROM sig a JOIN sig b ON a.source < b.source
"""


@register(
    "source_minhash_overlap",
    oracle=_SOURCE_OVERLAP_ORACLE,
    tags=("dedup", "llm", "stats"),
)
def source_minhash_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from source-union MinHash
    signatures: for each unordered source pair, the fraction of the
    16 permutations whose signatures agree — an unbiased estimate of
    the Jaccard similarity of the two sources' full shingle-set
    unions.

    Plan shape (the 100 TB contract):
    1. One linear scan-side pass: shingle + 16 md5 minhashes per doc
       (the same ``_doc_features`` stage every near-dup operator
       shares, fanned out across cores).
    2. One hash-agg doc→source: ``min`` per permutation. Map-side
       combine collapses each partition to |sources| rows before the
       shuffle, so shuffle bytes are |sources| x 16 digests per
       partition — independent of corpus size.
    3. Pairwise stage on the AGGREGATED table only: |sources|^2/2
       comparisons of 16-value signatures. Sources number in the
       dozens-to-thousands; at web scale (millions of domains) the
       same signatures would be LSH-banded exactly like
       ``lsh_candidate_pairs`` bands doc signatures — the plan
       degrades to the already-registered banding, never to doc-pair
       cost.

    NULL convention: a source whose every doc is shorter than one
    shingle has NULL signatures; agreement uses null-safe equality
    (``eqNullSafe`` / ``IS NOT DISTINCT FROM``) so the row is still
    produced and two such degenerate sources count as agreeing.
    """
    d = read_table(spark, sf_dir, "documents")
    # stats-barriered (r13, replacing the r12 merge hint): BOTH sides
    # are doc-grain (corpus-growing) — the static planner broadcast the
    # FEATURES side because its Generate-blind estimate undercut the
    # honest scan estimate of the (doc_id, source) projection (the
    # ×100-smoke class). The barrier keeps the static plan SMJ while
    # AQE's size-measured runtime BHJ conversion stays free.
    feats = stats_barrier(_doc_features(spark, sf_dir)).join(
        d.select("doc_id", "source"), "doc_id"
    )
    doc_sigs = feats.select(
        "source", *[TX.minhash(F.col("feats"), s) for s in range(_N_PERM)]
    ).toDF("source", *[f"sig_{s}" for s in range(_N_PERM)])
    # persist: the self-join below references this table twice; without
    # it Spark re-executes the whole shingle + 16-way md5 scan for BOTH
    # sides (observed: two identical partial_min aggregates in the
    # plan). The persisted table is |sources| x 17 values. Measured
    # honestly at sf0.1 the persist is a slight LOSS (1.68 s vs 1.43 s
    # cold — materialization breaks the codegen pipeline and the tiny
    # corpus re-scan is cheaper than the cache round-trip), but the
    # no-persist plan re-reads the ENTIRE corpus for the second join
    # side, which at 100 TB doubles the dominant cost; the persist
    # keeps the second read at sketch size. Registry-standard
    # .persist() precedent: extras21/extras9. (localCheckpoint was
    # measured strictly worse on both counts — extra RDD stages.)
    src = doc_sigs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        *[F.min(f"sig_{s}").alias(f"sig_{s}") for s in range(_N_PERM)],
    ).persist()
    a = src.alias("a")
    b = src.alias("b")
    agree = sum(
        F.when(
            F.col(f"a.sig_{s}").eqNullSafe(F.col(f"b.sig_{s}")), 1
        ).otherwise(0)
        for s in range(_N_PERM)
    )
    return (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.n_docs").alias("n_docs_a"),
            F.col("b.n_docs").alias("n_docs_b"),
            agree.cast("bigint").alias("n_agree"),
            F.round(agree.cast("double") / _N_PERM, 6).alias("jaccard_est"),
        )
    )
