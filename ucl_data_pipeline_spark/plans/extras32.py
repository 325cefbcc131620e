"""Round-7 batch 12: sketch mergeability —

- ``kmv_merge_parity``: the property that makes the KMV sketch
  (extras31) a DISTRIBUTED primitive, driver-verified: the bottom-k
  of the UNION of per-partition bottom-k sketches is exactly the
  global bottom-k (every global bottom-k hash is necessarily in its
  own partition's bottom-k), so per-source sketches merge into the
  same estimator state a single global pass would build —
  bit-identically. This is the contract a 100 TB NDV service runs
  on: executors ship k hashes each, the driver (or a reduce tree)
  keeps the k smallest of the union, and NOTHING is lost relative to
  having seen all the data. The query emits one sketch row per
  source plus a ``__merged__`` row (built ONLY from the per-source
  sketch rows) and a ``__direct__`` row (built from the global hash
  set); the merged row carries an ``est_matches_direct`` gate that
  the oracle — and therefore the driver — checks as a value, the
  same pattern as the ANN recall gates.

Registry conventions (plans/registry.py): the shared md5-hex 48-bit
digest spelling (extras31) keyed with tag 1000 (documents.text uses
tag 4 in extras31 — a different tag keeps the two queries' hash
spaces independent); exact BIGINTs; the estimate is one IEEE division
of exact integers, ROUND 6; small-cardinality branch returns the
exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.extras31 import _EST_NUM, _K, _h48, _sql_h48
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_TAG = 1000

_SQL_EST = (
    f"CASE WHEN n_sketch < {_K} THEN CAST(n_sketch AS DOUBLE) "
    f"ELSE {_EST_NUM}.0 / CAST(kth_min_hash AS DOUBLE) END"
)

_MERGE_ORACLE = f"""
WITH g AS (
  SELECT DISTINCT source, {_sql_h48('text', _TAG)} AS h
  FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM g
), per_source AS (
  SELECT source AS scope,
         CAST(MAX(h) AS BIGINT) AS kth_min_hash,
         CAST(COUNT(*) AS BIGINT) AS n_sketch
  FROM ranked WHERE rn <= {_K} GROUP BY source
), merged_pool AS (
  SELECT DISTINCT h FROM ranked WHERE rn <= {_K}
), merged AS (
  SELECT '__merged__' AS scope,
         CAST(MAX(h) AS BIGINT) AS kth_min_hash,
         CAST(COUNT(*) AS BIGINT) AS n_sketch
  FROM (SELECT h FROM merged_pool ORDER BY h LIMIT {_K}) t
), direct AS (
  SELECT '__direct__' AS scope,
         CAST(MAX(h) AS BIGINT) AS kth_min_hash,
         CAST(COUNT(*) AS BIGINT) AS n_sketch
  FROM (SELECT DISTINCT h FROM g ORDER BY h LIMIT {_K}) t
), unioned AS (
  SELECT * FROM per_source
  UNION ALL SELECT * FROM merged
  UNION ALL SELECT * FROM direct
)
SELECT
  scope, kth_min_hash, n_sketch,
  ROUND({_SQL_EST}, 6) AS ndv_est,
  CASE WHEN scope = '__merged__'
       THEN kth_min_hash = (SELECT kth_min_hash FROM direct)
            AND n_sketch = (SELECT n_sketch FROM direct)
       ELSE NULL END AS est_matches_direct
FROM unioned
"""


@register(
    "kmv_merge_parity",
    oracle=_MERGE_ORACLE,
    tags=("stats", "sketch"),
)
def kmv_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV sketches of document-text hashes, their
    union-merge, and the direct global sketch — with a driver-checked
    gate that merge ≡ direct (identical k-th minimum AND sketch
    size).

    Plan shape (the 100 TB contract): the (source, hash) grain is one
    hash-agg over the scan; per-source bottom-k is a row_number
    window PARTITIONED BY source (sort only within each source's
    NDV-grain slice — no global sort); the merge pool is at most
    k·|sources| rows, so the merged bottom-k is a
    TakeOrderedAndProject over a sketch-sized input, exactly the
    reduce-tree step a cluster would run. The __direct__ row is the
    expensive path the merge REPLACES — present only to be audited
    against, like exact_ndv in ndv_kmv_sketch_error.

    Determinism: same shared md5-hex digest spelling as extras31
    (tag 1000 keeps the hash space independent); all comparisons on
    exact BIGINTs; the boolean gate is engine-independent because
    both engines materialize identical sketches.
    """
    g = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("source", _h48("text", _TAG).alias("h"))
        .distinct()
    )
    ranked = g.withColumn(
        "rn", F.row_number().over(Window.partitionBy("source").orderBy("h"))
    ).where(F.col("rn") <= _K)
    # per-source sketch rows — also the ONLY input to the merge path
    per_source = ranked.groupBy(F.col("source").alias("scope")).agg(
        F.max("h").cast("bigint").alias("kth_min_hash"),
        F.count("*").cast("bigint").alias("n_sketch"),
    )
    merged = (
        ranked.select("h")
        .distinct()
        .orderBy("h")
        .limit(_K)
        .agg(
            F.max("h").cast("bigint").alias("kth_min_hash"),
            F.count("*").cast("bigint").alias("n_sketch"),
        )
        .select(F.lit("__merged__").alias("scope"), "kth_min_hash", "n_sketch")
    )
    direct = (
        g.select("h")
        .distinct()
        .orderBy("h")
        .limit(_K)
        .agg(
            F.max("h").cast("bigint").alias("kth_min_hash"),
            F.count("*").cast("bigint").alias("n_sketch"),
        )
        .select(F.lit("__direct__").alias("scope"), "kth_min_hash", "n_sketch")
    )
    unioned = per_source.unionByName(merged).unionByName(direct)
    est = F.when(
        F.col("n_sketch") < _K, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(_EST_NUM)) / F.col("kth_min_hash").cast("double"))
    dkth = direct.select(
        F.col("kth_min_hash").alias("d_kth"), F.col("n_sketch").alias("d_n")
    )
    return (
        unioned.crossJoin(F.broadcast(dkth))
        .select(
            "scope",
            "kth_min_hash",
            "n_sketch",
            F.round(est, 6).alias("ndv_est"),
            F.when(
                F.col("scope") == "__merged__",
                (F.col("kth_min_hash") == F.col("d_kth"))
                & (F.col("n_sketch") == F.col("d_n")),
            ).alias("est_matches_direct"),
        )
    )
