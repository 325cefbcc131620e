"""Round-7 batch 11: distinct-count sketching —

- ``ndv_kmv_sketch_error``: the K-Minimum-Values (KMV / bottom-k)
  distinct-count sketch (Bar-Yossef et al. 2002; the theta sketch of
  Apache DataSketches) audited against exact NDV for a spread of
  schema columns. KMV is THE mergeable NDV sketch a 100 TB engine
  ships between executors: each partition keeps its k smallest hash
  values, union-merge keeps the k smallest of the union, and the
  estimate (k-1) / U_(k) needs only the k-th smallest normalized
  hash. Unlike HyperLogLog (whose register layout is
  engine-implementation-specific, so Spark's ``approx_count_distinct``
  can never hash-match a DuckDB oracle), KMV is defined purely by the
  hash function — and the registry already has a cross-engine-exact
  md5-derived hash spelling (extras13 ``epoch_shuffle_shards``), so
  the WHOLE sketch, not just its error, is oracle-checkable: both
  engines build bit-identical sketches and the driver verifies the
  estimator itself.

Why audit NDV at all: extras28's ``join_cardinality_audit`` showed
the System-R estimate is exactly as good as its NDV inputs; at 100 TB
exact COUNT(DISTINCT) per column per snapshot is unaffordable, so the
planner runs on sketched NDVs — this operator measures what that
substitution costs (KMV rel. error concentrates at ~1/sqrt(k-2),
12.6% at k=64).

Registry conventions (plans/registry.py): hashes are exact BIGINTs
from the shared '0x'-hex spelling; the estimate is one IEEE division
of exact integers, ROUND 6; the n_distinct < k branch returns the
exact count (the standard KMV small-cardinality rule).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_K = 64
# (k-1) * 2^48 — the estimator numerator, one exactly-representable
# double literal (< 2^54) so neither engine performs the multiply.
_EST_NUM = (_K - 1) * (1 << 48)
assert _EST_NUM == 17732923532771328

_AUDIT_COLS: tuple[tuple[str, str, str], ...] = (
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
    ("documents.text", "documents", "text"),
)


def _h48(col: Column | str, tag: int) -> Column:
    """48-bit hash: first 12 hex chars of md5('{tag}:' || value) as a
    BIGINT — the extras13 cross-engine digest spelling widened from 32
    to 48 bits so birthday collisions are negligible at any NDV this
    audit will see (collisions would only merge identically on both
    engines anyway — the sketch stays bit-identical). Accepts a column
    name or any string-typed Column expression (extras33 hashes a
    composite row key); the ONE Spark-side spelling of this digest —
    keep it in lockstep with ``_sql_h48``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{tag}:"), c.cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")


def _sql_h48(col: str, tag: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{tag}:' || CAST({col} AS VARCHAR)), 1, 12))"
        "::BIGINT AS BIGINT)"
    )


_COL_CTE = """
g_{i} AS (
  SELECT DISTINCT {h} AS h FROM {table} WHERE {col} IS NOT NULL
), k_{i} AS (
  SELECT
    '{label}' AS col_name,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM g_{i}) AS exact_ndv,
    (SELECT CAST(MAX(h) AS BIGINT) FROM
       (SELECT h FROM g_{i} ORDER BY h LIMIT {k}) t) AS kth_min_hash,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM
       (SELECT h FROM g_{i} ORDER BY h LIMIT {k}) t) AS n_sketch
)"""

_KMV_ORACLE = (
    "WITH "
    + ", ".join(
        _COL_CTE.format(
            i=i,
            label=label,
            table=table,
            col=col,
            h=_sql_h48(col, i),
            k=_K,
        )
        for i, (label, table, col) in enumerate(_AUDIT_COLS)
    )
    + ", unioned AS ("
    + " UNION ALL ".join(f"SELECT * FROM k_{i}" for i in range(len(_AUDIT_COLS)))
    + f"""
), est AS (
  SELECT *,
    CASE WHEN n_sketch < {_K} THEN CAST(n_sketch AS DOUBLE)
         ELSE {_EST_NUM}.0 / CAST(kth_min_hash AS DOUBLE)
    END AS est_raw
  FROM unioned
)
SELECT
  col_name, exact_ndv, kth_min_hash,
  ROUND(est_raw, 6) AS ndv_est,
  ROUND((est_raw - CAST(exact_ndv AS DOUBLE))
        / NULLIF(CAST(exact_ndv AS DOUBLE), 0.0), 6) AS rel_error
FROM est
"""
)


def _kmv_one(
    spark: SparkSession, sf_dir: str, i: int, label: str, table: str, col: str
) -> DataFrame:
    """One column's sketch + audit. The distinct-hash set is an
    NDV-grain hash-agg (map-side combine); the bottom-k is a
    TakeOrderedAndProject over that grain — per-partition top-k then
    a k*p-row merge, never a full sort shuffle. In production the
    exact_ndv column is the thing you DROP (it is the expensive
    side); it exists here because the audit's whole point is
    measuring the sketch against it."""
    g = (
        read_table(spark, sf_dir, table)
        .where(F.col(col).isNotNull())
        .select(_h48(col, i).alias("h"))
        .distinct()
    )
    exact = g.agg(F.count("*").cast("bigint").alias("exact_ndv"))
    sketch = (
        g.orderBy("h")
        .limit(_K)
        .agg(
            F.max("h").cast("bigint").alias("kth_min_hash"),
            F.count("*").cast("bigint").alias("n_sketch"),
        )
    )
    est_raw = F.when(
        F.col("n_sketch") < _K, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(_EST_NUM)) / F.col("kth_min_hash").cast("double")
    )
    return (
        exact.crossJoin(F.broadcast(sketch))
        .select(
            F.lit(label).alias("col_name"),
            "exact_ndv",
            "kth_min_hash",
            F.round(est_raw, 6).alias("ndv_est"),
            F.round(
                (est_raw - F.col("exact_ndv").cast("double"))
                / F.nullif(F.col("exact_ndv").cast("double"), F.lit(0.0)),
                6,
            ).alias("rel_error"),
        )
    )


@register(
    "ndv_kmv_sketch_error",
    oracle=_KMV_ORACLE,
    tags=("stats", "sketch"),
)
def ndv_kmv_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-64) distinct-count sketch vs exact NDV for five
    schema columns spanning key ints and long text values: one row
    per column with the k-th minimum hash (the sketch's entire
    state boundary), the estimate (k-1)·2^48 / h_(k), and the signed
    relative error.

    Plan shape (the 100 TB contract): per column, one scan →
    distinct-hash hash-agg (shuffle NDV-bounded by the map-side
    partial) → TakeOrderedAndProject for the bottom-k (per-partition
    top-k, merge of k rows per partition — no global sort). The
    sketch side is exactly what a distributed NDV service would run;
    the exact side exists only to be audited against. Five columns =
    five independent stage pipelines unioned.

    Determinism: the hash is the shared md5-hex digest spelling, so
    BOTH engines materialize identical 48-bit hash sets, identical
    bottom-k, identical k-th minimum — the driver verifies the sketch
    itself, not just summary shapes. The estimator is one IEEE
    division of exact integers ((k-1)·2^48 is a single
    exactly-representable double literal), ROUND 6. Columns with
    fewer than k distinct hashes take the exact-count branch.
    """
    rows = [
        _kmv_one(spark, sf_dir, i, label, table, col)
        for i, (label, table, col) in enumerate(_AUDIT_COLS)
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), rows)
