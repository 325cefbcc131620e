"""Round-7 batch 9: optimizer-statistics diagnostics, part 2 —

- ``join_skew_advisor``: per join-key column, the exact key-frequency
  skew profile a shuffle planner needs — row count, NDV, the heaviest
  key and its count, mean frequency, skew factor (max/mean), the
  heaviest key's share of all rows, and the prescribed salt fan-out
  for a 100k-rows-per-task target. This is the measurement half of
  the mitigation the engine already demonstrates
  (``salted_skew_join``): the advisor tells you WHICH keys need
  salting and by HOW MUCH, before the shuffle that would have
  straggled. Together with ``join_cardinality_audit`` (extras28) it
  forms the offline statistics loop a 100 TB deployment runs before
  pinning join strategies: cardinality q-error decides broadcast vs
  shuffle; the skew factor decides salting / AQE skew-join thresholds
  (``spark.sql.adaptive.skewJoin.skewedPartitionFactor`` is exactly
  a bound on this column).

Reference scope anchor: the reference's pandas merges
(scripts/enrich_features.py:151-179) are skew-blind — in-memory hash
joins don't straggle. On a cluster the heaviest key IS the critical
path of every shuffle stage; this operator makes it a number.

Registry conventions (plans/registry.py): exact BIGINT counts;
``top_key`` tie-broken to the SMALLEST key among maximal counts
(deterministic cross-engine, unlike arg_max); the only double ops are
final divisions of exact integers, ROUND 6; salt fan-out in exact
integer ceil-division (``div`` / ``//`` — no float intermediate).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# Fact-side join keys — where shuffle skew lives. (column label,
# table, key column.)
_SKEW_KEYS: tuple[tuple[str, str, str], ...] = (
    ("orders.o_custkey", "orders", "o_custkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("customer.c_nationkey", "customer", "c_nationkey"),
    ("events.user_id", "events", "user_id"),
)

# Salting target: rows of one key a single task should carry. The
# prescription column is ceil(max_cnt / target) in exact integers.
_SALT_TARGET = 100_000

_KEY_CTE = """
g_{i} AS (
  SELECT CAST({key} AS BIGINT) AS k, COUNT(*) AS cnt
  FROM {table} GROUP BY CAST({key} AS BIGINT)
), s_{i} AS (
  SELECT
    '{label}' AS key_col,
    (SELECT CAST(SUM(cnt) AS BIGINT) FROM g_{i}) AS n_rows,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM g_{i}) AS ndv,
    (SELECT CAST(MAX(cnt) AS BIGINT) FROM g_{i}) AS max_cnt,
    (SELECT MIN(k) FROM g_{i}
       WHERE cnt = (SELECT MAX(cnt) FROM g_{i})) AS top_key
)"""

_SKEW_ORACLE = (
    "WITH "
    + ", ".join(
        _KEY_CTE.format(i=i, label=label, table=table, key=key)
        for i, (label, table, key) in enumerate(_SKEW_KEYS)
    )
    + ", unioned AS ("
    + " UNION ALL ".join(f"SELECT * FROM s_{i}" for i in range(len(_SKEW_KEYS)))
    + f"""
)
SELECT
  key_col, n_rows, ndv, max_cnt, top_key,
  ROUND(CAST(n_rows AS DOUBLE) / NULLIF(CAST(ndv AS DOUBLE), 0.0), 6)
    AS mean_cnt,
  ROUND((CAST(max_cnt AS DOUBLE) * CAST(ndv AS DOUBLE))
        / NULLIF(CAST(n_rows AS DOUBLE), 0.0), 6) AS skew_factor,
  ROUND(CAST(max_cnt AS DOUBLE) / NULLIF(CAST(n_rows AS DOUBLE), 0.0), 6)
    AS top_share,
  CAST((max_cnt + {_SALT_TARGET - 1}) // {_SALT_TARGET} AS BIGINT)
    AS salt_buckets
FROM unioned
"""
)


def _skew_one(
    spark: SparkSession, sf_dir: str, label: str, table: str, key: str
) -> DataFrame:
    """One key column's profile. The grain hash-agg is the only pass
    over the rows (map-side partial_count combine: shuffle at NDV
    grain); the stats and the argmax run over the NDV-sized grain
    table. ``top_key`` joins the grain back on cnt == max via a
    broadcast singleton and takes MIN(k) — deterministic under ties,
    which arg_max/max_by is not guaranteed to be cross-engine."""
    g = (
        read_table(spark, sf_dir, table)
        .groupBy(F.col(key).cast("bigint").alias("k"))
        .agg(F.count("*").alias("cnt"))
    )
    stats = g.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("ndv"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    top = (
        g.join(F.broadcast(stats.select("max_cnt")), g.cnt == F.col("max_cnt"))
        .agg(F.min("k").alias("top_key"))
    )
    n_d = F.col("n_rows").cast("double")
    ndv_d = F.col("ndv").cast("double")
    max_d = F.col("max_cnt").cast("double")
    return (
        stats.crossJoin(F.broadcast(top))
        .select(
            F.lit(label).alias("key_col"),
            "n_rows",
            "ndv",
            "max_cnt",
            "top_key",
            F.round(n_d / F.nullif(ndv_d, F.lit(0.0)), 6).alias("mean_cnt"),
            F.round(
                (max_d * ndv_d) / F.nullif(n_d, F.lit(0.0)), 6
            ).alias("skew_factor"),
            F.round(max_d / F.nullif(n_d, F.lit(0.0)), 6).alias("top_share"),
            F.expr(
                f"(max_cnt + {_SALT_TARGET - 1}) div {_SALT_TARGET}"
            ).cast("bigint").alias("salt_buckets"),
        )
    )


@register(
    "join_skew_advisor",
    oracle=_SKEW_ORACLE,
    tags=("stats", "plan"),
)
def join_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact key-frequency skew profile for every fact-side join key:
    one row per key column with (n_rows, ndv, max_cnt, top_key,
    mean_cnt, skew_factor, top_share, salt_buckets).

    Plan shape (the 100 TB contract): per key, ONE pass over the fact
    rows — a grain hash-agg whose map-side partial_count collapses
    each input partition to its local key set before the shuffle, so
    shuffle bytes are NDV-bounded. Everything downstream (sum/count/
    max, the cnt==max argmax join, the advisory arithmetic) runs on
    the NDV-sized grain table with broadcast singletons. At 1000
    executors the six profiles are independent stage pipelines over
    their fact scans; no row-level join, no sort, no collect.

    ``skew_factor`` is the quantity AQE's skew-join machinery
    thresholds on (skewedPartitionFactor); ``salt_buckets`` is the
    exact fan-out ``salted_skew_join`` would need at a 100k-rows-per-
    task target, in pure integer ceil-division so both engines agree
    bit-for-bit even on the boundary.

    Determinism: counts exact; ``top_key`` = MIN key among maximal
    counts (ties broken identically cross-engine); doubles are final
    divisions of exact integers, ROUND 6, NULLIF-guarded.
    """
    rows = [
        _skew_one(spark, sf_dir, label, table, key)
        for label, table, key in _SKEW_KEYS
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), rows)
