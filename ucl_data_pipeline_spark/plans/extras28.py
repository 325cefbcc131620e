"""Round-7 batch 8: optimizer-statistics diagnostics —

- ``join_cardinality_audit``: the System-R / textbook-CBO join
  cardinality estimate (|R|*|S| / max(ndv_R(k), ndv_S(k))) audited
  against the TRUE join cardinality for every FK join in the schema —
  with the truth computed from key-grain count products, never by
  materializing the row-level join. The q-error
  (max(est/actual, actual/est)) per join is the number a cost-based
  optimizer (Spark's CBO with ``spark.sql.cbo.enabled``, or any
  engine's ANALYZE stats) lives or dies by: q-error near 1 means
  NDV-based estimation is trustworthy for that join's key
  distribution; a large q-error flags skew that will mis-size every
  downstream join strategy choice (broadcast vs shuffle, build-side
  selection, AQE initial partition counts).

Why this belongs in a 100 TB engine: at scale you cannot afford to
discover a mis-estimated join at runtime — the estimate decides
whether a 10 GB side gets broadcast. This audit is the offline
feedback loop: run it on a sample or a snapshot, find the joins where
uniform-NDV assumptions break, and pin those joins' strategies (or
add histograms) before the 1000-executor run.

Reference scope anchor: the reference's pandas merges
(scripts/enrich_features.py:151-179) never face this decision — every
table fits in memory. The moment the same DAG runs on Spark, join
sizing becomes the dominant planning question; this operator makes
the engine's answer auditable.

Registry conventions (plans/registry.py): exact integer counts as
BIGINT end-to-end; the only double ops are two final divisions of
exact integers (IEEE-deterministic cross-engine), ROUND 6.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# Audited joins: (join_name, left table, left key, right table,
# right key). The first five are the schema's FK edges — there the
# PK side is unique and FK integrity holds, so the NDV estimate is
# provably exact (est = n_right = actual, q_error = 1): the audit
# doubles as an FK-integrity check (any q_error != 1 on these rows
# means orphaned or duplicated keys). The last edge is the
# interesting one — a genuine many-to-many (customer x supplier on
# nationkey) where the uniform-frequency assumption meets real key
# skew and the q-error measures how badly.
_FK_JOINS: tuple[tuple[str, str, str, str, str], ...] = (
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier_lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
    ("nation_customer", "nation", "n_nationkey", "customer", "c_nationkey"),
    ("cust_supp_nation_m2m", "customer", "c_nationkey", "supplier", "s_nationkey"),
)

_JOIN_CTE = """
gl_{i} AS (
  SELECT {lk} AS k, COUNT(*) AS cl FROM {lt} GROUP BY {lk}
), gr_{i} AS (
  SELECT {rk} AS k, COUNT(*) AS cr FROM {rt} GROUP BY {rk}
), stats_{i} AS (
  SELECT
    '{name}' AS join_name,
    (SELECT CAST(SUM(cl) AS BIGINT) FROM gl_{i}) AS n_left,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM gl_{i}) AS ndv_left,
    (SELECT CAST(SUM(cr) AS BIGINT) FROM gr_{i}) AS n_right,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM gr_{i}) AS ndv_right,
    (SELECT CAST(COALESCE(SUM(cl * cr), 0) AS BIGINT)
       FROM gl_{i} JOIN gr_{i} USING (k)) AS actual_rows
)"""

_AUDIT_ORACLE = (
    "WITH "
    + ", ".join(
        _JOIN_CTE.format(i=i, name=name, lt=lt, lk=lk, rt=rt, rk=rk)
        for i, (name, lt, lk, rt, rk) in enumerate(_FK_JOINS)
    )
    + ", unioned AS ("
    + " UNION ALL ".join(
        f"SELECT * FROM stats_{i}" for i in range(len(_FK_JOINS))
    )
    + """
), est AS (
  SELECT *,
    (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE))
      / NULLIF(CAST(GREATEST(ndv_left, ndv_right) AS DOUBLE), 0.0)
      AS est_raw,
    CAST(actual_rows AS DOUBLE) AS act_raw
  FROM unioned
)
SELECT
  join_name, n_left, n_right, ndv_left, ndv_right, actual_rows,
  ROUND(est_raw, 6) AS est_rows,
  ROUND(GREATEST(est_raw / NULLIF(act_raw, 0.0),
                 act_raw / NULLIF(est_raw, 0.0)), 6) AS q_error
FROM est
"""
)


def _audit_one(
    spark: SparkSession, sf_dir: str, name: str, lt: str, lk: str, rt: str, rk: str
) -> DataFrame:
    """One FK edge's audit row. Two hash-aggs collapse each side to
    key grain (map-side combine: shuffle bytes are NDV-bounded, not
    row-bounded); the 'actual' is SUM(cl*cr) over the key-grain
    equi-join — algebraically the exact join cardinality, at NDV-join
    cost instead of row-join cost. The three singleton aggregates
    combine via broadcast cross-joins (registry precedent: every
    stats-vs-stats composition in extras20/extras22)."""
    gl = (
        read_table(spark, sf_dir, lt)
        .groupBy(F.col(lk).alias("k"))
        .agg(F.count("*").alias("cl"))
    )
    gr = (
        read_table(spark, sf_dir, rt)
        .groupBy(F.col(rk).alias("k"))
        .agg(F.count("*").alias("cr"))
    )
    stats_l = gl.agg(
        F.sum("cl").cast("bigint").alias("n_left"),
        F.count("*").cast("bigint").alias("ndv_left"),
    )
    stats_r = gr.agg(
        F.sum("cr").cast("bigint").alias("n_right"),
        F.count("*").cast("bigint").alias("ndv_right"),
    )
    act = gl.join(gr, "k").agg(
        F.coalesce(F.sum(F.col("cl") * F.col("cr")), F.lit(0))
        .cast("bigint")
        .alias("actual_rows")
    )
    est_raw = (
        F.col("n_left").cast("double") * F.col("n_right").cast("double")
    ) / F.nullif(
        F.greatest("ndv_left", "ndv_right").cast("double"), F.lit(0.0)
    )
    act_raw = F.col("actual_rows").cast("double")
    return (
        stats_l.crossJoin(F.broadcast(stats_r))
        .crossJoin(F.broadcast(act))
        .select(
            F.lit(name).alias("join_name"),
            "n_left",
            "n_right",
            "ndv_left",
            "ndv_right",
            "actual_rows",
            F.round(est_raw, 6).alias("est_rows"),
            F.round(
                F.greatest(
                    est_raw / F.nullif(act_raw, F.lit(0.0)),
                    act_raw / F.nullif(est_raw, F.lit(0.0)),
                ),
                6,
            ).alias("q_error"),
        )
    )


@register(
    "join_cardinality_audit",
    oracle=_AUDIT_ORACLE,
    tags=("stats", "plan"),
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System-R NDV join-cardinality estimate vs exact truth for six
    audited joins — the schema's five FK edges plus one genuine
    many-to-many (customer x supplier on nationkey) — one row per
    join with the q-error.

    Plan shape (the 100 TB contract): per edge, two key-grain
    hash-aggs (map-side combine; shuffle at NDV grain) feed (a) two
    singleton stat rows and (b) a key-grain equi-join whose
    SUM(cl*cr) IS the exact join cardinality — the row-level join is
    never built, so 'truth' costs NDV-join, not row-join. The six
    audit rows union. At 1000 executors each edge is an independent
    stage pipeline; the dominant cost is the two grain shuffles per
    edge, each bounded by the key NDV (<= row count, typically far
    below it).

    Determinism: counts and NDVs are exact BIGINTs; ``est_rows`` and
    ``q_error`` are single IEEE divisions of exact integers (identical
    across engines), ROUND 6. Divisions NULLIF-guarded per the
    registry's x/0 convention (Spark NULL vs DuckDB inf).
    """
    rows = [
        _audit_one(spark, sf_dir, name, lt, lk, rt, rk)
        for name, lt, lk, rt, rk in _FK_JOINS
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), rows)
