"""Round-8 batch 4: incremental materialized-view maintenance —

- ``mv_incremental_agg_parity``: maintain a per-customer aggregate MV
  (order count + spend) from a BASE snapshot plus a CDC batch of
  inserts AND deletes using retractable-aggregate algebra — each
  change row contributes op·value with op ∈ {+1, −1}, the base MV and
  the delta MV merge by full-outer coalesce-addition, and groups
  whose maintained count reaches 0 drop out — then return the
  maintained MV, which the oracle proves equal to recomputing the
  aggregate from scratch over (base − deletes + inserts). This is the
  correctness contract of incremental view maintenance in lakehouse
  pipelines (Delta CDF / Materialized View refresh): at 100 TB you
  cannot re-aggregate the world per batch; you fold the change stream
  into the MV and the ONLY acceptable semantics is bit-equality with
  recomputation. Complements ``snapshot_upsert_latest`` (row-grain
  keep-latest) with the AGGREGATE-grain retraction algebra, and the
  streaming family's stream≡batch parity discipline applied to the
  batch-CDC path.

The CDC batch is synthesized deterministically from orders: rows with
o_orderkey % 7 == 0 are "new" inserts (excluded from the base), and
base rows with o_orderkey % 5 == 0 are deleted by the batch — so the
batch exercises inserts, partial deletes, AND at least the
possibility of full-group retraction, with every branch identical in
both engines.

Registry conventions (plans/registry.py): counts are exact BIGINTs
(sum of ±1); spend sums run in DECIMAL(18,6) on BOTH the base and
delta paths BEFORE the final double cast, so maintained and
recomputed results are bit-identical regardless of the order the
retractions fold in (the dsum order-independence convention).

Scale: the base MV is the standing state (key-grain); the delta agg
shuffles only the CHANGE BATCH at key grain (map-side combinable);
the merge is a key-grain outer join of two aggregates. Nothing
re-touches base fact rows — that is the entire point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_DEC = "decimal(18,6)"

_MV_ORACLE = """
WITH base AS (
  SELECT * FROM orders WHERE o_orderkey % 7 <> 0
), inserts AS (
  SELECT * FROM orders WHERE o_orderkey % 7 = 0
), deletes AS (
  SELECT * FROM base WHERE o_orderkey % 5 = 0
), effective AS (
  SELECT * FROM base WHERE o_orderkey % 5 <> 0
  UNION ALL
  SELECT * FROM inserts
)
SELECT o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
FROM effective
GROUP BY o_custkey
"""


@register(
    "mv_incremental_agg_parity",
    oracle=_MV_ORACLE,
    tags=("agg", "incremental", "scale"),
)
def mv_incremental_agg_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-customer MV after folding a CDC batch (inserts +
    deletes) into the base aggregate via retraction algebra — the
    ORACLE recomputes the aggregate from scratch over the effective
    row set, so the driver's hash match IS the proof that incremental
    maintenance ≡ recomputation, group-for-group and bit-for-bit.
    See the module docstring for the CDC synthesis and the 100 TB
    contract.

    The Spark side deliberately takes the INCREMENTAL path end to
    end: base MV (one key-grain agg over the snapshot), delta MV (one
    key-grain agg over op-signed change rows only), full-outer
    coalesce-merge, zero-count retraction drop. No expression ever
    re-aggregates the effective row set directly — equality with the
    recomputing oracle is earned, not restated.

    Determinism: counts are sums of exact ±1; money folds in
    DECIMAL(18,6) on both paths before the final double cast, so the
    merged sum equals the recomputed sum exactly regardless of fold
    order; a fully-retracted group's zero count drops it on the
    incremental side exactly where recomputation never produces it.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    inserts = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_custkey", "o_totalprice", F.lit(1).alias("op")
    )
    deletes = base.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_custkey", "o_totalprice", F.lit(-1).alias("op")
    )
    cdc = inserts.unionByName(deletes)

    mv_base = base.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("s_b"),
    )
    mv_delta = cdc.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum("op").cast("bigint").alias("n_d"),
        F.sum(
            (F.col("op").cast(_DEC) * F.col("o_totalprice").cast(_DEC)).cast(
                _DEC
            )
        ).alias("s_d"),
    )
    zero_dec = F.lit(0).cast(_DEC)
    merged = mv_base.join(mv_delta, "custkey", "full_outer").select(
        "custkey",
        (
            F.coalesce(F.col("n_b"), F.lit(0))
            + F.coalesce(F.col("n_d"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_orders"),
        (
            F.coalesce(F.col("s_b"), zero_dec)
            + F.coalesce(F.col("s_d"), zero_dec)
        )
        .cast(_DEC)
        .alias("spend_dec"),
    )
    return merged.filter(F.col("n_orders") > 0).select(
        "custkey", "n_orders", F.col("spend_dec").cast("double").alias("spend")
    )
