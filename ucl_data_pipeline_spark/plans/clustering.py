"""Iterative clustering over the embeddings table: distributed k-means
as a driver-coordinated Spark loop.

SQL can't express the fixed-point iteration (the oracle harness
records a rows-only check; pytest asserts determinism, inertia
monotonicity and cluster integrity instead), but every step inside an
iteration is declarative DataFrame algebra, so the loop scales the way
MLlib's own implementation does:

- centroids live on the driver/broadcast (k×dim doubles — tiny),
- assignment is a broadcast comparison, no shuffle of the points,
- the update is one partial+final aggregation keyed by cluster id.

Determinism: Forgy init from the k lowest vec_ids, ties in the argmin
broken by cluster id, exact-decimal centroid means — identical results
every run at every partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

K = 8
ITERATIONS = 5


def _sq_dist(a: str, b: str) -> F.Column:
    diffs = F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


@register("kmeans_clusters", oracle=None, tags=("vector", "llm", "iterative"))
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, 5 iterations) over embeddings; returns
    (vec_id, cluster_id, sq_dist rounded to 6dp). See module docstring
    for the scale shape; no SQL oracle (iterative), driver records
    rows-only and tests/test_clustering.py asserts the semantics.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double("embedding").alias("embedding")
    )
    centroids = (
        e.orderBy("vec_id")
        .limit(K)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster_id"),
            F.col("embedding").alias("centroid"),
        )
        .withColumn("cluster_id", F.col("cluster_id") - 1)
        .localCheckpoint()
    )
    assigned = None
    for _ in range(ITERATIONS):
        scored = e.crossJoin(F.broadcast(centroids)).select(
            "vec_id",
            "embedding",
            "cluster_id",
            _sq_dist("embedding", "centroid").alias("sq_dist"),
        )
        best = F.row_number().over(
            Window.partitionBy("vec_id").orderBy("sq_dist", "cluster_id")
        )
        assigned = (
            scored.withColumn("rn", best).filter(F.col("rn") == 1).drop("rn")
        )
        centroids = (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count("*")
                ).alias("cval")
            )
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("centroid")
            )
            .localCheckpoint()
        )
    return assigned.select(
        "vec_id", "cluster_id", F.round("sq_dist", 6).alias("sq_dist")
    )
