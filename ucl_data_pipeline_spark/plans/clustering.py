"""Iterative clustering over the embeddings table: distributed k-means
as a driver-coordinated Spark loop, with deterministic k-means||
(scalable k-means++) initialization.

SQL can't express the fixed-point iteration (the oracle harness
records a rows-only check; pytest asserts determinism, inertia
monotonicity and cluster integrity instead), but every step inside an
iteration is declarative DataFrame algebra, so the loop scales the way
MLlib's own implementation does:

- centers live on the driver and enter the plan as LITERAL arrays
  (k x dim doubles — tiny), so assignment is a NARROW projection:
  ``array_min(transform(centers, c -> sq_dist(x, c)))`` — no
  crossJoin, no per-point shuffle, no window;
- the update is one partial+final aggregation keyed by
  (cluster, dimension) — n*dim rows combine map-side down to k*dim;
- each Lloyd iteration is exactly ONE Spark job (collect the k*dim
  new centroid values), not a checkpoint cascade.

Initialization is k-means|| (Bahmani et al., VLDB 2012) made
deterministic: per-round oversampling keeps point x iff
``u(x, round) < L * d2(x) / total``, where u is a hash-derived uniform
(xxhash64 — no RNG state), d2 the squared distance to the nearest
current center, and total an EXACT decimal sum (double-sum order
jitter could flip a boundary point between runs). The candidate set
(~L per round) is weighted by cluster population and reduced to K on
the driver with a greedy farthest-point pass — no randomness anywhere,
so results are bit-identical across runs and partitionings.

Determinism: hash-thresholded sampling, exact-decimal totals and
centroid means, argmin ties broken toward the lowest cluster id
(array_position returns the FIRST index attaining the min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

K = 8
ITERATIONS = 5
INIT_ROUNDS = 2
OVERSAMPLE = 2 * K  # the "l" of k-means||


def _sq_dist(a: str, b: str) -> Column:
    diffs = F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _centers_lit(centers: list[list[float]]) -> Column:
    # The k x dim center matrix enters the plan as ONE parsed SQL
    # expression. Building it element-wise (F.array of F.lit, or even
    # F.lit on a nested list) issues one py4j round-trip PER ELEMENT —
    # ~6k JVM calls per iteration at k=8, dim=64, which profiling
    # showed was over half of kmeans' total runtime. repr(float) is
    # shortest-round-trip and Double.parseDouble is correctly rounded,
    # so the values survive bit-exactly.
    inner = ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")" for c in centers
    )
    return F.expr(f"array({inner})")


def _dists(centers: list[list[float]]) -> Column:
    """array of squared distances from `embedding` to each center."""
    return F.transform(
        _centers_lit(centers),
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def _exact_total(df: DataFrame, col: str) -> float:
    """Order-independent sum of a double column (decimal accumulate)."""
    row = df.agg(
        F.sum(F.col(col).cast("decimal(28,12)")).cast("double").alias("t")
    ).collect()[0]
    return float(row.t or 0.0)


def _kmeans_parallel_init(pts: DataFrame, k: int) -> list[list[float]]:
    """Deterministic k-means|| seeding. `pts` has (vec_id, embedding)."""
    seed = pts.orderBy("vec_id").limit(1).collect()[0]
    centers: list[list[float]] = [list(seed.embedding)]
    for r in range(INIT_ROUNDS):
        d2 = pts.select(
            "vec_id", "embedding", F.array_min(_dists(centers)).alias("d2")
        )
        total = _exact_total(d2, "d2")
        if total <= 0.0:  # all points coincide with a center
            break
        u = (
            F.pmod(F.xxhash64("vec_id", F.lit(r)), F.lit(1_000_000)) + 0.5
        ) / 1_000_000.0
        cand = (
            d2.filter(u * F.lit(total) < F.lit(float(OVERSAMPLE)) * F.col("d2"))
            .select("vec_id", "embedding")
            .collect()
        )
        centers.extend(list(c.embedding) for c in sorted(cand, key=lambda c: c.vec_id))
    # Weight candidates by how many points they own, then reduce to k on
    # the driver (candidate set is ~INIT_ROUNDS * OVERSAMPLE rows).
    idx = F.array_position(
        (d := _dists(centers)), F.array_min(d)
    ).alias("center_idx")
    weights = {
        row.center_idx: row.w
        for row in pts.select(idx).groupBy("center_idx").agg(F.count("*").alias("w")).collect()
    }
    chosen = [0]  # the seed stays
    while len(chosen) < k and len(chosen) < len(centers):

        def gain(i: int) -> tuple[float, int]:
            d_min = min(
                sum((a - b) * (a - b) for a, b in zip(centers[i], centers[j]))
                for j in chosen
            )
            # negative index as the tie-break so ties pick the LOWEST i
            return (weights.get(i + 1, 0) * d_min, -i)

        best = max((i for i in range(len(centers)) if i not in chosen), key=gain)
        chosen.append(best)
    picked = [centers[i] for i in chosen]
    if len(picked) < k:  # degenerate corpus: pad with first distinct points
        pad = pts.orderBy("vec_id").limit(k).collect()
        for row in pad:
            if len(picked) >= k:
                break
            emb = list(row.embedding)
            if emb not in picked:
                picked.append(emb)
    return picked


def _seed_centers(pts: DataFrame) -> list[list[float]]:
    """Literal seed centers = embeddings of vec_id 0..K-1, with the id
    contract asserted: the oracles use ``cid = vec_id`` while the engine
    uses LIST POSITION as the cluster id, so if any vec_id in 0..K-1
    were absent the positional ids would silently shift off the
    oracle's. The testdata generator guarantees dense ids; this guard
    turns a would-be hash mismatch into an immediate error.
    """
    rows = pts.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    if ids != list(range(K)):
        raise ValueError(
            f"seed centers need vec_id exactly 0..{K - 1}, got {ids}"
        )
    return [list(r.embedding) for r in rows]


_ASSIGN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS cid, emb AS cvec FROM e WHERE vec_id < {K}
), dist AS (
  SELECT e.vec_id, e.emb, c.cid,
         list_reduce(
           list_prepend(0.0,
             list_transform(generate_series(1, len(e.emb)),
               i -> (e.emb[i] - c.cvec[i]) * (e.emb[i] - c.cvec[i]))),
           (a, b) -> a + b) AS d2
  FROM e CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, emb, cid
  FROM dist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)
SELECT
  CAST(a.cid AS INTEGER) AS cluster_id,
  CAST(i - 1 AS INTEGER) AS pos,
  COUNT(*) AS n_points,
  ROUND(CAST(SUM(CAST(a.emb[i] AS DECIMAL(18,9))) AS DOUBLE)
    / COUNT(*), 6) AS mean_val
FROM assigned a, unnest(generate_series(1, len(a.emb))) AS t(i)
GROUP BY a.cid, i
"""


@register("kmeans_assign", oracle=_ASSIGN_ORACLE, tags=("vector", "llm", "agg"))
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One oracle-checked Lloyd step: fixed deterministic centers (the
    embeddings of vec_id 0..K-1) → argmin assignment → per-cluster
    per-dimension exact-decimal means. ``kmeans_clusters`` itself stays
    rows-only (driver-coordinated iteration), but this hash-matches the
    step every iteration is made of — the same treatment pagerank gives
    its supersteps via unrolled CTEs.

    Cross-engine determinism of the argmin: d2 is a left fold from 0.0
    over per-dimension squared diffs — bit-identical IEEE operation
    order on both engines (DuckDB ``list_reduce(list_prepend(0.0, …))``
    mirrors ``F.aggregate(…, lit(0.0), +)``) — and ties break toward
    the lowest center id on both sides.

    Scale shape: identical to the production Lloyd iteration — centers
    are k×dim literals in a NARROW projection (no crossJoin of points
    with centers, no shuffle for assignment), then ONE hash-agg keyed by
    (cluster, dimension); the k-row center collect is the same tiny
    driver pull kmeans_clusters performs per iteration.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double("embedding").alias("embedding")
    )
    centers = _seed_centers(e)
    d = _dists(centers)
    assigned = e.select(
        (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cluster_id"),
        "embedding",
    )
    return (
        assigned.select("cluster_id", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(
            F.count("*").alias("n_points"),
            F.round(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_val"),
        )
    )


_LLOYD2_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent0 AS (
  SELECT vec_id AS cid, emb AS cvec FROM e WHERE vec_id < {K}
), dist1 AS (
  SELECT e.vec_id, e.emb, c.cid,
         list_reduce(
           list_prepend(0.0,
             list_transform(generate_series(1, len(e.emb)),
               i -> (e.emb[i] - c.cvec[i]) * (e.emb[i] - c.cvec[i]))),
           (a, b) -> a + b) AS d2
  FROM e CROSS JOIN cent0 c
), assigned1 AS (
  SELECT vec_id, emb, cid
  FROM dist1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
), newc AS (
  SELECT cid, list(mean_val ORDER BY pos) AS cvec
  FROM (
    SELECT a.cid, i AS pos,
           CAST(SUM(CAST(a.emb[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
             AS mean_val
    FROM assigned1 a, unnest(generate_series(1, len(a.emb))) AS t(i)
    GROUP BY a.cid, i
  ) GROUP BY cid
), cent1 AS (  -- empty clusters keep their previous center
  SELECT c0.cid, COALESCE(n.cvec, c0.cvec) AS cvec
  FROM cent0 c0 LEFT JOIN newc n ON c0.cid = n.cid
), dist2 AS (
  SELECT e.vec_id, e.emb, c.cid,
         list_reduce(
           list_prepend(0.0,
             list_transform(generate_series(1, len(e.emb)),
               i -> (e.emb[i] - c.cvec[i]) * (e.emb[i] - c.cvec[i]))),
           (a, b) -> a + b) AS d2
  FROM e CROSS JOIN cent1 c
), assigned2 AS (
  SELECT vec_id, emb, cid
  FROM dist2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)
SELECT
  CAST(a.cid AS INTEGER) AS cluster_id,
  CAST(i - 1 AS INTEGER) AS pos,
  COUNT(*) AS n_points,
  ROUND(CAST(SUM(CAST(a.emb[i] AS DECIMAL(18,9))) AS DOUBLE)
    / COUNT(*), 6) AS mean_val
FROM assigned2 a, unnest(generate_series(1, len(a.emb))) AS t(i)
GROUP BY a.cid, i
"""


@register("kmeans_lloyd2", oracle=_LLOYD2_ORACLE, tags=("vector", "llm", "agg"))
def kmeans_lloyd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO oracle-checked Lloyd iterations unrolled from literal seed
    centers (embeddings of vec_id 0..K-1): assign → recompute centers →
    reassign → per-cluster per-dimension means. Extends
    ``kmeans_assign`` (one step) the way pagerank's unrolled-CTE oracle
    covers its supersteps, closing the verification gap on the full
    iterative loop: ``kmeans_clusters`` is exactly this step composed n
    times, so a hash-match here checks the loop body INCLUDING the
    center-feedback path that a single step can't see.

    Cross-engine determinism: iteration-1 centers are exact-decimal
    sums divided by counts — one IEEE double division with identical
    operands on both engines, so the fed-back centers are bit-identical
    without rounding; d2 folds from 0.0 in identical order; argmin ties
    break toward the lowest center id; empty clusters carry their
    previous center forward on both sides.

    Scale shape: per iteration, one narrow literal-centers projection
    (no point-center shuffle) + one (cluster, dim)-keyed hash-agg with
    map-side partials; between iterations only k×dim doubles cross the
    driver. Identical to the production ``kmeans_clusters`` loop body.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double("embedding").alias("embedding")
    )
    # Two narrow passes over the points (assign@seed → means; final
    # plan) — worth one in-memory persist even at this scale; the
    # production loop (kmeans_clusters) does the same.
    pts = e.persist()
    seeds = _seed_centers(pts)

    def lloyd_means(centers: list[list[float]]) -> DataFrame:
        d = _dists(centers)
        assigned = pts.select(
            (F.array_position(d, F.array_min(d)) - 1)
            .cast("int")
            .alias("cluster_id"),
            "embedding",
        )
        return (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                F.count("*").alias("n_points"),
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count("*")
                ).alias("mean_val"),
            )
        )

    # iteration 1: collect the k×dim new centers (tiny driver pull)
    new = {}
    for row in lloyd_means(seeds).collect():
        new.setdefault(row.cluster_id, {})[row.pos] = row.mean_val
    cent1 = [
        [new[cid][p] for p in sorted(new[cid])] if cid in new else seeds[cid]
        for cid in range(len(seeds))
    ]
    # iteration 2: same step from the fed-back centers, rounded output
    out = lloyd_means(cent1)
    pts.unpersist()
    return out.select(
        "cluster_id",
        "pos",
        "n_points",
        F.round("mean_val", 6).alias("mean_val"),
    )


def _lloyd_unrolled_oracle(n_iters: int) -> str:
    """Oracle for n_iters Lloyd iterations from the vec_id<K seed
    centers, fully unrolled as a CTE chain (dist_i → assigned_i →
    newc_i → cent_i, feeding cent_i into dist_{i+1}) — the pagerank
    unrolled-CTE trick applied to k-means. Centers between iterations
    are exact-decimal means cast to double (identical operands on both
    engines, no rounding), so the fed-back values are bit-identical.
    """
    d2 = (
        "list_reduce(\n"
        "           list_prepend(0.0,\n"
        "             list_transform(generate_series(1, len(e.emb)),\n"
        "               i -> (e.emb[i] - c.cvec[i]) * (e.emb[i] - c.cvec[i]))),\n"
        "           (a, b) -> a + b)"
    )
    parts = [
        "WITH e AS (",
        "  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings",
        "), cent0 AS (",
        f"  SELECT vec_id AS cid, emb AS cvec FROM e WHERE vec_id < {K}",
        ")",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f", dist{i} AS (\n"
            f"  SELECT e.vec_id, e.emb, c.cid, {d2} AS d2\n"
            f"  FROM e CROSS JOIN cent{i - 1} c\n"
            f"), assigned{i} AS (\n"
            f"  SELECT vec_id, emb, cid FROM dist{i}\n"
            f"  QUALIFY row_number() OVER"
            f" (PARTITION BY vec_id ORDER BY d2, cid) = 1\n"
            f")"
        )
        if i < n_iters:  # last assignment feeds the output, not a center
            parts.append(
                f", newc{i} AS (\n"
                f"  SELECT cid, list(mean_val ORDER BY pos) AS cvec FROM (\n"
                f"    SELECT a.cid, i AS pos,\n"
                f"           CAST(SUM(CAST(a.emb[i] AS DECIMAL(18,9)))"
                f" AS DOUBLE) / COUNT(*) AS mean_val\n"
                f"    FROM assigned{i} a,"
                f" unnest(generate_series(1, len(a.emb))) AS t(i)\n"
                f"    GROUP BY a.cid, i\n"
                f"  ) GROUP BY cid\n"
                f"), cent{i} AS (\n"
                f"  SELECT c0.cid, COALESCE(n.cvec, c0.cvec) AS cvec\n"
                f"  FROM cent{i - 1} c0 LEFT JOIN newc{i} n ON c0.cid = n.cid\n"
                f")"
            )
    parts.append(
        f"""
SELECT
  CAST(a.cid AS INTEGER) AS cluster_id,
  CAST(i - 1 AS INTEGER) AS pos,
  COUNT(*) AS n_points,
  ROUND(CAST(SUM(CAST(a.emb[i] AS DECIMAL(18,9))) AS DOUBLE)
    / COUNT(*), 6) AS mean_val
FROM assigned{n_iters} a, unnest(generate_series(1, len(a.emb))) AS t(i)
GROUP BY a.cid, i"""
    )
    return "\n".join(parts)


@register(
    "kmeans_lloyd5",
    oracle=_lloyd_unrolled_oracle(ITERATIONS),
    tags=("vector", "llm", "agg"),
)
def kmeans_lloyd5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIVE oracle-checked Lloyd iterations unrolled from the literal
    seed centers — the full ``ITERATIONS`` count ``kmeans_clusters``
    runs, so the production loop body is now hash-verified at its
    actual depth (``kmeans_assign`` = 1 step, ``kmeans_lloyd2`` = 2;
    this closes the ladder: ``kmeans_clusters`` differs only in its
    k-means|| seeding). The oracle is generated by
    ``_lloyd_unrolled_oracle`` — a dist/assign/recenter CTE block per
    iteration, empty clusters carrying their center forward.

    Cross-engine determinism: identical to kmeans_lloyd2 — exact-
    decimal center means (one IEEE division, identical operands), d2
    folded from 0.0 in identical order, argmin ties to the lowest cid,
    output means rounded at 6 dp only at the end.

    Scale shape: per iteration one narrow literal-centers projection
    plus one (cluster, dim)-keyed map-side-combinable hash-agg; only
    k×dim doubles cross the driver between iterations; the point set
    is persisted once across all five passes.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double("embedding").alias("embedding")
    )
    pts = e.persist()
    centers = _seed_centers(pts)

    def lloyd_means(cs: list[list[float]]) -> DataFrame:
        d = _dists(cs)
        return (
            pts.select(
                (F.array_position(d, F.array_min(d)) - 1)
                .cast("int")
                .alias("cluster_id"),
                "embedding",
            )
            .select("cluster_id", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(
                F.count("*").alias("n_points"),
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count("*")
                ).alias("mean_val"),
            )
        )

    for _ in range(ITERATIONS - 1):
        new: dict[int, dict[int, float]] = {}
        for row in lloyd_means(centers).collect():
            new.setdefault(row.cluster_id, {})[row.pos] = row.mean_val
        centers = [
            [new[cid][p] for p in sorted(new[cid])]
            if cid in new
            else centers[cid]
            for cid in range(len(centers))
        ]
    out = lloyd_means(centers)
    pts.unpersist()
    return out.select(
        "cluster_id",
        "pos",
        "n_points",
        F.round("mean_val", 6).alias("mean_val"),
    )


@register("kmeans_clusters", oracle=None, tags=("vector", "llm", "iterative"))
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, k-means|| init, 5 Lloyd iterations) over the
    embeddings table; returns (vec_id, cluster_id, sq_dist rounded to
    6dp). See module docstring for the scale shape; no SQL oracle
    (iterative), the driver records rows-only and
    tests/test_clustering.py asserts the semantics.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    # Row-aware parallelism: ~15 tiny driver-coordinated jobs run over
    # the cached points, so scheduling cost scales with partition count
    # — blanket fan_out(32) at sf0.1 (2000 rows) spent more time
    # scheduling 32 tasks x 15 jobs than computing (A/B: 32 parts
    # 9.6 s, 4 parts 3.5 s). n comes from parquet row-group metadata
    # (count of an unprojected scan — no data read); at 100 TB
    # n/4096 >> cores, so this caps at full cluster parallelism.
    n_rows = emb.count()
    parallelism = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(parallelism, n_rows // 4096))
    pts = (
        emb.select("vec_id", VX.as_double("embedding").alias("embedding"))
        # Persist across init + Lloyd iterations: every round re-reads
        # the full point set (~9 passes total), so without this each
        # pass re-scans parquet and re-runs the double conversion; at
        # 100 TB an uncached iterative re-scan is the dominant cost.
        # MEMORY_AND_DISK: partitions that don't fit spill instead of
        # being recomputed.
        .repartition(n_parts)
        .persist()
    )
    centers = _kmeans_parallel_init(pts, K)
    for _ in range(ITERATIONS):
        d = _dists(centers)
        assigned = pts.select(
            "vec_id",
            "embedding",
            (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cluster_id"),
        )
        rows = (
            assigned.select("cluster_id", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count("*")
                ).alias("cval")
            )
            .collect()
        )
        new_centers = [list(c) for c in centers]  # empty cluster keeps its center
        by_cluster: dict[int, dict[int, float]] = {}
        for row in rows:
            by_cluster.setdefault(row.cluster_id, {})[row.pos] = row.cval
        for cid, dims in by_cluster.items():
            new_centers[cid] = [dims[p] for p in sorted(dims)]
        centers = new_centers
    d = _dists(centers)
    return pts.select(
        "vec_id",
        (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cluster_id"),
        F.round(F.array_min(d), 6).alias("sq_dist"),
    )
