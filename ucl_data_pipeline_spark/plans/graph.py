"""Graph analytics over the star schema: PageRank on the trade
network. Unlike k-means (driver-coordinated argmin/init → rows-only),
FIXED-ITERATION PageRank is fully oracle-checkable: the Spark side
chains five lazy iteration plans (no driver round-trips at all) and
the DuckDB oracle unrolls the same five steps as chained CTEs, with
every per-iteration sum made order-independent by the registry's
round-then-decimal-sum convention — so an ITERATIVE algorithm gets an
exact cross-engine value hash.

Scale shape: each iteration is one join (ranks ⋈ edges, keyed by src)
+ one hash-agg (keyed by dst) + one left join back onto the node list
— identical to a Pregel superstep. Ranks are (node, double) pairs:
tiny relative to edges, so at scale the edge table keeps a fixed
partitioning and ranks shuffle to it each round. For long iteration
counts, localCheckpoint every few rounds bounds lineage (five plans
deep needs none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_DAMP = 0.85
_N_ITER = 5
_N_NODES = 25  # nation is a fixed-size dimension


def _sql_iter(prev: str, cur: str) -> str:
    """One unrolled PageRank step in DuckDB SQL (mirrors the Spark
    iteration expression-for-expression)."""
    return f"""{cur} AS (
  SELECT n.node,
    ROUND({1 - _DAMP} / {_N_NODES} + {_DAMP} * COALESCE(c.contrib, 0.0), 12)
      AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
      CAST(SUM(CAST(ROUND(r.rank * e.w / o.ow, 12) AS DECIMAL(28,12)))
           AS DOUBLE) AS contrib
    FROM {prev} r
    JOIN edges e ON e.src = r.node
    JOIN outw o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)"""


# Shared CTE prefix (nodes/edges/outw/r0 + the unrolled iterations) —
# also consumed by extras34's pagerank_residual_audit, which SELECTs
# from the intermediate r{k} frames instead of the last one.
PAGERANK_CTE_PREFIX = f"""
WITH nodes AS (
  SELECT n_nationkey AS node FROM nation
), edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, c.c_nationkey
), outw AS (
  SELECT src, SUM(w) AS ow FROM edges GROUP BY src
), r0 AS (
  SELECT node, CAST(1.0 / {_N_NODES} AS DOUBLE) AS rank FROM nodes
),
{",".join(_sql_iter(f"r{i}", f"r{i + 1}") for i in range(_N_ITER))}
"""

_PAGERANK_ORACLE = f"""{PAGERANK_CTE_PREFIX}
SELECT node, rank FROM r{_N_ITER}
ORDER BY rank DESC, node
"""


def pagerank_rank_chain(
    spark: SparkSession, sf_dir: str, n_iter: int = _N_ITER
) -> list[DataFrame]:
    """The full lazy rank chain [r0, r1, ..., r_n_iter] — shared by
    ``pagerank_trade_network`` (which returns the last frame) and the
    round-8 ``pagerank_residual_audit`` in extras34 (which differences
    consecutive frames). Extracting the list changes NO expression in
    the witnessed pagerank plan: the loop body below is the round-1
    spelling verbatim; this wrapper only keeps references to the
    intermediate (still lazy) DataFrames instead of dropping them."""
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nodes = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").cast("double").alias("w"))
        # edges ⋈ out-weights reused every iteration: materialize once
        .persist()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # outw has one row per source node (≤25) — broadcast it onto edges.
    ew = (
        edges.join(F.broadcast(outw), "src")
        .select("src", "dst", "w", "ow")
        .persist()
    )

    ranks = nodes.select("node", F.lit(1.0 / _N_NODES).alias("rank"))
    chain = [ranks]
    for _ in range(n_iter):
        # ranks/contrib are bounded by node count (25 rows) — broadcast
        # them so the weighted edge table never re-shuffles per
        # superstep (same policy as bfs_reach_hops).
        contrib = (
            ew.join(F.broadcast(ranks), ranks["node"] == ew["src"])
            .select(
                F.col("dst").alias("cnode"),
                F.round(F.col("rank") * F.col("w") / F.col("ow"), 12).alias(
                    "term"
                ),
            )
            .groupBy("cnode")
            .agg(
                F.sum(F.col("term").cast("decimal(28,12)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = nodes.join(
            F.broadcast(contrib), nodes["node"] == contrib["cnode"], "left"
        ).select(
            "node",
            F.round(
                F.lit((1 - _DAMP) / _N_NODES)
                + F.lit(_DAMP) * F.coalesce("contrib", F.lit(0.0)),
                12,
            ).alias("rank"),
        )
        chain.append(ranks)
    return chain


@register("pagerank_trade_network", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative", "join"))
def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 5 fixed iterations) over the nation trade
    network: an edge supplier-nation → customer-nation per
    (lineitem ⋈ orders) flow, weighted by flow count. Each iteration
    is one lazy join+agg superstep — NO driver round-trips (contrast
    kmeans, whose centroid argmin forces per-iteration collects); the
    whole five-step computation is a single Catalyst plan.

    Cross-engine determinism: per-edge contributions are rounded to
    12 dp and summed exactly in decimal each iteration, so both
    engines produce bit-identical ranks after every step.
    """
    ranks = pagerank_rank_chain(spark, sf_dir, _N_ITER)[-1]
    return ranks.orderBy(F.col("rank").desc(), "node")


# ---------------------------------------------------------------------------
# Fixed-superstep BFS (multi-source shortest hops)
# ---------------------------------------------------------------------------

_BFS_ITER = 4


def _sql_bfs_iter(prev: str, cur: str) -> str:
    """One unrolled BFS relaxation step in DuckDB SQL (mirrors the
    Spark iteration): hops_{i+1}(n) = min(hops_i(n), 1 + min over
    in-edges of hops_i(src)). All-integer arithmetic — exact on any
    engine by construction."""
    return f"""{cur} AS (
  SELECT d.node,
    CASE WHEN d.hops IS NULL THEN c.cand
         WHEN c.cand IS NULL THEN d.hops
         ELSE LEAST(d.hops, c.cand) END AS hops
  FROM {prev} d LEFT JOIN (
    SELECT e.dst AS cnode, MIN(p.hops) + 1 AS cand
    FROM {prev} p
    JOIN bedges e ON e.src = p.node
    WHERE p.hops IS NOT NULL
    GROUP BY e.dst
  ) c ON c.cnode = d.node
)"""


_BFS_ORACLE = f"""
WITH bedges AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
), d0 AS (
  SELECT n_nationkey AS node,
         CASE WHEN n_regionkey = 0 THEN 0 END AS hops
  FROM nation
),
{",".join(_sql_bfs_iter(f"d{i}", f"d{i + 1}") for i in range(_BFS_ITER))}
SELECT node, CAST(hops AS INTEGER) AS hops FROM d{_BFS_ITER}
"""


@register("bfs_reach_hops", oracle=_BFS_ORACLE, tags=("graph", "iterative", "join"))
def bfs_reach_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS ({N} fixed supersteps) over the distinct trade
    edges: minimum hop count from the region-0 nations to every nation;
    NULL hops = unreached within {N}. Like pagerank_trade_network the
    whole computation is ONE lazy Catalyst plan (no driver round-trips)
    and the oracle unrolls the identical supersteps as chained CTEs —
    but here the state is integral, so cross-engine exactness needs no
    float conventions at all.

    Scale shape: each superstep is one join (frontier ⋈ edges, keyed by
    src) + one min-agg (keyed by dst) + one left join back to the node
    list — a Pregel superstep; distances are one int per node, tiny
    next to edges, which keep a fixed partitioning across rounds. For
    long diameters, localCheckpoint every few supersteps bounds
    lineage (four plans deep needs none).
    """
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .distinct()
        .persist()
    )
    d = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_regionkey") == 0, F.lit(0)).alias("hops"),
    )
    for _ in range(_BFS_ITER):
        # Both sides of each superstep's joins that carry distance state
        # are bounded by the node count (nation: 25 rows) — broadcast
        # them so edges NEVER shuffle: each superstep is then a
        # broadcast join + partial-aggregated min, no sort-merge.
        cand = (
            edges.join(
                F.broadcast(d.filter(F.col("hops").isNotNull())),
                d["node"] == edges["src"],
            )
            .groupBy(F.col("dst").alias("cnode"))
            .agg((F.min("hops") + 1).alias("cand"))
        )
        d = d.join(F.broadcast(cand), d["node"] == cand["cnode"], "left").select(
            "node",
            F.when(F.col("hops").isNull(), F.col("cand"))
            .when(F.col("cand").isNull(), F.col("hops"))
            .otherwise(F.least("hops", "cand"))
            .alias("hops"),
        )
    return d.select("node", F.col("hops").cast("int").alias("hops"))
