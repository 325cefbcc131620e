"""Round-5 inventory depth, fourth batch: ranking-quality evaluation
(NDCG), association rules, robust outlier fences, RFM customer
segmentation, latency SLO quantiles, and embedding-centroid drift —
the remaining everyday shapes of a metrics/quality platform.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.llm_ops import _SQL_COS, brute_force_topk
from ucl_data_pipeline_spark.plans.registry import register, sql_dsum
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# ANN/embedding ranking quality: label-relevance NDCG@10
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_QUERIES = 5

# Rank discounts 1/log2(rank+1) and ideal-DCG prefix sums as shared
# LITERALS: both engines pick from the same constants, so the only
# engine-computed float work is the bounded summation (ROUND 6).
_DISCOUNTS = [1.0 / math.log2(r + 1) for r in range(1, _NDCG_K + 1)]
_IDCG = [0.0]
for _d in _DISCOUNTS:
    _IDCG.append(_IDCG[-1] + _d)

_SQL_DISCOUNTS = "[" + ", ".join(repr(d) for d in _DISCOUNTS) + "]"
_SQL_IDCG = "[" + ", ".join(repr(v) for v in _IDCG) + "]"

_NDCG_ORACLE = f"""
WITH topk AS (
  SELECT q.vec_id AS query_id, q.label AS q_label,
         c.vec_id AS neighbor_id, c.label AS c_label,
         row_number() OVER (
           PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) AS rnk
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _NDCG_QUERIES}
   AND c.vec_id <> q.vec_id
  QUALIFY rnk <= {_NDCG_K}
),
scored AS (
  SELECT query_id,
         CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel,
         SUM(CASE WHEN c_label = q_label
                  THEN ({_SQL_DISCOUNTS})[rnk] ELSE 0.0 END) AS dcg
  FROM topk GROUP BY query_id
)
SELECT query_id, n_rel,
       ROUND(dcg / NULLIF(({_SQL_IDCG})[n_rel + 1], 0.0), 6) AS ndcg_at_10
FROM scored
"""


@register("ann_ndcg_at_10", oracle=_NDCG_ORACLE, tags=("vector", "llm", "gate"))
def ann_ndcg_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality gate: NDCG@10 of exact cosine retrieval judged
    by label agreement — "when I retrieve 10 nearest neighbors, how
    early do the same-label ones appear?". Complements the recall gates
    (extras3.py): recall measures the INDEX against exact retrieval;
    NDCG measures the EMBEDDING SPACE itself against ground-truth
    labels — the number that says whether nearest-neighbor dedup/search
    can work on this representation at all.

    Determinism: rank discounts 1/log₂(r+1) and the ideal-DCG prefix
    table enter BOTH engines as shared literals (module constants), so
    no transcendental is evaluated per-engine; the bounded 10-term sum
    is ROUND 6.

    Scale: same bounded brute-force shape as the recall gates — the
    query side is structurally capped (5 broadcast rows) against one
    corpus scan; NDCG math runs on ≤ k rows per query.
    """
    e = read_table(spark, sf_dir, "embeddings")
    queries = (
        e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 100 * _NDCG_QUERIES))
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    topk = brute_force_topk(
        e.select("vec_id", "embedding"), queries, _NDCG_K, _NDCG_QUERIES
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    ranked = topk.withColumn("rnk", F.row_number().over(w))
    qlab = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    clab = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("c_label")
    )
    disc = F.array(*[F.lit(d) for d in _DISCOUNTS])
    idcg = F.array(*[F.lit(v) for v in _IDCG])
    scored = (
        ranked.join(F.broadcast(qlab), "query_id")
        .join(clab, "neighbor_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("c_label") == F.col("q_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_rel"),
            F.sum(
                F.when(
                    F.col("c_label") == F.col("q_label"),
                    F.element_at(disc, F.col("rnk")),
                ).otherwise(0.0)
            ).alias("dcg"),
        )
    )
    return scored.select(
        "query_id",
        "n_rel",
        F.round(
            F.col("dcg")
            / F.nullif(
                F.element_at(idcg, (F.col("n_rel") + 1).cast("int")), F.lit(0.0)
            ),
            6,
        ).alias("ndcg_at_10"),
    )


# ---------------------------------------------------------------------------
# Association rules: support / confidence / lift on co-purchased parts
# ---------------------------------------------------------------------------

_RULES_TOPK = 25

_RULES_ORACLE = f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM basket),
item AS (
  SELECT l_partkey, COUNT(*) AS n_item FROM basket GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
top_pairs AS (
  SELECT * FROM pairs
  ORDER BY n_ab DESC, part_a, part_b
  LIMIT {_RULES_TOPK}
)
SELECT p.part_a, p.part_b,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) / t.n, 6) AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) / ia.n_item, 6) AS conf_a_to_b,
       ROUND(CAST(p.n_ab AS DOUBLE) * t.n
             / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
FROM top_pairs p
JOIN item ia ON ia.l_partkey = p.part_a
JOIN item ib ON ib.l_partkey = p.part_b
CROSS JOIN n_orders t
"""


@register("assoc_rules_lift", oracle=_RULES_ORACLE, tags=("join", "agg"))
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics for the top co-purchased part pairs:
    support (pair share of baskets), confidence (P(b|a)) and lift
    (observed co-occurrence over the independence expectation) — the
    classic market-basket read on top of copurchase_pairs' mining
    plan. Lift > 1 flags genuinely associated items; confidence alone
    is inflated by popular items, which is exactly what lift corrects.

    Determinism: all three metrics are single double divisions of
    exact integer counts, ROUND 6; the top-k cut is
    (count desc, part_a, part_b).

    Scale: identical candidate shape to copurchase_pairs (dedup'd
    baskets self-joined on the order key, per-key blow-up bounded by
    basket size); item frequencies are a map-side-combinable hash-agg;
    the metric joins touch only the k surviving pairs, with the basket
    count as a 1-row broadcast.
    """
    li = read_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct().persist()
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    item = basket.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .orderBy(F.col("n_ab").desc(), "part_a", "part_b")
        .limit(_RULES_TOPK)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb"))
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias(
                "conf_a_to_b"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# IQR outlier fences (Tukey) per event type
# ---------------------------------------------------------------------------

_IQR_ORACLE = """
WITH q AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.25), 6) AS q1,
         ROUND(quantile_cont(value, 0.75), 6) AS q3
  FROM events GROUP BY event_type
),
fences AS (
  SELECT event_type, q1, q3,
         ROUND(q1 - 1.5 * (q3 - q1), 6) AS lo,
         ROUND(q3 + 1.5 * (q3 - q1), 6) AS hi
  FROM q
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       f.q1, f.q3, f.lo AS fence_lo, f.hi AS fence_hi,
       CAST(COUNT(*) FILTER (WHERE e.value < f.lo OR e.value > f.hi)
            AS BIGINT) AS n_outliers
FROM events e JOIN fences f ON f.event_type = e.event_type
GROUP BY e.event_type, f.q1, f.q3, f.lo, f.hi
"""


@register("iqr_outlier_fences", oracle=_IQR_ORACLE, tags=("agg", "stats"))
def iqr_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences per event type: Q1/Q3, the 1.5·IQR
    fences, and the count of points outside them — the box-plot
    outlier rule, the quantile-based sibling of robust_zscore_outliers
    (which uses median/MAD). Reported as fences + counts so the whole
    screen is one bounded row per group.

    Determinism: both engines interpolate exact quantiles over
    identical doubles; fences are ROUNDED to 6dp BEFORE the comparison
    — ulp differences in the engines' interpolation arithmetic would
    otherwise flip the outlier test for points sitting exactly on a
    fence (same hardening rule as the seasonal/CUSUM boundary fix).

    Scale: quantiles per group need a per-group sort (Spark's
    percentile agg buffers the group — for unbounded groups swap to
    approx_percentile, same plan otherwise, as robust_zscore's approx
    twin does); the outlier count joins the tiny fence table back
    broadcast, one more fact pass. Two passes total, both
    shuffle-light.
    """
    ev = read_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile(F.col("value"), F.lit(0.75)), 6).alias("q3"),
    )
    fences = q.select(
        "event_type",
        "q1",
        "q3",
        F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6).alias("lo"),
        F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6).alias("hi"),
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3", "lo", "hi")
        .agg(
            F.count("*").alias("n_events"),
            F.count(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                )
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "q1",
            "q3",
            F.col("lo").alias("fence_lo"),
            F.col("hi").alias("fence_hi"),
            "n_outliers",
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (threshold scoring, no global ntile)
# ---------------------------------------------------------------------------

_RFM_ORACLE = f"""
WITH rfm AS (
  SELECT o_custkey,
         CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_order,
         COUNT(*) AS f,
         {sql_dsum('o_totalprice')} AS m
  FROM orders GROUP BY 1
),
anchored AS (
  SELECT o_custkey,
         CAST((SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
              - last_order AS BIGINT) AS r,
         CAST(f AS BIGINT) AS f, m
  FROM rfm
),
th AS (
  SELECT
    ROUND(quantile_cont(r, 0.25), 6) AS r1,
    ROUND(quantile_cont(r, 0.50), 6) AS r2,
    ROUND(quantile_cont(r, 0.75), 6) AS r3,
    ROUND(quantile_cont(f, 0.25), 6) AS f1,
    ROUND(quantile_cont(f, 0.50), 6) AS f2,
    ROUND(quantile_cont(f, 0.75), 6) AS f3,
    ROUND(quantile_cont(m, 0.25), 6) AS m1,
    ROUND(quantile_cont(m, 0.50), 6) AS m2,
    ROUND(quantile_cont(m, 0.75), 6) AS m3
  FROM anchored
)
SELECT a.o_custkey,
       a.r AS recency_days, a.f AS frequency, a.m AS monetary,
       CAST(4 - ((a.r > t.r1)::INT + (a.r > t.r2)::INT + (a.r > t.r3)::INT)
            AS INTEGER) AS r_score,
       CAST(1 + ((a.f > t.f1)::INT + (a.f > t.f2)::INT + (a.f > t.f3)::INT)
            AS INTEGER) AS f_score,
       CAST(1 + ((a.m > t.m1)::INT + (a.m > t.m2)::INT + (a.m > t.m3)::INT)
            AS INTEGER) AS m_score
FROM anchored a CROSS JOIN th t
"""


@register("rfm_segmentation", oracle=_RFM_ORACLE, tags=("agg", "stats"))
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer Recency (days since last order,
    anchored to the corpus max date), Frequency, Monetary (exact
    decimal), each scored 1-4 by quartile — the workhorse customer-
    value segmentation. Recency scores INVERT (recent = high).

    Scale note — scored WITHOUT a global ntile: ranking windows with no
    partition key single-thread the whole customer table. Instead the
    three quartile boundaries are computed once (one aggregate),
    broadcast, and each customer is scored by threshold comparisons —
    embarrassingly parallel, same plan at any cardinality. Thresholds
    are ROUNDED to 6dp before comparison (interpolation-ulp hardening;
    with integer-valued metrics the quantile often lands exactly ON a
    data value, where raw ulp noise would flip scores).

    Determinism: quartiles interpolate identical doubles (decimal-exact
    monetary cast once); scores are integer comparisons against the
    rounded thresholds.
    """
    from ucl_data_pipeline_spark.plans.registry import dsum

    o = read_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count("*").cast("long").alias("f"),
        dsum("o_totalprice").alias("m"),
    )
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    anchored = rfm.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("maxd", "last_order").cast("long").alias("r"),
        "f",
        "m",
    )
    th = anchored.agg(
        *[
            F.round(F.percentile(F.col(c), F.lit(p)), 6).alias(f"{c}{i}")
            for c in ("r", "f", "m")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def score(c: str, invert: bool) -> F.Column:
        hits = sum(
            (F.col(c) > F.col(f"{c}{i}")).cast("int") for i in (1, 2, 3)
        )
        return (4 - hits if invert else 1 + hits).cast("int")

    return anchored.crossJoin(F.broadcast(th)).select(
        "o_custkey",
        F.col("r").alias("recency_days"),
        F.col("f").alias("frequency"),
        F.col("m").alias("monetary"),
        score("r", invert=True).alias("r_score"),
        score("f", invert=False).alias("f_score"),
        score("m", invert=False).alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Shipping-latency SLO quantiles per order priority
# ---------------------------------------------------------------------------

_LATENCY_ORACLE = """
WITH lat AS (
  SELECT o.o_orderpriority AS priority,
         CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
              AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(quantile_cont(days, 0.50), 6) AS p50,
       ROUND(quantile_cont(days, 0.90), 6) AS p90,
       ROUND(quantile_cont(days, 0.99), 6) AS p99,
       CAST(MAX(days) AS BIGINT) AS p100
FROM lat GROUP BY priority
"""


@register("ship_latency_quantiles", oracle=_LATENCY_ORACLE, tags=("agg", "stats"))
def ship_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-latency SLO quantiles: p50/p90/p99/max of
    order-to-ship days per order priority — the tail-latency report
    shape (does HIGH priority actually ship faster at the p99?).

    Determinism: latencies are exact integer day differences; quantile
    interpolation runs on identical inputs, outputs ROUND 6.

    Scale: the orders join is fact-to-fact on the order key (one
    co-partitioned shuffle — at 100 TB, bucketing both tables on
    orderkey makes it exchange-free); exact per-group quantiles buffer
    each group — the bounded-cardinality priority domain makes that
    safe here, and the approx_percentile sketch is the drop-in for
    unbounded groups.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    return lat.groupBy("priority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.percentile(F.col("days"), F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile(F.col("days"), F.lit(0.90)), 6).alias("p90"),
        F.round(F.percentile(F.col("days"), F.lit(0.99)), 6).alias("p99"),
        F.max("days").cast("long").alias("p100"),
    )


# ---------------------------------------------------------------------------
# Embedding-centroid drift between two corpus halves
# ---------------------------------------------------------------------------

_CENTROID_SHIFT_ORACLE = """
WITH comp AS (
  SELECT e.label,
         CAST(i AS INTEGER) AS pos,
         e.vec_id % 2 AS half,
         CAST(CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS v
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS t(i)
),
cent AS (
  SELECT label, pos, half,
         CAST(SUM(v) AS DOUBLE) / COUNT(*) AS c
  FROM comp GROUP BY label, pos, half
),
delta AS (
  SELECT a.label, a.pos,
         CAST(CAST((a.c - b.c) * (a.c - b.c) AS DECIMAL(18,12))
              AS DECIMAL(18,12)) AS d2
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.pos = b.pos AND a.half = 0 AND b.half = 1
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_dims,
       ROUND(SQRT(CAST(SUM(d2) AS DOUBLE)), 6) AS l2_shift
FROM delta
GROUP BY label
"""


@register("embedding_centroid_shift", oracle=_CENTROID_SHIFT_ORACLE, tags=("vector", "llm", "stats"))
def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split the corpus into two halves (even
    / odd vec_id — in production, two time windows), compute per-label
    centroids for each half, and report the L2 distance between them —
    the representation-drift number that tells a training pipeline its
    embedding space moved before downstream ANN recall quietly decays.
    (The even/odd split makes the expected shift ≈ sampling noise — a
    useful baseline to alarm against.)

    Determinism: float components are cast to DECIMAL(18,9) before
    summing (label_centroids' convention), so half-centroids are
    identical doubles; squared deltas re-enter DECIMAL(18,12) so the
    64-dim sum is order-free; only √ is rounded.

    Scale: one scan-side posexplode, one (label, pos, half)-keyed
    hash-agg (map-side combinable, bounded by labels × dims × 2), then
    arithmetic on the bounded centroid table. No windows, no driver
    collects.
    """
    e = read_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos0", "ev"),
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        "half",
        F.col("ev").cast("double").cast("decimal(18,9)").alias("v"),
    )
    cent = comp.groupBy("label", "pos", "half").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("c")
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", "pos", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "pos", F.col("c").alias("cb")
    )
    delta = a.join(b, ["label", "pos"]).select(
        "label",
        ((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
        .cast("decimal(18,12)")
        .alias("d2"),
    )
    return delta.groupBy("label").agg(
        F.count("*").cast("long").alias("n_dims"),
        F.round(F.sqrt(F.sum("d2").cast("double")), 6).alias("l2_shift"),
    )
