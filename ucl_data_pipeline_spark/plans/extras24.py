"""Round-7 batch 4: two more tuning frontiers — the dedup
aggressiveness knob and the watermark-sizing knob, each priced as ONE
expensive pass with the knob settings as filters over it (the
``ann_recall_frontier`` pattern from extras17/21):

- ``dedup_threshold_frontier``: near-duplicate pairs / dropped docs vs
  cosine threshold 0.80/0.90/0.95 over ONE LSH-bucketed candidate
  pass — the single most consequential knob in corpus curation (too
  low deletes paraphrases, too high ships boilerplate).
- ``watermark_lateness_frontier``: events dropped vs watermark horizon
  60 s/1 h/1 d from ONE arrival-order lateness scan — the completeness
  vs state-size tradeoff every Structured Streaming job sets blind;
  this makes it a measured curve (extras12.out_of_order_stats is the
  per-type audit; this is the sizing curve).

Registry conventions (plans/registry.py) apply: the knob axis is a
bounded literal array, candidate generation is shared across settings,
exact integer counts, one final division ROUND 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.functions.scalar import epoch_us
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_COS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Near-dup rate vs cosine threshold
# ---------------------------------------------------------------------------

_DEDUP_THRESHOLDS = (0.80, 0.90, 0.95)

# Deterministic near-dup injection: class α mixes each vector with a
# circular shift of itself — cos(x, x+α·shift(x)) ≈ 1/√(1+α²) for
# near-orthogonal shifts, so α = 0.2/0.45/0.8 lands ≈0.98/0.91/0.78 —
# one class per threshold band, making every knob setting bite
# differently (the dedup_embedding_cosine universe precedent).
_MIX = (
    "list_transform(range(1, len({e}) + 1), "
    "i -> {e}[i] + {a} * {e}[(i % len({e})) + 1])"
)

# Corpus-sized LSH (helpers shared in functions/vector.py — see the
# SCALE_NOTES "corpus-sized LSH fix" entry): bucket width grows with
# the corpus so the candidate join never saturates; at driver-fixture
# sizes the ladder resolves to 8 bits, bit-identical to sign_bucket.

_DEDUP_FRONTIER_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
e AS (
  SELECT vec_id, embedding FROM base
  UNION ALL
  SELECT vec_id + 1000000, {_MIX.format(e='embedding', a='0.2')}
  FROM base WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 2000000, {_MIX.format(e='embedding', a='0.45')}
  FROM base WHERE vec_id % 10 = 3
  UNION ALL
  SELECT vec_id + 3000000, {_MIX.format(e='embedding', a='0.8')}
  FROM base WHERE vec_id % 10 = 6
),
nb AS (
  SELECT {VX.sql_nbits_for_count('COUNT(*)')} AS nbits FROM e
),
b AS (
  SELECT vec_id, embedding,
         {VX.sql_adaptive_sign_bucket('embedding')} AS bucket
  FROM e, nb
),
cand AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, {_SQL_COS} AS cos_sim
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM e),
lat AS (
  SELECT t.threshold, c.qid, c.cid, c.cos_sim
  FROM cand c
  CROSS JOIN (SELECT unnest([0.80, 0.90, 0.95]::DOUBLE[]) AS threshold) t
)
SELECT threshold,
  CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
  CAST(SUM(CASE WHEN cos_sim > threshold THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_pairs,
  CAST(COUNT(DISTINCT CASE WHEN cos_sim > threshold THEN cid END) AS BIGINT)
    AS n_dropped,
  ROUND(CAST(COUNT(DISTINCT CASE WHEN cos_sim > threshold THEN cid END)
             AS DOUBLE) / (SELECT n_docs FROM n), 6) AS drop_rate
FROM lat
GROUP BY threshold
"""


@register(
    "dedup_threshold_frontier",
    oracle=_DEDUP_FRONTIER_ORACLE,
    tags=("dedup", "vector", "llm", "frontier"),
)
def dedup_threshold_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate dedup aggressiveness curve: candidate pairs come
    from ONE sign-bit-LSH bucket join with CORPUS-SIZED bucket width
    (smallest b ∈ [8, 20] with 2^b ≥ n/16, by exact integer ladder —
    see the module comment; a FIXED 8-bit bucket space saturates
    quadratically at ×100 corpus, measured 191 s → 18 s with this
    fix, ratio 174 → 12.7) and cosine computed ONCE per pair;
    each threshold ∈ {0.80, 0.90, 0.95} is then a FILTER over that
    shared pair set. The universe injects three deterministic near-dup
    classes (self-mix α = 0.2/0.45/0.8 → cos ≈ 0.98/0.91/0.78, one per
    threshold band — the ``dedup_embedding_cosine`` universe
    precedent), so every knob setting catches a different slice and
    the curve actually curves on the fixture. Emits dup-pair counts, docs dropped under the
    keep-lowest-id rule (a doc drops when ANY lower-id candidate
    exceeds the threshold), and the drop rate — the curve a curation
    team reads before picking the knob that decides what fraction of
    the corpus dies.

    Determinism: cosine doubles are bit-identical across engines
    (float32→double element arithmetic in index order); thresholds are
    exact literals; all counts integer; one final ratio ROUND 6.

    Scale: the candidate pass is the whole cost and it is shared by
    all settings — re-running dedup per threshold at 100 TB is exactly
    what this query exists to avoid. The threshold fan-out (×3) rides
    the candidate set, never the corpus.
    """
    base = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double("embedding").alias("embedding")
    )

    def mix(alpha: float):
        emb = F.col("embedding")
        return F.transform(
            F.sequence(F.lit(1), F.size(emb)),
            lambda i: F.element_at(emb, i)
            + alpha * F.element_at(emb, (i % F.size(emb)) + 1),
        )

    def dup_class(mod: int, offset: int, alpha: float) -> DataFrame:
        return base.filter(F.col("vec_id") % 10 == mod).select(
            (F.col("vec_id") + offset).alias("vec_id"),
            mix(alpha).alias("embedding"),
        )

    e = (
        base.unionAll(dup_class(0, 1_000_000, 0.2))
        .unionAll(dup_class(3, 2_000_000, 0.45))
        .unionAll(dup_class(6, 3_000_000, 0.8))
    )
    nb = e.agg(VX.nbits_for_count(F.count("*")).alias("nbits"))
    b = e.crossJoin(F.broadcast(nb)).select(
        "vec_id",
        "embedding",
        VX.adaptive_sign_bucket("embedding", F.col("nbits")).alias("bucket"),
    )
    q = b.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    cand = q.join(
        c, (F.col("bucket") == F.col("c_bucket")) & (F.col("qid") < F.col("cid"))
    ).select("qid", "cid", VX.cosine("q_emb", "c_emb").alias("cos_sim"))
    n = e.agg(F.count("*").cast("long").alias("n_docs"))
    lat = cand.select(
        "qid",
        "cid",
        "cos_sim",
        F.explode(
            F.array(*[F.lit(t) for t in _DEDUP_THRESHOLDS])
        ).alias("threshold"),
    )
    hit = F.col("cos_sim") > F.col("threshold")
    g = lat.groupBy("threshold").agg(
        F.count("*").cast("long").alias("n_candidate_pairs"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_dup_pairs"),
        F.count_distinct(F.when(hit, F.col("cid"))).cast("long").alias(
            "n_dropped"
        ),
    )
    return g.crossJoin(F.broadcast(n)).select(
        "threshold",
        "n_candidate_pairs",
        "n_dup_pairs",
        "n_dropped",
        F.round(
            F.col("n_dropped").cast("double") / F.col("n_docs"), 6
        ).alias("drop_rate"),
    )


# ---------------------------------------------------------------------------
# Dropped-event fraction vs watermark horizon
# ---------------------------------------------------------------------------

_WM_HORIZONS = (60, 3600, 86400)

# The fixture's events arrive perfectly in event_id order (zero
# natural lateness — verified, and why out_of_order_stats reads 0), so
# the arrival model injects DETERMINISTIC transport delay: every 7th
# event arrives ((event_id % 4) + 1) × 30 min late. Arrival order =
# (event-time + delay); lateness is then event-time vs the per-user
# event-time high-water in ARRIVAL order — the exact quantity a
# watermark compares against.
_WM_DELAY = (
    "CASE WHEN event_id % 7 = 3 THEN ((event_id % 4) + 1) * 1800 "
    "ELSE 0 END"
)

_WM_FRONTIER_ORACLE = f"""
WITH arrival AS (
  SELECT user_id, event_id, ts,
         ts + to_seconds({_WM_DELAY}) AS arrival_ts
  FROM events
),
arr AS (
  SELECT ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY arrival_ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM arrival
),
lateness AS (
  SELECT CASE WHEN ts < high_water
              THEN (epoch_us(high_water) - epoch_us(ts)) // 1000000
         END AS late_secs
  FROM arr
)
SELECT horizon_seconds,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN late_secs > horizon_seconds THEN 1 ELSE 0 END)
       AS BIGINT) AS n_dropped,
  ROUND(CAST(SUM(CASE WHEN late_secs > horizon_seconds THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS drop_rate
FROM lateness
CROSS JOIN (VALUES (60), (3600), (86400)) AS h(horizon_seconds)
GROUP BY horizon_seconds
"""


@register(
    "watermark_lateness_frontier",
    oracle=_WM_FRONTIER_ORACLE,
    tags=("events", "streaming", "frontier"),
)
def watermark_lateness_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing curve: for horizon ∈ {60 s, 1 h, 1 d}, the
    fraction of events a Structured Streaming job with that watermark
    would DROP (their event-time lateness vs the per-user high-water
    mark in ARRIVAL order exceeds the horizon) — the completeness side
    of the completeness-vs-state-size tradeoff, measured instead of
    guessed. The fixture's events arrive perfectly ordered (zero
    natural lateness — why ``out_of_order_stats`` reads 0), so the
    arrival model injects deterministic transport delay (every 7th
    event arrives 30/60/90/120 min late by event_id class — the
    injection discipline ``dedup_threshold_frontier`` uses); the
    streaming ops in streaming/windows.py consume the chosen horizon.

    Determinism: all integer microsecond arithmetic; one final ratio
    ROUND 6.

    Scale: ONE per-user ordered window over the fact table (user keys
    scale out; arrival order is the within-partition sort), then the
    3-horizon fan-out rides the scan output. The lateness scan is
    shared — the alternative, one streaming backfill per candidate
    horizon, is the 100 TB mistake this query replaces.
    """
    e = read_table(spark, sf_dir, "events")
    delay_secs = F.when(
        F.col("event_id") % 7 == 3, ((F.col("event_id") % 4) + 1) * 1800
    ).otherwise(F.lit(0))
    arrival = e.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("ts") + F.make_dt_interval(secs=delay_secs)).alias("arrival_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = arrival.select("ts", F.max("ts").over(w).alias("high_water"))
    lateness = arr.select(
        F.when(
            F.col("ts") < F.col("high_water"),
            ((epoch_us("high_water") - epoch_us("ts")) / F.lit(1_000_000))
            .cast("bigint"),
        ).alias("late_secs")
    )
    lat = lateness.select(
        "late_secs",
        F.explode(
            F.array(*[F.lit(h) for h in _WM_HORIZONS])
        ).alias("horizon_seconds"),
    )
    dropped = F.when(F.col("late_secs") > F.col("horizon_seconds"), 1).otherwise(0)
    return lat.groupBy("horizon_seconds").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(dropped).cast("long").alias("n_dropped"),
        F.round(
            F.sum(dropped).cast("double") / F.count("*"), 6
        ).alias("drop_rate"),
    )
