"""Round-5 inventory depth, second batch: sketch-quality gates and
preprocessing transforms — the MinHash estimator-error gate (the
dedup-side sibling of the ANN recall gates), a corpus bigram language
model scoring documents, rank-based quantile normalization, and
interval-union coverage.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental or division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import (
    _rep_features,
    _SQL_SHINGLES,
    _SQL_TOKS,
    _sql_minhash,
)
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table, stats_barrier

# ---------------------------------------------------------------------------
# MinHash estimator-error gate (dedup-side analogue of ann_recall_at_3)
# ---------------------------------------------------------------------------

_MH_ERR_ORACLE = rf"""
WITH rep AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
), tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM rep
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), sig AS (
  SELECT doc_id, feats,
    {_sql_minhash(0)} AS mh_0, {_sql_minhash(1)} AS mh_1,
    {_sql_minhash(2)} AS mh_2, {_sql_minhash(3)} AS mh_3,
    {_sql_minhash(4)} AS mh_4, {_sql_minhash(5)} AS mh_5
  FROM feat
), banded AS (
  SELECT *,
    md5(mh_0 || mh_1) AS band_0,
    md5(mh_2 || mh_3) AS band_1,
    md5(mh_4 || mh_5) AS band_2
  FROM sig
), bucket AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_key FROM banded WHERE band_0 IS NOT NULL
  UNION ALL
  SELECT doc_id, 1, band_1 FROM banded WHERE band_1 IS NOT NULL
  UNION ALL
  SELECT doc_id, 2, band_2 FROM banded WHERE band_2 IS NOT NULL
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bucket a
  JOIN bucket b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT
  c.doc_a, c.doc_b,
  ROUND((
      CASE WHEN sa.mh_0 = sb.mh_0 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_1 = sb.mh_1 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_2 = sb.mh_2 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_3 = sb.mh_3 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_4 = sb.mh_4 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_5 = sb.mh_5 THEN 1 ELSE 0 END) / 6.0, 6)
    AS est_jaccard,
  ROUND(CAST(len(list_filter(sa.feats, x -> list_contains(sb.feats, x))) AS DOUBLE)
    / CAST(len(sa.feats) + len(sb.feats)
           - len(list_filter(sa.feats, x -> list_contains(sb.feats, x))) AS DOUBLE), 6)
    AS exact_jaccard,
  ROUND(ABS(
    (CASE WHEN sa.mh_0 = sb.mh_0 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_1 = sb.mh_1 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_2 = sb.mh_2 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_3 = sb.mh_3 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_4 = sb.mh_4 THEN 1 ELSE 0 END
    + CASE WHEN sa.mh_5 = sb.mh_5 THEN 1 ELSE 0 END) / 6.0
    - CAST(len(list_filter(sa.feats, x -> list_contains(sb.feats, x))) AS DOUBLE)
      / CAST(len(sa.feats) + len(sb.feats)
             - len(list_filter(sa.feats, x -> list_contains(sb.feats, x))) AS DOUBLE)
  ), 6) AS abs_err
FROM cand c
JOIN banded sa ON c.doc_a = sa.doc_id
JOIN banded sb ON c.doc_b = sb.doc_id
"""


@register("minhash_jaccard_error", oracle=_MH_ERR_ORACLE, tags=("dedup", "llm", "gate"))
def minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality gate: for every LSH candidate pair,
    the signature-based Jaccard estimate (fraction of the 6 minhashes
    that agree) next to the exact shingle-set Jaccard and their
    absolute error — the dedup-pipeline sibling of the ANN recall
    gates (extras3.py): it makes the QUALITY of the sketch driver-
    visible, not just the speed of the dedup that uses it. A corpus
    whose mean abs_err drifts up (shorter docs, shingle distribution
    shift) needs more hashes per signature; this query is the
    monitoring hook that says so.

    Scale: candidate pairs come from the banded-LSH bucket join (same
    plan as dedup_minhash_lsh — shuffle keyed (band_idx, band_key),
    never all-pairs); the per-pair exact Jaccard touches only candidate
    docs' feature arrays. Signatures and bands are computed once per
    representative document in one scan-side pass.
    """
    feats = _rep_features(spark, sf_dir).persist()
    mh = [TX.minhash(F.col("feats"), s) for s in range(6)]
    sig = feats.select(
        "doc_id",
        "feats",
        *[mh[s].alias(f"mh_{s}") for s in range(6)],
    ).select(
        "*",
        F.md5(F.concat("mh_0", "mh_1")).alias("band_0"),
        F.md5(F.concat("mh_2", "mh_3")).alias("band_1"),
        F.md5(F.concat("mh_4", "mh_5")).alias("band_2"),
    ).persist()
    bucket = sig.select(
        "doc_id",
        F.posexplode(F.array("band_0", "band_1", "band_2")).alias(
            "band_idx", "band_key"
        ),
    ).filter(F.col("band_key").isNotNull())
    # stats-barriered (r13, replacing the r12 merge hint): both sides
    # of the band self-join are corpus-sized with a Generate-blind
    # static estimate (the ×100-smoke broadcast class — see
    # llm_ops.lsh_candidate_pairs); static stays SMJ, AQE's runtime
    # size-measured BHJ conversion is free again.
    bucket = stats_barrier(bucket)
    a = bucket.alias("a")
    b = bucket.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ssrc = stats_barrier(sig)
    sa = ssrc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("feats").alias("fa"),
        *[F.col(f"mh_{s}").alias(f"a_mh_{s}") for s in range(6)],
    )
    sb = ssrc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("feats").alias("fb"),
        *[F.col(f"mh_{s}").alias(f"b_mh_{s}") for s in range(6)],
    )
    matches = None
    for s in range(6):
        m = F.when(F.col(f"a_mh_{s}") == F.col(f"b_mh_{s}"), 1).otherwise(0)
        matches = m if matches is None else matches + m
    est = matches / F.lit(6.0)
    inter = F.size(F.array_intersect("fa", "fb"))
    exact = inter.cast("double") / (
        F.size("fa") + F.size("fb") - inter
    ).cast("double")
    return (
        # stats-barriered above: sa/sb carry corpus-sized feature
        # arrays the static planner would broadcast on a Generate-
        # blind estimate (the r12 ×100-smoke class).
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus bigram LM scoring (add-one smoothing, avg bigram probability)
# ---------------------------------------------------------------------------

_BIGRAM_LM_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), bg AS (
  SELECT doc_id,
         toks[i] AS w1, toks[i + 1] AS w2
  FROM tok, UNNEST(range(1, len(toks))) AS t(i)
  WHERE len(toks) >= 2
), c2 AS (
  SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY w1
), v AS (
  SELECT COUNT(DISTINCT w1) AS vocab FROM (
    SELECT w1 FROM bg UNION ALL SELECT w2 FROM bg
  )
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(CAST(
           CAST(c2.n2 + 1 AS DOUBLE) / CAST(c1.n1 + v.vocab AS DOUBLE)
           AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6)
         AS avg_bigram_prob
FROM bg
JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
JOIN c1 ON c1.w1 = bg.w1
CROSS JOIN v
GROUP BY bg.doc_id
"""


@register("doc_bigram_likelihood", oracle=_BIGRAM_LM_ORACLE, tags=("llm", "text"))
def doc_bigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document under a corpus bigram language model with
    add-one smoothing: p(w₂|w₁) = (c(w₁,w₂)+1)/(c(w₁)+V), reported as
    the per-document mean bigram probability — the fluency/typicality
    signal a training-data pipeline uses to rank text quality (the
    arithmetic-mean form keeps the statistic oracle-exact; perplexity
    is a monotone transform of the same joins).

    Determinism: each p is one double division of exact integers
    (bit-identical both engines); the per-doc sum accumulates in
    DECIMAL(18,12) so partition order can't perturb it; final mean
    ROUND 6.

    Scale: bigram instances are scan-side (one explode); the model
    tables c2/c1 are hash-aggs keyed by the bigram/unigram; scoring is
    two equi-joins keyed the same way — the c2 join reuses the bigram
    shuffle partitioning. V is a 1-row broadcast. Hot-token skew in the
    c1 join is the AQE skew-join case. State is O(model), not O(corpus).
    """
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", TX.tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    # One scan-side explode of zipped adjacent-token pairs — no join in
    # the bigram-construction path.
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1),
                F.expr("slice(toks, 2, size(toks) - 1)"),
            )
        ).alias("z"),
    ).select(
        "doc_id", F.col("z.0").alias("w1"), F.col("z.1").alias("w2")
    )
    bg = bg.persist()
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("n1"))
    v = (
        bg.select(F.col("w1").alias("w"))
        .unionAll(bg.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("vocab"))
    )
    p = (F.col("n2") + 1).cast("double") / (F.col("n1") + F.col("vocab")).cast(
        "double"
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(p.cast("decimal(18,12)")).cast("double") / F.count("*"),
                6,
            ).alias("avg_bigram_prob"),
        )
    )


# ---------------------------------------------------------------------------
# Rank-based quantile normalization (per-source feature transform)
# ---------------------------------------------------------------------------

_QNORM_ORACLE = """
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
          - 0.5)
         / COUNT(*) OVER (PARTITION BY source), 6) AS quantile_norm
FROM documents
"""


@register("quantile_normalize_feature", oracle=_QNORM_ORACLE, tags=("window", "stats"))
def quantile_normalize_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of a numeric feature within
    each group: value → (rank − ½)/n over its source's empirical
    distribution — the distribution-free rescaling used before
    cross-source comparisons or as a model-input transform (maps any
    distribution onto uniform(0,1); a Φ⁻¹ on top would give normal
    scores). Tie-break (n_chars, doc_id) makes ranks total.

    Scale: one shuffle on the group key, one per-group sort serving
    both window functions (Catalyst computes ROW_NUMBER and the
    partition COUNT in a single window stage over the same ordering).
    No joins, no collects; output is row-for-row with the input.
    """
    d = read_table(spark, sf_dir, "documents")
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    return d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(
            (F.row_number().over(wr) - 0.5) / F.count("*").over(wn), 6
        ).alias("quantile_norm"),
    )


# ---------------------------------------------------------------------------
# Interval-union coverage (merge overlapping activity windows)
# ---------------------------------------------------------------------------

_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT user_id,
         CAST(ts AS TIMESTAMP) - INTERVAL 5 MINUTE AS s,
         CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island,
         MIN(s) AS lo, MAX(e) AS hi
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(epoch_us(hi) - epoch_us(lo)) AS DOUBLE) / 1000000.0
         AS covered_seconds
FROM merged
GROUP BY user_id
"""


@register("interval_union_coverage", oracle=_COVERAGE_ORACLE, tags=("temporal", "window"))
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: expand each event to a ±5-minute
    activity window, merge overlapping windows per user (gaps-and-
    islands: a window starts a new island iff its start exceeds the
    running max end of everything before it), and report per-user
    island count and total covered seconds. The dedup-aware "time
    actually active" metric — naive SUM(duration) double-counts
    overlaps; this is the canonical fix (same shape as merging IP-block
    ranges or sensor uptime windows).

    Determinism: timestamps are exact microseconds; EPOCH differences
    are exact doubles; island assignment uses the total order (s, e).

    Scale: one shuffle on user_id; both windows and the final aggs run
    inside that partitioning (running-max and running-sum are O(1)
    state per row). No joins — this beats the common self-join interval
    merge, which is quadratic per user.
    """
    ev = read_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    # Durations summed as exact integer microseconds (order-free),
    # converted to seconds once at the end — a double-seconds sum would
    # be partition-order-sensitive and break cross-engine equality.
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        (
            F.sum(F.expr("timestampdiff(MICROSECOND, lo, hi)")).cast("double")
            / F.lit(1000000.0)
        ).alias("covered_seconds"),
    )
