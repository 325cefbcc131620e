"""Round-8 batch 18: sequence mining, overdispersion monitoring, and
the negative-sampling table —

- ``sequential_pattern_support``: the counting core of sequential-
  pattern mining (GSP/PrefixSpan's support step) — for every adjacent
  event-type pair in users' time-ordered streams, the number of users
  exhibiting the pattern, its support fraction, and lift against the
  independence baseline supp(a)·supp(b)/n. Top-20 by support. The
  "what do users actually do next" inventory behind funnel design;
  ``event_transition_matrix`` counts TRANSITIONS (occurrence grain),
  this counts USERS (the mining-support grain — a pattern one
  bot-user fires 10 000 times still supports 1).
- ``event_dispersion_index``: the variance-to-mean ratio (Fano
  factor / index of dispersion) of hourly event counts per type —
  D ≈ 1 is Poisson, D ≫ 1 means bursty/overdispersed arrivals, the
  stationarity diagnostic that decides whether rate alerts can
  assume Poisson noise. Sufficient-stats exact over the observed-hour
  grain.
- ``unigram_neg_sampling_table``: the word2vec negative-sampling
  table — vocabulary slots allocated ∝ count^{3/4} into a 2¹⁶-slot
  integer space by largest remainder, emitted as [lo, hi) ranges per
  token. Slots sum to exactly 65 536 (integer allocation, no float
  drift), so a uniform integer draw maps to a token by range lookup
  — the deterministic artifact an embedding-training pipeline ships
  to workers.

Registry conventions (plans/registry.py): supports/counts exact
BIGINT; the ¾-power weights ROUND 6 → DECIMAL for the order-free
total; the slot allocation is the Hamilton rule (floors + ranked
remainders, total order); windows only over bounded grains (vocab,
hour series, top-20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Sequential pattern support (user-grain, adjacent pairs)
# ---------------------------------------------------------------------------

_SEQ_TOPN = 20

_SEQ_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), pat AS (
  SELECT event_type AS a, nxt AS b,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_pattern
  FROM ordered WHERE nxt IS NOT NULL
  GROUP BY event_type, nxt
), singles AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS su
  FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events
), scored AS (
  SELECT p.a, p.b, p.n_users_pattern,
         ROUND(CAST(p.n_users_pattern AS DOUBLE) / t.n, 6) AS support_frac,
         ROUND(CAST(p.n_users_pattern AS DOUBLE) * t.n
               / (CAST(sa.su AS DOUBLE) * sb.su), 6) AS lift
  FROM pat p
  JOIN singles sa ON sa.event_type = p.a
  JOIN singles sb ON sb.event_type = p.b
  CROSS JOIN tot t
)
SELECT a, b, n_users_pattern, support_frac, lift
FROM scored
ORDER BY n_users_pattern DESC, a, b
LIMIT {_SEQ_TOPN}
"""


@register(
    "sequential_pattern_support",
    oracle=_SEQ_ORACLE,
    tags=("events", "temporal", "stats"),
)
def sequential_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair sequential-pattern support over user event
    streams: for each (a THEN b) pattern, the number of DISTINCT
    users exhibiting it (mining support — occurrence counts reward
    one hyperactive user; user counts don't), the support fraction,
    and lift vs the independence baseline supp(a)·supp(b)/n. Top-{k}
    patterns by support with a total tie-break. This is the support-
    counting kernel every sequential-pattern miner (GSP, PrefixSpan)
    iterates; longer patterns extend the same user-grain join shape.

    Determinism: adjacency comes from a LEAD over (ts, event_id) — a
    total order; all supports are exact distinct counts; the two
    ratios are single divisions ROUND 6.

    Scale: one user-partitioned window (the standard sessionization
    shuffle), one (a, b) hash-agg with distinct-user rollup, a
    #types-sized broadcast of single supports, TakeOrdered top-{k}.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pat = ordered.groupBy(
        F.col("event_type").alias("a"), F.col("nxt").alias("b")
    ).agg(F.countDistinct("user_id").cast("long").alias("n_users_pattern"))
    singles = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("su")
    )
    tot = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    sa = singles.select(F.col("event_type").alias("a"), F.col("su").alias("sa"))
    sb = singles.select(F.col("event_type").alias("b"), F.col("su").alias("sb"))
    return (
        pat.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_users_pattern",
            F.round(
                F.col("n_users_pattern").cast("double") / F.col("n"), 6
            ).alias("support_frac"),
            F.round(
                F.col("n_users_pattern").cast("double")
                * F.col("n")
                / (F.col("sa").cast("double") * F.col("sb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_users_pattern"), "a", "b")
        .limit(_SEQ_TOPN)
    )


# ---------------------------------------------------------------------------
# Index of dispersion (Fano factor) of hourly event counts
# ---------------------------------------------------------------------------

_DISP_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), st AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM hourly GROUP BY event_type
)
SELECT event_type, n_hours,
       ROUND(CAST(s AS DOUBLE) / n_hours, 6) AS mean_per_hour,
       ROUND((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_hours)
             / (n_hours - 1), 6) AS var_per_hour,
       ROUND(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_hours)
              / (n_hours - 1)) / (CAST(s AS DOUBLE) / n_hours), 6)
         AS dispersion,
       CAST(CASE WHEN ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_hours)
                       / (n_hours - 1)) / (CAST(s AS DOUBLE) / n_hours) > 1.5
                 THEN 1 ELSE 0 END AS INTEGER) AS overdispersed
FROM st
"""


@register(
    "event_dispersion_index",
    oracle=_DISP_ORACLE,
    tags=("events", "temporal", "stats"),
)
def event_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor) of hourly event counts per
    type: sample variance / mean over the OBSERVED-hour series. D ≈ 1
    is Poisson arrival noise; D ≫ 1 (flagged at 1.5) is bursty
    overdispersion, which breaks every alert threshold derived under
    Poisson assumptions — the diagnostic to run BEFORE trusting
    rate-based monitors (CUSUM/Page-Hinkley tune differently on
    overdispersed streams). Observed-hour grain: silent hours are
    absent (the fixture's streams are dense); a calendar spine would
    only lower D.

    Determinism: hourly counts and both sufficient statistics are
    exact BIGINTs; mean/variance/D are pinned IEEE expressions over
    them, ROUND 6; the flag compares the exact double against a
    literal.

    Scale: one (type, hour) hash-agg over the fact stream — map-side
    combinable — then a #types-grain conditional aggregation. The
    classic two-level rollup; nothing touches event grain twice.
    """
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("long").alias("c"))
    st = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    n, s, ss = F.col("n_hours"), F.col("s"), F.col("ss")
    var = (ss.cast("double") - s.cast("double") * s / n) / (n - 1)
    mean = s.cast("double") / n
    return st.select(
        "event_type",
        "n_hours",
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var, 6).alias("var_per_hour"),
        F.round(var / mean, 6).alias("dispersion"),
        F.when(var / mean > 1.5, 1).otherwise(0).cast("int").alias(
            "overdispersed"
        ),
    )


# ---------------------------------------------------------------------------
# word2vec negative-sampling table (count^{3/4}, Hamilton slots)
# ---------------------------------------------------------------------------

_NEG_SLOTS = 65536  # 2^16

_NEG_ORACLE = rf"""
WITH tc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
  GROUP BY tok
), wgt AS (
  SELECT tok, c,
         CAST(ROUND(POWER(CAST(c AS DOUBLE), 0.75), 6) AS DECIMAL(28,6)) AS w
  FROM tc
), tot AS (
  SELECT CAST(SUM(w) AS DOUBLE) AS wt FROM wgt
), shares AS (
  SELECT w.tok, w.c, CAST(w.w AS DOUBLE) AS wd,
         FLOOR({_NEG_SLOTS} * CAST(w.w AS DOUBLE) / t.wt) AS fl,
         {_NEG_SLOTS} * CAST(w.w AS DOUBLE) / t.wt
           - FLOOR({_NEG_SLOTS} * CAST(w.w AS DOUBLE) / t.wt) AS rem
  FROM wgt w CROSS JOIN tot t
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, tok) AS rk,
         SUM(fl) OVER () AS fl_tot
  FROM shares
), alloc AS (
  SELECT tok, c, ROUND(wd, 6) AS weight,
         CAST(fl + CASE WHEN rk <= {_NEG_SLOTS} - fl_tot THEN 1 ELSE 0 END
              AS BIGINT) AS n_slots
  FROM ranked
)
SELECT tok AS token, c AS n_occurrences, weight, n_slots,
       CAST(COALESCE(SUM(n_slots) OVER (ORDER BY tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS slot_lo,
       CAST(SUM(n_slots) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS slot_hi
FROM alloc
"""


@register(
    "unigram_neg_sampling_table",
    oracle=_NEG_ORACLE,
    tags=("llm", "text", "sample"),
)
def unigram_neg_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec negative-sampling table: {s} integer slots
    allocated across the vocabulary ∝ count^{{3/4}} (the Mikolov
    smoothing that up-weights rare words), integerized by the
    largest-remainder rule and emitted as [slot_lo, slot_hi) ranges
    in token order. Because slots are an EXACT integer partition of
    {s}, any worker mapping uniform draws u ∈ [0, {s}) through the
    ranges samples the identical distribution — no float
    renormalization, no per-worker drift; this is the shipped
    artifact, not a description of one.

    Determinism: the ¾-power weights are ROUND-6 doubles re-entered
    as DECIMAL(28,6) for the order-free total; shares/floors/
    remainders are pinned IEEE expressions; the remainder ranking
    and the cumulative range windows use total orders (tok).

    Scale: one corpus hash-agg to vocabulary grain; everything after
    (weights, Hamilton allocation, range prefix sums) runs on the
    vocabulary — the keyless windows ride the bounded derived grain
    exactly like largest_remainder_apportion.
    """
    tc = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wgt = tc.select(
        "tok",
        "c",
        F.round(F.pow(F.col("c").cast("double"), F.lit(0.75)), 6)
        .cast("decimal(28,6)")
        .alias("w"),
    )
    tot = wgt.agg(F.sum("w").cast("double").alias("wt"))
    share = F.lit(_NEG_SLOTS) * F.col("w").cast("double") / F.col("wt")
    shares = wgt.crossJoin(F.broadcast(tot)).select(
        "tok",
        "c",
        F.col("w").cast("double").alias("wd"),
        F.floor(share).alias("fl"),
        (share - F.floor(share)).alias("rem"),
    )
    w_all = Window.partitionBy(F.lit(1))
    ranked = shares.select(
        "tok",
        "c",
        "wd",
        "fl",
        F.row_number()
        .over(w_all.orderBy(F.col("rem").desc(), "tok"))
        .alias("rk"),
        F.sum("fl").over(w_all).alias("fl_tot"),
    )
    n_slots = (
        F.col("fl")
        + F.when(F.col("rk") <= F.lit(_NEG_SLOTS) - F.col("fl_tot"), 1)
        .otherwise(0)
    ).cast("long")
    alloc = ranked.select(
        "tok",
        "c",
        F.round("wd", 6).alias("weight"),
        n_slots.alias("n_slots"),
    )
    w_cum = Window.orderBy("tok")
    return alloc.select(
        F.col("tok").alias("token"),
        F.col("c").alias("n_occurrences"),
        "weight",
        "n_slots",
        F.coalesce(
            F.sum("n_slots").over(w_cum.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("slot_lo"),
        F.sum("n_slots")
        .over(w_cum.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("slot_hi"),
    )
