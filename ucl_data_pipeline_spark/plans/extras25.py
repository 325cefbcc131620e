"""Round-7 batch 5: censoring-aware A/B comparison and tokenizer
economics —

- ``logrank_survival_ab``: the log-rank test comparing time-to-first-
  high-value-event survival between two user cohorts — THE
  censoring-aware A/B read (a t-test on conversion times silently
  drops every user who hasn't converted yet, biasing toward fast
  converters). Pairs with ``kaplan_meier_survival`` (extras16), whose
  duration/censoring definitions it reuses verbatim.
- ``tokenizer_fertility``: tokens per 100 characters by language — the
  tokenizer-economics metric (fertility) that decides how much of a
  compute budget each language actually consumes; high-fertility
  languages cost more FLOPs per byte of text.

Registry conventions (plans/registry.py): exact integer counts and
at-risk sets, per-event-time double terms rounded to 12 dp and summed
exactly in decimal, final ROUND 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions.scalar import epoch_us
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import fan_out, read_table

# ---------------------------------------------------------------------------
# Log-rank test between two user cohorts
# ---------------------------------------------------------------------------

_LOGRANK_ORACLE = """
WITH users AS (
  SELECT user_id,
         user_id % 2 AS grp,
         MIN(ts) AS first_ts,
         MAX(ts) AS last_ts,
         MIN(CASE WHEN value > 200 THEN ts END) AS hit_ts
  FROM events GROUP BY user_id
),
durs AS (
  SELECT grp,
         epoch_us(COALESCE(hit_ts, last_ts)) // 3600000000
           - epoch_us(first_ts) // 3600000000 AS dur,
         CASE WHEN hit_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM users
),
tot AS (
  SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM durs
),
cells AS (
  SELECT dur,
    CAST(SUM(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS BIGINT) AS d1,
    CAST(SUM(CASE WHEN grp = 1 AND observed = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS c1,
    CAST(SUM(CASE WHEN grp = 0 THEN observed ELSE 0 END) AS BIGINT) AS d0,
    CAST(SUM(CASE WHEN grp = 0 AND observed = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS c0
  FROM durs GROUP BY dur
),
risk AS (
  SELECT dur, d1, d0,
    (SELECT na FROM tot)
      - (SUM(d1 + c1) OVER (ORDER BY dur) - (d1 + c1)) AS n1r,
    (SELECT nb FROM tot)
      - (SUM(d0 + c0) OVER (ORDER BY dur) - (d0 + c0)) AS n0r
  FROM cells
),
terms AS (
  SELECT d1,
    CAST(ROUND(CAST((d1 + d0) * n1r AS DOUBLE) / (n1r + n0r), 12)
         AS DECIMAL(38,12)) AS e1_t,
    CAST(ROUND(CASE WHEN n1r + n0r > 1 THEN
           CAST((d1 + d0) * n1r AS DOUBLE) / (n1r + n0r) * n0r
             / (n1r + n0r) * (n1r + n0r - (d1 + d0)) / (n1r + n0r - 1)
         ELSE 0.0 END, 12) AS DECIMAL(38,12)) AS v_t
  FROM risk
  WHERE d1 + d0 > 0
)
SELECT (SELECT na FROM tot) AS n_users_a,
       (SELECT nb FROM tot) AS n_users_b,
       CAST(SUM(d1) AS BIGINT) AS observed_a,
       ROUND(CAST(SUM(e1_t) AS DOUBLE), 6) AS expected_a,
       ROUND((SUM(d1) - CAST(SUM(e1_t) AS DOUBLE))
             * (SUM(d1) - CAST(SUM(e1_t) AS DOUBLE))
             / NULLIF(CAST(SUM(v_t) AS DOUBLE), 0.0), 6) AS logrank_chi2
FROM terms
"""


@register("logrank_survival_ab", oracle=_LOGRANK_ORACLE, tags=("stats", "window"))
def logrank_survival_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: do the two user cohorts (user_id parity — the
    deterministic A/B split) differ in time-to-first-high-value-event
    survival? Reuses ``kaplan_meier_survival``'s duration/censoring
    definitions verbatim (hour-bucket diffs, right-censored at last
    event). At each event time t: E₁(t) = d(t)·n₁(t)/n(t) under H₀ and
    hypergeometric variance V(t); χ² = (O₁−E₁)²/ΣV — the test that
    weights every event time by its at-risk set instead of dropping
    censored users.

    Determinism: cohort sizes, deaths and at-risk counts are exact
    BIGINTs from one duration-grain window per cohort; the per-event-
    time E/V doubles are spelled in identical left-associative order,
    rounded to 12 dp and summed exactly in decimal; final ROUND 6.

    Scale: identical profile to the KM query — one fact-grain user
    agg, then everything runs on the bounded duration grain (≤
    observation-window hours). The two cohorts ride ONE scan as
    conditional aggregates, not two passes.
    """
    e = read_table(spark, sf_dir, "events")
    hour = lambda c: F.floor(epoch_us(c) / F.lit(3_600_000_000))  # noqa: E731
    users = e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(F.when(F.col("value") > 200, F.col("ts"))).alias("hit_ts"),
    )
    durs = users.select(
        (F.col("user_id") % 2).alias("grp"),
        (hour(F.coalesce("hit_ts", "last_ts")) - hour("first_ts")).alias("dur"),
        F.when(F.col("hit_ts").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    tot = durs.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    cells = durs.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("observed")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("observed") == 0), 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("grp") == 0, F.col("observed")).otherwise(0))
        .cast("long")
        .alias("d0"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("observed") == 0), 1).otherwise(0))
        .cast("long")
        .alias("c0"),
    )
    w = Window.orderBy("dur")
    risk = cells.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d1",
        "d0",
        "na",
        "nb",
        (
            F.col("na")
            - (F.sum(F.col("d1") + F.col("c1")).over(w) - (F.col("d1") + F.col("c1")))
        ).alias("n1r"),
        (
            F.col("nb")
            - (F.sum(F.col("d0") + F.col("c0")).over(w) - (F.col("d0") + F.col("c0")))
        ).alias("n0r"),
    )
    d = F.col("d1") + F.col("d0")
    nr = F.col("n1r") + F.col("n0r")
    e1 = (d * F.col("n1r")).cast("double") / nr
    v = (
        (d * F.col("n1r")).cast("double")
        / nr
        * F.col("n0r")
        / nr
        * (nr - d)
        / (nr - 1)
    )
    terms = risk.filter(d > 0).select(
        "na",
        "nb",
        "d1",
        F.round(e1, 12).cast("decimal(38,12)").alias("e1_t"),
        F.round(F.when(nr > 1, v).otherwise(F.lit(0.0)), 12)
        .cast("decimal(38,12)")
        .alias("v_t"),
    )
    o1 = F.sum("d1").cast("long")
    se = F.sum("e1_t").cast("double")
    sv = F.sum("v_t").cast("double")
    return terms.groupBy("na", "nb").agg(
        o1.alias("observed_a"),
        F.round(se, 6).alias("expected_a"),
        F.round(
            (o1 - se) * (o1 - se) / F.nullif(sv, F.lit(0.0)), 6
        ).alias("logrank_chi2"),
    ).select(
        F.col("na").alias("n_users_a"),
        F.col("nb").alias("n_users_b"),
        "observed_a",
        "expected_a",
        "logrank_chi2",
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = rf"""
WITH t AS (
  SELECT lang, n_chars,
         CAST(len({_SQL_TOKS}) AS BIGINT) AS n_toks
  FROM documents
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  ROUND(CAST(SUM(n_toks) * 100 AS DOUBLE) / SUM(n_chars), 6)
    AS tokens_per_100_chars
FROM t GROUP BY lang
"""


@register("tokenizer_fertility", oracle=_FERTILITY_ORACLE, tags=("llm", "text", "agg"))
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: tokens produced per 100
    characters of input — the economics number behind multilingual
    budget decisions (a language whose tokenizer emits 2× the tokens
    per byte consumes 2× the training FLOPs and 2× the context window
    for the same content). Whitespace tokens here; swapping in the BPE
    proxy (``bpe_token_count``'s spelling) changes one expression.

    Determinism: token and char counts are exact BIGINTs; one final
    ratio ROUND 6.

    Scale: one scan-side map (the let-bound tokenizer — no per-element
    re-split) + one hash-agg on the language grain with map-side
    combine. Nothing else.
    """
    d = fan_out(
        read_table(spark, sf_dir, "documents").select("lang", "n_chars", "text")
    )
    t = d.select(
        "lang", "n_chars", F.size(TX.tokens("text")).cast("long").alias("n_toks")
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            (F.sum("n_toks") * 100).cast("double") / F.sum("n_chars"), 6
        ).alias("tokens_per_100_chars"),
    )
