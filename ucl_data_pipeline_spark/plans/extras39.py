"""Round-8 batch 6: privacy-release depth, graph peeling, marketing
attribution, and classifier-quality audit —

- ``t_closeness_check``: completes the privacy-audit triad
  (k_anonymity_check → l_diversity_check → t-closeness). A QI group
  can be large (k-anonymous) AND diverse (l-diverse) yet still leak
  if its sensitive-attribute DISTRIBUTION differs sharply from the
  global one; the t-closeness gate bounds the total-variation
  distance between the two distributions.
- ``kcore_copurchase``: 2-core decomposition of the part copurchase
  graph by iterative peeling (remove degree<k nodes until fixpoint)
  — the standard graph-curation step that strips pendant/tree
  structure before community or embedding work. Fixed 6 supersteps,
  unrolled identically in the DuckDB oracle (the pagerank/kmeans
  fixed-iteration discipline), converging in 3 rounds at sf0.01 and
  5 at sf0.1 (measured), so round 6 is a proven fixpoint at both.
- ``attribution_multi_touch``: multi-touch conversion attribution
  over the event stream — every purchase's value allocated across
  the user's preceding touches (view/click/signup, 3-day lookback)
  under FOUR industry models at once: time-decay (24 h half-life),
  linear, first-touch, last-touch, plus an '(unattributed)' bucket
  so each model's column still sums to total conversion value (the
  accounting identity a pytest asserts).
- ``auc_quality_langid``: one-vs-rest ROC-AUC of the text quality
  score as a language discriminator, per language — the rank-sum
  (Mann-Whitney) AUC computed from BOUNDED value-grain counts: the
  score is quantized to 4096 buckets first, so the ordered windows
  run over a ≤4097-row derived grain (the adjudicated
  bounded-grain window pattern), never over raw rows. This is the
  audit a curation team runs before using a quality score as a
  sampling weight: if AUC vs language is far from 0.5, the "quality"
  filter is secretly a language filter.

Registry conventions (plans/registry.py): exact-integer restatements
wherever a distribution distance or rank statistic allows it
(t-closeness TVD and AUC are single divisions of exact BIGINT
products); transcendental decay weights ROUND(...,6) per-term then
summed in DECIMAL (the unigram_entropy pattern); per-pair attributed
values ROUND(...,12) → DECIMAL(28,12) sums (the pagerank contrib
spelling); money sums via the dsum DECIMAL(18,6) helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import scalar as SC
from ucl_data_pipeline_spark.plans.llm_ops import (
    _QUALITY_ORACLE,
    text_quality_score,
)
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# t-closeness (privacy triad completion)
# ---------------------------------------------------------------------------

_T_CLOSE = 0.2  # standard textbook release threshold

_T_CLOSE_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey,
         CAST(FLOOR(c_acctbal / 2000) AS INTEGER) AS bal_band,
         c_mktsegment, COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2, 3
), gs AS (
  SELECT c_nationkey, bal_band, SUM(cnt) AS n_g FROM g GROUP BY 1, 2
), s AS (
  SELECT c_mktsegment, SUM(cnt) AS cnt_s FROM g GROUP BY 1
), tot AS (
  SELECT SUM(cnt) AS n FROM g
), cell AS (
  SELECT gs.c_nationkey, gs.bal_band, gs.n_g, s.cnt_s, tot.n,
         COALESCE(gg.cnt, 0) AS cnt_gs
  FROM gs CROSS JOIN s CROSS JOIN tot
  LEFT JOIN g gg
    ON gg.c_nationkey = gs.c_nationkey AND gg.bal_band = gs.bal_band
   AND gg.c_mktsegment = s.c_mktsegment
)
SELECT c_nationkey, bal_band,
       CAST(n_g AS BIGINT) AS group_size,
       ROUND(CAST(SUM(ABS(cnt_gs * n - cnt_s * n_g)) AS DOUBLE)
             / (2.0 * n_g * n), 6) AS tvd,
       (CAST(SUM(ABS(cnt_gs * n - cnt_s * n_g)) AS DOUBLE)
        / (2.0 * n_g * n)) <= {_T_CLOSE} AS t_close
FROM cell
GROUP BY c_nationkey, bal_band, n_g, n
"""


@register("t_closeness_check", oracle=_T_CLOSE_ORACLE, tags=("agg", "validate"))
def t_closeness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the same QI groups as k_anonymity_check /
    l_diversity_check (nation × 2000-wide balance band; sensitive =
    market segment): per group, the total-variation distance
    TVD = ½ Σ_s |p_s(group) − p_s(global)| and the gate TVD ≤ t=0.2.

    Determinism is earned by restating the TVD in exact integers:
    |cnt_gs·N − cnt_s·n_g| is an exact BIGINT per cell (zero cells
    included via the group × segment-domain cross join), its sum is an
    exact BIGINT, and the single final division by 2·n_g·N is the only
    float op — bit-identical cross-engine by IEEE, no float summation
    order anywhere. (At extreme row counts the BIGINT product needs a
    DECIMAL(38,0) widening — counts up to ~3e9 are safe as-is.)

    Scale: one hash-agg at (QI, sensitive) grain, then everything runs
    at QI-domain × sensitive-domain grain (bounded, constant in row
    count); the segment-domain and total frames are broadcast.
    """
    c = read_table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count("*").alias("cnt"))
    gs = g.groupBy("c_nationkey", "bal_band").agg(F.sum("cnt").alias("n_g"))
    s = g.groupBy("c_mktsegment").agg(F.sum("cnt").alias("cnt_s"))
    tot = g.agg(F.sum("cnt").alias("n"))
    cell = (
        gs.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tot))
        .join(g, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .select(
            "c_nationkey",
            "bal_band",
            "n_g",
            "cnt_s",
            "n",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt_gs"),
        )
    )
    num = F.sum(F.abs(F.col("cnt_gs") * F.col("n") - F.col("cnt_s") * F.col("n_g")))
    agg = cell.groupBy("c_nationkey", "bal_band", "n_g", "n").agg(num.alias("num"))
    tvd = F.col("num").cast("double") / (2.0 * F.col("n_g") * F.col("n"))
    return agg.select(
        "c_nationkey",
        "bal_band",
        F.col("n_g").cast("bigint").alias("group_size"),
        F.round(tvd, 6).alias("tvd"),
        (tvd <= _T_CLOSE).alias("t_close"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition of the copurchase graph (fixed-superstep peel)
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_SUPPORT = 2  # copurchase edge = pair seen in ≥2 distinct orders
_KCORE_ROUNDS = 6  # > measured fixpoint (3 @ sf0.01, 5 @ sf0.1)

_KCORE_EDGES_SQL = f"""basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e0 AS MATERIALIZED (
  SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= {_KCORE_SUPPORT}
)"""


def _sql_peel(i: int) -> str:
    """One unrolled peel superstep: degree → sub-k node set → edge
    filter (mirrors the Spark loop body expression-for-expression).
    Every CTE that is referenced more than once downstream is
    MATERIALIZED: DuckDB inlines plain CTEs, and each superstep
    references its predecessor ~5× (degree union branches + both
    NOT-IN filters), so an un-materialized chain re-inlines the base
    scan exponentially (observed as a too-many-open-files error at
    six rounds) — the oracle-side analogue of the Spark loop's
    localCheckpoint-per-round."""
    return f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}
  ) u GROUP BY node
), bad{i} AS MATERIALIZED (
  SELECT node FROM d{i} WHERE d < {_KCORE_K}
), e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a NOT IN (SELECT node FROM bad{i})
    AND b NOT IN (SELECT node FROM bad{i})
)"""


_KCORE_ORACLE = f"""
WITH {_KCORE_EDGES_SQL},
{",".join(_sql_peel(i) for i in range(_KCORE_ROUNDS))}
SELECT node AS part, CAST(d AS BIGINT) AS core_degree
FROM (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM e{_KCORE_ROUNDS}
    UNION ALL SELECT b FROM e{_KCORE_ROUNDS}
  ) u GROUP BY node
)
"""


def kcore_peel(spark: SparkSession, sf_dir: str, rounds: int) -> DataFrame:
    """Parameterized peel (see kcore_copurchase): surviving nodes and
    in-core degrees after ``rounds`` supersteps. Exposed so the
    fixpoint test can assert rounds−1 ≡ rounds."""
    baskets = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    parts = F.col("parts")
    pair_arr = F.flatten(
        F.transform(
            parts,
            lambda x, i: F.transform(
                F.slice(parts, i + F.lit(2), F.size(parts)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    edges = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= _KCORE_SUPPORT)
        .select("a", "b")
        .localCheckpoint()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )

    for _ in range(rounds):
        bad = degrees(edges).filter(F.col("d") < _KCORE_K).select("node")
        edges = (
            edges.join(bad.select(F.col("node").alias("a")), "a", "left_anti")
            .join(bad.select(F.col("node").alias("b")), "b", "left_anti")
            .localCheckpoint()
        )
    return degrees(edges).select(
        F.col("node").alias("part"),
        F.col("d").cast("bigint").alias("core_degree"),
    )


@register(
    "kcore_copurchase",
    oracle=_KCORE_ORACLE,
    tags=("graph", "iterative"),
)
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the part copurchase graph (edges = part pairs
    co-purchased in ≥2 distinct orders): iteratively remove nodes of
    degree < 2 for six fixed supersteps, then report every surviving
    node with its in-core degree. Six rounds is a measured fixpoint at
    both driver SFs (3 rounds to converge at sf0.01, 5 at sf0.1;
    tests/test_round8b.py asserts round 5 ≡ round 6), so the output IS
    the k-core, not a truncation — the pagerank/kmeans_lloyd
    fixed-iteration discipline that keeps an iterative algorithm
    exactly oracle-checkable.

    Scale: edge generation is the copurchase array spelling
    (extras3.py:43 — scan-side a<b pairs from per-order sorted part
    arrays, NO basket self-join, per-order cost bounded by basket
    size²); each superstep is one union + hash-agg (degree) and two
    anti-joins, all keyed on part ids, with localCheckpoint per round
    truncating lineage (every round's edge frame has three consumers —
    degree + both anti-joins — so eager materialization also prevents
    branch re-execution). Peeling strictly shrinks the edge set, so
    superstep cost is monotonically decreasing.
    """
    return kcore_peel(spark, sf_dir, _KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Multi-touch conversion attribution
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_DAYS = 3
_ATTR_HALFLIFE_US = 86_400_000_000.0  # 24 h in microseconds
_TOUCH_TYPES = ("view", "click", "signup")

_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS conv_ts, value
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id AS t_user, event_id AS touch_id,
         event_type AS channel, ts AS touch_ts
  FROM events WHERE event_type IN {_TOUCH_TYPES!r}
), p AS (
  SELECT c.conv_id, c.value, t.touch_id, t.channel, t.touch_ts,
         ROUND(POWER(0.5,
           (epoch_us(c.conv_ts) - epoch_us(t.touch_ts))
             / {_ATTR_HALFLIFE_US}), 6) AS w
  FROM conv c LEFT JOIN touch t
    ON t.t_user = c.user_id
   AND t.touch_ts <= c.conv_ts
   AND t.touch_ts >= c.conv_ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
), win AS (
  SELECT *,
    CAST(SUM(CAST(w AS DECIMAL(18,6))) OVER (PARTITION BY conv_id)
         AS DOUBLE) AS sum_w,
    COUNT(touch_id) OVER (PARTITION BY conv_id) AS n_t,
    ROW_NUMBER() OVER (PARTITION BY conv_id
                       ORDER BY touch_ts, touch_id) AS rn_first,
    ROW_NUMBER() OVER (PARTITION BY conv_id
                       ORDER BY touch_ts DESC, touch_id DESC) AS rn_last
  FROM p
), contrib AS (
  SELECT COALESCE(channel, '(unattributed)') AS channel, touch_id,
    CASE WHEN touch_id IS NULL THEN value
         ELSE ROUND(value * w / sum_w, 12) END AS td_c,
    CASE WHEN touch_id IS NULL THEN value
         ELSE ROUND(value / n_t, 12) END AS lin_c,
    CASE WHEN touch_id IS NULL OR rn_first = 1 THEN value
         ELSE 0.0 END AS first_c,
    CASE WHEN touch_id IS NULL OR rn_last = 1 THEN value
         ELSE 0.0 END AS last_c
  FROM win
)
SELECT channel, COUNT(*) AS n_rows,
  ROUND(CAST(SUM(CAST(td_c AS DECIMAL(28,12))) AS DOUBLE), 6) AS td_value,
  ROUND(CAST(SUM(CAST(lin_c AS DECIMAL(28,12))) AS DOUBLE), 6)
    AS linear_value,
  ROUND(CAST(SUM(CAST(first_c AS DECIMAL(18,6))) AS DOUBLE), 6)
    AS first_value,
  ROUND(CAST(SUM(CAST(last_c AS DECIMAL(18,6))) AS DOUBLE), 6)
    AS last_value
FROM contrib GROUP BY channel
"""


@register(
    "attribution_multi_touch",
    oracle=_ATTR_ORACLE,
    tags=("join", "window", "events"),
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: each purchase's value allocated over
    the same user's view/click/signup touches in the preceding 3 days,
    under four models at once — time-decay (24 h half-life, weights
    normalized per conversion), linear (1/n), first-touch, last-touch
    — aggregated per channel, with conversions that had NO touch in
    the window reported as '(unattributed)' so every model column
    sums to total conversion value (asserted in
    tests/test_round8b.py).

    Determinism: the decay weight is ROUND(pow(½, Δt_us/86400e6), 6)
    per-term (exact integer Δt in microseconds; transcendental
    rounded per the r6 convention), the per-conversion weight sum is
    an exact DECIMAL(18,6) window sum, each attributed value is
    ROUND(...,12) then DECIMAL(28,12)-summed (the pagerank contrib
    spelling), and first/last/unattributed sums are dsum-exact
    (event values are 2-decimal money). First/last tie-breaks pin
    (touch_ts, touch_id) totally.

    Scale: the conversion⋈touch join is equi-keyed on user_id with
    the 3-day band evaluated inside the join (the
    view_click_interval_join shape — no per-user cross product beyond
    the band); the four windows all partition by conv_id, whose
    fan-in is bounded by a user's touch rate × lookback. One shuffle
    to user, one to conv_id, one bounded-width final agg.
    """
    ev = read_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
        "value",
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    p = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAYS")
        ),
        "left",
    ).select(
        "conv_id",
        "value",
        "touch_id",
        "channel",
        "touch_ts",
        F.round(
            F.pow(
                F.lit(0.5),
                (SC.epoch_us("conv_ts") - SC.epoch_us("touch_ts"))
                / F.lit(_ATTR_HALFLIFE_US),
            ),
            6,
        ).alias("w"),
    )
    wc = Window.partitionBy("conv_id")
    win = p.select(
        "conv_id",
        "value",
        "touch_id",
        "channel",
        "w",
        F.sum(F.col("w").cast("decimal(18,6)")).over(wc).cast("double").alias("sum_w"),
        F.count("touch_id").over(wc).alias("n_t"),
        F.row_number().over(wc.orderBy("touch_ts", "touch_id")).alias("rn_first"),
        F.row_number()
        .over(wc.orderBy(F.desc("touch_ts"), F.desc("touch_id")))
        .alias("rn_last"),
    )
    no_touch = F.col("touch_id").isNull()
    v = F.col("value")
    contrib = win.select(
        F.coalesce(F.col("channel"), F.lit("(unattributed)")).alias("channel"),
        "touch_id",
        F.when(no_touch, v)
        .otherwise(F.round(v * F.col("w") / F.col("sum_w"), 12))
        .alias("td_c"),
        F.when(no_touch, v)
        .otherwise(F.round(v / F.col("n_t"), 12))
        .alias("lin_c"),
        F.when(no_touch | (F.col("rn_first") == 1), v).otherwise(F.lit(0.0)).alias(
            "first_c"
        ),
        F.when(no_touch | (F.col("rn_last") == 1), v).otherwise(F.lit(0.0)).alias(
            "last_c"
        ),
    )
    return contrib.groupBy("channel").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(F.col("td_c").cast("decimal(28,12)")).cast("double"), 6
        ).alias("td_value"),
        F.round(
            F.sum(F.col("lin_c").cast("decimal(28,12)")).cast("double"), 6
        ).alias("linear_value"),
        F.round(
            F.sum(F.col("first_c").cast("decimal(18,6)")).cast("double"), 6
        ).alias("first_value"),
        F.round(
            F.sum(F.col("last_c").cast("decimal(18,6)")).cast("double"), 6
        ).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# One-vs-rest ROC-AUC of the quality score as a language discriminator
# ---------------------------------------------------------------------------

_AUC_BUCKETS = 4096

_AUC_ORACLE = f"""
WITH q AS (
  SELECT doc_id, quality_score FROM ({_QUALITY_ORACLE})
  WHERE quality_score IS NOT NULL
), base AS (
  SELECT d.lang,
         CAST(FLOOR(q.quality_score * {_AUC_BUCKETS}) AS INTEGER) AS b
  FROM q JOIN documents d USING (doc_id)
), cell AS (
  SELECT b, lang, COUNT(*) AS cnt FROM base GROUP BY b, lang
), tot AS (
  SELECT b, SUM(cnt) AS tot_b,
         COALESCE(SUM(SUM(cnt)) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cumtot_lt
  FROM cell GROUP BY b
), cl AS (
  SELECT c.b, c.lang, c.cnt, t.tot_b, t.cumtot_lt,
         COALESCE(SUM(c.cnt) OVER (PARTITION BY c.lang ORDER BY c.b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cuml_lt
  FROM cell c JOIN tot t USING (b)
), per_lang AS (
  SELECT lang,
         SUM(cnt) AS n_pos,
         SUM(cnt * (cumtot_lt - cuml_lt)) AS conc,
         SUM(cnt * (tot_b - cnt)) AS ties
  FROM cl GROUP BY lang
), n AS (
  SELECT SUM(cnt) AS n_all FROM cell
)
SELECT lang,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_all - n_pos AS BIGINT) AS n_neg,
       ROUND((2.0 * conc + ties) / (2.0 * n_pos * (n_all - n_pos)), 6)
         AS auc,
       ROUND((2.0 * conc + ties) / (n_pos * (n_all - n_pos)) - 1.0, 6)
         AS gini
FROM per_lang CROSS JOIN n
"""


@register(
    "auc_quality_langid",
    oracle=_AUC_ORACLE,
    tags=("stats", "llm", "text"),
)
def auc_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language one-vs-rest ROC-AUC (and Gini = 2·AUC−1) of the
    registered text quality score as a language-id discriminator —
    the pre-sampling audit that catches a "quality" filter that is
    secretly a language filter (AUC far from 0.5 for some language
    means quality-weighted sampling will shift the language mix).

    The Mann-Whitney rank-sum AUC restated in exact integers over a
    BOUNDED grain: scores quantize to 4096 buckets (FLOOR(q·4096) —
    identical IEEE multiply+floor on both engines since the quality
    doubles are hash-proven identical), per-(bucket, lang) counts
    give concordant = Σ_b cnt_L(b)·(#rest below b) and tie mass
    Σ_b cnt_L(b)·(tot_b − cnt_L(b)), and
    AUC = (2·conc + ties) / (2·n_pos·n_neg) is a single division of
    exact BIGINTs. Quantization ties are scored ½ exactly as the
    midrank formula does, so this is the binned AUC, identically
    defined on both engines.

    Scale: one doc-grain scan + hash-agg to the (≤4097 × #langs)
    grain; the two cumulative windows run over that bounded derived
    grain (the adjudicated bounded-grain window pattern — histograms,
    day-grain series), never over rows; the final per-lang agg is
    #langs rows joined to a broadcast singleton total.
    """
    q = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "quality_score")
        .filter(F.col("quality_score").isNotNull())
    )
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    base = q.join(d, "doc_id").select(
        "lang",
        F.floor(F.col("quality_score") * _AUC_BUCKETS).cast("int").alias("b"),
    )
    cell = base.groupBy("b", "lang").agg(F.count("*").alias("cnt"))
    w_tot = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    tot = (
        cell.groupBy("b")
        .agg(F.sum("cnt").alias("tot_b"))
        .select(
            "b",
            "tot_b",
            F.coalesce(F.sum("tot_b").over(w_tot), F.lit(0)).alias("cumtot_lt"),
        )
    )
    w_lang = (
        Window.partitionBy("lang")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cl = (
        cell.withColumn(
            "cuml_lt", F.coalesce(F.sum("cnt").over(w_lang), F.lit(0))
        )
        .join(tot, "b")
    )
    per_lang = cl.groupBy("lang").agg(
        F.sum("cnt").alias("n_pos"),
        F.sum(F.col("cnt") * (F.col("cumtot_lt") - F.col("cuml_lt"))).alias("conc"),
        F.sum(F.col("cnt") * (F.col("tot_b") - F.col("cnt"))).alias("ties"),
    )
    n = cell.agg(F.sum("cnt").alias("n_all"))
    auc = (2.0 * F.col("conc") + F.col("ties")) / (
        2.0 * F.col("n_pos") * (F.col("n_all") - F.col("n_pos"))
    )
    return per_lang.crossJoin(F.broadcast(n)).select(
        "lang",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.col("n_all") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(
            (2.0 * F.col("conc") + F.col("ties"))
            / (F.col("n_pos") * (F.col("n_all") - F.col("n_pos")))
            - 1.0,
            6,
        ).alias("gini"),
    )
