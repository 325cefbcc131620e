"""Round-8 batch 12: the data-selection triptych — fix the leakage
the audit found, weight docs toward a target distribution, and gate
outliers by LM fit:

- ``component_split_assign``: leakage-FREE train/val/test assignment
  — split by near-dup COMPONENT (the connected components of the
  registered LSH dup graph) instead of by document, so every member
  of a duplicate cluster lands in the same split by construction.
  The fix for what ``split_leakage_audit`` (extras44) measures; the
  output carries the re-run leak count (provably 0) next to per-split
  inventory.
- ``dsir_importance_weights``: Data Selection via Importance
  Resampling (Xie et al., 2023) — per-doc log importance weight
  log p_target(x)/p_raw(x) under hashed-unigram bag-of-words models
  (64 md5 buckets, Laplace-smoothed), target = the English slice;
  reported per source with the top-quartile selection rate. The
  modern "make the corpus look like the target domain" selection
  operator next to the quality/contamination gates.
- ``perplexity_outlier_gate``: CCNet-style perplexity filtering —
  per-doc cross-entropy under the corpus-trained Kneser-Ney bigram
  model (the exact model extras44 registers), Tukey-fenced
  (q3 + 1.5·IQR of the per-doc bits); per-source flag rates with the
  global fences. The "drop gibberish and boilerplate the quality
  heuristics miss" gate, sharing one probability spelling with
  ``kneser_ney_bigram_lm`` via ``kn_model_from_cvw``.

Registry conventions (plans/registry.py): exact BIGINT counts and
integer-ratio probabilities (Laplace); log₂ terms ROUND 6 summed in
DECIMAL(18,6); order statistics by percentile_disc (actual data
values); the Knuth bucket for all split hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.functions.text import tokens
from ucl_data_pipeline_spark.plans.extras44 import (
    _KN_MODEL_FROM_CVW_CTES,
    _KN_PAIR_SQL,
    kn_bigrams,
    kn_model_from_cvw,
)
from ucl_data_pipeline_spark.plans.llm_ops import (
    CC_EDGES_SQL_CTES,
    _SQL_TOKS,
    cc_edge_set,
    dedup_connected_components,
)
from ucl_data_pipeline_spark.plans.registry import register, sql_knuth_bucket
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Component-keyed (leakage-free) split assignment
# ---------------------------------------------------------------------------

_CSPLIT_ORACLE = rf"""
WITH RECURSIVE {CC_EDGES_SQL_CTES}, reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst
), comp AS (
  SELECT doc_id, MIN(r) AS component_id FROM reach GROUP BY doc_id
), asg AS (
  SELECT c.doc_id, c.component_id,
         CASE WHEN {sql_knuth_bucket('c.component_id', 100)} < 80 THEN 0
              WHEN {sql_knuth_bucket('c.component_id', 100)} < 90 THEN 1
              ELSE 2 END AS r
  FROM comp c
), all_pairs AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_a, doc_b FROM exact_pairs
), leak AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_leak
  FROM all_pairs p
  JOIN asg sa ON p.doc_a = sa.doc_id
  JOIN asg sb ON p.doc_b = sb.doc_id
  WHERE sa.r <> sb.r
), stats AS (
  SELECT a.r,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT a.component_id) AS BIGINT) AS n_components,
         CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
  FROM asg a JOIN documents USING (doc_id)
  GROUP BY a.r
)
SELECT CASE s.r WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split,
       s.n_docs, s.n_components, s.n_tokens, l.n_leak AS n_leak_pairs
FROM stats s CROSS JOIN leak l
"""


@register(
    "component_split_assign",
    oracle=_CSPLIT_ORACLE,
    tags=("llm", "dedup", "sample", "iterative"),
)
def component_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free 80/10/10 split: hash the near-dup COMPONENT id
    (dedup_connected_components — smallest reachable doc_id over the
    registered LSH + exact-dup edge set) through the width-safe Knuth
    bucket, so a duplicate cluster can never straddle splits. Output:
    per-split documents / components / tokens, plus the re-run leak
    count over the full duplicate-pair set — structurally ZERO
    (both endpoints of every pair share a component, hence a split),
    the closing half of the audit→fix pair with extras44's
    ``split_leakage_audit`` (which measures the doc-keyed split's
    actual leakage on the same pair set).

    Scale: component labels are the CC output (edge-bounded label
    propagation); assignment is a pure projection on the label;
    per-split stats are one hash-agg over the doc-grain join of
    assignment × documents; the leak re-check joins the sparse pair
    set against the node-sized assignment twice. The pair set and
    assignment are the ONLY shuffled frames; no corpus self-join.
    """
    edges = cc_edge_set(spark, sf_dir)
    comp = dedup_connected_components(
        spark, sf_dir, edges=edges
    ).localCheckpoint()
    asg = comp.select(
        "doc_id",
        "component_id",
        F.when(knuth_bucket("component_id", 100) < 80, 0)
        .when(knuth_bucket("component_id", 100) < 90, 1)
        .otherwise(2)
        .alias("r"),
    )
    # near pairs have doc_a < doc_b and exact pairs rep < copy, so the
    # src < dst half of the symmetric edge set IS the undirected pair
    # union — one filter of the already-checkpointed frame instead of
    # a second LSH verify pass. localCheckpoint the sparse pair half
    # so the caller-owned edges cache can be released NOW (comp is
    # already checkpointed): without the unpersist the entry leaked
    # for the whole session (cc_superstep_convergence, extras34,
    # releases the same frame — round-8 advisor finding).
    all_pairs = (
        edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
        .localCheckpoint()
    )
    edges.unpersist()
    sa = asg.select(F.col("doc_id").alias("doc_a"), F.col("r").alias("ra"))
    sb = asg.select(F.col("doc_id").alias("doc_b"), F.col("r").alias("rb"))
    leak = (
        all_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("ra") != F.col("rb"))
        .agg(F.count("*").cast("long").alias("n_leak"))
    )
    stats = (
        asg.join(
            read_table(spark, sf_dir, "documents").select(
                "doc_id", F.size(tokens("text")).alias("n_toks")
            ),
            "doc_id",
        )
        .groupBy("r")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("component_id").cast("long").alias("n_components"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    name = (
        F.when(F.col("r") == 0, "train")
        .when(F.col("r") == 1, "val")
        .otherwise("test")
    )
    return stats.crossJoin(F.broadcast(leak)).select(
        name.alias("split"),
        "n_docs",
        "n_components",
        "n_tokens",
        F.col("n_leak").alias("n_leak_pairs"),
    )


# ---------------------------------------------------------------------------
# DSIR hashed-unigram importance weights
# ---------------------------------------------------------------------------

_DSIR_B = 64  # hash buckets
_DSIR_TARGET_LANG = "en"

_SQL_DSIR_BUCKET = (
    f"CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {_DSIR_B}"
)

_DSIR_ORACLE = rf"""
WITH tk AS (
  SELECT doc_id, source, lang, unnest({_SQL_TOKS}) AS tok FROM documents
), bk AS (
  SELECT doc_id, source, lang, {_SQL_DSIR_BUCKET} AS b FROM tk
), raw AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bk GROUP BY b
), tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
  FROM bk WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b
), tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS nr,
         (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tgt) AS nt
  FROM raw
), bw AS (
  SELECT r.b,
         ROUND(log2((CAST(COALESCE(t.ct, 0) AS DOUBLE) + 1.0)
                    / (CAST(o.nt AS DOUBLE) + {_DSIR_B}.0))
               - log2((CAST(r.cr AS DOUBLE) + 1.0)
                      / (CAST(o.nr AS DOUBLE) + {_DSIR_B}.0)), 6) AS lw
  FROM raw r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN tot o
), docw AS (
  SELECT bk.doc_id, bk.source,
         CAST(SUM(CAST(bw.lw AS DECIMAL(18,6))) AS DOUBLE) AS logw
  FROM bk JOIN bw ON bk.b = bw.b
  GROUP BY bk.doc_id, bk.source
), thr AS (
  SELECT percentile_disc(0.75) WITHIN GROUP (ORDER BY logw) AS q75 FROM docw
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.logw >= t.q75 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       ROUND(CAST(SUM(CASE WHEN d.logw >= t.q75 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS sel_rate,
       CAST(SUM(CAST(ROUND(d.logw, 6) AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_logw
FROM docw d CROSS JOIN thr t
GROUP BY d.source
"""


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    tags=("llm", "sample", "stats"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: every document scores
    log₂ p_target(x)/p_raw(x) under hashed-unigram bag-of-words
    models — tokens hash into {B} md5 buckets, bucket distributions
    are Laplace-smoothed counts over the TARGET slice (lang='{t}')
    and the RAW corpus, and a doc's weight is the sum of its tokens'
    per-bucket log-ratios. Reported per source with the top-quartile
    (logw ≥ P75) selection rate — the "resample the corpus toward
    the target domain" knob, next to the quality gate (absolute
    quality) and contamination gate (benchmark overlap).

    Determinism: buckets via the engine-portable conv/md5-prefix
    integer hash; bucket probabilities are Laplace integer ratios;
    the per-bucket log-ratio is ROUND 6 ONCE (each token occurrence
    then contributes an exact DECIMAL term); doc weights sum those
    decimals; the P75 threshold is percentile_disc — an actual data
    value, compared exactly.

    Scale: the DSIR shape is why it runs at pretraining scale — two
    hash-aggs to a {B}-row bucket table, a BROADCAST of those {B}
    rows back onto the token stream, and one doc-grain agg. No
    per-doc model, no pairwise anything. The P75 selection threshold
    is one corpus-wide percentile buffer (the documented
    approx-percentile substitution applies at 100 TB).
    """
    d = read_table(spark, sf_dir, "documents")
    bk = d.select(
        "doc_id",
        "source",
        "lang",
        F.explode(tokens("text")).alias("tok"),
    ).select(
        "doc_id",
        "source",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % _DSIR_B
        ).alias("b"),
    )
    raw = bk.groupBy("b").agg(F.count("*").cast("long").alias("cr"))
    tgt = (
        bk.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("ct"))
    )
    nr = raw.agg(F.sum("cr").cast("long").alias("nr"))
    nt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("nt"))
    lw = F.round(
        F.log2(
            (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(1.0))
            / (F.col("nt").cast("double") + F.lit(float(_DSIR_B)))
        )
        - F.log2(
            (F.col("cr").cast("double") + F.lit(1.0))
            / (F.col("nr").cast("double") + F.lit(float(_DSIR_B)))
        ),
        6,
    )
    bw = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nt))
        .select("b", lw.alias("lw"))
    )
    docw = (
        bk.join(F.broadcast(bw), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.col("lw").cast("decimal(18,6)"))
            .cast("double")
            .alias("logw")
        )
    )
    thr = docw.agg(
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY logw)").alias(
            "q75"
        )
    )
    sel = F.when(F.col("logw") >= F.col("q75"), 1).otherwise(0)
    return (
        docw.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(sel).cast("long").alias("n_selected"),
            F.round(
                F.sum(sel).cast("double") / F.count("*").cast("double"), 6
            ).alias("sel_rate"),
            F.sum(F.round("logw", 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_logw"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity outlier gate
# ---------------------------------------------------------------------------

_PPL_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, source, {_SQL_TOKS} AS t FROM documents
), bg AS (
  SELECT doc_id, source, s.v AS v, s.w AS w
  FROM (SELECT doc_id, source, {_KN_PAIR_SQL} FROM tok)
), cd AS (
  SELECT doc_id, source, v, w, CAST(COUNT(*) AS BIGINT) AS c_d
  FROM bg GROUP BY doc_id, source, v, w
), cvw AS (
  SELECT v, w, CAST(SUM(c_d) AS BIGINT) AS c_vw FROM cd GROUP BY v, w
), {_KN_MODEL_FROM_CVW_CTES}, doch AS (
  SELECT cd.doc_id, cd.source,
         -(CAST(SUM(CAST(ROUND(CAST(cd.c_d AS DOUBLE) * log2(md.p), 6)
                         AS DECIMAL(18,6))) AS DOUBLE))
           / CAST(SUM(cd.c_d) AS DOUBLE) AS h
  FROM cd JOIN model md ON cd.v = md.v AND cd.w = md.w
  GROUP BY cd.doc_id, cd.source
), fen AS (
  SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY h) AS q1,
         percentile_disc(0.75) WITHIN GROUP (ORDER BY h) AS q3
  FROM doch
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.h > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       ROUND(CAST(SUM(CASE WHEN d.h > f.q3 + 1.5 * (f.q3 - f.q1)
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS flag_rate,
       ROUND(f.q1, 6) AS h_q1,
       ROUND(f.q3, 6) AS h_q3,
       ROUND(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS fence_hi
FROM doch d CROSS JOIN fen f
GROUP BY d.source, f.q1, f.q3
"""


@register(
    "perplexity_outlier_gate",
    oracle=_PPL_ORACLE,
    tags=("llm", "text", "stats", "gate"),
)
def perplexity_outlier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity gate: per-document cross-entropy (bits
    per bigram) under the corpus-trained interpolated Kneser-Ney
    bigram model — the SAME probability expression
    ``kneser_ney_bigram_lm`` registers, via the shared
    ``kn_model_from_cvw`` — Tukey-fenced at q3 + 1.5·IQR over the
    per-doc distribution; per-source flag counts with the global
    fences. Perplexity filtering catches gibberish and boilerplate
    the surface-heuristic quality score misses (both directions:
    CCNet keeps the LOW-perplexity head; the high fence here flags
    the un-language-like tail the curation gate should drop). Docs
    with < 2 tokens have no bigrams and are out of the gate's domain
    (none exist in the corpus fixture).

    Determinism: per-doc H = −(Σ ROUND-6 decimal terms)/M is exact
    up to one IEEE division (identical cross-engine since the
    decimal sum and BIGINT M are bit-equal); fences are
    percentile_disc data values combined in one pinned expression;
    the flag compares those exact doubles. ROUND 6 at output only.

    Scale: model estimation is the KN shape (type-grain hash-aggs +
    a singleton broadcast); per-doc eval joins the doc-grain count
    frame to the type-grain model and re-aggregates to docs; fences
    are one two-cut percentile buffer over the doc-grain H column
    (single buffer via the array form if it ever matters; the
    approx substitution is documented for 100 TB). The doc-grain
    count frame is localCheckpoint-materialized — it feeds the model
    chain AND the eval join.
    """
    cd = (
        kn_bigrams(spark, sf_dir)
        .groupBy("doc_id", "source", "v", "w")
        .agg(F.count("*").cast("long").alias("c_d"))
        .localCheckpoint()
    )
    cvw = cd.groupBy("v", "w").agg(F.sum("c_d").cast("long").alias("c_vw"))
    model = kn_model_from_cvw(cvw)
    doch = (
        cd.join(model, ["v", "w"])
        .groupBy("doc_id", "source")
        .agg(
            (
                -F.sum(
                    F.round(
                        F.col("c_d").cast("double") * F.log2("p"), 6
                    ).cast("decimal(18,6)")
                ).cast("double")
                / F.sum("c_d").cast("double")
            ).alias("h")
        )
    )
    fen = doch.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY h)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY h)").alias("q3"),
    )
    fence_hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    flag = F.when(F.col("h") > fence_hi, 1).otherwise(0)
    return (
        doch.crossJoin(F.broadcast(fen))
        .groupBy("source", "q1", "q3")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(flag).cast("long").alias("n_flagged"),
            F.round(
                F.sum(flag).cast("double") / F.count("*").cast("double"), 6
            ).alias("flag_rate"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            "flag_rate",
            F.round("q1", 6).alias("h_q1"),
            F.round("q3", 6).alias("h_q3"),
            F.round(fence_hi, 6).alias("fence_hi"),
        )
    )
