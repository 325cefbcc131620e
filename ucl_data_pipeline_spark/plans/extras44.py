"""Round-8 batch 11: language-model estimation, probabilistic record
linkage, and split-integrity auditing —

- ``kneser_ney_bigram_lm``: interpolated Kneser-Ney bigram language
  model (absolute discount D=0.75, continuation-count backoff)
  trained on the corpus and scored per SOURCE as cross-entropy /
  perplexity — the canonical n-gram smoothing (Kneser & Ney 1995;
  Chen & Goodman 1998) next to the unigram-MLE ``doc_lm_cross_
  entropy``: continuation counts N1+(·,w) answer "how many contexts
  does w complete" rather than "how often does w occur", the fix for
  high-frequency-but-context-bound tokens.
- ``fellegi_sunter_patterns``: the Fellegi-Sunter (1969)
  record-linkage weight table over the engine's shared LSH candidate
  generator — per agreement PATTERN (lang/source/length-band
  agree/disagree), match and non-match counts under the exact-Jaccard
  ≥ θ truth, Laplace-smoothed m/u probabilities, and the summed
  log₂(m/u) decision weight. The classical probabilistic-linkage
  scoring that turns field agreements into a single match score.
- ``split_leakage_audit``: do near-duplicate pairs straddle
  train/val/test? The registered 80/10/10 Knuth split crossed with
  the registered near-dup edge set (LSH-verified J ≥ 0.5 pairs plus
  exact-duplicate (rep, copy) pairs): per split-pair counts and the
  leak share — THE dedup-before-split audit an LLM data pipeline
  runs before training (a val/test doc whose near-dup sits in train
  is memorization leakage, invisible to per-split stats).

Registry conventions (plans/registry.py): exact BIGINT counts;
probabilities are single divisions of exact integers (Laplace +1/+2
smoothing keeps every log argument strictly inside (0,1)); log₂ terms
ROUND 6 then summed in DECIMAL(18,6) (unigram_entropy pattern); float
expression trees are parenthesized IDENTICALLY in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.plans.llm_ops import (
    CC_EDGES_SQL_CTES,
    _SQL_BAND_CAND_CTES,
    _SQL_SHINGLES,
    _SQL_TOKS,
    _rep_features,
    _rep_frames,
    dedup_minhash_lsh,
    lsh_candidate_pairs,
)
from ucl_data_pipeline_spark.plans.registry import register, sql_knuth_bucket
from ucl_data_pipeline_spark.sources.io import read_table, stats_barrier

# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM, scored per source
# ---------------------------------------------------------------------------

_KN_D = 0.75

# Bigram extraction as a SQL fragment (grain columns prepended by the
# caller): s.v / s.w from the per-doc adjacent-pair list. Shared with
# extras45's doc-grain perplexity gate.
_KN_PAIR_SQL = (
    "unnest(CASE WHEN len(t) >= 2 THEN"
    " list_transform(generate_series(1, len(t) - 1),"
    " i -> {'v': t[i], 'w': t[i+1]})"
    " ELSE [] END) AS s"
)

# The KN model CTE chain given an existing cvw(v, w, c_vw) CTE —
# shared verbatim by this module's per-source LM and extras45's
# per-doc perplexity gate so the probability spelling can never fork.
_KN_MODEL_FROM_CVW_CTES = f"""ctx AS (
  SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v,
         CAST(COUNT(*) AS BIGINT) AS n1p_v
  FROM cvw GROUP BY v
), cont AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n1p_w FROM cvw GROUP BY w
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM cvw
), model AS (
  SELECT m.v, m.w,
         ((CAST(m.c_vw AS DOUBLE) - {_KN_D}) / CAST(x.c_v AS DOUBLE))
         + ((({_KN_D} * CAST(x.n1p_v AS DOUBLE)) / CAST(x.c_v AS DOUBLE))
            * (CAST(co.n1p_w AS DOUBLE) / CAST(t.t_types AS DOUBLE))) AS p
  FROM cvw m
  JOIN ctx x ON m.v = x.v
  JOIN cont co ON m.w = co.w
  CROSS JOIN tt t
)"""

_KN_ORACLE = rf"""
WITH tok AS (
  SELECT source, {_SQL_TOKS} AS t FROM documents
), bg AS (
  SELECT source, s.v AS v, s.w AS w
  FROM (SELECT source, {_KN_PAIR_SQL} FROM tok)
), cs AS (
  SELECT source, v, w, CAST(COUNT(*) AS BIGINT) AS c_s
  FROM bg GROUP BY source, v, w
), cvw AS (
  SELECT v, w, CAST(SUM(c_s) AS BIGINT) AS c_vw FROM cs GROUP BY v, w
), {_KN_MODEL_FROM_CVW_CTES}, ev AS (
  SELECT cs.source,
         CAST(SUM(cs.c_s) AS BIGINT) AS n_bigrams,
         CAST(SUM(CAST(ROUND(CAST(cs.c_s AS DOUBLE) * log2(md.p), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS s
  FROM cs JOIN model md ON cs.v = md.v AND cs.w = md.w
  GROUP BY cs.source
)
SELECT source, n_bigrams,
       ROUND(-(s) / CAST(n_bigrams AS DOUBLE), 6) AS cross_entropy_bits,
       ROUND(POWER(2.0, ROUND(-(s) / CAST(n_bigrams AS DOUBLE), 6)), 6)
         AS perplexity
FROM ev
"""


def kn_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, v, w) — one row per within-doc adjacent token
    pair. The let-bound pair extraction shared by the per-source LM
    here and extras45's per-doc perplexity gate (SQL twin:
    ``_KN_PAIR_SQL``)."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TX.tokens("text").alias("t")
    )

    def pair_arr(t: Column) -> Column:
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("v"),
                    F.element_at(t, i + 1).alias("w"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<v:string,w:string>>"))

    return d.select(
        "doc_id", "source", F.explode(TX._let(F.col("t"), pair_arr)).alias("p")
    ).select(
        "doc_id", "source", F.col("p.v").alias("v"), F.col("p.w").alias("w")
    )


def kn_model_from_cvw(cvw: DataFrame) -> DataFrame:
    """(v, w, p) interpolated-KN probabilities from a bigram-type count
    frame cvw(v, w, c_vw) — the ONE place the probability expression
    lives engine-side (SQL twin: ``_KN_MODEL_FROM_CVW_CTES``). The
    parenthesization is pinned to the oracle's; both engines walk the
    identical IEEE expression tree over exact-integer ratios."""
    ctx = cvw.groupBy("v").agg(
        F.sum("c_vw").cast("long").alias("c_v"),
        F.count("*").cast("long").alias("n1p_v"),
    )
    cont = cvw.groupBy("w").agg(F.count("*").cast("long").alias("n1p_w"))
    tt = cvw.agg(F.count("*").cast("long").alias("t_types"))
    p = (
        (F.col("c_vw").cast("double") - F.lit(_KN_D))
        / F.col("c_v").cast("double")
    ) + (
        (
            (F.lit(_KN_D) * F.col("n1p_v").cast("double"))
            / F.col("c_v").cast("double")
        )
        * (F.col("n1p_w").cast("double") / F.col("t_types").cast("double"))
    )
    return (
        cvw.join(ctx, "v")
        .join(cont, "w")
        .crossJoin(F.broadcast(tt))
        .select("v", "w", p.alias("p"))
    )


@register(
    "kneser_ney_bigram_lm", oracle=_KN_ORACLE, tags=("llm", "text", "stats")
)
def kneser_ney_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM trained on the whole corpus,
    evaluated per source: P(w|v) = (c(v,w) − D)/c(v) +
    (D·N1+(v,·)/c(v)) · N1+(·,w)/|bigram types|, D = {d}. Since every
    evaluated bigram is in the training counts, c(v,w) ≥ 1 > D and the
    discount max(·,0) is vacuous — noted so the oracle can share the
    unguarded spelling. Per-source cross-entropy (bits/bigram) and
    perplexity localize which source a corpus-level LM fits worst —
    the source-quality triage signal next to ``source_jsd_matrix``'s
    distributional distances and ``doc_lm_cross_entropy``'s
    unigram-MLE self-entropy.

    Determinism: every model probability is an IEEE expression over
    exact-integer ratios with the SAME parenthesization in both
    engines; log₂ terms are weighted (c_s·log₂ p), ROUND 6, summed in
    DECIMAL(18,6); the final −S/M division and 2^H are single ops on
    already-rounded values.

    Scale: the classic distributed n-gram estimation shape — ONE
    corpus-grain explode feeds a (source, v, w) hash-agg; everything
    after runs at BIGRAM-TYPE grain (c(v,w) by summing source cells,
    context totals/type counts by two more hash-aggs, the |T|
    singleton broadcast). The eval join is type-grain × #sources.
    The (source,v,w) frame is localCheckpoint-materialized: it feeds
    both the model chain and the eval join, and the model lineage
    must not re-run the corpus explode per consumer.
    """
    bg = kn_bigrams(spark, sf_dir).select("source", "v", "w")
    cs = (
        bg.groupBy("source", "v", "w")
        .agg(F.count("*").cast("long").alias("c_s"))
        .localCheckpoint()
    )
    cvw = cs.groupBy("v", "w").agg(F.sum("c_s").cast("long").alias("c_vw"))
    model = kn_model_from_cvw(cvw)
    ev = (
        cs.join(model, ["v", "w"])
        .groupBy("source")
        .agg(
            F.sum("c_s").cast("long").alias("n_bigrams"),
            F.sum(
                F.round(
                    F.col("c_s").cast("double") * F.log2("p"), 6
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("s"),
        )
    )
    h = F.round(-F.col("s") / F.col("n_bigrams").cast("double"), 6)
    return ev.select(
        "source",
        "n_bigrams",
        h.alias("cross_entropy_bits"),
        F.round(F.pow(F.lit(2.0), h), 6).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter agreement-pattern weight table
# ---------------------------------------------------------------------------

_FS_ORACLE = rf"""
WITH rep AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
), tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM rep
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), {_SQL_BAND_CAND_CTES}, scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_filter(fa.feats, x -> list_contains(fb.feats, x))) AS i_n,
         len(fa.feats) + len(fb.feats)
           - len(list_filter(fa.feats, x -> list_contains(fb.feats, x))) AS u_n
  FROM cand c
  JOIN feat fa ON c.doc_a = fa.doc_id
  JOIN feat fb ON c.doc_b = fb.doc_id
), pr AS (
  SELECT CASE WHEN s.i_n * 2 >= s.u_n THEN 1 ELSE 0 END AS mt,
         CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END AS ag_lang,
         CASE WHEN da.source = db.source THEN 1 ELSE 0 END AS ag_src,
         CASE WHEN da.n_chars // 100 = db.n_chars // 100 THEN 1 ELSE 0 END
           AS ag_len
  FROM scored s
  JOIN documents da ON s.doc_a = da.doc_id
  JOIN documents db ON s.doc_b = db.doc_id
), st AS (
  SELECT CAST(SUM(mt) AS BIGINT) AS n_m,
         CAST(SUM(1 - mt) AS BIGINT) AS n_u,
         CAST(SUM(mt * ag_lang) AS BIGINT) AS am_lang,
         CAST(SUM((1 - mt) * ag_lang) AS BIGINT) AS au_lang,
         CAST(SUM(mt * ag_src) AS BIGINT) AS am_src,
         CAST(SUM((1 - mt) * ag_src) AS BIGINT) AS au_src,
         CAST(SUM(mt * ag_len) AS BIGINT) AS am_len,
         CAST(SUM((1 - mt) * ag_len) AS BIGINT) AS au_len
  FROM pr
), pat AS (
  SELECT ag_lang, ag_src, ag_len,
         CAST(SUM(mt) AS BIGINT) AS n_match,
         CAST(SUM(1 - mt) AS BIGINT) AS n_nonmatch
  FROM pr GROUP BY ag_lang, ag_src, ag_len
)
SELECT
  (CASE WHEN p.ag_lang = 1 THEN 'A' ELSE 'D' END
   || CASE WHEN p.ag_src = 1 THEN 'A' ELSE 'D' END
   || CASE WHEN p.ag_len = 1 THEN 'A' ELSE 'D' END) AS pattern,
  p.ag_lang, p.ag_src, p.ag_len, p.n_match, p.n_nonmatch,
  CAST(
    CAST(ROUND(log2(
      (CASE WHEN p.ag_lang = 1
            THEN (CAST(s.am_lang AS DOUBLE) + 1.0) / (CAST(s.n_m AS DOUBLE) + 2.0)
            ELSE 1.0 - (CAST(s.am_lang AS DOUBLE) + 1.0) / (CAST(s.n_m AS DOUBLE) + 2.0) END)
      / (CASE WHEN p.ag_lang = 1
              THEN (CAST(s.au_lang AS DOUBLE) + 1.0) / (CAST(s.n_u AS DOUBLE) + 2.0)
              ELSE 1.0 - (CAST(s.au_lang AS DOUBLE) + 1.0) / (CAST(s.n_u AS DOUBLE) + 2.0) END)
    ), 6) AS DECIMAL(18,6))
    + CAST(ROUND(log2(
      (CASE WHEN p.ag_src = 1
            THEN (CAST(s.am_src AS DOUBLE) + 1.0) / (CAST(s.n_m AS DOUBLE) + 2.0)
            ELSE 1.0 - (CAST(s.am_src AS DOUBLE) + 1.0) / (CAST(s.n_m AS DOUBLE) + 2.0) END)
      / (CASE WHEN p.ag_src = 1
              THEN (CAST(s.au_src AS DOUBLE) + 1.0) / (CAST(s.n_u AS DOUBLE) + 2.0)
              ELSE 1.0 - (CAST(s.au_src AS DOUBLE) + 1.0) / (CAST(s.n_u AS DOUBLE) + 2.0) END)
    ), 6) AS DECIMAL(18,6))
    + CAST(ROUND(log2(
      (CASE WHEN p.ag_len = 1
            THEN (CAST(s.am_len AS DOUBLE) + 1.0) / (CAST(s.n_m AS DOUBLE) + 2.0)
            ELSE 1.0 - (CAST(s.am_len AS DOUBLE) + 1.0) / (CAST(s.n_m AS DOUBLE) + 2.0) END)
      / (CASE WHEN p.ag_len = 1
              THEN (CAST(s.au_len AS DOUBLE) + 1.0) / (CAST(s.n_u AS DOUBLE) + 2.0)
              ELSE 1.0 - (CAST(s.au_len AS DOUBLE) + 1.0) / (CAST(s.n_u AS DOUBLE) + 2.0) END)
    ), 6) AS DECIMAL(18,6))
  AS DOUBLE) AS fs_weight
FROM pat p CROSS JOIN st s
"""


def _fs_field_weight(ag: Column, am: Column, au: Column, n_m: Column, n_u: Column) -> Column:
    """One field's ROUND-6 log₂ weight as DECIMAL(18,6): log₂(m/u) on
    agreement, log₂((1−m)/(1−u)) on disagreement, with Laplace
    (+1)/(+2) smoothing pinning every probability inside (0,1)."""
    m = (am.cast("double") + F.lit(1.0)) / (n_m.cast("double") + F.lit(2.0))
    u = (au.cast("double") + F.lit(1.0)) / (n_u.cast("double") + F.lit(2.0))
    num = F.when(ag == 1, m).otherwise(F.lit(1.0) - m)
    den = F.when(ag == 1, u).otherwise(F.lit(1.0) - u)
    return F.round(F.log2(num / den), 6).cast("decimal(18,6)")


@register(
    "fellegi_sunter_patterns", oracle=_FS_ORACLE, tags=("dedup", "llm", "stats")
)
def fellegi_sunter_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over the engine's
    shared LSH candidate generator: every candidate pair is labeled
    matched/unmatched by the exact-Jaccard ≥ ½ truth (integer algebra,
    the dedup family's threshold), agreement indicators are computed
    on three fields (lang, source, n_chars÷100 length band), and the
    classical weight table is emitted per agreement PATTERN:
    w = Σ_f log₂(m_f/u_f) on agreement, log₂((1−m_f)/(1−u_f)) on
    disagreement, with m/u estimated from the matched/unmatched
    partitions under Laplace (+1)/(+2) smoothing (which also pins
    every log argument strictly inside (0,1) — no ±∞ branch exists).
    The decision-theoretic scoring that generalizes the dedup
    family's single-threshold rule to multi-evidence linkage.

    Scale: candidates are band-bucketed (never O(n²)); attribute
    joins re-fetch only candidate docs' three small fields; m/u live
    in ONE singleton stats row broadcast into the ≤2³-row pattern
    frame. The pair frame is persisted — it feeds both the singleton
    stats agg and the pattern agg (twice-consumed rule).
    """
    feats = _rep_features(spark, sf_dir).persist()
    cand = lsh_candidate_pairs(feats)
    # stats-barriered (r13, replacing the r12 merge hints): fa/fb carry
    # corpus-sized feature arrays the static planner would broadcast on
    # a Generate-blind estimate (the ×100-smoke class — see
    # dedup_minhash_lsh/extras9); static stays SMJ, AQE runtime
    # conversion free again.
    fsrc = stats_barrier(feats)
    fa = fsrc.select(F.col("doc_id").alias("doc_a"), F.col("feats").alias("fa"))
    fb = fsrc.select(F.col("doc_id").alias("doc_b"), F.col("feats").alias("fb"))
    inter = F.size(F.array_intersect("fa", "fb"))
    union = F.size("fa") + F.size("fb") - inter
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", (F.col("n_chars") / 100).cast("int").alias("lb")
    )
    da = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("src_a"),
        F.col("lb").alias("lb_a"),
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("src_b"),
        F.col("lb").alias("lb_b"),
    )
    pr = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", inter.alias("i_n"), union.alias("u_n"))
        .join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.when(F.col("i_n") * 2 >= F.col("u_n"), 1).otherwise(0).alias("mt"),
            F.when(F.col("lang_a") == F.col("lang_b"), 1).otherwise(0).alias("ag_lang"),
            F.when(F.col("src_a") == F.col("src_b"), 1).otherwise(0).alias("ag_src"),
            F.when(F.col("lb_a") == F.col("lb_b"), 1).otherwise(0).alias("ag_len"),
        )
        # twice-consumed (singleton m/u stats + pattern agg) AND the
        # upstream LSH lineage is heavy: localCheckpoint materializes
        # the candidate-grain indicator frame and truncates the plan
        .localCheckpoint()
    )
    st = pr.agg(
        F.sum("mt").cast("long").alias("n_m"),
        F.sum(1 - F.col("mt")).cast("long").alias("n_u"),
        F.sum(F.col("mt") * F.col("ag_lang")).cast("long").alias("am_lang"),
        F.sum((1 - F.col("mt")) * F.col("ag_lang")).cast("long").alias("au_lang"),
        F.sum(F.col("mt") * F.col("ag_src")).cast("long").alias("am_src"),
        F.sum((1 - F.col("mt")) * F.col("ag_src")).cast("long").alias("au_src"),
        F.sum(F.col("mt") * F.col("ag_len")).cast("long").alias("am_len"),
        F.sum((1 - F.col("mt")) * F.col("ag_len")).cast("long").alias("au_len"),
    )
    pat = pr.groupBy("ag_lang", "ag_src", "ag_len").agg(
        F.sum("mt").cast("long").alias("n_match"),
        F.sum(1 - F.col("mt")).cast("long").alias("n_nonmatch"),
    )
    joined = pat.crossJoin(F.broadcast(st))
    weight = (
        _fs_field_weight(
            F.col("ag_lang"), F.col("am_lang"), F.col("au_lang"),
            F.col("n_m"), F.col("n_u"),
        )
        + _fs_field_weight(
            F.col("ag_src"), F.col("am_src"), F.col("au_src"),
            F.col("n_m"), F.col("n_u"),
        )
        + _fs_field_weight(
            F.col("ag_len"), F.col("am_len"), F.col("au_len"),
            F.col("n_m"), F.col("n_u"),
        )
    ).cast("double")
    pattern = F.concat(
        F.when(F.col("ag_lang") == 1, "A").otherwise("D"),
        F.when(F.col("ag_src") == 1, "A").otherwise("D"),
        F.when(F.col("ag_len") == 1, "A").otherwise("D"),
    )
    return joined.select(
        pattern.alias("pattern"),
        "ag_lang",
        "ag_src",
        "ag_len",
        "n_match",
        "n_nonmatch",
        weight.alias("fs_weight"),
    )


# ---------------------------------------------------------------------------
# Train/val/test near-dup leakage audit
# ---------------------------------------------------------------------------

_LEAK_ORACLE = rf"""
WITH {CC_EDGES_SQL_CTES}, all_pairs AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_a, doc_b FROM exact_pairs
), sp AS (
  SELECT doc_id,
         CASE WHEN {sql_knuth_bucket('doc_id', 100)} < 80 THEN 0
              WHEN {sql_knuth_bucket('doc_id', 100)} < 90 THEN 1
              ELSE 2 END AS r
  FROM documents
), j AS (
  SELECT LEAST(sa.r, sb.r) AS lo, GREATEST(sa.r, sb.r) AS hi
  FROM all_pairs p
  JOIN sp sa ON p.doc_a = sa.doc_id
  JOIN sp sb ON p.doc_b = sb.doc_id
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j
)
SELECT
  CASE lo WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_a,
  CASE hi WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split_b,
  CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
  CAST(CASE WHEN lo <> hi THEN 1 ELSE 0 END AS INTEGER) AS is_leak,
  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS share
FROM j CROSS JOIN tot t
GROUP BY lo, hi, t.n
"""


@register(
    "split_leakage_audit", oracle=_LEAK_ORACLE, tags=("llm", "dedup", "sample")
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage across the registered 80/10/10 Knuth
    split: the engine's full duplicate-pair set — LSH-verified
    J ≥ ½ pairs among exact-collapsed representatives PLUS
    (representative, copy) pairs for byte-identical duplicates (the
    same edge set dedup_connected_components closes over) — is
    crossed with each endpoint's split assignment, and pair counts
    are reported per unordered split pair with the leak flag and
    share. Any (train, val)/(train, test)/(val, test) row with
    n_dup_pairs > 0 is memorization leakage the per-split token
    stats cannot see; the fix (dedup BEFORE splitting, or split by
    near-dup COMPONENT rather than doc) is exactly what
    ``cc_canonical_selection`` implements.

    Determinism: split membership is the width-safe Knuth bucket
    (pure integer algebra); pair normalization LEAST/GREATEST on the
    integer split rank; counts exact; one ROUND-6 share division.

    Scale: the pair set is band-bucketed LSH output (never O(n²));
    split assignment is a pure projection joined at pair grain; the
    final agg is a ≤6-row frame with a singleton total broadcast.
    """
    # r13 (verdict task 3): the near and exact lineages share ONE
    # exact-dup collapse via _rep_frames — the old spelling re-scanned
    # documents and re-ran the text-grain groupBy that _rep_features
    # had already computed inside dedup_minhash_lsh (a duplicated
    # scan+aggregate subtree in this query's plan, bench top-3).
    rep, feats, exact = _rep_frames(spark, sf_dir)
    feats = feats.persist()
    near = dedup_minhash_lsh(spark, sf_dir, feats=feats).select(
        "doc_a", "doc_b"
    )
    all_pairs = near.unionByName(exact)
    sp = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(knuth_bucket("doc_id", 100) < 80, 0)
        .when(knuth_bucket("doc_id", 100) < 90, 1)
        .otherwise(2)
        .alias("r"),
    )
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("r").alias("ra"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("r").alias("rb"))
    j = (
        all_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("ra", "rb").alias("lo"), F.greatest("ra", "rb").alias("hi")
        )
    )
    grouped = j.groupBy("lo", "hi").agg(
        F.count("*").cast("long").alias("n_dup_pairs")
    )
    tot = grouped.agg(F.sum("n_dup_pairs").cast("long").alias("n"))
    name = lambda c: (  # noqa: E731
        F.when(F.col(c) == 0, "train").when(F.col(c) == 1, "val").otherwise("test")
    )
    return (
        grouped.crossJoin(F.broadcast(tot))
        .select(
            name("lo").alias("split_a"),
            name("hi").alias("split_b"),
            "n_dup_pairs",
            F.when(F.col("lo") != F.col("hi"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_leak"),
            F.round(
                F.col("n_dup_pairs").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("share"),
        )
    )
