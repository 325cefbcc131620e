"""Round-8 batch 8: near-dup refinement and curation fairness —

- ``reciprocal_best_match``: mutual-best-match (reciprocal nearest
  neighbor) pruning over the shared LSH candidate generator — the
  entity-resolution step that turns a candidate SOUP into 1:1 link
  decisions: a pair survives only if each side is the other's
  highest-Jaccard partner. The classic record-linkage/bitext-mining
  filter (and the RBM step in image-matching pipelines), here as one
  window argmax per direction over the candidate set.
- ``bag_jaccard_pairs``: MULTISET (weighted) token Jaccard
  Σ min(c_a,c_b) / Σ max(c_a,c_b) next to plain set Jaccard for the
  same LSH candidates — repetition-aware overlap (a doc that repeats
  one paragraph 10× is near-identical to the single-paragraph doc
  under set Jaccard but not under bag Jaccard). Token keys shuffle as
  xxhash64 digests engine-side; the raw-string-keyed oracle is the
  collision check (llm_ops band-key discipline).
- ``quality_gate_disparity``: the four-fifths (80%) disparate-impact
  rule applied to the curation quality gate, per language, at TWO
  thresholds — the registered curation gate (extras21's
  _CUR_Q_THRESH) and a stricter candidate gate 0.6 — pass rate,
  impact ratio vs the highest-passing language, and the flag. The
  companion decision audit to auc_quality_langid: AUC says the score
  CAN discriminate language; this says whether the deployed gate
  DOES, and whether tightening it would.

Registry conventions: Jaccards are single divisions of exact BIGINT
counts (ROUND 6 at output only, comparisons/argmaxes on the exact
doubles); window tie-breaks pinned (similarity DESC, partner id ASC);
pass rates and impact ratios are divisions of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.extras21 import _CUR_Q_THRESH
from ucl_data_pipeline_spark.plans.llm_ops import (
    _QUALITY_ORACLE,
    _SQL_BAND_CAND_CTES,
    _SQL_SHINGLES,
    _SQL_TOKS,
    _rep_features,
    lsh_candidate_pairs,
    text_quality_score,
)
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import fan_out, read_table, stats_barrier

# ---------------------------------------------------------------------------
# Reciprocal best match (mutual-NN link pruning)
# ---------------------------------------------------------------------------

_RBM_ORACLE = rf"""
WITH rep AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
), tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM rep
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), {_SQL_BAND_CAND_CTES}, scored AS (
  SELECT
    c.doc_a, c.doc_b,
    CAST(len(list_filter(fa.feats, x -> list_contains(fb.feats, x))) AS DOUBLE)
      / CAST(len(fa.feats) + len(fb.feats)
             - len(list_filter(fa.feats, x -> list_contains(fb.feats, x)))
             AS DOUBLE) AS jaccard
  FROM cand c
  JOIN feat fa ON c.doc_a = fa.doc_id
  JOIN feat fb ON c.doc_b = fb.doc_id
), sym AS (
  SELECT doc_a AS doc, doc_b AS partner, jaccard FROM scored
  UNION ALL
  SELECT doc_b, doc_a, jaccard FROM scored
), best AS (
  SELECT doc, partner, jaccard FROM sym
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc
                             ORDER BY jaccard DESC, partner) = 1
)
SELECT x.doc AS doc_a, x.partner AS doc_b, ROUND(x.jaccard, 6) AS jaccard
FROM best x JOIN best y ON y.doc = x.partner AND y.partner = x.doc
WHERE x.doc < x.partner
"""


@register("reciprocal_best_match", oracle=_RBM_ORACLE, tags=("dedup", "llm"))
def reciprocal_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best-match pairs over the engine's shared LSH
    candidate generator (lsh_candidate_pairs — same banding as
    dedup_minhash_lsh / dedup_minhash_pr): score every candidate by
    exact shingle Jaccard, take each document's best partner
    (jaccard DESC, partner id ASC — a deterministic total order since
    Jaccards are exact-integer ratios), and keep pairs where the
    choice is MUTUAL. This is the 1:1 link-decision step of entity
    resolution: it prunes asymmetric hub attractions (a boilerplate
    doc that is everyone's best match but reciprocates only one).

    Scale: candidates are band-bucketed (never O(n²)); scoring
    re-fetches only candidate docs' features (hash array_intersect —
    O(|A|+|B|) codegen, not an interpreted lambda); the argmax windows
    partition by doc_id with bucket-bounded fan-in; the mutuality
    check is a self-equi-join of the (doc → best partner) frame on the
    reversed key — node-sized, not pair-sized.
    """
    feats = _rep_features(spark, sf_dir).persist()
    cand = lsh_candidate_pairs(feats)
    # stats-barriered (r13, replacing the r12 merge hints): fa/fb carry
    # corpus-sized feature arrays the static planner would broadcast on
    # a Generate-blind estimate (the ×100-smoke class — see
    # dedup_minhash_lsh/extras9); the barrier keeps the static plan SMJ
    # and re-enables AQE's size-measured runtime BHJ conversion.
    fsrc = stats_barrier(feats)
    fa = fsrc.select(F.col("doc_id").alias("doc_a"), F.col("feats").alias("fa"))
    fb = fsrc.select(F.col("doc_id").alias("doc_b"), F.col("feats").alias("fb"))
    inter = F.size(F.array_intersect("fa", "fb"))
    union = F.size("fa") + F.size("fb") - inter
    scored = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        # consumed twice (once per direction of sym): persist so the
        # banding + scoring lineage runs once, not once per branch
        .persist()
    )
    sym = scored.select(
        F.col("doc_a").alias("doc"), F.col("doc_b").alias("partner"), "jaccard"
    ).unionAll(
        scored.select(
            F.col("doc_b").alias("doc"), F.col("doc_a").alias("partner"), "jaccard"
        )
    )
    w = Window.partitionBy("doc").orderBy(F.desc("jaccard"), "partner")
    best = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc", "partner", "jaccard")
        # consumed twice (forward + reversed side of the mutuality
        # join): persist the node-sized frame
        .persist()
    )
    bsrc = stats_barrier(best)
    rev = bsrc.select(
        F.col("doc").alias("partner"), F.col("partner").alias("doc")
    )
    return (
        # stats-barriered: both sides are the node-sized best-partner
        # frame (corpus-growing; same Generate-blind estimate class).
        bsrc.join(rev, ["doc", "partner"])
        .filter(F.col("doc") < F.col("partner"))
        .select(
            F.col("doc").alias("doc_a"),
            F.col("partner").alias("doc_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Bag (multiset) Jaccard next to set Jaccard for LSH candidates
# ---------------------------------------------------------------------------

_BAG_JACCARD_ORACLE = rf"""
WITH rep AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
), tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM rep
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), {_SQL_BAND_CAND_CTES}, tc AS (
  SELECT doc_id, t AS tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
  GROUP BY doc_id, t
), sizes AS (
  SELECT doc_id, SUM(c) AS n_bag, COUNT(*) AS n_set FROM tc GROUP BY doc_id
), shared AS (
  SELECT c.doc_a, c.doc_b,
         SUM(LEAST(ta.c, tb.c)) AS s_min,
         COUNT(*) AS inter_set
  FROM cand c
  JOIN tc ta ON ta.doc_id = c.doc_a
  JOIN tc tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b
)
SELECT s.doc_a, s.doc_b,
       ROUND(CAST(s.s_min AS DOUBLE)
             / CAST(sa.n_bag + sb.n_bag - s.s_min AS DOUBLE), 6)
         AS bag_jaccard,
       ROUND(CAST(s.inter_set AS DOUBLE)
             / CAST(sa.n_set + sb.n_set - s.inter_set AS DOUBLE), 6)
         AS set_jaccard
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
"""


@register("bag_jaccard_pairs", oracle=_BAG_JACCARD_ORACLE, tags=("dedup", "llm"))
def bag_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) token Jaccard Σmin/Σmax next to plain set
    Jaccard for the shared LSH candidate pairs — repetition-aware
    similarity (Σmax = |A|+|B|−Σmin over token COUNTS), the overlap
    measure that separates 'same content' from 'same content repeated
    10×', which set semantics cannot see. Pairs with bag ≪ set are
    exactly the internally-repetitive docs the repetition_score
    operator flags doc-wise.

    Scale: candidates from the band-bucketed generator (never O(n²));
    per-doc token counts are one hash-agg; the pair scoring joins
    candidate×token-count frames keyed on (doc, 8-byte xxhash64 token
    digest) — equality keys only, never output, so they shuffle as
    digests (llm_ops band-key discipline); the raw-string-keyed
    DuckDB oracle is the collision check. Bag/set sizes are doc-grain
    broadcast-able side frames.
    """
    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    rep = d.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    feats = _rep_features(spark, sf_dir).persist()
    cand = lsh_candidate_pairs(feats)
    tc = (
        rep.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("doc_id", F.xxhash64("tok").alias("tokd"))
        .agg(F.count("*").alias("c"))
    ).persist()
    sizes = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bag"), F.count("*").alias("n_set")
    )
    # stats-barriered (r13, replacing the r12 merge hints): ta/tb are
    # corpus-sized exploded token-count frames the static planner would
    # broadcast on Generate-blind estimates (the ×100-smoke class — see
    # extras9/llm_ops); static stays SMJ, AQE runtime conversion free.
    tsrc = stats_barrier(tc)
    ta = tsrc.select(
        F.col("doc_id").alias("doc_a"), "tokd", F.col("c").alias("ca")
    )
    tb = tsrc.select(
        F.col("doc_id").alias("doc_b"), "tokd", F.col("c").alias("cb")
    )
    shared = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tokd"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.least("ca", "cb")).alias("s_min"),
            F.count("*").alias("inter_set"),
        )
    )
    # stats-barriered: sa/sb are doc-grain (corpus-growing) size
    # tables — same class as above.
    zsrc = stats_barrier(sizes)
    sa = zsrc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_bag").alias("na_bag"),
        F.col("n_set").alias("na_set"),
    )
    sb = zsrc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_bag").alias("nb_bag"),
        F.col("n_set").alias("nb_set"),
    )
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("s_min").cast("double")
                / (F.col("na_bag") + F.col("nb_bag") - F.col("s_min")).cast(
                    "double"
                ),
                6,
            ).alias("bag_jaccard"),
            F.round(
                F.col("inter_set").cast("double")
                / (
                    F.col("na_set") + F.col("nb_set") - F.col("inter_set")
                ).cast("double"),
                6,
            ).alias("set_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Four-fifths-rule disparity audit of the quality gate
# ---------------------------------------------------------------------------

_DISP_STRICT = 0.6
_FOUR_FIFTHS = 0.8

_DISPARITY_ORACLE = f"""
WITH q AS (
  SELECT doc_id, quality_score FROM ({_QUALITY_ORACLE})
  WHERE quality_score IS NOT NULL
), labeled AS (
  SELECT d.lang, q.quality_score
  FROM q JOIN documents d USING (doc_id)
), thresholds(threshold) AS (
  -- CAST: DuckDB types bare VALUES literals DECIMAL; Spark's frame
  -- carries DOUBLE and the driver hashes the column's bits
  VALUES (CAST({_CUR_Q_THRESH} AS DOUBLE)), (CAST({_DISP_STRICT} AS DOUBLE))
), rates AS (
  SELECT t.threshold, l.lang,
         COUNT(*) AS n_docs,
         SUM(CASE WHEN l.quality_score >= t.threshold THEN 1 ELSE 0 END)
           AS n_pass
  FROM labeled l CROSS JOIN thresholds t
  GROUP BY t.threshold, l.lang
), mx AS (
  SELECT threshold,
         MAX(CAST(n_pass AS DOUBLE) / n_docs) AS max_rate
  FROM rates GROUP BY threshold
)
SELECT r.threshold, r.lang,
       CAST(r.n_docs AS BIGINT) AS n_docs,
       CAST(r.n_pass AS BIGINT) AS n_pass,
       ROUND(CAST(r.n_pass AS DOUBLE) / r.n_docs, 6) AS pass_rate,
       ROUND(CAST(r.n_pass AS DOUBLE) / r.n_docs / m.max_rate, 6)
         AS impact_ratio,
       (CAST(r.n_pass AS DOUBLE) / r.n_docs / m.max_rate)
         < {_FOUR_FIFTHS} AS below_four_fifths
FROM rates r JOIN mx m USING (threshold)
"""


@register(
    "quality_gate_disparity",
    oracle=_DISPARITY_ORACLE,
    tags=("llm", "validate", "stats"),
)
def quality_gate_disparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-fifths-rule disparate-impact audit of the quality gate by
    language, at the REGISTERED curation threshold (extras21's
    _CUR_Q_THRESH=0.48, IMPORTED so the audit can never drift from
    the gate it audits) and at a stricter candidate 0.6: per (threshold,
    lang) — docs, passes, pass rate, impact ratio vs the
    highest-passing language, and the <0.8 flag. At 0.48 the corpus
    passes the rule; at 0.6 the de rate collapses (≈4% vs ≈19% for
    fr) — the audit shows the PROPOSED tightening, not the current
    gate, is what would turn the quality filter into a language
    filter (the decision-level companion to auc_quality_langid's
    score-level AUC).

    Determinism: rates and ratios are divisions of exact counts in
    fixed order; the max rate over the bounded language domain
    compares identical doubles on both engines.

    Scale: one doc-grain scan crossed with the 2-row threshold frame
    (broadcast), one hash-agg at (threshold × lang) grain — bounded —
    and a broadcast max-rate join. Constant-size output.
    """
    q = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "quality_score")
        .filter(F.col("quality_score").isNotNull())
    )
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    labeled = q.join(d, "doc_id")
    thresholds = F.broadcast(
        labeled.sparkSession.createDataFrame(
            [(float(_CUR_Q_THRESH),), (float(_DISP_STRICT),)], ["threshold"]
        )
    )
    rates = (
        labeled.crossJoin(thresholds)
        .groupBy("threshold", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("quality_score") >= F.col("threshold")).cast("int")
            ).alias("n_pass"),
        )
    )
    rate = F.col("n_pass").cast("double") / F.col("n_docs")
    mx = rates.groupBy("threshold").agg(F.max(rate).alias("max_rate"))
    return rates.join(F.broadcast(mx), "threshold").select(
        "threshold",
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_pass").cast("bigint").alias("n_pass"),
        F.round(rate, 6).alias("pass_rate"),
        F.round(rate / F.col("max_rate"), 6).alias("impact_ratio"),
        (rate / F.col("max_rate") < _FOUR_FIFTHS).alias("below_four_fifths"),
    )
