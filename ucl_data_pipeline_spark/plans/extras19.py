"""Round-6 operators, third batch: Zipf rank-frequency slope, a
decision-tree feature-split finder (weighted Gini), mix-shift vs
within-segment drift decomposition, a MinHash-LSH precision/recall
gate against bounded exact ground truth, per-document n-gram novelty,
and a dictionary-encoding layout planner.

Registry conventions apply (decimal-exact aggregates, atomic output
columns, oracle dtype CASTs, ANSI-neutral arithmetic; transcendental
per-term values are ROUND-6-then-decimal-summed — the
``unigram_entropy`` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import (
    _SQL_BAND_CAND_CTES,
    _SQL_SHINGLES,
    _SQL_TOKS,
    lsh_candidate_pairs,
)
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (vocabulary power-law fit)
# ---------------------------------------------------------------------------

_ZIPF_TOP = 500

_ZIPF_ORACLE = rf"""
WITH tok AS (
  SELECT unnest({_SQL_TOKS}) AS tok FROM documents
),
cnt AS (
  SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk
  FROM cnt
  QUALIFY rnk <= {_ZIPF_TOP}
),
pts AS (
  SELECT CAST(ROUND(LN(rnk), 6) AS DECIMAL(18,6)) AS lx,
         CAST(ROUND(LN(c), 6) AS DECIMAL(18,6)) AS ly
  FROM ranked
),
m AS (
  SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
         SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(n * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6)
         AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / NULLIF(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
                * CAST(sx AS DOUBLE)) / n, 6) AS zipf_intercept
FROM m
"""


@register("zipf_vocab_slope", oracle=_ZIPF_ORACLE, tags=("llm", "text", "stats"))
def zipf_vocab_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the corpus vocabulary: OLS slope of
    ln(frequency) on ln(rank) over the top {N} tokens — natural text
    sits near −1; synthetic/templated corpora (like this fixture) and
    boilerplate-heavy crawls deviate sharply, making the slope a cheap
    corpus-health indicator alongside `unigram_entropy`. Ranking is a
    deterministic ROW_NUMBER over (freq DESC, token); the log points
    use the ROUND-6-then-decimal convention, and the 6dp-decimal
    moment products are exact at scale 12, so the OLS sums are
    bit-identical. The rank window runs over the top-{N} VOCABULARY
    slice, never rows — at 100 TB the token-count agg is the only
    fact-sized stage.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(TX.tokens("text")).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("c"))
    ranked = (
        cnt.select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= _ZIPF_TOP)
    )
    pts = ranked.select(
        F.round(F.log("rnk"), 6).cast("decimal(18,6)").alias("lx"),
        F.round(F.log("c"), 6).cast("decimal(18,6)").alias("ly"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / F.nullif(
        n * sxx - sx * sx, F.lit(0.0)
    )
    return m.select(
        n.cast("bigint").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# Decision-tree feature-split finder (weighted Gini over decile cuts)
# ---------------------------------------------------------------------------

_GINI_SPLIT_ORACLE = """
WITH labeled AS (
  SELECT o_totalprice AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
cuts AS (
  SELECT unnest(quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]))
    AS thr
  FROM labeled
),
cells AS (
  SELECT c.thr,
         SUM(CASE WHEN l.v <= c.thr THEN 1 ELSE 0 END) AS nl,
         SUM(CASE WHEN l.v <= c.thr AND l.y = 1 THEN 1 ELSE 0 END) AS pl,
         COUNT(*) AS n,
         SUM(l.y) AS p
  FROM labeled l CROSS JOIN cuts c
  GROUP BY c.thr
),
scored AS (
  SELECT thr, nl, n - nl AS nr,
         (nl * 1.0 / n) * (1.0 - (pl * 1.0 / NULLIF(nl, 0))
                               * (pl * 1.0 / NULLIF(nl, 0))
                         - (1.0 - pl * 1.0 / NULLIF(nl, 0))
                           * (1.0 - pl * 1.0 / NULLIF(nl, 0)))
         + ((n - nl) * 1.0 / n)
           * (1.0 - ((p - pl) * 1.0 / NULLIF(n - nl, 0))
                    * ((p - pl) * 1.0 / NULLIF(n - nl, 0))
              - (1.0 - (p - pl) * 1.0 / NULLIF(n - nl, 0))
                * (1.0 - (p - pl) * 1.0 / NULLIF(n - nl, 0))) AS g
  FROM cells
)
SELECT thr AS threshold,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right,
       ROUND(g, 6) AS gini_weighted,
       g = MIN(g) OVER () AS is_best
FROM scored
"""


def _decile_cuts_one_buffer(labeled: DataFrame, col: str) -> DataFrame:
    """The nine decile order statistics of ``col`` as a 1-column
    ``thr`` frame, from ONE percentile buffer instead of nine scalar
    percentile_disc aggregates — each scalar agg buffers and sorts the
    full column independently (the engine's documented
    percentile-buffer trap, registry.range_bucket docstring). The
    ARRAY form of percentile_disc shares one buffer across all nine
    fractions — the quality_filter_pipeline idiom (extras18) — with
    native discrete-percentile semantics; measured 2.44 s → 0.59 s at
    sf0.1 for identical outputs (and ~2× faster than a hand-rolled
    array_sort∘collect_list + rank-pick spelling).
    tests/test_round11.py pins the equivalence against the nine-agg
    spelling on adversarial row counts (1, 2, 3, 7, and 10-multiples)
    and the empty input (NULL cuts are filtered → empty cut table,
    matching the old spelling's empty crossJoin).

    Scale note: one task holds one sorted column buffer — the same
    single-buffer class as EACH scalar agg, 9× less of it. The query
    docstring documents the 100 TB path (value-grain histogram +
    cumulative cells).
    """
    fr = ",".join(f"{k / 10}D" for k in range(1, 10))
    return (
        labeled.agg(
            F.expr(
                f"percentile_disc(array({fr})) WITHIN GROUP (ORDER BY {col})"
            ).alias("__cuts")
        )
        .select(F.explode("__cuts").alias("thr"))
        .filter(F.col("thr").isNotNull())
    )


@register(
    "gini_impurity_feature_split",
    oracle=_GINI_SPLIT_ORACLE,
    tags=("stats", "agg"),
)
def gini_impurity_feature_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decision-tree split finder: weighted Gini impurity of the
    binary label (URGENT order or not) for each candidate threshold on
    the price feature — the inner loop of tree/GBDT training, here as
    a declarative plan. Candidates are the nine decile ORDER
    STATISTICS (percentile_disc — actual values, identical on both
    engines); every impurity is a fixed double expression over integer
    cell counts, NULLIF-guarded for empty sides; is_best compares
    UNROUNDED values so the winner can't disagree across engines. The
    fact table is scanned once against a 9-row broadcast cut table;
    at 100 TB the counts come from a (value-grain, label) histogram
    and each threshold reads cumulative cells — same math, no 9×
    fan-out.

    The nine cuts come from ONE shared percentile buffer (the ARRAY
    form of percentile_disc, ``_decile_cuts_one_buffer``), not nine
    scalar percentile_disc aggregates — each of those buffers and
    sorts the FULL column independently (the engine's documented
    percentile-buffer trap, registry.range_bucket docstring);
    measured 2.44 s → 0.59 s for the cut stage at sf0.1 for identical
    outputs (query 5.35 s → 1.10 s).
    """
    o = read_table(spark, sf_dir, "orders")
    labeled = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    cuts = _decile_cuts_one_buffer(labeled, "v")
    cells = (
        labeled.crossJoin(F.broadcast(cuts))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("v") <= F.col("thr"), 1).otherwise(0)).alias(
                "nl"
            ),
            F.sum(
                F.when(
                    (F.col("v") <= F.col("thr")) & (F.col("y") == 1), 1
                ).otherwise(0)
            ).alias("pl"),
            F.count("*").alias("n"),
            F.sum("y").alias("p"),
        )
    )
    nl, pl = F.col("nl"), F.col("pl")
    n, p = F.col("n"), F.col("p")
    nr, pr_ = n - nl, p - pl
    pl_rate = pl * 1.0 / F.nullif(nl, F.lit(0))
    pr_rate = pr_ * 1.0 / F.nullif(nr, F.lit(0))
    g = (nl * 1.0 / n) * (
        1.0 - pl_rate * pl_rate - (1.0 - pl_rate) * (1.0 - pl_rate)
    ) + (nr * 1.0 / n) * (
        1.0 - pr_rate * pr_rate - (1.0 - pr_rate) * (1.0 - pr_rate)
    )
    scored = cells.select(
        F.col("thr").alias("threshold"),
        nl.cast("bigint").alias("n_left"),
        nr.cast("bigint").alias("n_right"),
        g.alias("_g"),
    )
    return scored.select(
        "threshold",
        "n_left",
        "n_right",
        F.round(F.col("_g"), 6).alias("gini_weighted"),
        (F.col("_g") == F.min("_g").over(Window.partitionBy())).alias(
            "is_best"
        ),
    )


# ---------------------------------------------------------------------------
# Mix-shift vs within-segment drift decomposition (Oaxaca-style)
# ---------------------------------------------------------------------------

_DRIFT_DECOMP_ORACLE = """
WITH seg AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN o.o_orderdate >= TIMESTAMP '1995-01-01' THEN 1 ELSE 0 END
           AS post,
         COUNT(*) AS n,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS mean_v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT post, SUM(n) AS np FROM seg GROUP BY post
),
wide AS (
  SELECT s.segment,
         MAX(CASE WHEN s.post = 0 THEN s.n * 1.0 / t.np END) AS share_pre,
         MAX(CASE WHEN s.post = 1 THEN s.n * 1.0 / t.np END) AS share_post,
         MAX(CASE WHEN s.post = 0 THEN s.mean_v END) AS mean_pre,
         MAX(CASE WHEN s.post = 1 THEN s.mean_v END) AS mean_post
  FROM seg s JOIN tot t USING (post)
  GROUP BY s.segment
)
SELECT segment,
       ROUND(share_pre, 6) AS share_pre,
       ROUND(share_post, 6) AS share_post,
       ROUND(mean_pre, 6) AS mean_pre,
       ROUND(mean_post, 6) AS mean_post,
       ROUND((share_post - share_pre) * mean_pre, 6) AS mix_contrib,
       ROUND(share_post * (mean_post - mean_pre), 6) AS within_contrib
FROM wide
"""


@register(
    "segment_drift_decomposition",
    oracle=_DRIFT_DECOMP_ORACLE,
    tags=("stats", "agg"),
)
def segment_drift_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oaxaca-style decomposition of the period-over-period change in
    mean order value into per-segment MIX SHIFT (composition moved:
    (share_post − share_pre)·mean_pre) and WITHIN-SEGMENT change
    (share_post·(mean_post − mean_pre)) — the drift report that tells
    you whether the metric moved because segments changed size or
    because behavior changed inside them; the two contribution columns
    sum exactly to the overall Δmean. Segment-period means use the
    exact-decimal convention and shares are integer ratios, so every
    output is a deterministic double. One broadcast dim join + two
    segment-grain aggs.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    seg = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.when(
                F.col("o_orderdate")
                >= F.lit("1995-01-01").cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("post"),
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("mean_v"),
        )
    )
    tot = seg.groupBy("post").agg(F.sum("n").alias("np"))
    joined = seg.join(F.broadcast(tot), "post")

    def side(post: int, expr):
        return F.max(F.when(F.col("post") == post, expr))

    wide = joined.groupBy("segment").agg(
        side(0, F.col("n") * 1.0 / F.col("np")).alias("share_pre"),
        side(1, F.col("n") * 1.0 / F.col("np")).alias("share_post"),
        side(0, F.col("mean_v")).alias("mean_pre"),
        side(1, F.col("mean_v")).alias("mean_post"),
    )
    return wide.select(
        "segment",
        F.round("share_pre", 6).alias("share_pre"),
        F.round("share_post", 6).alias("share_post"),
        F.round("mean_pre", 6).alias("mean_pre"),
        F.round("mean_post", 6).alias("mean_post"),
        F.round(
            (F.col("share_post") - F.col("share_pre")) * F.col("mean_pre"),
            6,
        ).alias("mix_contrib"),
        F.round(
            F.col("share_post") * (F.col("mean_post") - F.col("mean_pre")),
            6,
        ).alias("within_contrib"),
    )


# ---------------------------------------------------------------------------
# MinHash-LSH precision/recall gate vs bounded exact ground truth
# ---------------------------------------------------------------------------

_PR_SUBSET = 500  # doc_id ceiling: bounds the exact-truth computation
_PR_JACCARD = 0.5

_MINHASH_PR_ORACLE = rf"""
WITH sub AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_PR_SUBSET}
), tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM sub
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), gram AS (
  SELECT DISTINCT doc_id, unnest(feats) AS g FROM feat
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM gram GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM gram a JOIN gram b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.i * 1.0 / (sa.sz + sb.sz - i.i) >= {_PR_JACCARD}
), {_SQL_BAND_CAND_CTES}, joined AS (
  SELECT COALESCE(c.doc_a, t.doc_a) AS doc_a,
         c.doc_a IS NOT NULL AS in_cand,
         t.doc_a IS NOT NULL AS in_truth
  FROM cand c
  FULL OUTER JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
)
SELECT CAST(SUM(CASE WHEN in_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
       CAST(SUM(CASE WHEN in_cand AND in_truth THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       ROUND(SUM(CASE WHEN in_cand AND in_truth THEN 1 ELSE 0 END) * 1.0
             / NULLIF(SUM(CASE WHEN in_cand THEN 1 ELSE 0 END), 0), 6)
         AS precision,
       ROUND(SUM(CASE WHEN in_cand AND in_truth THEN 1 ELSE 0 END) * 1.0
             / NULLIF(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END), 0), 6)
         AS recall
FROM joined
"""


@register(
    "dedup_minhash_pr", oracle=_MINHASH_PR_ORACLE, tags=("dedup", "llm", "gate")
)
def dedup_minhash_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall gate for the MinHash-LSH candidate generator
    against EXACT ground truth (shingle-Jaccard ≥ {J}) on a bounded
    doc_id < {S} subset — the quality number that justifies banding
    parameters (3 bands × 2 rows here): recall is the probability a
    true near-dup pair lands in ≥1 shared bucket, precision is the
    verification workload's hit rate. The truth side never does an
    unbounded all-pairs pass: it is an inverted-index self-join WITHIN
    the literal subset (any pair at Jaccard ≥ {J} shares a shingle, so
    the index join loses no truth pairs), mirroring the bounded-audit
    pattern of `minhash_jaccard_error`. Complements that error audit:
    this grades the CANDIDATE SET itself, not the estimator values.
    """
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PR_SUBSET)
        .select("doc_id", "text")
    )
    feats = d.select(
        "doc_id", TX.shingles(TX.tokens("text")).alias("feats")
    ).persist()
    gram = feats.select(
        "doc_id", F.explode("feats").alias("g")
    ).distinct()
    sizes = gram.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = gram.select(F.col("doc_id").alias("doc_a"), "g")
    gb = gram.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        ga.join(gb, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb"))
    truth = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("i") * 1.0 / (F.col("sa") + F.col("sb") - F.col("i"))
            >= _PR_JACCARD
        )
        .select("doc_a", "doc_b")
    )
    cand = lsh_candidate_pairs(feats)
    joined = cand.withColumn("in_cand", F.lit(True)).join(
        truth.withColumn("in_truth", F.lit(True)),
        ["doc_a", "doc_b"],
        "full_outer",
    )
    hit = F.sum(
        F.when(
            F.col("in_cand").isNotNull() & F.col("in_truth").isNotNull(), 1
        ).otherwise(0)
    )
    nc = F.sum(F.when(F.col("in_cand").isNotNull(), 1).otherwise(0))
    nt = F.sum(F.when(F.col("in_truth").isNotNull(), 1).otherwise(0))
    return joined.agg(
        nc.cast("bigint").alias("n_candidates"),
        nt.cast("bigint").alias("n_truth"),
        hit.cast("bigint").alias("n_hit"),
        F.round(hit * 1.0 / F.nullif(nc, F.lit(0)), 6).alias("precision"),
        F.round(hit * 1.0 / F.nullif(nt, F.lit(0)), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Per-document n-gram novelty (unique-content fraction)
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), gram AS (
  SELECT DISTINCT doc_id, unnest(feats) AS g FROM feat
), df AS (
  SELECT g, COUNT(*) AS gdf FROM gram GROUP BY g
)
SELECT gram.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df.gdf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(SUM(CASE WHEN df.gdf = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*),
             6) AS novelty_rate
FROM gram JOIN df USING (g)
GROUP BY gram.doc_id
"""


@register(
    "ngram_novelty_rate", oracle=_NOVELTY_ORACLE, tags=("llm", "text", "dedup")
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-gram
    shingles that occur in NO other document (corpus document
    frequency = 1) — the inverse view of `dup_span_fraction`: near-0
    novelty means the doc is assembled from corpus-common text
    (boilerplate/mirror), near-1 means unique content worth keeping
    at dedup time. Shape: scan-side shingling, one shingle-DF
    hash-agg, one join back, one per-doc agg — the same
    two-shuffle-regardless-of-dup-rate profile as dup_span_fraction,
    no pairwise stage. Both shuffles (the distinct and the DF
    hash-agg + join-back) are keyed on the 64-bit xxhash64 digest of
    the shingle, computed scan-side BEFORE the explode's output ever
    hits a shuffle — a raw 3-gram string averages ~20-30 bytes vs 8
    for the digest, so digest keys cut shuffle bytes ~3-5× and make
    the sort/agg comparisons fixed-width. The digest only renames the
    grouping key (the output is per-doc counts, never the shingles
    themselves), so results differ from the string spelling only on a
    64-bit collision — probability ~n²/2⁶⁵, negligible at any SF the
    oracle runs at; the DuckDB oracle keeps raw strings on the bounded
    fixture, which is exactly the collision check.
    """
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    gram = (
        d.select(
            "doc_id",
            F.explode(TX.shingles(TX.tokens("text"))).alias("g"),
        )
        .select("doc_id", F.xxhash64("g").alias("g"))
        .distinct()
    )
    df = gram.groupBy("g").agg(F.count("*").alias("gdf"))
    return (
        gram.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("gdf") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("gdf") == 1, 1).otherwise(0))
                * 1.0
                / F.count("*"),
                6,
            ).alias("novelty_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Dictionary-encoding layout planner (per-column NDV/size audit)
# ---------------------------------------------------------------------------

_DICT_PLAN_ORACLE = """
WITH unp AS (
  SELECT 'p_brand' AS col, p_brand AS v FROM part
  UNION ALL SELECT 'p_type', p_type FROM part
  UNION ALL SELECT 'p_name', p_name FROM part
),
per_val AS (
  SELECT col, v, COUNT(*) AS c, LENGTH(v) AS len FROM unp GROUP BY col, v
)
SELECT col,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS ndv,
       ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_share,
       CAST(SUM(c * len) AS BIGINT) AS plain_bytes,
       CAST(SUM(len) + 2 * SUM(c) AS BIGINT) AS dict_bytes,
       SUM(len) + 2 * SUM(c) < SUM(c * len) AS dict_recommended
FROM per_val
GROUP BY col
"""


@register(
    "dictionary_encoding_planner",
    oracle=_DICT_PLAN_ORACLE,
    tags=("layout", "scale"),
)
def dictionary_encoding_planner(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dictionary-encoding planner for string columns: per column, the
    NDV, the heaviest value's share, and the estimated plain vs
    dictionary-encoded byte footprint (distinct-value bytes + 2-byte
    codes) — the decision input a columnar writer uses to pick
    encodings (parquet falls back to plain when the dictionary page
    overflows; knowing NDV up front avoids the mid-write fallback).
    p_brand (25 values) recommends dict, p_name (near-unique) does
    not — the planner demonstrably discriminates. One stack unpivot
    into a (col, value)-grain hash-agg, then a column-grain rollup:
    both map-side combinable, cost independent of which columns win.
    """
    p = read_table(spark, sf_dir, "part")
    unp = p.select(
        F.expr(
            "stack(3, 'p_brand', p_brand, 'p_type', p_type, "
            "'p_name', p_name) AS (col, v)"
        )
    )
    per_val = unp.groupBy("col", "v").agg(F.count("*").alias("c")).select(
        "col", "v", "c", F.length("v").alias("len")
    )
    return per_val.groupBy("col").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("ndv"),
        F.round(F.max("c") * 1.0 / F.sum("c"), 6).alias("top_share"),
        F.sum(F.col("c") * F.col("len")).cast("bigint").alias("plain_bytes"),
        (F.sum("len") + 2 * F.sum("c")).cast("bigint").alias("dict_bytes"),
        ((F.sum("len") + 2 * F.sum("c")) < F.sum(F.col("c") * F.col("len")))
        .alias("dict_recommended"),
    )
