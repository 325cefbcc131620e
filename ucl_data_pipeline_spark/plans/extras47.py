"""Round-8 batch 14: semantic dedup pruning, differential-privacy
sensitivity auditing, and the second classic lexical ranker —

- ``semdedup_cluster_prune``: SemDeDup (Abbas et al., 2023) — cluster
  the embedding space, find intra-cluster near-duplicate pairs, and
  prune each pair's member CLOSEST to the cluster centroid (keeping
  the farthest preserves cluster diversity — the paper's key twist on
  keep-lowest-id dedup). Built from the engine's registered pieces:
  the kmeans seed-center assignment (clustering.py), the adaptive
  sign-bucket candidate generator and seeded near-dup universe
  (dedup_embedding_cosine), exact-cosine verification.
- ``dp_sensitivity_audit``: the pre-release audit a differential-
  privacy aggregation pipeline runs FIRST — per event type, the
  distribution of per-user contributions (count and value mass), the
  P99 clipping bound, and the exact fraction of mass the clip would
  discard. The L1/L2 sensitivity of an unclipped release is the MAX
  user contribution; clipping at a quantile bounds sensitivity with
  quantified bias. Completes the privacy family (k-anonymity,
  l-diversity, t-closeness) with the DP-side primitive.
- ``query_likelihood_dirichlet``: the query-likelihood language-model
  ranker with Dirichlet smoothing (Zhai & Lafferty 2001) for the same
  fixed query BM25 ranks — score(d) = Σ_t log₂((tf + μ·p(t|C)) /
  (|d| + μ)), μ = {mu}. The OTHER classic lexical ranker; smoothed
  probabilities mean absent terms still contribute, so the two
  rankers disagree exactly where document length and collection
  frequency trade off differently.

Registry conventions (plans/registry.py): exact BIGINT counts;
per-term double scores ROUND-12 → DECIMAL(38,12) sums (the BM25
pattern); percentile_disc for clip bounds (actual data values);
decimal money end-to-end in the clip-mass fractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.plans.clustering import (
    K,
    _centers_lit,
    _dists,
    _seed_centers,
)
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_COS, _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import fan_out, read_table

# ---------------------------------------------------------------------------
# SemDeDup: cluster, find near-dups, prune the centroid-closest member
# ---------------------------------------------------------------------------

_SEM_THETA = 0.9

_SEMDEDUP_ORACLE = f"""
WITH universe AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.5)
  FROM embeddings WHERE vec_id % 10 = 0
), cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < {K}
), dist AS (
  SELECT u.vec_id, u.embedding, c.cid,
         list_reduce(
           list_prepend(0.0,
             list_transform(generate_series(1, len(u.embedding)),
               i -> (u.embedding[i] - c.cvec[i]) * (u.embedding[i] - c.cvec[i]))),
           (a, b) -> a + b) AS d2
  FROM universe u CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, embedding, cid
  FROM dist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
), nbu AS (
  SELECT {VX.sql_nbits_for_count('COUNT(*)')} AS nbits FROM universe
), withsim AS (
  SELECT a.vec_id, a.embedding, a.cid,
         {VX.sql_adaptive_sign_bucket('a.embedding')} AS bucket,
         list_dot_product(a.embedding, c.cvec)
           / nullif(sqrt(list_dot_product(a.embedding, a.embedding))
                    * sqrt(list_dot_product(c.cvec, c.cvec)), 0.0) AS csim
  FROM assigned a JOIN cent c ON a.cid = c.cid, nbu
), pairs AS (
  SELECT q.cid,
         CASE WHEN q.csim > c.csim THEN q.vec_id
              WHEN q.csim < c.csim THEN c.vec_id
              ELSE GREATEST(q.vec_id, c.vec_id) END AS pruned_id
  FROM withsim q
  JOIN withsim c
    ON q.cid = c.cid AND q.bucket = c.bucket AND q.vec_id < c.vec_id
  WHERE {_SQL_COS} > {_SEM_THETA}
), per_cluster AS (
  SELECT cid,
         CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
         CAST(COUNT(DISTINCT pruned_id) AS BIGINT) AS n_pruned
  FROM pairs GROUP BY cid
), sizes AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points FROM assigned GROUP BY cid
)
SELECT CAST(s.cid AS INTEGER) AS cluster_id, s.n_points,
       COALESCE(p.n_dup_pairs, 0) AS n_dup_pairs,
       COALESCE(p.n_pruned, 0) AS n_pruned,
       ROUND(CAST(COALESCE(p.n_pruned, 0) AS DOUBLE)
             / CAST(s.n_points AS DOUBLE), 6) AS prune_rate
FROM sizes s LEFT JOIN per_cluster p ON s.cid = p.cid
"""


@register(
    "semdedup_cluster_prune",
    oracle=_SEMDEDUP_ORACLE,
    tags=("dedup", "vector", "llm"),
)
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the seeded near-dup universe (the
    dedup_embedding_cosine fixture — scaled copies of every 10th
    vector, cosine ≈ 1 to their originals): assign every vector to
    its nearest kmeans seed center (the registered literal-center
    argmin), generate intra-cluster candidates through the adaptive
    sign-bucket LSH, verify exact cosine > {t}, and prune each
    verified pair's member with the HIGHER cosine to its cluster
    centroid (keep-farthest — the diversity-preserving rule that
    distinguishes SemDeDup from keep-lowest-id; ties prune the larger
    id). Per cluster: size, dup pairs, pruned count, prune rate.

    Determinism: assignment argmin is the kmeans fold (sequential
    IEEE, ties to lowest center id); centroid similarities are exact
    doubles against LITERAL centers; the prune decision compares two
    such doubles with an id tie-break; counts exact.

    Scale: the SemDeDup paper's pipeline shape exactly — cluster
    assignment is a narrow projection against k×dim literal centers
    (no shuffle), candidates are (cluster, sign-bucket) equi-join
    buckets (never O(n²) — same candidate discipline as the dedup
    family), verification touches only candidates, and the prune
    aggregation is cluster-grain.
    """
    base = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double("embedding").alias("embedding")
    )
    copies = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.5).alias("embedding"),
    )
    e = base.unionByName(copies)
    centers = _seed_centers(
        read_table(spark, sf_dir, "embeddings").select(
            "vec_id", VX.as_double("embedding").alias("embedding")
        )
    )
    d = _dists(centers)
    assigned = e.select(
        "vec_id",
        "embedding",
        (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cid"),
    )
    nb = e.agg(VX.nbits_for_count(F.count("*")).alias("nbits"))
    cvec = F.element_at(_centers_lit(centers), F.col("cid") + 1)
    withsim = (
        assigned.crossJoin(F.broadcast(nb))
        .select(
            "vec_id",
            "embedding",
            "cid",
            VX.adaptive_sign_bucket("embedding", F.col("nbits")).alias("bucket"),
            VX.cosine(F.col("embedding"), cvec).alias("csim"),
        )
        # consumed by both sides of the candidate self-join
        .localCheckpoint()
    )
    q = withsim.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cid").alias("q_cid"),
        F.col("bucket").alias("q_bucket"),
        F.col("csim").alias("q_csim"),
    )
    c = withsim.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("cid").alias("c_cid"),
        F.col("bucket").alias("c_bucket"),
        F.col("csim").alias("c_csim"),
    )
    pruned_id = (
        F.when(F.col("q_csim") > F.col("c_csim"), F.col("q_id"))
        .when(F.col("q_csim") < F.col("c_csim"), F.col("c_id"))
        .otherwise(F.greatest("q_id", "c_id"))
    )
    pairs = (
        q.join(
            c,
            (F.col("q_cid") == F.col("c_cid"))
            & (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("q_id") < F.col("c_id")),
        )
        .filter(VX.cosine("q_emb", "c_emb") > _SEM_THETA)
        .select(F.col("q_cid").alias("cid"), pruned_id.alias("pruned_id"))
    )
    per_cluster = pairs.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_dup_pairs"),
        F.countDistinct("pruned_id").cast("long").alias("n_pruned"),
    )
    sizes = assigned.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_points")
    )
    return (
        sizes.join(F.broadcast(per_cluster), "cid", "left")
        .select(
            F.col("cid").cast("int").alias("cluster_id"),
            "n_points",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce("n_pruned", F.lit(0)).cast("long").alias("n_pruned"),
            F.round(
                F.coalesce("n_pruned", F.lit(0)).cast("double")
                / F.col("n_points").cast("double"),
                6,
            ).alias("prune_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Differential-privacy sensitivity audit
# ---------------------------------------------------------------------------

_DP_ORACLE = """
WITH contrib AS (
  SELECT event_type, user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(value AS DECIMAL(18,2))) AS v_sum
  FROM events GROUP BY event_type, user_id
), cuts AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         MAX(n_events) AS max_count,
         percentile_disc(0.99) WITHIN GROUP (ORDER BY n_events) AS p99_count,
         CAST(MAX(v_sum) AS DOUBLE) AS max_value,
         CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v_sum) AS DOUBLE)
           AS p99_value
  FROM contrib GROUP BY event_type
)
SELECT c.event_type, k.n_users,
       CAST(k.max_count AS BIGINT) AS max_count,
       CAST(k.p99_count AS BIGINT) AS p99_count,
       ROUND(CAST(SUM(LEAST(c.n_events, k.p99_count)) AS DOUBLE)
             / CAST(SUM(c.n_events) AS DOUBLE), 6) AS count_kept_frac,
       ROUND(k.max_value, 2) AS max_value,
       ROUND(k.p99_value, 2) AS p99_value,
       ROUND(CAST(SUM(LEAST(c.v_sum, CAST(k.p99_value AS DECIMAL(18,2))))
                  AS DOUBLE)
             / CAST(SUM(c.v_sum) AS DOUBLE), 6) AS value_kept_frac
FROM contrib c JOIN cuts k ON c.event_type = k.event_type
GROUP BY c.event_type, k.n_users, k.max_count, k.p99_count, k.max_value,
         k.p99_value
"""


@register(
    "dp_sensitivity_audit", oracle=_DP_ORACLE, tags=("privacy", "stats", "agg")
)
def dp_sensitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy sensitivity audit per event type: the
    per-user contribution distribution (event count and decimal value
    mass), its maximum (= the L1 sensitivity an UNCLIPPED count/sum
    release would have to noise against), the P99 contribution as the
    candidate clipping bound, and the exact fraction of mass a P99
    clip keeps. DP aggregation pipelines clip per-user contributions
    BEFORE adding calibrated noise — sensitivity then equals the clip
    bound, and this audit quantifies the bias that buys. The DP-side
    completion of the privacy family (k_anonymity_check,
    l_diversity_check, t_closeness_check cover the syntactic side).

    Determinism: contributions are exact (BIGINT counts, DECIMAL
    value sums); clip bounds are percentile_disc data values; LEAST
    against the decimal-cast bound stays exact; the kept-fractions
    are single divisions of exact decimal sums, ROUND 6.

    Scale: one (event_type, user) hash-agg over the fact stream —
    map-side combinable — then per-type percentile buffers over USER
    grain (bounded by the user population, not events; the approx
    substitution documented for 100 TB), then one re-aggregation of
    the same user-grain frame against broadcast bounds.
    """
    ev = read_table(spark, sf_dir, "events")
    contrib = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v_sum"),
    )
    cuts = contrib.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.max("n_events").alias("max_count"),
        F.expr(
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY n_events)"
        ).alias("p99_count"),
        F.max("v_sum").cast("double").alias("max_value"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v_sum)")
        .cast("double")
        .alias("p99_value"),
    )
    return (
        contrib.join(F.broadcast(cuts), "event_type")
        .groupBy(
            "event_type", "n_users", "max_count", "p99_count", "max_value",
            "p99_value",
        )
        .agg(
            F.round(
                F.sum(F.least("n_events", "p99_count")).cast("double")
                / F.sum("n_events").cast("double"),
                6,
            ).alias("count_kept_frac"),
            F.round(
                F.sum(
                    F.least(
                        F.col("v_sum"),
                        F.col("p99_value").cast("decimal(18,2)"),
                    )
                ).cast("double")
                / F.sum("v_sum").cast("double"),
                6,
            ).alias("value_kept_frac"),
        )
        .select(
            "event_type",
            "n_users",
            F.col("max_count").cast("long").alias("max_count"),
            F.col("p99_count").cast("long").alias("p99_count"),
            "count_kept_frac",
            F.round("max_value", 2).alias("max_value"),
            F.round("p99_value", 2).alias("p99_value"),
            "value_kept_frac",
        )
    )


# ---------------------------------------------------------------------------
# Query-likelihood ranking with Dirichlet smoothing
# ---------------------------------------------------------------------------

_QL_TERMS = ("vector", "hash", "filter")
_QL_MU = 100.0
_QL_TOPN = 20

_QL_TERMS_SQL = ", ".join(f"'{t}'" for t in _QL_TERMS)

_QL_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok
), allt AS (
  SELECT doc_id, unnest(toks) AS t FROM tok
), coll AS (
  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS cf
  FROM allt WHERE t IN ({_QL_TERMS_SQL}) GROUP BY t
), ctot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS csize FROM allt
), tf AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM allt WHERE t IN ({_QL_TERMS_SQL}) GROUP BY doc_id, t
), matched AS (
  SELECT DISTINCT doc_id FROM tf
), grid AS (
  SELECT m.doc_id, c.term, c.cf, t.csize, d.dl,
         COALESCE(f.tf, 0) AS tf
  FROM matched m
  CROSS JOIN coll c
  CROSS JOIN ctot t
  JOIN dl d ON d.doc_id = m.doc_id
  LEFT JOIN tf f ON f.doc_id = m.doc_id AND f.term = c.term
), scored AS (
  SELECT doc_id,
         CAST(SUM(CAST(ROUND(log2(
           (CAST(tf AS DOUBLE)
            + {_QL_MU} * (CAST(cf AS DOUBLE) / CAST(csize AS DOUBLE)))
           / (CAST(dl AS DOUBLE) + {_QL_MU})), 12) AS DECIMAL(38,12)))
           AS DOUBLE) AS s,
         CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_terms_matched
  FROM grid GROUP BY doc_id
)
SELECT doc_id, n_terms_matched, ROUND(s, 6) AS ql_score,
       CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(s, 6) DESC, doc_id) AS rnk
  FROM scored
)
WHERE rnk <= {_QL_TOPN}
"""


@register(
    "query_likelihood_dirichlet",
    oracle=_QL_ORACLE,
    tags=("llm", "text", "window"),
)
def query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (Zhai &
    Lafferty 2001) for the BM25 fixture query {{vector, hash,
    filter}}: score(d) = Σ_t log₂((tf(t,d) + μ·cf(t)/|C|) /
    (|d| + μ)), μ = {m} — the language-modeling ranker next to
    ``bm25_doc_ranking``'s probabilistic-relevance one. Candidates
    are docs matching ≥1 term (the inverted-index candidate set);
    each candidate is then scored over ALL query terms — absent
    terms contribute their smoothed collection probability, which is
    where QL and BM25 genuinely diverge (BM25 ignores absent terms;
    QL penalizes long documents for them smoothly).

    Determinism: tf/cf/|C|/|d| exact BIGINTs; each per-(doc, term)
    score is one pinned double expression ROUND 12 → DECIMAL(38,12)
    sum (the BM25 pattern — 3 doubles already sum order-sensitively);
    ranking on the ROUND-6 score with doc_id tie-break.

    Scale: identical inverted-index plan shape to BM25 — the IN-list
    prunes the token stream before the tf hash-agg; collection stats
    are broadcast scalars; the all-terms grid is |candidates| × 3
    rows via a 3-row broadcast cross; top-N is TakeOrdered.
    """
    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select("doc_id", TX.tokens("text").alias("toks"))
    dl = tok.select("doc_id", F.size("toks").cast("long").alias("dl"))
    allt = tok.select("doc_id", F.explode("toks").alias("t"))
    coll = (
        allt.filter(F.col("t").isin(*_QL_TERMS))
        .groupBy(F.col("t").alias("term"))
        .agg(F.count("*").cast("long").alias("cf"))
    )
    ctot = allt.agg(F.count("*").cast("long").alias("csize"))
    tf = (
        allt.filter(F.col("t").isin(*_QL_TERMS))
        .groupBy("doc_id", F.col("t").alias("term"))
        .agg(F.count("*").cast("long").alias("tf"))
    )
    matched = tf.select("doc_id").distinct()
    grid = (
        matched.crossJoin(F.broadcast(coll))
        .crossJoin(F.broadcast(ctot))
        .join(dl, "doc_id")
        .join(tf.withColumnRenamed("tf", "tf_raw"), ["doc_id", "term"], "left")
        .select(
            "doc_id",
            "term",
            "cf",
            "csize",
            "dl",
            F.coalesce("tf_raw", F.lit(0)).alias("tf"),
        )
    )
    term_score = F.log2(
        (
            F.col("tf").cast("double")
            + F.lit(_QL_MU)
            * (F.col("cf").cast("double") / F.col("csize").cast("double"))
        )
        / (F.col("dl").cast("double") + F.lit(_QL_MU))
    )
    scored = grid.groupBy("doc_id").agg(
        F.sum(F.round(term_score, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s"),
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_terms_matched"),
    )
    ranked = scored.orderBy(F.round("s", 6).desc(), "doc_id").limit(_QL_TOPN)
    w = Window.orderBy(F.round("s", 6).desc(), "doc_id")
    return ranked.select(
        "doc_id",
        "n_terms_matched",
        F.round("s", 6).alias("ql_score"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
