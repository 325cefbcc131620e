"""Round-8 batch 27: the IR-stack completion —

- ``vsm_tfidf_ranking``: the classic SMART ltc·ltc vector-space
  model for the SAME fixed query ``bm25_doc_ranking`` and
  ``query_likelihood_dirichlet`` rank — document weights
  (1+ln tf)·ln(N/df) cosine-normalized over the FULL document vector
  (the part naive tf-idf skips), query weights ln(N/df). With BM25
  and QL already registered, this completes the three classical
  ranking families (vector-space / probabilistic / language-model)
  over one corpus and one query — the ranker-agreement tooling
  (``rbo_ranker_agreement``) can now read any pair.
- ``rocchio_prf_rerank``: Rocchio pseudo-relevance feedback on the
  embedding corpus — take the query vector's top-5 cosine neighbors,
  average them into a feedback centroid, and re-rank the corpus by
  the centroid; emits the re-ranked top-10 WITH each doc's original
  rank, so the movement PRF causes is the artifact itself. The
  query-expansion step every dense-retrieval stack evaluates.
- ``err_cascade_metric``: Expected Reciprocal Rank @10 (Chapelle
  2009) for the standard 5-query label-relevance retrieval setup —
  the CASCADE-model metric: a relevant doc at rank r only pays off
  if the user got past the relevant docs above it, ERR =
  Σ_r (1/r)·R_r·Π_{{i<r}}(1−R_i). With binary relevance R = 1/2,
  every term is an exact dyadic rational. Completes MAP/MRR
  (position-averaged), NDCG (log-discounted) with the
  user-model-discounted read.

Registry conventions (plans/registry.py): ROUND-12-then-decimal sums
for transcendental weight accumulations; exact dyadic ERR terms in
DECIMAL(18,9); ranking ties broken by id (total order); ROUND 6
outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_COS, _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# SMART ltc.ltc vector-space ranking (same query as BM25 / QL)
# ---------------------------------------------------------------------------

_VSM_TERMS = ("vector", "hash", "filter")  # = _BM25_TERMS / _QL_TERMS
_VSM_TOPN = 20
_VSM_TERMS_SQL = ", ".join(f"'{t}'" for t in _VSM_TERMS)

_VSM_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
tf AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
  GROUP BY doc_id, t
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
wd AS (
  SELECT tf.doc_id, tf.term,
         ROUND((1 + LN(tf.tf)) * LN(CAST(n.n AS DOUBLE) / df.df), 12) AS w
  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
),
dnorm AS (
  SELECT doc_id,
         SQRT(CAST(SUM(CAST(ROUND(w * w, 12) AS DECIMAL(38,12)))
                   AS DOUBLE)) AS nrm
  FROM wd GROUP BY doc_id
),
qw AS (
  SELECT df.term, ROUND(LN(CAST(n.n AS DOUBLE) / df.df), 12) AS w
  FROM df CROSS JOIN n
  WHERE df.term IN ({_VSM_TERMS_SQL})
),
qnorm AS (
  SELECT SQRT(CAST(SUM(CAST(ROUND(w * w, 12) AS DECIMAL(38,12)))
                   AS DOUBLE)) AS qn
  FROM qw
),
dot AS (
  SELECT wd.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
         CAST(SUM(CAST(ROUND(wd.w * qw.w, 12) AS DECIMAL(38,12)))
              AS DOUBLE) AS dp
  FROM wd JOIN qw ON qw.term = wd.term
  GROUP BY wd.doc_id
),
scored AS (
  SELECT d.doc_id, d.n_terms_matched,
         ROUND(d.dp / (dn.nrm * q.qn), 6) AS vsm_score
  FROM dot d JOIN dnorm dn ON dn.doc_id = d.doc_id CROSS JOIN qnorm q
)
SELECT doc_id, n_terms_matched, vsm_score, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY vsm_score DESC, doc_id) AS rnk
  FROM scored
)
WHERE rnk <= {_VSM_TOPN}
"""


@register("vsm_tfidf_ranking", oracle=_VSM_ORACLE, tags=("llm", "text", "window"))
def vsm_tfidf_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMART ltc·ltc vector-space ranking for the fixed query
    {terms}: document term weights (1+ln tf)·ln(N/df), query weights
    ln(N/df), score = cosine of the two ltc vectors — the document
    norm runs over the doc's FULL term vector (the normalization that
    separates real VSM from bag-of-tf-idf scoring; long docs stop
    winning by length alone). Third member of the classical ranking
    trio over this corpus: ``bm25_doc_ranking`` (probabilistic),
    ``query_likelihood_dirichlet`` (language-model), and now the
    vector-space model — top-{k} with (score DESC, doc_id) ties.

    Determinism: tf/df/N are exact BIGINTs; every transcendental
    weight, weight-square, and weight-product is ROUND-12 then
    DECIMAL(38,12)-summed (order-free); the final cosine is one
    division of identical doubles, ROUND 6.

    Scale: one tokenization pass to (doc, term) grain — the SAME
    hash-agg BM25 pays — plus a doc-grain norm agg; the query side is
    |terms| rows broadcast. TakeOrdered top-{k}. (At 100 TB the term
    key is the xxhash64 digest, llm_ops.py:252.)
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("t"))
    tf = tok.groupBy("doc_id", F.col("t").alias("term")).agg(
        F.count("*").cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = d.agg(F.count("*").cast("long").alias("n"))
    wd = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                (1 + F.log("tf")) * F.log(F.col("n").cast("double") / F.col("df")),
                12,
            ).alias("w"),
        )
    )

    def _d12(term) -> F.Column:
        return F.sum(F.round(term, 12).cast("decimal(38,12)")).cast("double")

    dnorm = wd.groupBy("doc_id").agg(
        F.sqrt(_d12(F.col("w") * F.col("w"))).alias("nrm")
    )
    qw = (
        df.crossJoin(F.broadcast(n))
        .filter(F.col("term").isin(*_VSM_TERMS))
        .select(
            "term",
            F.round(F.log(F.col("n").cast("double") / F.col("df")), 12).alias(
                "qwt"
            ),
        )
    )
    qnorm = qw.agg(F.sqrt(_d12(F.col("qwt") * F.col("qwt"))).alias("qn"))
    dot = (
        wd.join(F.broadcast(qw), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            _d12(F.col("w") * F.col("qwt")).alias("dp"),
        )
    )
    scored = (
        dot.join(dnorm, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            "n_terms_matched",
            F.round(F.col("dp") / (F.col("nrm") * F.col("qn")), 6).alias(
                "vsm_score"
            ),
        )
    )
    # Distributed top-k (query_likelihood_dirichlet spelling,
    # extras47.py): orderBy().limit() is TakeOrderedAndProject, so the
    # ranking window only ever sees the bounded k rows — no
    # single-partition sort of the full matched-doc set.
    ranked = scored.orderBy(F.desc("vsm_score"), "doc_id").limit(_VSM_TOPN)
    w_rank = Window.orderBy(F.desc("vsm_score"), "doc_id")
    return ranked.select(
        "doc_id",
        "n_terms_matched",
        "vsm_score",
        F.row_number().over(w_rank).cast("long").alias("rank"),
    ).orderBy("rank")


vsm_tfidf_ranking.__doc__ = vsm_tfidf_ranking.__doc__.format(
    terms=_VSM_TERMS, k=_VSM_TOPN
)


# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance feedback re-ranking (dense embeddings)
# ---------------------------------------------------------------------------

_PRF_QUERY_ID = 0
_PRF_FB = 5
_PRF_TOPN = 10

_PRF_ORACLE = f"""
WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id = {_PRF_QUERY_ID}
),
base AS (
  SELECT c.vec_id, c.label, c.embedding,
         ROW_NUMBER() OVER (ORDER BY {_SQL_COS} DESC, c.vec_id) AS rank_before
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> {_PRF_QUERY_ID}
),
fb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
  FROM base WHERE rank_before <= {_PRF_FB}
),
centroid AS MATERIALIZED (
  SELECT list(mv ORDER BY pos) AS emb FROM (
    SELECT i AS pos,
           ROUND(CAST(SUM(CAST(emb[i] AS DECIMAL(18,9))) AS DOUBLE)
                 / {_PRF_FB}, 6) AS mv
    FROM fb, unnest(generate_series(1, len(emb))) AS t(i)
    GROUP BY i
  )
),
rer AS (
  SELECT b.vec_id, b.label, b.rank_before,
         ROW_NUMBER() OVER (ORDER BY
           list_dot_product(CAST(b.embedding AS DOUBLE[]), ct.emb)
           / nullif(sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(ct.emb, ct.emb)), 0.0)
           DESC, b.vec_id) AS rank_after
  FROM base b CROSS JOIN centroid ct
)
SELECT CAST(rank_after AS BIGINT) AS rank_after,
       vec_id, label,
       CAST(rank_before AS BIGINT) AS rank_before
FROM rer
WHERE rank_after <= {_PRF_TOPN}
ORDER BY rank_after
"""


@register(
    "rocchio_prf_rerank", oracle=_PRF_ORACLE, tags=("vector", "llm", "window")
)
def rocchio_prf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback over the embedding corpus:
    rank by cosine to query vec {q}, average the top-{fb} neighbors
    into a feedback centroid (α=0, β=1 — pure feedback, the PRF
    limit), re-rank the corpus by the centroid, and emit the new
    top-{k} with each doc's ORIGINAL rank alongside — the
    before/after movement IS the result (docs pulled in by the
    feedback neighborhood, lexical one-off neighbors pushed out).
    The query-expansion step dense-retrieval stacks A/B against raw
    similarity (``embedding_topk_cosine``).

    Determinism: both rankings order by (cosine DESC, vec_id) — the
    established total-order convention of the ANN family; the
    centroid's per-dimension means are exact DECIMAL(18,9) sums
    divided by the literal {fb} then ROUND 6, so the re-rank query
    vector is identical across engines.

    Scale: ONE bounded query row broadcast against the corpus scan,
    twice (base rank, re-rank); the centroid is a {fb}-row
    per-dimension agg. Both top-k selections are distributed
    TakeOrdered, and rank_before is recovered by a rows-ahead COUNT
    against a bounded broadcast candidate list — no global ranking
    window ever touches the corpus grain. No all-pairs path — the
    same structural cap as the brute-force ANN baseline
    (llm_ops._TOPK_MAX_QUERIES).
    """
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _PRF_QUERY_ID).select(
        F.col("embedding").alias("qemb")
    )
    # Corpus-grain cosine-to-query frame. NO global ranking window is
    # ever applied to it: the feedback set and the re-ranked top-k are
    # both distributed TakeOrdered (orderBy().limit()), and the
    # original rank of each surviving doc is recovered by COUNTING the
    # corpus rows strictly ahead of it in the same (cos0 DESC, vec_id)
    # total order — a hash-agg over corpus × |top-k| broadcast rows,
    # exactly row_number semantics without a single-partition sort.
    # persist(): `base` is consumed by THREE lazy branches (feedback
    # top-k, the re-rank scan, the rows-ahead count), so without it
    # the full corpus cosine computes three times per run — the
    # engine's documented branch-re-execution convention (extras27's
    # measured precedent). Materializing also makes the
    # cos0 == t_cos0 equality in the rows-ahead filter compare STORED
    # values instead of relying on bit-identical recomputation across
    # branches (deterministic today, fragile if the cosine helper
    # ever gains a non-deterministic reduction order).
    base = (
        e.filter(F.col("vec_id") != _PRF_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "embedding",
            VX.cosine("embedding", "qemb").alias("cos0"),
        )
        .persist()
    )
    fb = (
        base.orderBy(F.desc("cos0"), "vec_id")
        .limit(_PRF_FB)
        .select(F.posexplode(VX.as_double("embedding")).alias("pos", "val"))
    )
    centroid = (
        fb.groupBy("pos")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                / _PRF_FB,
                6,
            ).alias("mv")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s["mv"],
            ).alias("cemb")
        )
    )
    rer = base.crossJoin(F.broadcast(centroid)).select(
        "vec_id",
        "label",
        "cos0",
        VX.cosine("embedding", "cemb").alias("cos1"),
    )
    top_after = rer.orderBy(F.desc("cos1"), "vec_id").limit(_PRF_TOPN)
    w_after = Window.orderBy(F.desc("cos1"), "vec_id")
    ranked = top_after.select(
        F.row_number().over(w_after).cast("long").alias("rank_after"),
        "vec_id",
        "label",
        "cos0",
    )
    # rank_before of each top-k doc = 1 + #corpus rows strictly ahead
    # of it in (cos0 DESC, vec_id): one corpus scan against a bounded
    # broadcast candidate list, hash-agg on the candidate key.
    cand = ranked.select(
        F.col("vec_id").alias("t_vid"), F.col("cos0").alias("t_cos0")
    )
    ahead = (
        base.select("vec_id", "cos0")
        .crossJoin(F.broadcast(cand))
        .filter(
            (F.col("cos0") > F.col("t_cos0"))
            | (
                (F.col("cos0") == F.col("t_cos0"))
                & (F.col("vec_id") < F.col("t_vid"))
            )
        )
        .groupBy("t_vid")
        .agg(F.count("*").alias("n_ahead"))
    )
    return (
        ranked.join(
            F.broadcast(ahead), ranked["vec_id"] == ahead["t_vid"], "left"
        )
        .select(
            "rank_after",
            "vec_id",
            "label",
            (F.coalesce(F.col("n_ahead"), F.lit(0)) + 1)
            .cast("long")
            .alias("rank_before"),
        )
        .orderBy("rank_after")
    )


rocchio_prf_rerank.__doc__ = rocchio_prf_rerank.__doc__.format(
    q=_PRF_QUERY_ID, fb=_PRF_FB, k=_PRF_TOPN
)


# ---------------------------------------------------------------------------
# Expected Reciprocal Rank @10 (cascade user model, binary relevance)
# ---------------------------------------------------------------------------

_ERR_K = 10
_ERR_QUERIES = 5

_ERR_ORACLE = f"""
WITH topk AS (
  SELECT q.vec_id AS query_id, q.label AS q_label,
         c.vec_id AS neighbor_id, c.label AS c_label,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) AS rnk
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _ERR_QUERIES}
   AND c.vec_id <> q.vec_id
  QUALIFY rnk <= {_ERR_K}
),
hits AS (
  SELECT query_id, rnk,
         CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS rel,
         COALESCE(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id ORDER BY rnk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS hits_before
  FROM topk
)
SELECT query_id,
       CAST(SUM(rel) AS BIGINT) AS n_rel10,
       ROUND(CAST(SUM(CASE WHEN rel = 1
         THEN CAST(ROUND(POWER(0.5, hits_before + 1) / rnk, 9)
                   AS DECIMAL(18,9))
         ELSE CAST(0 AS DECIMAL(18,9)) END) AS DOUBLE), 6) AS err_at_10
FROM hits
GROUP BY query_id
ORDER BY query_id
"""


@register("err_cascade_metric", oracle=_ERR_ORACLE, tags=("vector", "llm", "gate"))
def err_cascade_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Reciprocal Rank @{k} under the cascade user model
    (Chapelle et al. 2009) for the standard {q}-query label-relevance
    retrieval setup: the user scans down, stops at a satisfying doc
    with probability R, so rank r's payoff is discounted by
    Π_{{i<r}}(1−R_i) — a metric that, unlike MAP/NDCG, punishes
    putting the second relevant doc right below the first. With
    binary relevance R = 1/2, each term is (1/2)^(hits_before+1)/r —
    an exact dyadic rational. Completes the engine's ranking-metric
    set: position-averaged (``retrieval_map_mrr``), log-discounted
    (``ann_ndcg_at_10``), and now user-model-discounted.

    Determinism: ranking is the established (cosine DESC, vec_id)
    total order; hits_before is an exact integer window; each ERR
    term (1/2)^(h+1)/r is a pinned IEEE expression over exact dyadics
    and integers — identical doubles both engines — ROUND-9 and
    DECIMAL(18,9)-summed (order-free); output ROUND 6.

    Scale: {q} bounded query rows broadcast against one corpus scan,
    per-query top-{k} heaps; all metric math on ≤{q}·{k} rows.
    """
    e = read_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(
            (F.col("vec_id") % 100 == 0)
            & (F.col("vec_id") < 100 * _ERR_QUERIES)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("qemb"),
        )
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    topk = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("c_label"),
            VX.cosine("embedding", "qemb").alias("cos"),
        )
        .select(
            "query_id",
            "q_label",
            "neighbor_id",
            "c_label",
            F.row_number().over(w_q).alias("rnk"),
        )
        .filter(F.col("rnk") <= _ERR_K)
    )
    rel = F.when(F.col("c_label") == F.col("q_label"), 1).otherwise(0)
    w_before = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hits = topk.select(
        "query_id",
        "rnk",
        rel.alias("rel"),
        F.coalesce(F.sum(rel).over(w_before), F.lit(0)).alias("hits_before"),
    )
    term = F.round(
        F.pow(F.lit(0.5), F.col("hits_before") + 1) / F.col("rnk"), 9
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.sum("rel").cast("long").alias("n_rel10"),
            F.round(
                F.sum(
                    F.when(F.col("rel") == 1, term.cast("decimal(18,9)"))
                    .otherwise(F.lit(0).cast("decimal(18,9)"))
                ).cast("double"),
                6,
            ).alias("err_at_10"),
        )
        .orderBy("query_id")
    )


err_cascade_metric.__doc__ = err_cascade_metric.__doc__.format(
    k=_ERR_K, q=_ERR_QUERIES
)
