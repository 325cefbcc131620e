"""Round-7 batch 6: split health and text retrieval —

- ``srm_check_split``: sample-ratio-mismatch gate over the REGISTERED
  80/10/10 splitter (``train_val_test_split``'s exact Knuth-hash
  assignment): multinomial chi² of the realized split counts vs the
  declared ratios. SRM is the first sanity check every experimentation
  platform runs — a biased assignment invalidates everything computed
  downstream of it, so the engine gates its own splitter.
- ``bm25_doc_ranking``: Okapi BM25 (k1=1.2, b=0.75) document ranking
  for a fixed keyword query — the lexical-retrieval standard the
  engine's tf-idf surface was missing; pairs with the ANN family as
  the "sparse" side a hybrid retriever would RRF-fuse with
  ``ann_rrf_fusion``.

Registry conventions (plans/registry.py): exact integer counts,
per-term doubles rounded to 12 dp and decimal-summed, final ROUND 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register, sql_knuth_bucket
from ucl_data_pipeline_spark.sources.io import fan_out, read_table

# ---------------------------------------------------------------------------
# Sample-ratio-mismatch gate over the registered splitter
# ---------------------------------------------------------------------------

_SRM_CRIT = 5.991  # chi2 95th percentile, 2 df

_SRM_ORACLE = f"""
WITH assign AS (
  SELECT CASE WHEN {sql_knuth_bucket('doc_id', 100)} < 80 THEN 'train'
              WHEN {sql_knuth_bucket('doc_id', 100)} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_train,
    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM assign
),
chi AS (
  SELECT n, n_train, n_val, n_test,
    CAST(CAST(ROUND((n_train - n * 0.8) * (n_train - n * 0.8) / (n * 0.8), 12)
         AS DECIMAL(38,12))
       + CAST(ROUND((n_val - n * 0.1) * (n_val - n * 0.1) / (n * 0.1), 12)
         AS DECIMAL(38,12))
       + CAST(ROUND((n_test - n * 0.1) * (n_test - n * 0.1) / (n * 0.1), 12)
         AS DECIMAL(38,12)) AS DOUBLE) AS chi2
  FROM obs
)
SELECT n AS n_docs, n_train, n_val, n_test,
       ROUND(chi2, 6) AS srm_chi2,
       CAST(CASE WHEN chi2 > {_SRM_CRIT} THEN 1 ELSE 0 END AS BIGINT)
         AS srm_flag
FROM chi
"""


@register("srm_check_split", oracle=_SRM_ORACLE, tags=("stats", "llm", "gate"))
def srm_check_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check of the engine's own 80/10/10
    splitter (``train_val_test_split``'s exact Knuth-hash assignment,
    re-derived here from the same ``knuth_bucket`` helper so the gate
    and the splitter can never drift): multinomial χ² of realized
    counts vs declared ratios, flagged at the 2-df 95% critical value.
    A splitter whose hash is biased (or whose key space is truncated)
    silently corrupts every downstream eval — this is the gate that
    catches it, the same way ``bloom_semi_join_fpr`` audits the Bloom
    pushdown and ``ann_recall_*`` audit the ANN indexes.

    Determinism: counts are exact BIGINTs; the three χ² cell terms are
    rounded to 12 dp and added as decimals (a 3-term double sum
    already differs in order across engines); final ROUND 6.

    Scale: one projection + one count-agg over the corpus. The gate is
    free relative to anything it protects.
    """
    d = read_table(spark, sf_dir, "documents")
    u = knuth_bucket("doc_id", 100)
    split = F.when(u < 80, "train").when(u < 90, "val").otherwise("test")
    obs = d.select(split.alias("split")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )

    def cell(count: str, p: float):
        exp = F.col("n") * p
        return F.round(
            (F.col(count) - exp) * (F.col(count) - exp) / exp, 12
        ).cast("decimal(38,12)")

    chi2 = (
        cell("n_train", 0.8) + cell("n_val", 0.1) + cell("n_test", 0.1)
    ).cast("double")
    return obs.select(
        F.col("n").alias("n_docs"),
        "n_train",
        "n_val",
        "n_test",
        F.round(chi2, 6).alias("srm_chi2"),
        F.when(chi2 > _SRM_CRIT, F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Okapi BM25 document ranking for a fixed keyword query
# ---------------------------------------------------------------------------

_BM25_TERMS = ("vector", "hash", "filter")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
dl AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dl) AS BIGINT) AS total_dl
  FROM dl
),
tf AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
  WHERE t IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, t
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
    CAST(ROUND(
      LN(1 + ((SELECT n FROM stats) - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf * ({_BM25_K1} + 1))
      / (tf.tf + {_BM25_K1}
         * (1 - {_BM25_B} + {_BM25_B} * dl.dl
            / (CAST((SELECT total_dl FROM stats) AS DOUBLE)
               / (SELECT n FROM stats)))),
      12) AS DECIMAL(38,12)) AS term_score
  FROM tf JOIN df ON df.term = tf.term JOIN dl ON dl.doc_id = tf.doc_id
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
         ROUND(CAST(SUM(term_score) AS DOUBLE), 6) AS bm25_score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms_matched, bm25_score,
       CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id) AS rnk
  FROM agg
)
WHERE rnk <= {_BM25_TOPN}
"""


@register("bm25_doc_ranking", oracle=_BM25_ORACLE, tags=("llm", "text", "window"))
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-20 document ranking for the
    fixed keyword query {vector, hash, filter} — lexical retrieval
    with tf saturation and length normalization, the sparse ranker a
    hybrid search stack pairs with the ANN family (fuse via the
    ``ann_rrf_fusion`` pattern). idf = ln(1 + (N−df+0.5)/(df+0.5)),
    the standard non-negative variant.

    Determinism: tf/df/dl are exact BIGINTs; avgdl is one exact-int
    division; each per-(doc, term) score is an identical double
    expression rounded to 12 dp and decimal-summed per doc (≤3 terms,
    but a 3-term double sum already differs in order across engines);
    ranking on the 6 dp-rounded score with doc_id tie-break.

    Scale: the fact-sized stage is the tokenize + query-term filter
    (the IN-list prunes before the tf hash-agg, so shuffle volume is
    per-query-term postings, not the corpus vocabulary); df and the
    corpus stats are broadcast scalars; top-N is a distributed
    TakeOrdered over matched docs, with the ranking window applied
    only to the bounded k rows. This is the inverted-index query plan
    spelled relationally — at 100 TB the tf table IS the posting list.
    """
    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select("doc_id", TX.tokens("text").alias("toks"))
    dl = tok.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    tf = (
        tok.select("doc_id", F.explode("toks").alias("t"))
        .filter(F.col("t").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("t").alias("term"))
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n")
    idf = F.log(
        1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(term_score, 12).cast("decimal(38,12)").alias("term_score"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms_matched"),
        F.round(F.sum("term_score").cast("double"), 6).alias("bm25_score"),
    )
    # Distributed top-k: orderBy().limit() compiles to
    # TakeOrderedAndProject (per-partition heaps + driver merge), then
    # the ranking window runs over the bounded k rows only — never a
    # single-partition sort of the full matched-doc set (the
    # query_likelihood_dirichlet spelling, extras47.py).
    ranked = agg.orderBy(F.col("bm25_score").desc(), F.col("doc_id")).limit(
        _BM25_TOPN
    )
    w = Window.orderBy(F.col("bm25_score").desc(), F.col("doc_id"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))
