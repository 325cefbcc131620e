"""Round-7 batch 10: corpus-LM document scoring —

- ``doc_lm_cross_entropy``: per-document cross-entropy (and
  perplexity) under the CORPUS unigram language model — the
  CCNet-style quality filter (Wenzek et al., "CCNet: Extracting High
  Quality Monolingual Datasets from Web Crawl Data"): score every
  document by how surprising its tokens are to a model of the whole
  corpus, then drop/keep by perplexity band. This is a genuinely
  different signal from ``unigram_entropy`` (WITHIN-doc self-entropy):
  a document of rare-but-diverse gibberish has HIGH self-entropy yet
  is exactly what the cross-entropy filter catches (every token
  improbable under the corpus LM); conversely boilerplate repeated
  corpus-wide scores low cross-entropy even when each instance is
  long. Production pipelines use a trained KenLM; the unigram corpus
  LM is the exact-arithmetic, oracle-checkable core of the same
  plumbing — swap the vocab table for n-gram LM scores and the plan
  is unchanged.

Reference scope anchor: the reference has no corpus-level notion at
all (per-file pandas scripts); corpus-conditioned scoring is the
capability a training-data engine adds on top.

Registry conventions (plans/registry.py): transcendental per-term
values ROUND 6 then summed EXACTLY in decimal (order-independent
across engines); counts exact BIGINT; final outputs ROUND 6. The
perplexity is derived from the ALREADY-ROUNDED entropy so both
engines exponentiate bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import fan_out, read_table

_XENT_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
), cnt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
), vocab AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS cw FROM cnt GROUP BY tok
), tot AS (
  SELECT CAST(SUM(cw) AS BIGINT) AS n FROM vocab
), agg AS (
  SELECT
    c.doc_id,
    CAST(SUM(c.c) AS BIGINT) AS n_tokens,
    CAST(SUM(CAST(ROUND(
      c.c * log2(CAST(t.n AS DOUBLE) / CAST(v.cw AS DOUBLE)), 6
    ) AS DECIMAL(18,6))) AS DOUBLE) AS s
  FROM cnt c JOIN vocab v USING (tok) CROSS JOIN tot t
  GROUP BY c.doc_id
)
SELECT
  doc_id,
  n_tokens,
  ROUND(s / n_tokens, 6) AS cross_entropy_bits,
  ROUND(POWER(2.0, ROUND(s / n_tokens, 6)), 6) AS perplexity
FROM agg
"""


@register(
    "doc_lm_cross_entropy",
    oracle=_XENT_ORACLE,
    tags=("llm", "text", "stats"),
)
def doc_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy H(doc ‖ corpus) =
    (Σ_tok c_doc · log2(N / c_corpus)) / n_doc bits per token, plus
    perplexity 2^H — low = stereotyped/boilerplate relative to the
    corpus, high = out-of-distribution (the CCNet filter bands).

    Plan shape (the 100 TB contract): ONE explode pass builds the
    (doc, token)-grain count table; the corpus LM (token → count) is
    a RE-aggregation of that same grain table — never a second corpus
    scan — and N is one broadcast singleton. The scoring join runs at
    doc-token-type grain keyed by the token, with map-side
    partial_count combines bounding every shuffle at grain
    cardinality, not raw token instances. The grain table is
    persisted because two branches (scoring side, vocab side) consume
    it: without the persist Spark re-runs the corpus explode for the
    vocab branch (extras27 precedent — persist pins the second read
    at grain size; at 100 TB the grain spills columnar, still far
    under re-reading raw text). At web scale the vocab join is a
    plain shuffle join on the token; swapping the string key for the
    dedup family's xxhash64 digest spelling applies if profile shows
    the key bytes dominating (SCALE_NOTES digest-applicability rule).

    Determinism: per-term ROUND(c·log2(N/cw), 6) → decimal sum
    (associative) → final ROUND 6; perplexity exponentiates the
    ROUNDED entropy so both engines see identical inputs.

    Zero-token documents have no grain rows and are absent — same
    contract as ``unigram_entropy``.
    """
    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    cnt = (
        tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c")).persist()
    )
    vocab = cnt.groupBy("tok").agg(F.sum("c").cast("bigint").alias("cw"))
    tot = vocab.agg(F.sum("cw").cast("bigint").alias("n"))
    term = F.round(
        F.col("c")
        * F.log2(F.col("n").cast("double") / F.col("cw").cast("double")),
        6,
    )
    agg = (
        cnt.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(term.cast("decimal(18,6)")).cast("double").alias("s"),
        )
    )
    h = F.round(F.col("s") / F.col("n_tokens"), 6)
    return agg.select(
        "doc_id",
        "n_tokens",
        h.alias("cross_entropy_bits"),
        F.round(F.pow(F.lit(2.0), h), 6).alias("perplexity"),
    )
