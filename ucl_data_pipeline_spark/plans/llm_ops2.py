"""Round-2 training-data pipeline operators over ``documents``:
benchmark-contamination detection, training-sequence packing,
repetition scoring, unigram entropy (perplexity proxy) and n-gram
language-model statistics.

Like plans.llm_ops these are first-class engine capabilities beyond the
reference's surface: the curation stages a 100 TB pretraining pipeline
runs between raw crawl and tokenized shards. Everything is a pure
Catalyst expression (higher-order array functions, window aggs) with an
exact DuckDB oracle; the cross-engine determinism conventions
(decimal-exact sums, ROUND(x, 6) on transcendentals, identical aliases)
follow plans.registry's docstring.

Scale design (100 TB):
- contamination joins benchmark n-grams by gram key (shuffle bounded by
  eval-gram volume — each eval gram matches at most one distinct
  benchmark gram, so the join can never amplify);
- packing windows partition by shard (``source``), never globally — a
  global ORDER BY window would serialize the corpus through one task;
- entropy/repetition/LM stats are one explode + one hash-agg each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_SQL_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


def _sql_kgrams(k: int, t: str = "toks") -> str:
    """DuckDB spelling of TX.shingles(toks, k) (space-joined k-gram runs)."""
    gram = " || ' ' || ".join(f"{t}[i+{j + 1}]" for j in range(k))
    return (
        f"CASE WHEN len({t}) >= {k} THEN "
        f"list_transform(generate_series(0, len({t})-{k}), i -> {gram})"
        f" ELSE [] END"
    )


# ---------------------------------------------------------------------------
# Benchmark contamination: n-gram overlap against a held-out set
# ---------------------------------------------------------------------------

# The "benchmark" is a deterministic pseudo-split of the corpus
# (doc_id % 97 == 0) standing in for an external eval set; in production
# the benchmark n-gram table is a separate (small) input. 5-grams are
# the standard contamination unit (long enough to be distinctive).
_CONTAMINATION_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), gram AS (
  SELECT doc_id, unnest(list_distinct({_sql_kgrams(5)})) AS g FROM tok
), bench AS (
  SELECT DISTINCT g FROM gram WHERE doc_id % 97 = 0
), eval_grams AS (
  SELECT doc_id, g FROM gram WHERE doc_id % 97 <> 0
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM eval_grams GROUP BY doc_id
), hits AS (
  SELECT e.doc_id, COUNT(*) AS n_contaminated
  FROM eval_grams e JOIN bench b ON e.g = b.g
  GROUP BY e.doc_id
)
SELECT
  p.doc_id,
  p.n_grams,
  COALESCE(h.n_contaminated, 0) AS n_contaminated,
  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
    AS contamination_frac
FROM per_doc p LEFT JOIN hits h ON p.doc_id = h.doc_id
"""


@register(
    "contamination_ngram_overlap",
    oracle=_CONTAMINATION_ORACLE,
    tags=("llm", "text", "join"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: per evaluation-corpus document,
    the fraction of its distinct 5-grams that appear anywhere in the
    benchmark split — the decontamination gate every pretraining corpus
    runs before training (n-gram overlap a la GPT-3 appendix C).

    Scale shape: benchmark grams are DISTINCT (set semantics), so the
    gram-key equi-join emits at most one row per eval gram — bounded by
    the eval side, no amplification; per-doc ratios are one hash-agg.
    The benchmark side is small in practice and broadcast by AQE.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    # 5-grams are equality keys only (bench-set semi-join + counts) —
    # shuffle xxhash64 digests, not ~40-byte strings (collision-safe
    # at 64 bits; the string-keyed oracle is the collision check).
    gram = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.shingles(TX.tokens("text"), 5))).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("g"))
    bench = gram.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    eval_grams = gram.filter(F.col("doc_id") % 97 != 0)
    per_doc = eval_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        eval_grams.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("contamination_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Training-sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512

_PACK_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, source, len({_SQL_TOKS}) AS n_tokens FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum_tokens
  FROM tok
)
SELECT
  doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
  CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}.0) AS INTEGER) AS pack_id,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY source, FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}.0)
    ORDER BY doc_id
  ) AS INTEGER) AS pack_pos
FROM cum
"""


@register("pack_sequences_greedy", oracle=_PACK_ORACLE, tags=("llm", "window"))
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming contiguous packing of documents into fixed token-budget
    training sequences: within each shard (``source``), documents are
    laid end-to-end in doc_id order and a document belongs to the pack
    in which it STARTS (cumulative-sum window ÷ budget) — the
    deterministic, windowed equivalent of concat-and-split packing used
    to build pretraining batches.

    Scale shape: the window partitions by shard, so no global sort —
    each shard packs independently (exactly how a distributed tokenizer
    shards work); one shuffle on ``source``.
    """
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TX.token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    pack_id = F.floor(
        (F.col("cum_tokens") - F.col("n_tokens")) / float(_PACK_BUDGET)
    ).cast("int")
    with_pack = cum.withColumn("pack_id", pack_id)
    w_pos = Window.partitionBy("source", "pack_id").orderBy("doc_id")
    return with_pack.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "pack_id",
        F.row_number().over(w_pos).cast("int").alias("pack_pos"),
    )


# ---------------------------------------------------------------------------
# Repetition scoring
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), tri AS (
  SELECT doc_id, {_sql_kgrams(3)} AS grams FROM tok
)
SELECT
  doc_id,
  CAST(len(grams) AS INTEGER) AS n_trigrams,
  CAST(len(list_distinct(grams)) AS INTEGER) AS n_unique,
  CASE WHEN len(grams) > 0
       THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
            / CAST(len(grams) AS DOUBLE)
       ELSE 0.0 END AS dup_frac
FROM tri
"""


@register("repetition_score", oracle=_REPETITION_ORACLE, tags=("llm", "text"))
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: fraction of trigram instances that
    are repeats of an earlier trigram — the standard boilerplate /
    degenerate-text filter signal (repeated n-gram ratios, Rae et al.
    Gopher §A.1.1). Pure array expressions; fan_out because shingling
    is CPU-bound and the testdata scan arrives as one split (A/B: 2.9 s
    → 0.6 s at sf0.01).
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    grams = TX.shingles(TX.tokens("text"), 3)
    n = F.size(grams)
    nu = F.size(F.array_distinct(grams))
    return d.select(
        "doc_id",
        n.cast("int").alias("n_trigrams"),
        nu.cast("int").alias("n_unique"),
        F.when(n > 0, (n - nu).cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Unigram entropy (perplexity proxy)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
), cnt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
), agg AS (
  SELECT
    doc_id,
    CAST(SUM(c) AS BIGINT) AS n_tokens,
    CAST(SUM(CAST(ROUND(c * log2(c), 6) AS DECIMAL(18,6))) AS DOUBLE) AS s
  FROM cnt GROUP BY doc_id
)
SELECT
  doc_id,
  n_tokens,
  ROUND(log2(n_tokens) - s / n_tokens, 6) AS unigram_entropy
FROM agg
"""


@register("unigram_entropy", oracle=_ENTROPY_ORACLE, tags=("llm", "text"))
def unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy H = log2(n) − (Σ c·log2 c)/n — a
    cheap perplexity proxy: near-zero for degenerate repetition, high
    for diverse text. Quality-filter companion to repetition_score.

    Determinism: the transcendental per-term values are rounded to 6 dp
    and summed EXACTLY in decimal (sum order differs across engines;
    decimal addition is associative), final output rounded to 6 dp —
    the registry's cross-engine convention. Shape: one explode + two
    hash-aggs keyed by doc_id.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    cnt = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(
            F.round(F.col("c") * F.log2("c"), 6).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("s"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round(F.log2("n_tokens") - F.col("s") / F.col("n_tokens"), 6).alias(
            "unigram_entropy"
        ),
    )


# ---------------------------------------------------------------------------
# n-gram language-model statistics
# ---------------------------------------------------------------------------

_BIGRAM_LM_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), bg AS (
  SELECT unnest({_sql_kgrams(2)}) AS bigram FROM tok
), cnt AS (
  SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
), w1 AS (
  SELECT split_part(bigram, ' ', 1) AS head, bigram, n,
         SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS head_n
  FROM cnt
)
SELECT bigram, n, CAST(n AS DOUBLE) / CAST(head_n AS DOUBLE) AS cond_p
FROM w1
ORDER BY n DESC, bigram
LIMIT 20
"""


@register("bigram_lm_stats", oracle=_BIGRAM_LM_ORACLE, tags=("llm", "text", "agg"))
def bigram_lm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics: top-20 bigrams by count with the
    conditional probability P(w₂|w₁) = c(w₁w₂)/c(w₁·) — the building
    block of n-gram LM scoring / KenLM-style filtering. Integer counts
    divide exactly in double, so no rounding is needed.

    Shape: one explode + hash-agg keyed by bigram, a window keyed by
    the head token (both partial-aggregated map-side), top-20 via
    TakeOrderedAndProject — no global sort materialization.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    d = fan_out(read_table(spark, sf_dir, "documents").select("text"))
    bg = d.select(F.explode(TX.shingles(TX.tokens("text"), 2)).alias("bigram"))
    cnt = bg.groupBy("bigram").agg(F.count("*").alias("n"))
    head = F.split(F.col("bigram"), " ").getItem(0)
    w = Window.partitionBy(head)
    return (
        cnt.withColumn("head_n", F.sum("n").over(w))
        .select(
            "bigram",
            "n",
            (F.col("n").cast("double") / F.col("head_n").cast("double")).alias(
                "cond_p"
            ),
        )
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


_VOCAB_ORACLE = rf"""
WITH tok AS (
  SELECT unnest({_SQL_TOKS}) AS tok FROM documents
), cnt AS (
  SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok
), tot AS (
  SELECT SUM(n) AS total FROM cnt
)
SELECT tok, n,
  CAST(n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
  CAST(SUM(n) OVER (ORDER BY n DESC, tok
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_coverage
FROM cnt CROSS JOIN tot t
ORDER BY n DESC, tok
LIMIT 100
"""


@register("vocab_coverage", oracle=_VOCAB_ORACLE, tags=("llm", "text", "agg"))
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-100 tokens by frequency with
    corpus share and CUMULATIVE coverage — the curve that decides
    tokenizer vocab size ("how many types cover 95% of tokens").
    Cumulative sums run over exact integers (cumsum of counts, one
    division at the end), so cross-engine values are bit-identical.

    Shape: one explode + hash-agg keyed by token, a 1-row broadcast
    total, one ranked window — at 100 TB the window only ever sees the
    aggregated vocabulary, not the corpus.
    """
    from pyspark.sql import Window as W

    from ucl_data_pipeline_spark.sources.io import fan_out

    d = fan_out(read_table(spark, sf_dir, "documents").select("text"))
    cnt = d.select(F.explode(TX.tokens("text")).alias("tok")).groupBy("tok").agg(
        F.count("*").alias("n")
    )
    tot = cnt.agg(F.sum("n").alias("total"))
    w = (
        W.orderBy(F.col("n").desc(), "tok")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        cnt.join(F.broadcast(tot))
        .select(
            "tok",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
            (
                F.sum("n").over(w).cast("double")
                / F.col("total").cast("double")
            ).alias("cum_coverage"),
        )
        .orderBy(F.col("n").desc(), "tok")
        .limit(100)
    )
