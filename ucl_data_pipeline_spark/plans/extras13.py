"""Round-5 inventory depth, tenth batch: deterministic training-epoch
shuffling, corpus language-mix profiling, and embedding-norm
distribution gates — the remaining everyday shapes of an LLM
data-curation platform.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Deterministic per-epoch shuffle sharding
# ---------------------------------------------------------------------------

_SHUFFLE_EPOCHS = 3
_SHUFFLE_SHARDS = 8

_EPOCH_SHUFFLE_ORACLE = f"""
WITH assign AS (
  SELECT e.epoch, d.doc_id,
         CAST(('0x' || substr(md5(e.epoch || ':' || d.doc_id), 1, 8))::BIGINT
              % {_SHUFFLE_SHARDS} AS INTEGER) AS shard
  FROM documents d,
       (SELECT unnest(generate_series(0, {_SHUFFLE_EPOCHS - 1})) AS epoch) e
)
SELECT CAST(epoch AS INTEGER) AS epoch, shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
FROM assign GROUP BY epoch, shard
"""


@register(
    "epoch_shuffle_shards", oracle=_EPOCH_SHUFFLE_ORACLE, tags=("llm", "sampling")
)
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch shuffle sharding for training-data
    loading: shard(doc, epoch) = md5(epoch ‖ ':' ‖ doc_id) mod S —
    every epoch re-deals the corpus into different shards (breaking
    order correlations between epochs) while staying fully
    reproducible from (doc_id, epoch) alone: any worker can recompute
    its shard membership without a stored permutation, which is the
    property that matters when the permutation itself would be a
    100 TB table. The per-(epoch, shard) count and id-sum fingerprint
    the deal so drift in the hash path is driver-visible.

    Scale: a scan-side hash projection and one hash-agg; the ×E epoch
    fan-out multiplies rows by a small constant (here 3). The md5
    prefix is decoded as 8 hex chars → 32-bit int, identical integer
    arithmetic in both engines.
    """
    d = read_table(spark, sf_dir, "documents")
    epochs = F.explode(
        F.array(*[F.lit(i) for i in range(_SHUFFLE_EPOCHS)])
    ).alias("epoch")
    assign = d.select("doc_id", epochs).select(
        "epoch",
        "doc_id",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(_SHUFFLE_SHARDS),
        )
        .cast("int")
        .alias("shard"),
    )
    return assign.groupBy(
        F.col("epoch").cast("int").alias("epoch"), "shard"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_ids"),
    )


# ---------------------------------------------------------------------------
# Language mix per source (+ per-source language entropy)
# ---------------------------------------------------------------------------

_LANG_MIX_ORACLE = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
totals AS (
  SELECT source, SUM(n) AS total FROM counts GROUP BY source
),
ent AS (
  SELECT c.source,
         CAST(SUM(CAST(
           ROUND(-(CAST(c.n AS DOUBLE) / t.total)
                 * LN(CAST(c.n AS DOUBLE) / t.total), 6)
           AS DECIMAL(18,6))) AS DOUBLE) AS lang_entropy
  FROM counts c JOIN totals t USING (source)
  GROUP BY c.source
)
SELECT c.source, c.lang, CAST(c.n AS BIGINT) AS n_docs,
       ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
       e.lang_entropy
FROM counts c
JOIN totals t USING (source)
JOIN ent e ON e.source = c.source
"""


@register("doc_language_mix", oracle=_LANG_MIX_ORACLE, tags=("llm", "text", "agg"))
def doc_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language-mix profile: per (source, language) the doc
    count and share, each row carrying its source's language ENTROPY
    (nats) — the one-glance diagnostic for multilingual curation
    (entropy ≈ 0 → monolingual source; high → mixed, needs per-lang
    quotas before domain_mixture_weights runs). Shares are divisions
    of exact integers; entropy terms take LN on those identical
    ratios, ROUND-6 per term, decimal-summed. Two hash-aggs on
    collapsing grains + broadcast-sized joins keyed by source —
    output is (source × lang)-bounded, constant at any corpus scale.
    """
    d = read_table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    totals = counts.groupBy("source").agg(F.sum("n").alias("total"))
    joined = counts.join(F.broadcast(totals), "source")
    p = F.col("n").cast("double") / F.col("total")
    ent = (
        joined.groupBy("source")
        .agg(
            F.sum(F.round(-p * F.log(p), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("lang_entropy")
        )
    )
    return joined.join(F.broadcast(ent), "source").select(
        "source",
        "lang",
        F.col("n").alias("n_docs"),
        F.round(p, 6).alias("share"),
        "lang_entropy",
    )


# ---------------------------------------------------------------------------
# Embedding L2-norm quantiles per label
# ---------------------------------------------------------------------------

_NORM_FRACS = [0.25, 0.5, 0.75]

_NORM_QUANT_ORACLE = f"""
WITH norms AS (
  SELECT label,
         ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))), 6) AS nrm
  FROM embeddings
),
ordered AS (
  SELECT label, nrm,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY nrm) AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM norms
),
fr AS (SELECT unnest([{", ".join(repr(q) for q in _NORM_FRACS)}]) AS q),
picked AS (
  SELECT label, q, MIN(nrm) AS v
  FROM ordered, fr
  WHERE rn = CAST(CEIL(q * n) AS BIGINT)
  GROUP BY label, q
)
SELECT label,
       MAX(CASE WHEN q = 0.25 THEN v END) AS norm_p25,
       MAX(CASE WHEN q = 0.5 THEN v END) AS norm_p50,
       MAX(CASE WHEN q = 0.75 THEN v END) AS norm_p75
FROM picked GROUP BY label
"""


@register(
    "embedding_norm_quantiles", oracle=_NORM_QUANT_ORACLE, tags=("vector", "llm")
)
def embedding_norm_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm distribution per label (p25/p50/p75) — the
    representation-health gate next to embedding_centroid_shift: a
    label whose norm quartiles drift signals a degenerate or
    collapsing embedding region before ANN recall visibly degrades.
    Norms are scan-side array folds over float32→float64 exact casts,
    ROUND-6 (the one transcendental); quantiles are ORDER STATISTICS
    via the rank-⌈q·n⌉ spelling (Spark percentile_disc's definition,
    spelled identically in the oracle — quantile_disc's index formula
    provably diverges from it for some (n mod 8, q) pairs, see
    range_partition_boundaries). One window shuffle keyed by label.
    """
    from ucl_data_pipeline_spark.functions import vector as VX

    e = read_table(spark, sf_dir, "embeddings")
    norms = e.select(
        "label", F.round(VX.norm("embedding"), 6).alias("nrm")
    )
    return norms.groupBy("label").agg(
        *[
            F.expr(
                f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY nrm)"
            ).alias(f"norm_p{int(q * 100)}")
            for q in _NORM_FRACS
        ]
    )
