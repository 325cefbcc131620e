"""Round-4 inventory depth: co-occurrence mining, privacy auditing,
and inverted-index construction — three operator shapes a large-scale
training-data pipeline needs that the round-3 inventory lacked.

Like every plans module, each query is a Catalyst-native DataFrame
composition with an exact DuckDB oracle (registry conventions:
deterministic tie-breaks, BIGINT/DOUBLE/VARCHAR outputs, serialized
collections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Market-basket co-occurrence (self-join pair mining)
# ---------------------------------------------------------------------------

_COPURCHASE_TOPK = 25

_COPURCHASE_ORACLE = f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT {_COPURCHASE_TOPK}
"""


@register("copurchase_pairs", oracle=_COPURCHASE_ORACLE, tags=("join", "agg"))
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs: distinct (order, part) baskets
    self-joined on the order key with ``part_a < part_b`` (each pair
    once), counted, top-25 with a deterministic
    (count desc, part_a, part_b) tie-break. The canonical market-basket
    co-occurrence shape — also how a data pipeline mines co-occurring
    n-grams/entities for association features.

    Scale: the self-join shuffles both sides on the SAME key (one
    co-partitioned exchange, no broadcast of a fact-sized side); the
    per-key blow-up is basket-size², bounded by the per-order line
    count (TPC-H ≤ 7; at 100 TB a basket-size cap before pairing is
    the standard guard — here the dedup-to-distinct-parts projection
    is that cap's hook). Pair counting is a map-side-combinable
    hash-agg, and the final top-k is a TakeOrdered over aggregated
    pairs, never a global sort of raw pairs.
    """
    basket = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = basket.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = basket.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "k").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(_COPURCHASE_TOPK)
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON = 5

_K_ANON_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS group_size,
       COUNT(*) >= {_K_ANON} AS k_anonymous
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@register("k_anonymity_check", oracle=_K_ANON_ORACLE, tags=("agg", "validate"))
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before releasing/training on user-linked data:
    group sizes over the quasi-identifier tuple (nation, market
    segment) with a k≥5 anonymity flag. Groups below k are the
    re-identifiable cells a release pipeline must suppress or
    generalize; the same shape audits PII-adjacent slices of a
    training corpus (pii_redaction's companion gate).

    Scale: one map-side-combinable hash-agg keyed by the
    quasi-identifiers; output cardinality is the QI domain, not the
    row count — constant-size result at any data scale.
    """
    return (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") >= _K_ANON).alias("k_anonymous"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted-index postings
# ---------------------------------------------------------------------------

_POSTINGS_MIN_DF = 25
_POSTINGS_CAP = 10

_POSTINGS_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
    FROM documents
  )
)
SELECT token,
       COUNT(*) AS df,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, {_POSTINGS_CAP}),
                       ',') AS postings_head
FROM tok
GROUP BY token
HAVING COUNT(*) >= {_POSTINGS_MIN_DF}
"""


@register("inverted_index_postings", oracle=_POSTINGS_ORACLE, tags=("llm", "text"))
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction over the corpus: token → document
    frequency + the first 10 doc ids of the sorted posting
    list (serialized; registry's atomic-output convention), for tokens
    with df ≥ 25. The core retrieval/contamination-
    lookup structure a text pipeline materializes beside the corpus.

    Scale: scan-side tokenize + explode, ONE hash-agg keyed by token
    (distinct (doc, token) pairs collapse map-side), posting lists
    capped with ``slice`` AFTER ``array_sort`` so the serialized head
    is deterministic under any partitioning. The df floor keeps output
    bounded by vocabulary, and the explicit cap means no unbounded
    collect_list state for stop-word-frequency tokens at 100 TB —
    at real scale the cap would move into a windowed top-n per token
    before the collect; the df≥25 floor plus 10-head keeps this single-agg form honest here.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(TX.distinct_tokens("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list("doc_id")), 1, _POSTINGS_CAP
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= _POSTINGS_MIN_DF)
    )
