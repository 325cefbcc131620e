"""Round-5 inventory depth, twelfth batch: the modern Spark 4 SQL
surfaces — VARIANT semi-structured extraction, LISTAGG, GROUP BY ALL,
bag-semantics set operations, and bitmap-aggregate distinct counting —
each pinned against DuckDB's implementation of the same standard.

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
# VARIANT semi-structured extraction (Spark 4 open variant type)
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
       CAST(json_extract_string(props, '$.missing') AS INTEGER) AS prop_missing
FROM events
WHERE props IS NOT NULL
"""


@register("variant_extract_surface", oracle=_VARIANT_ORACLE, tags=("sql", "json"))
def variant_extract_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path extraction — the schema-on-read path that
    replaces per-query ``from_json`` schema declarations and keeps
    shredded-column pushdown available at the storage layer (the
    open-variant design Parquet/Iceberg/Delta share). Missing paths
    yield NULL, pinned by the second column; DuckDB's JSON type is the
    reference semantics. Scan-side only — parse once, extract many.
    """
    e = read_table(spark, sf_dir, "events")
    e.filter(F.col("props").isNotNull()).createOrReplaceTempView("variant_events")
    return spark.sql(
        """
        SELECT event_id,
               variant_get(parse_json(props), '$.k', 'int') AS prop_k,
               variant_get(parse_json(props), '$.missing', 'int') AS prop_missing
        FROM variant_events
        """
    )


# ---------------------------------------------------------------------------
# LISTAGG (SQL:2016 ordered string aggregation)
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
WITH agg AS (
  SELECT c_nationkey,
         string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
           AS segments_csv
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, segments_csv,
       CAST(len(string_split(segments_csv, ',')) AS BIGINT) AS n_segments
FROM agg
"""


@register("listagg_surface", oracle=_LISTAGG_ORACLE, tags=("agg", "sql"))
def listagg_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG — the SQL:2016 ordered string aggregation, new in
    Spark 4 — distinct market segments per nation as one
    deterministic CSV cell (DISTINCT + WITHIN GROUP ORDER BY make the
    cell reproducible; an unordered listagg is a flaky-test factory).
    The engine's previous spelling of this shape
    (``concat_ws(array_sort(collect_set(...)))``, collect_sorted_list)
    stays registered; this row pins that the standard surface agrees
    with it and with DuckDB's string_agg. One hash-agg; the cell size
    is bounded by the segment domain, not row count.
    """
    c = read_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("listagg_customer")
    # n_segments is derived from the cell in an OUTER select (both
    # engines): mixing listagg(DISTINCT) with COUNT(DISTINCT) in one
    # aggregate trips a Spark 4.1 ListAgg.withNewChildrenInternal
    # ClassCastException when RewriteDistinctAggregates transforms the
    # plan — worked around, not worked on, since the derived count is
    # equivalent.
    return spark.sql(
        """
        WITH agg AS (
          SELECT c_nationkey,
                 listagg(DISTINCT c_mktsegment, ',')
                   WITHIN GROUP (ORDER BY c_mktsegment) AS segments_csv
          FROM listagg_customer GROUP BY c_nationkey
        )
        SELECT c_nationkey, segments_csv,
               CAST(size(split(segments_csv, ',')) AS BIGINT) AS n_segments
        FROM agg
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL (analyst-ergonomics surface)
# ---------------------------------------------------------------------------

_GROUP_BY_ALL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""


@register("group_by_all_surface", oracle=_GROUP_BY_ALL_ORACLE, tags=("agg", "sql"))
def group_by_all_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL — the analyst-ergonomics syntax
    (group on every non-aggregate select item) DuckDB popularized and
    Spark 4 adopted; this row pins that both engines infer the SAME
    grouping keys for a mixed select list. Semantically identical to
    the explicit pricing_summary-style aggregate: one map-combined
    hash-agg, exact decimal sum convention.
    """
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gba_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM gba_lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------

_BAG_OPS_ORACLE = """
WITH a AS (
  SELECT o_orderpriority AS pri FROM orders WHERE o_orderkey % 2 = 0
),
b AS (
  SELECT o_orderpriority AS pri FROM orders WHERE o_orderkey % 2 = 1
)
SELECT 'except_all' AS op, pri FROM (SELECT pri FROM a EXCEPT ALL SELECT pri FROM b)
UNION ALL
SELECT 'intersect_all' AS op, pri
FROM (SELECT pri FROM a INTERSECT ALL SELECT pri FROM b)
"""


@register("bag_set_ops_surface", oracle=_BAG_OPS_ORACLE, tags=("sql",))
def bag_set_ops_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — BAG semantics set operations
    (multiplicity max(m−n, 0) and min(m, n) per value), the variant
    the DISTINCT-semantics rows (except_nations / intersect_nations)
    cannot express and the one reconciliation jobs actually need
    ("how many of each priority does snapshot A have beyond B?").
    Catalyst plans both as aggregate-count + generate replication —
    one shuffle per side on the value, never a join. The multiset
    output is compared whole (order-insensitive driver hash =
    multiset equality).
    """
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderpriority").alias("pri")
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderpriority").alias("pri")
    )
    return (
        a.exceptAll(b)
        .select(F.lit("except_all").alias("op"), "pri")
        .unionByName(
            a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "pri")
        )
    )


# ---------------------------------------------------------------------------
# Bitmap-aggregate distinct counting (Spark 4 bitmap functions)
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT c_nationkey,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_bitmap,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_exact,
       TRUE AS bitmap_exact
FROM customer GROUP BY c_nationkey
"""


@register("bitmap_distinct_counts", oracle=_BITMAP_ORACLE, tags=("agg", "sketch"))
def bitmap_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark 4's bitmap aggregates:
    bucket keys with bitmap_bucket_number, OR the per-bucket position
    bitmaps with bitmap_construct_agg, sum bitmap_count over buckets —
    the roaring-bitmap pattern warehouses use to make COUNT DISTINCT
    cheap AND mergeable (pre-aggregated per day/segment, bitmaps OR
    together losslessly — HLL's mergeability with none of its error;
    the cost is bitmap storage bounded by the key domain). The result
    must EQUAL plain COUNT(DISTINCT), asserted row-wise; the oracle
    (no bitmap functions in DuckDB) states exactly that identity.
    Two-level hash-agg, both map-combinable.
    """
    c = read_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("bitmap_customer")
    return spark.sql(
        """
        WITH buckets AS (
          SELECT c_nationkey,
                 bitmap_bucket_number(c_custkey) AS bucket,
                 bitmap_construct_agg(bitmap_bit_position(c_custkey)) AS bm
          FROM bitmap_customer
          GROUP BY c_nationkey, bitmap_bucket_number(c_custkey)
        ),
        summed AS (
          SELECT c_nationkey,
                 CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_bitmap
          FROM buckets GROUP BY c_nationkey
        ),
        exact AS (
          SELECT c_nationkey,
                 CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_exact
          FROM bitmap_customer GROUP BY c_nationkey
        )
        SELECT s.c_nationkey, s.n_distinct_bitmap, e.n_distinct_exact,
               s.n_distinct_bitmap = e.n_distinct_exact AS bitmap_exact
        FROM summed s JOIN exact e ON s.c_nationkey = e.c_nationkey
        """
    )


# ---------------------------------------------------------------------------
# Per-source dedup-rate profile
# ---------------------------------------------------------------------------

_DEDUP_RATE_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
         AS dup_rate
FROM documents GROUP BY source
"""


@register("doc_dedup_rate_by_source", oracle=_DEDUP_RATE_ORACLE, tags=("dedup", "llm"))
def doc_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate: docs vs distinct content
    hashes, the first column of every corpus intake report (a source
    whose dup_rate spikes is a crawler re-fetching or a mirror — cut
    it BEFORE the expensive near-dup stages run). COUNT(DISTINCT) runs
    on the 32-byte digest, not the document, so the shuffle carries
    hashes; the ratio is a division of exact integers, ROUND 6.
    """
    d = read_table(spark, sf_dir, "documents")
    uniq = F.count_distinct(F.md5("text"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        uniq.alias("n_unique_texts"),
        F.round(
            F.lit(1.0) - uniq.cast("double") / F.count("*"), 6
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# Token-budget histogram (training-batch planning)
# ---------------------------------------------------------------------------

_TOKEN_BUDGET_ORACLE = r"""
WITH tc AS (
  SELECT len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
  FROM documents
)
SELECT CAST(LEAST(n_tokens // 25, 8) AS INTEGER) AS bucket_25,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM tc GROUP BY 1
"""


@register("token_budget_histogram", oracle=_TOKEN_BUDGET_ORACLE, tags=("llm", "text"))
def token_budget_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram in 25-token buckets (capped at 200+) with
    the total token mass per bucket — the two numbers that size a
    training run: where the documents are versus where the TOKENS are
    (a corpus can be 80% short docs yet 80% long-doc tokens, which
    decides pack_sequences_greedy's context length). Scan-side token
    count + one hash-agg on a 9-value domain; all integer.
    """
    d = read_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return (
        d.select(n.alias("n_tokens"))
        .groupBy(
            F.least(F.expr("n_tokens div 25"), F.lit(8))
            .cast("int")
            .alias("bucket_25")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )
