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

    Scale: NO join at all. Each order's distinct parts collapse to
    one sorted array in a single hash-agg (map-side partial
    collect_set, shuffle at order grain); the a<b pairs are generated
    SCAN-SIDE from that array with index-aware ``transform`` +
    ``slice`` — per-order cost is basket-size², bounded by the
    per-order line count (TPC-H ≤ 7; at 100 TB a ``slice`` cap on the
    sorted array is the standard basket-size guard, one expression
    away). Pair counting is a map-side-combinable hash-agg and the
    final top-k is a TakeOrdered over aggregated pairs, never a
    global sort of raw pairs. This replaced a basket self-join whose
    build side was fact-sized (~600k rows at sf0.1): AQE dutifully
    broadcast it under the 32 MB threshold — the kind of plan that
    dies at 100 TB when the build side is 100 GB. The array spelling
    has no join operator to mis-size (measured 1.43 s → ~0.6 s at
    sf0.1). Lambda-CSE note: ``parts`` is a post-aggregate attribute,
    not an inlined expression, so referencing it inside the lambdas
    is per-element cheap (tests/test_plans.py lambda gate still
    applies engine-wide).
    """
    baskets = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    parts = F.col("parts")
    pair_arr = F.flatten(
        F.transform(
            parts,
            lambda x, i: F.transform(
                F.slice(parts, i + F.lit(2), F.size(parts)),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .groupBy("part_a", "part_b")
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


# ---------------------------------------------------------------------------
# Per-group OLS regression surface (exact-sum formulation)
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4)))
           AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,2)))
           AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4)))
           AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


@register("regr_ols_surface", oracle=_REGR_ORACLE, tags=("agg", "stats"))
def regr_ols_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares regression (slope / intercept /
    r² of extendedprice on quantity per return flag) from the five
    classical sufficient statistics — the distributed formulation:
    Σx, Σy, Σxy, Σx², Σy² are map-side-combinable partial sums, so the
    whole regression is ONE hash-agg pass at any scale, never a
    centered two-pass algorithm. Engine-native ``regr_slope`` et al.
    accumulate doubles in partition order (non-deterministic across
    engines AND runs); here every sum is EXACT decimal (inputs are
    2-dp decimals, so the products have bounded scale), and the final
    arithmetic is an identical double expression on both engines,
    rounded to 6 dp.
    """
    l = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((q * p).cast("decimal(24,4)")).cast("double").alias("sxy"),
        F.sum((q * q).cast("decimal(18,2)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(28,4)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Continuous (interpolated) percentile surface
# ---------------------------------------------------------------------------

_PCONT_ORACLE = """
SELECT o_orderpriority,
       ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 6)
         AS p25,
       ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
         AS p50,
       ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice), 6)
         AS p95
FROM orders
GROUP BY o_orderpriority
"""


@register("percentile_cont_surface", oracle=_PCONT_ORACLE, tags=("agg", "stats"))
def percentile_cont_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_cont: the INTERPOLATED order statistic (linear
    between the two straddling values at rank p·(n−1)), complementing
    percentile_disc_surface's exact-data-value variant. Spark's exact
    ``percentile`` implements the same definition as SQL
    percentile_cont; outputs rounded to 6 dp (one interpolation
    division in double — last-ulp safety).

    Scale: exact percentiles need the per-group sorted values — fine
    keyed by a 5-value priority column, but the 100 TB path for
    high-cardinality keys is approx_percentile_bounded (registered),
    which trades a 1e-4 rank error for a mergeable sketch. Both are
    registered so the trade-off is explicit in the inventory.
    """
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.round(
                F.expr(f"percentile(o_totalprice, {pq})"), 6
            ).alias(name)
            for pq, name in ((0.25, "p25"), (0.5, "p50"), (0.95, "p95"))
        ]
    )


# ---------------------------------------------------------------------------
# ANN recall measurement (index-quality gate)
# ---------------------------------------------------------------------------

# Reuse the exact spellings from llm_ops so the oracle stays literally
# in sync with the two queries it grades.
from ucl_data_pipeline_spark.plans.llm_ops import (  # noqa: E402
    _SQL_BUCKET,
    _SQL_COS,
    _TOPK_MAX_QUERIES,
)

_RECALL_ORACLE = f"""
WITH exact3 AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _TOPK_MAX_QUERIES}
   AND c.vec_id <> q.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) <= 3
), approx3 AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
   AND {_SQL_BUCKET.format(side='q')} = {_SQL_BUCKET.format(side='c')}
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id ORDER BY {_SQL_COS} DESC, c.vec_id) <= 3
)
SELECT e.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       ROUND(COUNT(a.neighbor_id) / 3.0, 6) AS recall_at_3
FROM exact3 e
LEFT JOIN approx3 a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


@register("ann_recall_at_3", oracle=_RECALL_ORACLE, tags=("vector", "llm", "agg"))
def ann_recall_at_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the sign-bit-LSH ANN index against the exact
    brute-force baseline, per query — the quality gate a pipeline runs
    BEFORE switching its retrieval path to an approximate index, and
    re-runs whenever the index is rebuilt. Composes the two registered
    queries (embedding_lsh_topk vs embedding_topk_cosine) so the
    measurement can never drift from what it grades.

    Scale: the exact side is the expensive part, but recall is always
    measured on a bounded QUERY SAMPLE (here vec_id % 100), so the
    brute-force cost is O(sample·n) once per index build, not a
    production path. The overlap join is per-(query, neighbor) on two
    ≤3-row-per-query tables — negligible.
    """
    from pyspark.sql import Window

    from ucl_data_pipeline_spark.plans.llm_ops import (
        embedding_lsh_topk,
        embedding_topk_cosine,
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    exact3 = (
        embedding_topk_cosine(spark, sf_dir)  # registered exact top-5
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    approx3 = embedding_lsh_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact3.join(approx3, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / 3.0, 6).alias("recall_at_3"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-snapshot incremental dedup (corpus ingestion gate)
# ---------------------------------------------------------------------------

_XSNAP_ORACLE = r"""
WITH corpus AS (
  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    AS norm_hash
  FROM documents WHERE doc_id % 4 <> 0
), incoming AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_hash
  FROM documents WHERE doc_id % 4 = 0
), novel AS (
  SELECT i.* FROM incoming i ANTI JOIN corpus c USING (norm_hash)
)
SELECT doc_id, source, norm_hash
FROM novel
QUALIFY row_number() OVER (PARTITION BY norm_hash ORDER BY doc_id) = 1
"""


@register("dedup_cross_snapshot", oracle=_XSNAP_ORACLE, tags=("dedup", "llm"))
def dedup_cross_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: an incoming batch (doc_id % 4 = 0
    stands in for today's crawl) is admitted only where its normalized
    content hash (a) does not already exist in the standing corpus
    (LEFT ANTI join on the digest) and (b) is unique within the batch
    (first doc_id wins). This is THE shape of continuous corpus
    building at 100 TB — history is never rescanned per ingest; the
    corpus side reduces to its distinct 16-byte digests (at scale: a
    digest index table maintained incrementally, exactly what
    incremental_agg_merge does for aggregates), the anti join shuffles
    32-byte keys rather than documents, and the within-batch dedup
    windows over the BATCH only.
    """
    d = read_table(spark, sf_dir, "documents")
    h = F.md5(TX.normalized_text("text")).alias("norm_hash")
    corpus = (
        d.filter(F.col("doc_id") % 4 != 0).select(h).distinct()
    )
    incoming = d.filter(F.col("doc_id") % 4 == 0).select("doc_id", "source", h)
    novel = incoming.join(corpus, "norm_hash", "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("norm_hash").orderBy("doc_id")
    return (
        novel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "norm_hash")
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------

from ucl_data_pipeline_spark.plans.registry import sql_knuth_bucket  # noqa: E402
from ucl_data_pipeline_spark.functions.scalar import knuth_bucket  # noqa: E402

_N_SHARDS = 8

# Per-(doc, shard) weight: the width-safe Knuth hash of a key derived
# from both ids; argmax over shards with lowest-shard tie-break.
_RDV_W = sql_knuth_bucket("d.doc_id * 31 + s.shard", 1_000_000)

def rendezvous_pick(d: DataFrame, n_shards: int) -> DataFrame:
    """(doc_id, shard) assignment by highest-random-weight hashing —
    factored out so the minimal-relocation property (dropping a shard
    moves ONLY the docs that lived on it) is unit-testable across
    shard counts (tests/test_round4.py)."""
    spark = d.sparkSession
    shards = spark.range(n_shards).select(F.col("id").cast("int").alias("shard"))
    w = d.crossJoin(F.broadcast(shards)).select(
        "doc_id",
        "shard",
        knuth_bucket(
            F.col("doc_id") * 31 + F.col("shard"), 1_000_000
        ).alias("wt"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("wt"), "shard")
    return (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", "shard")
    )


_RDV_ORACLE = f"""
WITH s AS (
  SELECT unnest(generate_series(0, {_N_SHARDS - 1})) AS shard
), w AS (
  SELECT d.doc_id, s.shard, {_RDV_W} AS wt
  FROM documents d CROSS JOIN s
), pick AS (
  SELECT doc_id, shard
  FROM w
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, shard) = 1
)
SELECT shard,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM pick
GROUP BY shard
"""


@register("shard_assignment_rendezvous", oracle=_RDV_ORACLE, tags=("llm", "agg"))
def shard_assignment_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard placement: each doc
    goes to the shard maximizing a per-(doc, shard) hash weight —
    per-shard counts + id ranges as the placement audit. The property
    that matters at 100 TB: adding/removing ONE shard relocates only
    ~1/N of keys (each doc moves only if the new shard wins its
    argmax), versus mod-N hashing which relocates almost everything —
    this is how an engine re-shards a corpus, a feature store, or an
    ANN index incrementally.

    Shape: the weight table is a narrow projection of doc_id over a
    {_N_SHARDS}-row broadcast grid (no data shuffle to score), the
    argmax is a window keyed by doc_id, and the audit is one hash-agg.
    Deterministic: hash-derived weights (no RNG), lowest-shard
    tie-break, same width-safe arithmetic on both engines.
    """
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    pick = rendezvous_pick(d, _N_SHARDS)
    return pick.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# ---------------------------------------------------------------------------
# Robust z-score outliers (median / MAD)
# ---------------------------------------------------------------------------

_ROBUST_ORACLE = """
WITH med AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med))
           AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - m.med) / (1.4826 * d.mad), 6) AS robust_z
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0
  AND abs((e.value - m.med) / (1.4826 * d.mad)) > 2.5
"""


@register("robust_zscore_outliers", oracle=_ROBUST_ORACLE, tags=("agg", "stats"))
def robust_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection with MEDIAN/MAD instead of mean/stddev
    (zscore_by_group's robust sibling): |x − median| > 2.5·(1.4826·MAD)
    flags heavy-tail anomalies without the masking problem — a single
    extreme value inflates a stddev enough to hide itself, but cannot
    move a median. The workhorse quality gate for skewed quantities
    (the events value column has real tails; uniform columns like
    o_totalprice max out at |z|≈1.4 by construction).

    Determinism: percentile_disc picks ACTUAL data values (no
    interpolation arithmetic to diverge), so median and MAD are
    bit-identical across engines; the final score is one identical
    double expression rounded to 6 dp.

    Scale: two grouped exact medians over a bounded key domain + two
    broadcast-sized joins back to the facts; for high-cardinality keys
    the medians swap to approx_percentile sketches (registered
    separately) without changing the score expression.
    """
    e = read_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
        ).alias("med")
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY abs(value - med))"
        ).alias("mad")
    )
    z = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    # MAD = 0 (a group where >50% of values are identical) would make z
    # divide by zero — non-ANSI Spark NULL-drops such rows, ANSI throws,
    # DuckDB yields inf; excluding the degenerate groups explicitly (and
    # identically in the oracle) keeps all three deterministic.
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.round(z, 6).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# Pointwise mutual information of co-occurring token pairs
# ---------------------------------------------------------------------------

_PMI_MIN_DF = 25
_PMI_MAX_DF = 450
_PMI_MIN_CO = 50

_PMI_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
    FROM documents
  )
), df AS (
  SELECT token, COUNT(*) AS df FROM tok GROUP BY token
  HAVING COUNT(*) BETWEEN {_PMI_MIN_DF} AND {_PMI_MAX_DF}
), keep AS (
  SELECT t.doc_id, t.token FROM tok t JOIN df USING (token)
), pairs AS (
  SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS co
  FROM keep a JOIN keep b
    ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_PMI_MIN_CO}
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok
)
SELECT p.tok_a, p.tok_b, p.co,
       ROUND(log2(CAST(p.co AS DOUBLE) * n.n_docs
                  / (CAST(da.df AS DOUBLE) * db.df)), 6) AS pmi
FROM pairs p
JOIN df da ON da.token = p.tok_a
JOIN df db ON db.token = p.tok_b
CROSS JOIN n
"""


@register("token_pmi_pairs", oracle=_PMI_ORACLE, tags=("llm", "text", "agg"))
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of document-level token
    co-occurrence: PMI(a,b) = log2(co·N / (df_a·df_b)) for mid-df
    tokens (df in [_PMI_MIN_DF, _PMI_MAX_DF] = [25, 450] — stop words
    excluded by the ceiling, noise by the floor) with co-occurrence
    ≥ _PMI_MIN_CO = 50. The classical collocation /
    phrase-mining signal a text pipeline feeds into tokenizer-merge or
    feature engineering decisions.

    Scale: the df window is the quadratic-blowup guard — pairing runs
    only over informative tokens (same principle as
    jaccard_shingle_pairs' stop-shingle cap), keyed by doc_id in ONE
    co-partitioned self-join; counts are exact integers so the single
    log2 expression is cross-engine deterministic at 6 dp. df and N
    are broadcast-sized side tables.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(TX.distinct_tokens("text")).alias("token")
    )
    df_t = (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df").between(_PMI_MIN_DF, _PMI_MAX_DF))
    )
    keep = tok.join(F.broadcast(df_t.select("token")), "token")
    a = keep.select(F.col("doc_id").alias("k"), F.col("token").alias("tok_a"))
    b = keep.select(F.col("doc_id").alias("k"), F.col("token").alias("tok_b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= _PMI_MIN_CO)
    )
    n_docs = tok.select("doc_id").distinct().count()
    da = df_t.select(F.col("token").alias("tok_a"), F.col("df").alias("df_a"))
    db = df_t.select(F.col("token").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "co",
            F.round(
                F.log2(
                    F.col("co").cast("double")
                    * F.lit(n_docs)
                    / (F.col("df_a").cast("double") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP)
# ---------------------------------------------------------------------------

_TWAP_ORACLE = """
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER w AS t_next
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), seg AS (
  SELECT user_id,
         t_next - t AS dt_us,
         CAST(ROUND(value * (CAST(t_next - t AS DOUBLE) / 1000000.0), 6)
              AS DECIMAL(28,6)) AS wv
  FROM seq WHERE t_next IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       ROUND(CAST(SUM(wv) AS DOUBLE)
             / (CAST(SUM(dt_us) AS DOUBLE) / 1000000.0), 6) AS twap
FROM seg
GROUP BY user_id
"""


@register("time_weighted_avg", oracle=_TWAP_ORACLE, tags=("temporal", "agg"))
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user: each reading weighted by how
    long it was current (interval to the next event), the correct mean
    for irregularly sampled series — an arithmetic mean over-weights
    bursts; TWAP is what metering, pricing (TWAP in trading), and
    sensor rollups actually need.

    Determinism: durations are exact integer microseconds; each
    value·dt product is one identical double op rounded to 6 dp, then
    summed EXACTLY in decimal; the final divide uses identical double
    operands on both engines. Ordering ties break on event_id.

    Scale: one window (single hash exchange on user_id) + one hash-agg
    on the same key — AQE reuses the partitioning, so the whole TWAP
    is ONE shuffle of the events table.
    """
    from pyspark.sql import Window

    from ucl_data_pipeline_spark.functions.scalar import epoch_us

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = epoch_us("ts")
    seq = ev.select(
        "user_id",
        "value",
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt_us = F.col("t_next") - F.col("t")
    wv = F.round(
        F.col("value") * (dt_us.cast("double") / 1_000_000.0), 6
    ).cast("decimal(28,6)")
    return (
        seq.select("user_id", dt_us.alias("dt_us"), wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(
                F.sum("wv").cast("double")
                / (F.sum("dt_us").cast("double") / 1_000_000.0),
                6,
            ).alias("twap"),
        )
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
), tot AS (
  SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type,
       CAST(p.n AS BIGINT) AS n,
       ROUND(CAST(p.n AS DOUBLE) / t.n_from, 6) AS p_transition
FROM pairs p JOIN tot t USING (from_type)
"""


@register(
    "event_transition_matrix", oracle=_TRANSITION_ORACLE, tags=("temporal", "agg")
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next=to | current=from) with exact pair counts — the
    behavioral-modeling primitive behind session prediction, funnel
    drop-off analysis, and (on token streams) the bigram LM this
    engine registers for text. Ties in the event ordering break on
    event_id so the sequence is deterministic.

    Scale: ONE window shuffle keyed by user_id produces every
    adjacent pair; the count and row-normalization aggregates run on
    the (from, to) domain — bounded by event-type cardinality squared,
    not by row count.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias(
            "p_transition"
        ),
    )


# ---------------------------------------------------------------------------
# Triangle counting on the trade graph
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH und AS (  -- undirected simple edges: canonical (lo, hi), no loops
  SELECT DISTINCT
         LEAST(s.s_nationkey, c.c_nationkey) AS a,
         GREATEST(s.s_nationkey, c.c_nationkey) AS b
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), per_node AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT n.n_nationkey AS node,
       COALESCE(p.n_triangles, 0) AS n_triangles
FROM nation n LEFT JOIN per_node p ON p.node = n.n_nationkey
"""


@register("triangle_count_trade", oracle=_TRIANGLE_ORACLE, tags=("graph", "join"))
def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count on the undirected nation trade graph —
    the clustering-coefficient numerator, the standard community-
    structure signal (and the classic MapReduce graph benchmark).
    DEGREE-ORDERED compact-forward enumeration: edges are re-directed
    from the lower to the higher endpoint in the total order
    (degree, node) — no global rank window needed, the tuple compares
    directly — and wedges form ONLY at each edge's source, i.e. at the
    triangle's LOWEST-DEGREE corner. Each wedge pair then probes the
    directed edge set once; since exactly one direction of (y, z)
    exists, each triangle is matched exactly once with no ordering
    filter.

    Scale: this is the real skew killer on power-law graphs — a hub of
    degree d contributes wedges only for the (few) neighbors that
    outrank it, so per-node wedge work is bounded by the h-index-like
    quantity min(d, #higher-degree-neighbors)², not d²; total work is
    O(E^1.5) worst-case (Chiba–Nishizeki bound) instead of Σd². The
    degree table is node-sized (broadcast); the O(V log V) order is
    implicit in the tuple comparison — no sort materialized. Edge
    derivation is the same dim-broadcast fact aggregation as pagerank;
    the triangle joins run on the aggregated 25-node edge table, not on
    facts. The oracle is enumeration-order invariant (per-node counts),
    so the id-canonical SQL grades this plan unchanged.
    """
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    und = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Re-direct each edge from the lower to the higher endpoint in the
    # (degree, node) total order; deg is node-sized → broadcast twice.
    with_deg = und.join(
        F.broadcast(deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))),
        "a",
    ).join(
        F.broadcast(deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))),
        "b",
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    dir_e = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    w1 = dir_e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    w2 = dir_e.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    e3 = dir_e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = w1.join(w2, "x").filter(F.col("y") != F.col("z")).join(e3, ["y", "z"])
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    per_node = corners.groupBy("node").agg(F.count("*").alias("n_triangles"))
    nodes = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
