"""Round-6 operators: the IVF nprobe=2 index variant with its recall
gate (the recall/latency knob a production IVF index actually tunes —
``embedding_ivf_topk``'s docstring promises it), a Bloom-filter
runtime-pruning family (build + false-positive-rate audit — the
dim-to-fact semi-join filter a 100 TB engine pushes below the
shuffle), and four evaluation/statistics operators a training-data
pipeline reports: Spearman rank correlation, a calibration curve with
per-bin Brier scores, Cohen's kappa inter-rater agreement, and the
Kish effective sample size of resample-to-uniform importance weights.

Registry conventions apply (decimal-exact aggregates, atomic output
columns, oracle dtype CASTs, ANSI-neutral arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.plans.extras4 import (
    _EXACT3_SQL,
    _recall_oracle,
    _recall_vs_exact,
)
from ucl_data_pipeline_spark.plans.llm_ops import _TOPK_MAX_QUERIES
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# IVF ANN, nprobe=2 — probe the TWO nearest inverted lists
# ---------------------------------------------------------------------------

_IVF2_ORACLE = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
cent AS (
  SELECT label,
         list(centroid_val ORDER BY pos) AS cvec
  FROM (
    SELECT e.label, i AS pos,
           CAST(SUM(CAST(e.embedding[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
             AS centroid_val
    FROM e, unnest(generate_series(1, len(e.embedding))) AS t(i)
    GROUP BY e.label, i
  )
  GROUP BY label
),
probe AS (
  SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.label AS probe_label
  FROM e q CROSS JOIN cent c
  WHERE q.vec_id % 100 = 0
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id
    ORDER BY list_dot_product(q.embedding, c.cvec)
               / nullif(sqrt(list_dot_product(q.embedding, q.embedding))
                        * sqrt(list_dot_product(c.cvec, c.cvec)), 0.0) DESC,
             c.label
  ) <= 2
)
SELECT p.query_id, p.probe_label, c.vec_id AS neighbor_id,
       list_dot_product(p.q_emb, c.embedding)
         / nullif(sqrt(list_dot_product(p.q_emb, p.q_emb))
                  * sqrt(list_dot_product(c.embedding, c.embedding)), 0.0)
         AS cos_sim
FROM probe p
JOIN e c ON c.label = p.probe_label AND c.vec_id <> p.query_id
QUALIFY row_number() OVER (
  PARTITION BY p.query_id
  ORDER BY cos_sim DESC, c.vec_id
) <= 3
"""


def _ivf_centroids(e: DataFrame) -> DataFrame:
    """Per-label coarse-quantizer centroids (label, cvec) with
    exact-decimal component means — shared by the nprobe=2 index and
    the recall frontier so the codebook can never drift between the
    index and its measurement."""
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                / F.count("*")
            ).alias("centroid_val")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s["centroid_val"],
            ).alias("cvec")
        )
    )


@register("embedding_ivf2_topk", oracle=_IVF2_ORACLE, tags=("vector", "llm"))
def embedding_ivf2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: each query probes its TWO nearest
    inverted lists (vs ``embedding_ivf_topk``'s nprobe=1), then exact
    cosine top-3 runs over the union of both lists' vectors. This is
    the knob a production IVF index tunes — recall rises monotonically
    with nprobe (recall gate: ``ann_recall_ivf2_at_3``, asserted ≥ the
    nprobe=1 gate's in tests) at linearly more candidate work.

    Scale shape is unchanged from nprobe=1: the centroid codebook is
    one tiny broadcast table; the probe step emits nprobe rows per
    query; candidates join on the list id (a partition key of the
    embedding table at scale → nprobe partition-pruned scans per
    query). Every candidate vector lives in exactly ONE list, so the
    two probed lists are disjoint — no dedup stage is needed before
    the re-rank window. Exact-decimal centroid means keep the coarse
    quantizer cross-engine deterministic.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", VX.as_double("embedding").alias("embedding")
    )
    cent = _ivf_centroids(e)
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        VX.cosine("q_emb", "cvec").desc(), F.col("label")
    )
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= 2)
        .select("query_id", "q_emb", F.col("label").alias("probe_label"))
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
    )
    topk_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        c.join(
            F.broadcast(probe),
            (F.col("c_label") == F.col("probe_label"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "probe_label",
            "neighbor_id",
            VX.cosine("q_emb", "c_emb").alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(topk_w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "ann_recall_ivf2_at_3",
    oracle=_recall_oracle(_IVF2_ORACLE),
    tags=("vector", "llm", "agg"),
)
def ann_recall_ivf2_at_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF nprobe=2 index vs the exact baseline —
    quality gate for ``embedding_ivf2_topk``. Probing a second list
    can only ADD candidates, so per-query recall dominates the
    nprobe=1 gate's row-for-row (tests/test_round6.py pins the
    engine-wide monotonicity); the gap between the two gates is the
    measured payoff of doubling candidate work.
    """
    return _recall_vs_exact(
        spark, sf_dir, embedding_ivf2_topk(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# IVF recall/latency frontier: recall@3 and candidate work per nprobe
# ---------------------------------------------------------------------------

_FRONTIER_NPROBES = (1, 2, 3)
_QUERY_ID_CEIL = 100 * _TOPK_MAX_QUERIES

_CENT_SQL = """
  SELECT label,
         list(centroid_val ORDER BY pos) AS cvec
  FROM (
    SELECT e.label, i AS pos,
           CAST(SUM(CAST(e.embedding[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
             AS centroid_val
    FROM e, unnest(generate_series(1, len(e.embedding))) AS t(i)
    GROUP BY e.label, i
  )
  GROUP BY label
"""

_FRONTIER_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
cent AS ({_CENT_SQL}),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM e
  WHERE vec_id % 100 = 0 AND vec_id < {_QUERY_ID_CEIL}
),
ranked AS (
  SELECT q.query_id, q.q_emb, c.label,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.q_emb, c.cvec)
                      / nullif(sqrt(list_dot_product(q.q_emb, q.q_emb))
                               * sqrt(list_dot_product(c.cvec, c.cvec)), 0.0)
                    DESC,
                    c.label
         ) AS rn
  FROM q CROSS JOIN cent c
),
np AS (SELECT unnest([{', '.join(str(n) for n in _FRONTIER_NPROBES)}]) AS nprobe),
probe AS (
  SELECT np.nprobe, r.query_id, r.q_emb, r.label
  FROM ranked r CROSS JOIN np WHERE r.rn <= np.nprobe
),
cand AS (
  SELECT p.nprobe, p.query_id, c.vec_id AS neighbor_id,
         list_dot_product(p.q_emb, c.embedding)
           / nullif(sqrt(list_dot_product(p.q_emb, p.q_emb))
                    * sqrt(list_dot_product(c.embedding, c.embedding)), 0.0)
           AS cos_sim
  FROM probe p
  JOIN e c ON c.label = p.label AND c.vec_id <> p.query_id
),
ncand AS (
  SELECT nprobe, query_id, COUNT(*) AS n_cand FROM cand GROUP BY 1, 2
),
top3 AS (
  SELECT nprobe, query_id, neighbor_id FROM cand
  QUALIFY row_number() OVER (
    PARTITION BY nprobe, query_id ORDER BY cos_sim DESC, neighbor_id) <= 3
),
exact3 AS ({_EXACT3_SQL}),
hits AS (
  SELECT np.nprobe, e3.query_id, COUNT(t.neighbor_id) AS n_hits
  FROM exact3 e3
  CROSS JOIN np
  LEFT JOIN top3 t
    ON t.nprobe = np.nprobe AND t.query_id = e3.query_id
   AND t.neighbor_id = e3.neighbor_id
  GROUP BY 1, 2
)
SELECT CAST(h.nprobe AS INTEGER) AS nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(COALESCE(nc.n_cand, 0)) AS BIGINT) AS n_candidates,
       ROUND(SUM(h.n_hits) / (3.0 * COUNT(*)), 6) AS mean_recall_at_3
FROM hits h
LEFT JOIN ncand nc ON nc.nprobe = h.nprobe AND nc.query_id = h.query_id
GROUP BY h.nprobe
"""


@register(
    "ann_recall_frontier",
    oracle=_FRONTIER_ORACLE,
    tags=("vector", "llm", "agg", "gate"),
)
def ann_recall_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall/latency frontier as a driver-verifiable artifact:
    one row per nprobe ∈ {1, 2, 3} with the mean recall@3 over the
    graded query sample and the TOTAL candidate vectors scored — the
    exact tradeoff curve a production index tunes (recall is monotone
    non-decreasing in nprobe because probing another list only ADDS
    candidates; candidate work grows ≈linearly in nprobe but stays
    sub-linear in corpus size: nprobe/k of the vectors per query).

    One centroid build (shared helper `_ivf_centroids` — the same
    codebook as ``embedding_ivf2_topk``), one ranked probe pass up to
    max(nprobe), then the per-nprobe variants are FILTERS of that one
    ranking — the whole curve costs one scan more than the single
    widest index, never |nprobes| independent builds. The candidate
    join is label-equi (partition-pruned at scale) against the
    broadcast probe set; the exact baseline is the registry's bounded
    brute-force top-3, so this gate composes the same pieces the
    driver already checks.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", VX.as_double("embedding").alias("embedding")
    )
    cent = _ivf_centroids(e)
    q = e.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _QUERY_ID_CEIL)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    rank_w = Window.partitionBy("query_id").orderBy(
        VX.cosine("q_emb", "cvec").desc(), F.col("label")
    )
    max_np = max(_FRONTIER_NPROBES)
    ranked = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= max_np)
        .select("query_id", "q_emb", "label", "rn")
    )
    nps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(n) for n in _FRONTIER_NPROBES])
        ).alias("nprobe")
    )
    probe = ranked.crossJoin(F.broadcast(nps)).filter(
        F.col("rn") <= F.col("nprobe")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
    )
    cand = c.join(
        F.broadcast(probe),
        (F.col("c_label") == F.col("label"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "nprobe",
        "query_id",
        "neighbor_id",
        VX.cosine("q_emb", "c_emb").alias("cos_sim"),
    # twice-consumed (ncand agg + top3 window) and expensive to build
    # (the cosine-scored probe join): without the persist the whole
    # candidate subtree — embeddings scan, probe ranking, candidate
    # join, per-candidate cosines — executed once per consumer (the
    # r12 plan dump showed 8 embeddings scans / 14 Windows in one
    # query; persist cuts it to one build, measured 3.5 → 2.9 s at
    # sf0.1). The theil_sen multi-pass persist precedent.
    ).persist()
    ncand = cand.groupBy("nprobe", "query_id").agg(
        F.count("*").alias("n_cand")
    )
    top3_w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    top3 = (
        cand.withColumn("rn3", F.row_number().over(top3_w))
        .filter(F.col("rn3") <= 3)
        .select("nprobe", "query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    from ucl_data_pipeline_spark.plans.llm_ops import embedding_topk_cosine

    exact_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    exact3 = (
        embedding_topk_cosine(spark, sf_dir)
        .withColumn("rn", F.row_number().over(exact_w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    hits = (
        exact3.crossJoin(F.broadcast(nps))
        .join(top3, ["nprobe", "query_id", "neighbor_id"], "left")
        .groupBy("nprobe", "query_id")
        .agg(F.count("hit").alias("n_hits"))
    )
    return (
        hits.join(ncand, ["nprobe", "query_id"], "left")
        .groupBy("nprobe")
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum(F.coalesce(F.col("n_cand"), F.lit(0)))
            .cast("bigint")
            .alias("n_candidates"),
            F.round(F.sum("n_hits") / (3.0 * F.count("*")), 6).alias(
                "mean_recall_at_3"
            ),
        )
        .select(
            F.col("nprobe").cast("int").alias("nprobe"),
            "n_queries",
            "n_candidates",
            "mean_recall_at_3",
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime pruning (build + false-positive-rate audit)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 4096        # m: filter size in bits
_BLOOM_WORDS = 512        # stored as 8-bit words (overflow-free bit_or)
_BLOOM_BAL = 9000         # member predicate: c_acctbal > threshold


def _hexfold_sql(hx: str, start: int, n: int) -> str:
    """DuckDB spelling of Spark ``conv(substring(hx, start, n), 16, 10)``
    (DuckDB has no conv): left fold acc·16+nibble over n hex digits —
    the same overflow-free pattern as checksum_table (extras2.py)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series({start}, {start + n - 1}), "
        f"i -> CAST(strpos('0123456789abcdef', substr({hx}, i, 1)) - 1 "
        "AS BIGINT))), (a, b) -> a * 16 + b)"
    )


_BLOOM_BUILD_SQL = f"""
  SELECT word_idx, CAST(bit_or(CAST(1 AS BIGINT) << bit_pos) AS BIGINT) AS bits
  FROM (
    SELECT p // 8 AS word_idx, p % 8 AS bit_pos
    FROM (
      SELECT unnest([
        {_hexfold_sql('hx', 1, 8)} % {_BLOOM_BITS},
        {_hexfold_sql('hx', 9, 8)} % {_BLOOM_BITS}
      ]) AS p
      FROM (
        SELECT md5(CAST(c_custkey AS VARCHAR)) AS hx
        FROM customer WHERE c_acctbal > {_BLOOM_BAL}
      )
    )
  )
  GROUP BY word_idx
"""

_BLOOM_WORDS_ORACLE = f"""
SELECT CAST(word_idx AS INTEGER) AS word_idx, bits
FROM ({_BLOOM_BUILD_SQL})
"""


def _bloom_positions(key):
    """Two bloom bit positions for a key column: independent 32-bit
    slices of one md5, reduced mod m — Spark side of _hexfold_sql."""
    hx = F.md5(key.cast("string"))
    p1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % _BLOOM_BITS
    p2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % _BLOOM_BITS
    return p1, p2


def _bloom_words_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > _BLOOM_BAL
    )
    p1, p2 = _bloom_positions(F.col("c_custkey"))
    pos = c.select(F.explode(F.array(p1, p2)).alias("p"))
    return (
        pos.select(
            (F.col("p") / 8).cast("long").alias("word_idx"),
            (F.col("p") % 8).alias("bit_pos"),
        )
        .groupBy("word_idx")
        .agg(
            # F.shiftleft takes a python-int bit count; a column-valued
            # shift needs the SQL spelling.
            F.bit_or(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(bit_pos AS INT))"
                )
            )
            .cast("bigint")
            .alias("bits")
        )
    )


@register(
    "bloom_filter_words", oracle=_BLOOM_WORDS_ORACLE, tags=("agg", "scale")
)
def bloom_filter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter BUILD over the high-balance customer keys (k=2
    hash functions = two independent 32-bit slices of one md5, m=4096
    bits stored as 8-bit words via bit_or — 8-bit words keep every
    shift far from BIGINT sign overflow on both engines). This is the
    runtime-filter structure a 100 TB engine ships to the fact-table
    scan to prune a semi join BEFORE the shuffle (Spark's own
    spark.sql.optimizer.runtimeFilter.* does exactly this internally);
    building it as one hash-agg over the dim side costs one tiny scan,
    and the result is a ≤512-row broadcast. Audit companion:
    ``bloom_semi_join_fpr`` measures its false-positive rate against
    ground truth. m is sized for the bench SF; production sizes m from
    the dim NDV (bits ≈ 1.44·k·ndv for a target FPR).
    """
    return _bloom_words_df(spark, sf_dir).select(
        F.col("word_idx").cast("int").alias("word_idx"), "bits"
    )


_BLOOM_FPR_ORACLE = f"""
WITH words AS ({_BLOOM_BUILD_SQL}),
members AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
),
probes AS (
  SELECT DISTINCT o_custkey AS k FROM orders
),
probed AS (
  SELECT p.k,
         EXISTS (SELECT 1 FROM members m WHERE m.c_custkey = p.k)
           AS is_member,
         COALESCE(w1.bits >> (p1 % 8) & 1, 0) = 1
           AND COALESCE(w2.bits >> (p2 % 8) & 1, 0) = 1 AS bloom_pass
  FROM (
    SELECT k,
           {_hexfold_sql('hx', 1, 8)} % {_BLOOM_BITS} AS p1,
           {_hexfold_sql('hx', 9, 8)} % {_BLOOM_BITS} AS p2
    FROM (SELECT k, md5(CAST(k AS VARCHAR)) AS hx FROM probes)
  ) p
  LEFT JOIN words w1 ON w1.word_idx = p.p1 // 8
  LEFT JOIN words w2 ON w2.word_idx = p.p2 // 8
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
         AS BIGINT) AS n_false_pos,
       ROUND(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
             * 1.0
             / NULLIF(COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END),
                      0), 6) AS fpr
FROM probed
"""


@register(
    "bloom_semi_join_fpr", oracle=_BLOOM_FPR_ORACLE, tags=("agg", "scale")
)
def bloom_semi_join_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join PRUNING AUDIT: probe every distinct
    orders.o_custkey against the ``bloom_filter_words`` filter and
    grade the pass set against true membership — n_pass is the rows a
    bloom-pruned scan would keep, n_false_pos / (non-members) is the
    measured FPR. True members can never fail (both their bits are
    set by construction), so the filter is provably safe to push below
    the join; the FPR is pure wasted-shuffle overhead, the number that
    decides whether shipping the filter pays at 100 TB. Probe-side
    cost: one md5 + two broadcast word lookups per DISTINCT key —
    scan-side, no shuffle of the fact table.
    """
    words = _bloom_words_df(spark, sf_dir)
    members = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > _BLOOM_BAL)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
        .withColumn("is_member", F.lit(True))
    )
    probes = (
        read_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    p1, p2 = _bloom_positions(F.col("k"))
    probed = probes.select("k", p1.alias("p1"), p2.alias("p2"))
    w1 = words.select(
        F.col("word_idx").alias("w1_idx"), F.col("bits").alias("bits1")
    )
    w2 = words.select(
        F.col("word_idx").alias("w2_idx"), F.col("bits").alias("bits2")
    )
    joined = (
        probed.join(
            F.broadcast(w1),
            (F.col("p1") / 8).cast("long") == F.col("w1_idx"),
            "left",
        )
        .join(
            F.broadcast(w2),
            (F.col("p2") / 8).cast("long") == F.col("w2_idx"),
            "left",
        )
        .join(F.broadcast(members), "k", "left")
        .select(
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
            (
                F.expr(
                    "shiftright(coalesce(bits1, CAST(0 AS BIGINT)), "
                    "CAST(p1 % 8 AS INT)) & 1 = 1"
                )
                & F.expr(
                    "shiftright(coalesce(bits2, CAST(0 AS BIGINT)), "
                    "CAST(p2 % 8 AS INT)) & 1 = 1"
                )
            ).alias("bloom_pass"),
        )
    )
    n_nonmember = F.count("*") - F.sum(
        F.when(F.col("is_member"), 1).otherwise(0)
    )
    fp = F.sum(
        F.when(F.col("bloom_pass") & ~F.col("is_member"), 1).otherwise(0)
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_members"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        fp.cast("bigint").alias("n_false_pos"),
        F.round(
            fp * 1.0 / F.nullif(n_nonmember, F.lit(0)), 6
        ).alias("fpr"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (midranks, exact-decimal moment sums)
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH r AS (
  SELECT l_returnflag AS flag,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)
             / 2.0 AS rx,
         RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1)
             / 2.0 AS ry
  FROM lineitem
),
m AS (
  SELECT flag,
         COUNT(*) AS n,
         SUM(CAST(rx AS DECIMAL(38,2))) AS sx,
         SUM(CAST(ry AS DECIMAL(38,2))) AS sy,
         SUM(CAST(rx AS DECIMAL(38,2)) * CAST(ry AS DECIMAL(38,2))) AS sxy,
         SUM(CAST(rx AS DECIMAL(38,2)) * CAST(rx AS DECIMAL(38,2))) AS sxx,
         SUM(CAST(ry AS DECIMAL(38,2)) * CAST(ry AS DECIMAL(38,2))) AS syy
  FROM r GROUP BY flag
)
SELECT flag,
       CAST(n AS BIGINT) AS n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(SQRT((n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (n * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                      0), 6) AS spearman_rho
FROM m
"""


@register(
    "spearman_price_qty", oracle=_SPEARMAN_ORACLE, tags=("stats", "window")
)
def spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and price per return
    flag — the rank-based complement to ``corr_matrix_lineitem``'s
    Pearson: invariant to monotone transforms and robust to the heavy
    tails money columns carry. Midranks (RANK + (peers−1)/2, the same
    tie convention as ``mann_whitney_u``) are half-integers, so every
    moment sum is EXACT in DECIMAL(38,2) — order-independent and
    bit-identical across engines; the final Pearson-on-ranks is a
    fixed double expression over those exact sums, ROUND 6 for its
    sqrt. Per-group windows shuffle once on the flag; the tie-count
    window rides the same exchange. At fact scale you'd pre-aggregate
    to value-grain (value, count) first and rank the grain — same
    midrank math, the ``ks_two_sample_drift`` trick.
    """
    li = read_table(spark, sf_dir, "lineitem")
    flag = F.col("l_returnflag")
    rx = (
        F.rank().over(Window.partitionBy(flag).orderBy("l_quantity"))
        + (
            F.count("*").over(
                Window.partitionBy(flag, F.col("l_quantity"))
            )
            - 1
        )
        / 2.0
    )
    ry = (
        F.rank().over(Window.partitionBy(flag).orderBy("l_extendedprice"))
        + (
            F.count("*").over(
                Window.partitionBy(flag, F.col("l_extendedprice"))
            )
            - 1
        )
        / 2.0
    )
    r = li.select(
        flag.alias("flag"),
        rx.cast("decimal(38,2)").alias("rx"),
        ry.cast("decimal(38,2)").alias("ry"),
    )
    m = r.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return m.select(
        "flag",
        n.cast("bigint").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / F.nullif(
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                F.lit(0.0),
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Calibration curve + Brier score for a deterministic scoring rule
# ---------------------------------------------------------------------------

_CALIB_ORACLE = """
WITH scored AS (
  SELECT LEAST(GREATEST(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000,
                        0), 1200000) AS num,
         CASE WHEN EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)
              THEN 1 ELSE 0 END AS y
  FROM customer c
)
SELECT CAST(LEAST(num * 10 // 1200000, 9) AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(num) AS DOUBLE) / 1200000.0 / COUNT(*) AS mean_p,
       CAST(SUM(y) AS BIGINT) * 1.0 / COUNT(*) AS frac_pos,
       CAST(SUM(CAST((num - y * 1200000) * (num - y * 1200000)
                     AS DECIMAL(38,0))) AS DOUBLE)
         / (1200000.0 * 1200000.0) / COUNT(*) AS brier_bin
FROM scored
GROUP BY 1
"""


@register(
    "brier_calibration_bins", oracle=_CALIB_ORACLE, tags=("stats", "agg")
)
def brier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve + per-bin Brier score for a scoring rule —
    the model-eval table every training pipeline ships: does predicted
    probability p match observed frequency in each decile bin? The
    score here is a DETERMINISTIC linear ramp of account balance,
    clamped — and computed entirely in INTEGER CENTS (num/1200000 is
    the probability), because a first attempt that decimal-cast an
    arbitrary double p hit the engines' different decimal rounding at
    the half-ulp boundary (the decimal-cast convention is only exact
    for values that ARE low-scale decimals, like money columns). With
    integer num, the bin, Σnum, Σy, and Σ(num−y·1200000)² are all
    exact integers/DECIMAL(38,0) — order-independent and bit-identical
    — and the displayed ratios are fixed double expressions over them.
    Outcome y is has-any-order (one broadcast semi-style join of the
    DISTINCT probe keys). One hash-agg on a 10-value key.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    num = F.least(
        F.greatest(
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
            + 100000,
            F.lit(0).cast("bigint"),
        ),
        F.lit(1200000).cast("bigint"),
    )
    scored = (
        c.join(
            F.broadcast(o.withColumn("has_order", F.lit(1))),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .select(
            num.alias("num"),
            F.coalesce("has_order", F.lit(0)).alias("y"),
        )
    )
    d2 = (F.col("num") - F.col("y") * 1200000) * (
        F.col("num") - F.col("y") * 1200000
    )
    return (
        scored.groupBy(
            F.least(
                (F.col("num") * 10 / 1200000).cast("bigint"), F.lit(9)
            )
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (
                F.sum("num").cast("double") / 1200000.0 / F.count("*")
            ).alias("mean_p"),
            (F.sum("y").cast("bigint") * 1.0 / F.count("*")).alias(
                "frac_pos"
            ),
            (
                F.sum(d2.cast("decimal(38,0)")).cast("double")
                / (1200000.0 * 1200000.0)
                / F.count("*")
            ).alias("brier_bin"),
        )
    )


# ---------------------------------------------------------------------------
# Cohen's kappa — inter-rater agreement of two deterministic raters
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH rated AS (
  SELECT CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(string_split(text, ' ')) >= 24 THEN 1 ELSE 0 END AS b
  FROM documents
),
counts AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
         SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00,
         SUM(a) AS na1,
         SUM(b) AS nb1
  FROM rated
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n11 AS BIGINT) AS n_both_pos,
       CAST(n00 AS BIGINT) AS n_both_neg,
       ROUND((n11 + n00) * 1.0 / n, 6) AS p_agree,
       ROUND(((n11 + n00) * 1.0 / n
              - (na1 * 1.0 / n * (nb1 * 1.0 / n)
                 + (n - na1) * 1.0 / n * ((n - nb1) * 1.0 / n)))
             / NULLIF(1.0 - (na1 * 1.0 / n * (nb1 * 1.0 / n)
                             + (n - na1) * 1.0 / n
                               * ((n - nb1) * 1.0 / n)), 0), 6) AS kappa
FROM counts
"""


@register("cohens_kappa_quality", oracle=_KAPPA_ORACLE, tags=("stats", "text"))
def cohens_kappa_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two document-quality raters — the
    inter-annotator-agreement statistic a labeling pipeline reports
    before trusting any single heuristic filter. Raters here are two
    deterministic engine heuristics (char-length ≥ 128 vs token-count
    ≥ 24); kappa corrects raw agreement for the agreement expected by
    chance from each rater's marginal rate. Everything reduces to one
    2×2 contingency count (a single map-combinable hash-agg over the
    corpus — no shuffle wider than 4 cells at any scale); kappa itself
    is a fixed double expression over those integers, NULLIF-guarded
    for the all-one-class degenerate case.
    """
    d = read_table(spark, sf_dir, "documents")
    rated = d.select(
        F.when(F.col("n_chars") >= 128, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ")) >= 24, 1)
        .otherwise(0)
        .alias("b"),
    )
    counts = rated.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)
        ).alias("n11"),
        F.sum(
            F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0)
        ).alias("n00"),
        F.sum("a").alias("na1"),
        F.sum("b").alias("nb1"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")) * 1.0 / n
    pe = (F.col("na1") * 1.0 / n) * (F.col("nb1") * 1.0 / n) + (
        (n - F.col("na1")) * 1.0 / n
    ) * ((n - F.col("nb1")) * 1.0 / n)
    return counts.select(
        n.cast("bigint").alias("n_docs"),
        F.col("n11").cast("bigint").alias("n_both_pos"),
        F.col("n00").cast("bigint").alias("n_both_neg"),
        F.round(po, 6).alias("p_agree"),
        F.round((po - pe) / F.nullif(1.0 - pe, F.lit(0.0)), 6).alias(
            "kappa"
        ),
    )


# ---------------------------------------------------------------------------
# Importance-weight effective sample size (resample-to-uniform diagnostic)
# ---------------------------------------------------------------------------

_ESS_ORACLE = """
WITH per_source AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
),
agg AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_sources,
         SUM(CAST(1.0 / n_s AS DECIMAL(18,12))) AS inv_sum
  FROM per_source
)
SELECT n_docs,
       n_sources,
       ROUND(n_sources * n_sources / CAST(inv_sum AS DOUBLE), 6) AS ess,
       ROUND(n_sources * n_sources / CAST(inv_sum AS DOUBLE) / n_docs, 6)
         AS ess_fraction
FROM agg
"""


@register("importance_weight_ess", oracle=_ESS_ORACLE, tags=("stats", "llm"))
def importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of the importance weights that
    reweight the corpus's empirical source mix to UNIFORM — the
    diagnostic that tells a data-mixing pipeline whether
    ``mixture_resample``-style reweighting is statistically safe (ESS
    ≈ N: balanced corpus; ESS ≪ N: a few rare sources dominate the
    weights and the resampled set behaves like far fewer documents).
    With per-source weight w_s = N/(S·n_s), the row-level Kish formula
    (Σw)²/Σw² collapses algebraically to S²/Σ_s(1/n_s) — so the whole
    diagnostic is one tiny per-source count agg and S-term fold, no
    row-level weight materialization at all; the fold is made
    order-independent by summing the (identical-per-row) doubles as
    DECIMAL(18,12) on both engines.
    """
    d = read_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count("*").alias("n_s"))
    agg = per_source.agg(
        F.sum("n_s").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_sources"),
        F.sum((1.0 / F.col("n_s")).cast("decimal(18,12)")).alias(
            "inv_sum"
        ),
    )
    ess = (
        F.col("n_sources")
        * F.col("n_sources")
        / F.col("inv_sum").cast("double")
    )
    return agg.select(
        "n_docs",
        "n_sources",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n_docs"), 6).alias("ess_fraction"),
    )
