"""Round-8 batch 15: representation truncation, observational causal
adjustment, and hierarchical snapshot diffing —

- ``matryoshka_truncation_recall``: recall@3 of cosine retrieval on
  PREFIX-truncated embeddings (dims 8/16/32 of 64) against full-dim
  exact retrieval, all variants from ONE scan — the
  Matryoshka-representation audit (Kusupati et al. 2022): if recall
  survives truncation, the ANN index can store 2-8× fewer bytes.
  Complements ``jl_projection_distortion`` (random projection) with
  the structured-truncation alternative modern embedding models are
  trained for.
- ``stratified_ate_adjustment``: covariate-adjusted treatment-effect
  estimation by stratification (standardization): the naive
  promo-vs-other revenue gap next to the stratum-weighted
  (return-flag) adjusted gap — the classic observational-causal
  correction for confounding a metrics platform should report
  INSTEAD of the naive diff whenever assignment correlates with a
  covariate. Completes the causal corner started by
  ``diff_in_diff_promo``.
- ``merkle_bucket_diff``: two-level Merkle-style snapshot diff — 64
  Knuth-bucket checksums (order-free decimal sums of per-row
  digests) locate changed buckets, then a key-grain drill-down runs
  ONLY inside changed buckets. The partition-pruned table-diff
  pattern behind replication validation at 100 TB: compare 64
  checksums, scan only what changed. The CDC batch is synthesized
  deterministically (keys %7 deleted, %11 repriced — the extras37
  convention).

Registry conventions (plans/registry.py): digests via the
conv/md5-prefix integer spelling; checksums in DECIMAL(38,0) (exact,
order-free); money in DECIMAL end-to-end; recalls and gaps are
divisions of exact sums ROUND 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.plans.extras8 import _NDCG_QUERIES
from ucl_data_pipeline_spark.plans.registry import register, sql_knuth_bucket
from ucl_data_pipeline_spark.sources.io import fan_out, read_table

# ---------------------------------------------------------------------------
# Matryoshka truncation recall
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32)
_MRL_K = 3


def _sql_trunc_cos(d: int) -> str:
    return (
        f"list_dot_product(CAST(q.embedding AS DOUBLE[])[1:{d}],"
        f" CAST(c.embedding AS DOUBLE[])[1:{d}])"
        f" / nullif(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[])[1:{d}],"
        f" CAST(q.embedding AS DOUBLE[])[1:{d}]))"
        f" * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[])[1:{d}],"
        f" CAST(c.embedding AS DOUBLE[])[1:{d}])), 0.0)"
    )


_SQL_FULL_COS = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / nullif(sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),"
    " CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),"
    " CAST(c.embedding AS DOUBLE[]))), 0.0)"
)

_MRL_ORACLE = f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_SQL_FULL_COS} AS s_full,
         {", ".join(f"{_sql_trunc_cos(d)} AS s_{d}" for d in _MRL_DIMS)}
  FROM embeddings q
  JOIN embeddings c
    ON q.vec_id % 100 = 0 AND q.vec_id < {100 * _NDCG_QUERIES}
   AND c.vec_id <> q.vec_id
), truth AS (
  SELECT query_id, neighbor_id
  FROM sims
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY s_full DESC, neighbor_id) <= {_MRL_K}
)
{" UNION ALL ".join(
    f'''
SELECT CAST({d} AS INTEGER) AS trunc_dim,
       CAST(COUNT(DISTINCT hit.query_id) AS BIGINT) AS n_queries,
       CAST(COUNT(hit.neighbor_id) AS BIGINT) AS n_hits,
       ROUND(CAST(COUNT(hit.neighbor_id) AS DOUBLE)
             / ({_MRL_K}.0 * {_NDCG_QUERIES}), 6) AS recall_at_3
FROM (
  SELECT t.query_id, t.neighbor_id
  FROM (SELECT query_id, neighbor_id FROM sims
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY s_{d} DESC, neighbor_id)
                <= {_MRL_K}) a
  JOIN truth t ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
) hit'''
    for d in _MRL_DIMS
)}
"""


@register(
    "matryoshka_truncation_recall",
    oracle=_MRL_ORACLE,
    tags=("vector", "gate", "frontier"),
)
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation frontier: recall@{k} of cosine retrieval
    on the FIRST 8/16/32 dimensions against full-64-dim exact
    retrieval, for the 5 standard probe queries — every similarity
    (full + all three truncations) computed in ONE pass over the same
    bounded candidate frame, each truncation then just re-ranks (the
    ann_recall_frontier one-generation discipline). If prefix
    truncation holds recall, the vector index shrinks 2-8× with no
    reindex — the audit to run before adopting MRL-style storage.

    Determinism: truncated similarities are the engine's
    sequential-fold dot products over array slices (list slicing ≡
    F.slice); rankings break ties on neighbor_id; recalls are exact
    hit-count ratios over the fixed {q}×{k} denominator.

    Scale: one structurally-capped broadcast of 5 query rows against
    a corpus scan; the four rankings are windows over ≤(corpus)
    per-query rows with bucket-bounded fan-in — and at real scale the
    truncated rankings would run against the IVF/PQ candidate lists,
    same as the recall gates.
    """
    e = read_table(spark, sf_dir, "embeddings")
    q = (
        e.filter(
            (F.col("vec_id") % 100 == 0)
            & (F.col("vec_id") < 100 * _NDCG_QUERIES)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            VX.as_double("embedding").alias("q_emb"),
        )
        .orderBy("query_id")
        .limit(_NDCG_QUERIES)
    )
    c = fan_out(
        e.select(
            F.col("vec_id").alias("neighbor_id"),
            VX.as_double("embedding").alias("c_emb"),
        )
    )
    sims_cols = [VX.cosine("q_emb", "c_emb").alias("s_full")] + [
        VX.cosine(
            F.slice("q_emb", 1, d), F.slice("c_emb", 1, d)
        ).alias(f"s_{d}")
        for d in _MRL_DIMS
    ]
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", *sims_cols)
        # four rankings consume the same similarity frame
        .localCheckpoint()
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.col("s_full").desc(), "neighbor_id"
    )
    truth = (
        sims.withColumn("rn", F.row_number().over(w_full))
        .filter(F.col("rn") <= _MRL_K)
        .select("query_id", "neighbor_id")
    )
    out = None
    for d in _MRL_DIMS:
        w_d = Window.partitionBy("query_id").orderBy(
            F.col(f"s_{d}").desc(), "neighbor_id"
        )
        approx = (
            sims.withColumn("rn", F.row_number().over(w_d))
            .filter(F.col("rn") <= _MRL_K)
            .select("query_id", "neighbor_id")
        )
        # ONE scalar agg (no groupBy): a dim with zero hits still emits
        # its row (n_queries/n_hits = 0) — the nested per-query agg
        # used to drop empty dims from the SQL side at sf0.001
        hits = (
            approx.join(truth, ["query_id", "neighbor_id"])
            .agg(
                F.countDistinct("query_id").cast("long").alias("n_queries"),
                F.count("*").cast("long").alias("n_hits"),
            )
            .select(
                F.lit(d).cast("int").alias("trunc_dim"),
                "n_queries",
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double")
                    / F.lit(float(_MRL_K * _NDCG_QUERIES)),
                    6,
                ).alias("recall_at_3"),
            )
        )
        out = hits if out is None else out.unionAll(hits)
    return out


# ---------------------------------------------------------------------------
# Stratified (standardized) average treatment effect
# ---------------------------------------------------------------------------

_ATE_ORACLE = """
WITH base AS (
  SELECT l.l_returnflag AS stratum,
         CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treat,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), cell AS (
  SELECT stratum,
         CAST(SUM(treat) AS BIGINT) AS n_t,
         CAST(SUM(1 - treat) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treat = 1 THEN y END) AS DOUBLE) AS s_t,
         CAST(SUM(CASE WHEN treat = 0 THEN y END) AS DOUBLE) AS s_c
  FROM base GROUP BY stratum
), gstats AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS nt_all,
         CAST(SUM(n_c) AS BIGINT) AS nc_all,
         CAST(SUM(CAST(s_t AS DECIMAL(28,6))) AS DOUBLE) AS st_all,
         CAST(SUM(CAST(s_c AS DECIMAL(28,6))) AS DOUBLE) AS sc_all,
         CAST(SUM(CAST(ROUND((CAST(n_t + n_c AS DOUBLE))
                             * (s_t / n_t - s_c / n_c), 6)
                       AS DECIMAL(28,6))) AS DOUBLE) AS wsum
  FROM cell WHERE n_t > 0 AND n_c > 0
)
SELECT c.stratum, c.n_t, c.n_c,
       ROUND(c.s_t / c.n_t, 6) AS mean_treat,
       ROUND(c.s_c / c.n_c, 6) AS mean_ctrl,
       ROUND(c.s_t / c.n_t - c.s_c / c.n_c, 6) AS stratum_diff,
       ROUND(g.st_all / g.nt_all - g.sc_all / g.nc_all, 6) AS naive_ate,
       ROUND(g.wsum / (g.nt_all + g.nc_all), 6) AS adjusted_ate
FROM cell c CROSS JOIN gstats g
WHERE c.n_t > 0 AND c.n_c > 0
"""


@register(
    "stratified_ate_adjustment",
    oracle=_ATE_ORACLE,
    tags=("stats", "agg", "causal"),
)
def stratified_ate_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-adjusted treatment effect by stratification
    (standardization / non-parametric g-computation): the
    promo-vs-other net-revenue gap per return-flag stratum, and the
    population-weighted average of those within-stratum gaps
    (adjusted ATE) next to the naive pooled gap — the pair of numbers
    whose disagreement IS Simpson's paradox. The observational-causal
    adjustment every experiment-less metrics readout needs when
    treatment assignment correlates with a covariate;
    ``diff_in_diff_promo`` handles time confounding, this handles
    composition confounding.

    Determinism: cell sufficient statistics (n, Σy) accumulate in
    DECIMAL; within-stratum means/diffs are IEEE ops on bit-identical
    doubles; the adjusted ATE re-enters DECIMAL via ROUND-6 weighted
    terms (the unigram_entropy pattern) so stratum order cannot
    perturb the weighted sum. Strata lacking either arm are excluded
    from adjustment (standard positivity requirement) and from the
    output.

    Scale: one fact-scan hash-agg to (stratum × arm) sufficient
    statistics after a broadcast dim join — the welch_ttest shape
    with a 3-value group key; the standardization runs on ≤3 rows
    with a singleton broadcast.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    base = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("l_returnflag").alias("stratum"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("treat"),
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("y"),
    )
    cell = base.groupBy("stratum").agg(
        F.sum("treat").cast("long").alias("n_t"),
        F.sum(1 - F.col("treat")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treat") == 1, F.col("y"))).cast("double").alias("s_t"),
        F.sum(F.when(F.col("treat") == 0, F.col("y"))).cast("double").alias("s_c"),
    )
    ok = cell.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    wterm = F.round(
        (F.col("n_t") + F.col("n_c")).cast("double")
        * (F.col("s_t") / F.col("n_t") - F.col("s_c") / F.col("n_c")),
        6,
    ).cast("decimal(28,6)")
    glob = ok.agg(
        F.sum("n_t").cast("long").alias("nt_all"),
        F.sum("n_c").cast("long").alias("nc_all"),
        F.sum(F.col("s_t").cast("decimal(28,6)")).cast("double").alias("st_all"),
        F.sum(F.col("s_c").cast("decimal(28,6)")).cast("double").alias("sc_all"),
        F.sum(wterm).cast("double").alias("wsum"),
    )
    return ok.crossJoin(F.broadcast(glob)).select(
        "stratum",
        "n_t",
        "n_c",
        F.round(F.col("s_t") / F.col("n_t"), 6).alias("mean_treat"),
        F.round(F.col("s_c") / F.col("n_c"), 6).alias("mean_ctrl"),
        F.round(
            F.col("s_t") / F.col("n_t") - F.col("s_c") / F.col("n_c"), 6
        ).alias("stratum_diff"),
        F.round(
            F.col("st_all") / F.col("nt_all")
            - F.col("sc_all") / F.col("nc_all"),
            6,
        ).alias("naive_ate"),
        F.round(
            F.col("wsum") / (F.col("nt_all") + F.col("nc_all")), 6
        ).alias("adjusted_ate"),
    )


# ---------------------------------------------------------------------------
# Two-level Merkle-style snapshot bucket diff
# ---------------------------------------------------------------------------

_MERKLE_B = 64

_SQL_ROW_DIGEST = (
    "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||"
    " CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_MERKLE_ORACLE = f"""
WITH snap_a AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
), snap_b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0
              THEN CAST(o_totalprice AS DECIMAL(18,2)) + 1.00
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
), da AS (
  SELECT {sql_knuth_bucket('o_orderkey', _MERKLE_B)} AS bkt, o_orderkey,
         {_SQL_ROW_DIGEST} AS dg
  FROM snap_a
), db AS (
  SELECT {sql_knuth_bucket('o_orderkey', _MERKLE_B)} AS bkt, o_orderkey,
         {_SQL_ROW_DIGEST} AS dg
  FROM snap_b
), la AS (
  SELECT bkt, CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM(CAST(dg AS DECIMAL(38,0))) AS VARCHAR) AS ck_a
  FROM da GROUP BY bkt
), lb AS (
  SELECT bkt, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(CAST(dg AS DECIMAL(38,0))) AS VARCHAR) AS ck_b
  FROM db GROUP BY bkt
), lvl1 AS (
  SELECT COALESCE(la.bkt, lb.bkt) AS bkt,
         COALESCE(la.n_a, 0) AS n_a, COALESCE(lb.n_b, 0) AS n_b,
         CASE WHEN la.ck_a IS NOT DISTINCT FROM lb.ck_b THEN 1 ELSE 0 END
           AS checksum_match
  FROM la FULL JOIN lb ON la.bkt = lb.bkt
), drill AS (
  SELECT v.bkt, CAST(COUNT(*) AS BIGINT) AS n_diff_rows
  FROM (
    SELECT COALESCE(da.bkt, db.bkt) AS bkt
    FROM da FULL JOIN db
      ON da.o_orderkey = db.o_orderkey
    WHERE da.dg IS DISTINCT FROM db.dg
  ) v
  JOIN lvl1 ON lvl1.bkt = v.bkt AND lvl1.checksum_match = 0
  GROUP BY v.bkt
)
SELECT l.bkt AS bucket, l.n_a, l.n_b,
       CAST(l.checksum_match AS INTEGER) AS checksum_match,
       COALESCE(d.n_diff_rows, 0) AS n_diff_rows
FROM lvl1 l LEFT JOIN drill d ON l.bkt = d.bkt
WHERE l.checksum_match = 0
"""


@register(
    "merkle_bucket_diff",
    oracle=_MERKLE_ORACLE,
    tags=("layout", "scale", "cdc"),
)
def merkle_bucket_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level Merkle-style snapshot diff between the orders table
    and a deterministically mutated snapshot (keys %7 deleted, keys
    %11 repriced +1.00 — the extras37 CDC convention): level 1
    compares {b} per-bucket checksums (order-free DECIMAL(38,0) sums
    of 60-bit row digests over the width-safe Knuth bucket), level 2
    drills into CHANGED buckets only and counts differing keys via a
    key-grain full-outer digest comparison. Emits one row per changed
    bucket. This is how replication/backfill validation works at
    100 TB: {b} checksum rows decide WHERE to look; the expensive
    key-grain comparison is partition-pruned to changed buckets —
    unchanged buckets are never rescanned at row grain.

    Determinism: digests are the conv/md5-prefix 60-bit integers over
    canonical integer-cents renderings (no decimal-to-string
    formatting dependence); checksums are exact decimal sums emitted
    as strings (38-digit values exceed float64 transport); the diff
    predicate is null-safe digest inequality.

    Scale: two scans → two (bucket)-grain hash-aggs (map-side
    combinable; the checksum IS a commutative monoid, so this is also
    the incremental-maintenance spelling — a CDC batch updates bucket
    checksums without rescanning) → a {b}-row comparison; the drill
    join shuffles only rows of changed buckets (semi-join pruning on
    the changed-bucket set).
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    snap_a = o
    snap_b = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.col("price") + F.lit(1.00).cast("decimal(18,2)"),
        )
        .otherwise(F.col("price"))
        .alias("price"),
    )

    def digested(df: DataFrame) -> DataFrame:
        dg = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit(":"),
                        (F.col("price") * 100).cast("long").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return df.select(
            knuth_bucket("o_orderkey", _MERKLE_B).alias("bkt"),
            "o_orderkey",
            dg.alias("dg"),
        )

    da = digested(snap_a)
    db = digested(snap_b)
    la = da.groupBy("bkt").agg(
        F.count("*").cast("long").alias("n_a"),
        F.sum(F.col("dg").cast("decimal(38,0)")).cast("string").alias("ck_a"),
    )
    lb = db.groupBy("bkt").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum(F.col("dg").cast("decimal(38,0)")).cast("string").alias("ck_b"),
    )
    lvl1 = (
        la.join(lb, "bkt", "full")
        .select(
            "bkt",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
            F.when(F.col("ck_a").eqNullSafe(F.col("ck_b")), 1)
            .otherwise(0)
            .alias("checksum_match"),
        )
        .filter(F.col("checksum_match") == 0)
        # consumed by the output AND the drill-down semi-join
        .localCheckpoint()
    )
    changed = lvl1.select("bkt")
    drill = (
        da.join(F.broadcast(changed), "bkt")
        .join(
            db.join(F.broadcast(changed), "bkt").withColumnRenamed("dg", "dg_b"),
            ["bkt", "o_orderkey"],
            "full",
        )
        .filter(~F.col("dg").eqNullSafe(F.col("dg_b")))
        .groupBy("bkt")
        .agg(F.count("*").cast("long").alias("n_diff_rows"))
    )
    return lvl1.join(drill, "bkt", "left").select(
        F.col("bkt").alias("bucket"),
        "n_a",
        "n_b",
        F.col("checksum_match").cast("int").alias("checksum_match"),
        F.coalesce("n_diff_rows", F.lit(0)).cast("long").alias("n_diff_rows"),
    )
