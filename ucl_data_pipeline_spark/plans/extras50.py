"""Round-8 batch 17: content-aware chunking, clustering evaluation,
and ranker-agreement measurement —

- ``texttiling_boundaries``: TextTiling (Hearst 1997) topic-boundary
  detection per document — fixed 10-token pseudo-sentence blocks,
  adjacent-block cosine over exact term-frequency vectors, depth
  scores against fixed-radius neighborhood peaks, boundaries where
  depth exceeds μ + σ/2 of the corpus depth distribution. The
  content-AWARE chunking operator next to ``doc_chunk_windows``'s
  fixed windows — RAG pipelines chunk at topic boundaries precisely
  so retrieval units stay coherent. (Simplification vs the paper:
  peaks are fixed-radius maxima (radius 2) rather than
  scan-until-decrease — relational, same intent; noted here so the
  oracle shares it.)
- ``cluster_nmi_purity``: external clustering evaluation — purity and
  normalized mutual information of the kmeans seed-center assignment
  against ground-truth labels, from one contingency table. The
  missing eval next to the internal measures the kmeans family
  reports; NMI is the standard number clustering papers lead with.
- ``rbo_ranker_agreement``: rank-biased overlap (Webber et al. 2010,
  p = 0.9, truncated at depth 20) between the engine's two lexical
  rankers (``bm25_doc_ranking`` vs ``query_likelihood_dirichlet``)
  for the shared fixed query — the top-weighted agreement curve that
  says WHERE the rankers disagree, not just whether.

Registry conventions (plans/registry.py): contingency/overlap counts
exact BIGINT; per-term logs and similarities ROUND 6 →
DECIMAL(18,6)/(38,12) sums; p^(d−1) weights enter both engines as
module literals; bounded-grain windows only (block gaps per doc,
≤8×|labels| cells, 20 depths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.clustering import K, _dists, _seed_centers
from ucl_data_pipeline_spark.plans.extras26 import _BM25_ORACLE, bm25_doc_ranking
from ucl_data_pipeline_spark.plans.extras47 import (
    _QL_ORACLE,
    query_likelihood_dirichlet,
)
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table, stats_barrier

# ---------------------------------------------------------------------------
# TextTiling topic boundaries
# ---------------------------------------------------------------------------

_TT_BLOCK = 10  # tokens per pseudo-sentence block
_TT_RADIUS = 2  # fixed peak radius

_TT_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), pos AS (
  SELECT doc_id, s.i - 1 AS p, s.tok AS tok
  FROM (SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t)),
                                     i -> {{'i': i, 'tok': t[i]}})) AS s
        FROM tok)
), blk AS (
  SELECT doc_id, CAST(p // {_TT_BLOCK} AS INTEGER) AS b, tok,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pos GROUP BY doc_id, p // {_TT_BLOCK}, tok
), norms AS (
  SELECT doc_id, b, CAST(SUM(c * c) AS BIGINT) AS nrm
  FROM blk GROUP BY doc_id, b
), gaps AS (
  SELECT a.doc_id, a.b AS g,
         ROUND(CAST(SUM(a.c * bb.c) AS DOUBLE)
               / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
               6) AS sim
  FROM blk a
  JOIN blk bb ON a.doc_id = bb.doc_id AND bb.b = a.b + 1 AND a.tok = bb.tok
  JOIN norms na ON na.doc_id = a.doc_id AND na.b = a.b
  JOIN norms nb ON nb.doc_id = a.doc_id AND nb.b = a.b + 1
  GROUP BY a.doc_id, a.b, na.nrm, nb.nrm
), allgaps AS (
  SELECT n.doc_id, n.b AS g, COALESCE(gp.sim, 0.0) AS sim
  FROM norms n
  LEFT JOIN gaps gp ON gp.doc_id = n.doc_id AND gp.g = n.b
  WHERE EXISTS (SELECT 1 FROM norms n2
                WHERE n2.doc_id = n.doc_id AND n2.b = n.b + 1)
), simd AS (
  SELECT doc_id, g, sim, CAST(sim AS DECIMAL(18,6)) AS sd FROM allgaps
), peaks AS (
  SELECT doc_id, g, sim, sd,
         COALESCE(MAX(sd) OVER (PARTITION BY doc_id ORDER BY g
                    ROWS BETWEEN {_TT_RADIUS} PRECEDING AND 1 PRECEDING),
                  sd) AS pl,
         COALESCE(MAX(sd) OVER (PARTITION BY doc_id ORDER BY g
                    ROWS BETWEEN 1 FOLLOWING AND {_TT_RADIUS} FOLLOWING),
                  sd) AS pr
  FROM simd
), depth AS (
  -- CASE, not GREATEST: DuckDB's GREATEST promotes DECIMAL args to
  -- DOUBLE, which would re-float the exact depth algebra
  SELECT doc_id, g, sim,
         (CASE WHEN pl >= sd THEN pl ELSE sd END)
         + (CASE WHEN pr >= sd THEN pr ELSE sd END)
         - 2 * sd AS d
  FROM peaks
), stats AS (
  SELECT CAST(SUM(d) AS DOUBLE) AS sd,
         CAST(SUM(d * d) AS DOUBLE) AS sdd,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM depth
), thr AS (
  SELECT sd / n + sqrt((sdd - sd * sd / n) / n) / 2 AS cut FROM stats
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN CAST(d.d AS DOUBLE) > t.cut THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boundaries,
       CAST(SUM(CAST(d.sim AS DECIMAL(18,6))) AS DOUBLE) AS sum_sim,
       CAST(MAX(d.d) AS DOUBLE) AS max_depth
FROM depth d CROSS JOIN thr t
GROUP BY d.doc_id
"""


@register(
    "texttiling_boundaries",
    oracle=_TT_ORACLE,
    tags=("llm", "text", "window"),
)
def texttiling_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling per document: split into {b}-token pseudo-sentence
    blocks, score every adjacent-block gap by exact-tf cosine
    (integer dot products and norms — zero-overlap gaps score 0),
    compute depth = (left peak − sim) + (right peak − sim) with
    fixed-radius-{r} peaks, and flag boundaries where depth exceeds
    the corpus μ + σ/2 cut (the paper's threshold rule on the
    engine's exact-decimal moment spelling). Per doc: gap count,
    boundary count, summed gap similarity (exact decimal — the mean
    sum/n_gaps hit a ROUND-6 midpoint fork at sf0.001; the SUM of
    6-dp decimals is exact and the reader divides), max depth — the
    topic-coherence chunking signal a RAG pipeline uses instead of
    fixed windows.

    Determinism: block tf vectors are exact integers, so each gap
    cosine is one sqrt-and-divide on exact ints, ROUND 6; depth
    combines the ROUND-6 sims IN DECIMAL(18,6) (MAX is selection and
    l + r − 2s is exact decimal algebra — the double spelling forked
    a half-ulp rounding boundary at sf0.001); μ and σ come from
    DECIMAL-exact Σd, Σd²; the cut compare runs on bit-identical
    doubles.

    Scale: one posexplode → (doc, block, token) hash-agg; gap
    cosines are a self-join keyed on (doc, adjacent block) at
    block-token grain; depth windows partition by doc with ≤{r}+1
    fan-in; the global moment agg and broadcast cut close it. No
    corpus-sized window, no pairwise blocks beyond adjacency.
    """
    d = read_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("p", "tok")
    )
    blk = (
        pos.select(
            "doc_id", (F.col("p") / _TT_BLOCK).cast("int").alias("b"), "tok"
        )
        .groupBy("doc_id", "b", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        # feeds the left side, right side, and norm agg of the gap join
        .localCheckpoint()
    )
    norms = blk.groupBy("doc_id", "b").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("nrm")
    ).localCheckpoint()
    # stats-barriered (r13, replacing the r12 merge hints): every side
    # here is block- or block-token grain (corpus-growing), but a
    # localCheckpoint CARRIES its origin plan's Generate-blind size
    # estimates, and the static planner broadcast all four builds —
    # the ×100 perturbed smoke blew the driver on this query
    # (SCALE_NOTES r12). The barrier keeps the static plan SMJ while
    # AQE's size-measured runtime BHJ conversion stays free. The
    # 1-row threshold crossJoin below stays an explicit broadcast
    # (scalar, bounded).
    blkb = stats_barrier(blk)
    normsb = stats_barrier(norms)
    a = blkb.select("doc_id", "b", "tok", F.col("c").alias("ca"))
    bb = blkb.select(
        "doc_id", (F.col("b") - 1).alias("b"), "tok", F.col("c").alias("cb")
    )
    na = normsb.select("doc_id", "b", F.col("nrm").alias("na"))
    nb = normsb.select(
        "doc_id", (F.col("b") - 1).alias("b"), F.col("nrm").alias("nb")
    )
    gaps = (
        a.join(bb, ["doc_id", "b", "tok"])
        .groupBy("doc_id", "b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
        .join(na, ["doc_id", "b"])
        .join(nb, ["doc_id", "b"])
        .select(
            "doc_id",
            F.col("b").alias("g"),
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("sim"),
        )
    )
    has_next = normsb.alias("n").join(
        normsb.alias("n2"),
        (F.col("n.doc_id") == F.col("n2.doc_id"))
        & (F.col("n2.b") == F.col("n.b") + 1),
        "left_semi",
    )
    allgaps = (
        has_next.select("doc_id", F.col("b").alias("g"))
        .join(gaps, ["doc_id", "g"], "left")
        .select("doc_id", "g", F.coalesce("sim", F.lit(0.0)).alias("sim"))
    )
    w_l = (
        Window.partitionBy("doc_id")
        .orderBy("g")
        .rowsBetween(-_TT_RADIUS, -1)
    )
    w_r = (
        Window.partitionBy("doc_id").orderBy("g").rowsBetween(1, _TT_RADIUS)
    )
    # depth algebra runs in DECIMAL(18,6) over the ROUND-6 sims:
    # l + r − 2s of 6-dp values is itself a 6-dp decimal, but the
    # equivalent double expression can land a half-ulp off a rounding
    # boundary and fork the engines' last digit (hit at sf0.001)
    simd = allgaps.withColumn("sd_", F.col("sim").cast("decimal(18,6)"))
    sdc = F.col("sd_")
    depth_col = (
        F.greatest(F.coalesce(F.max("sd_").over(w_l), sdc), sdc)
        + F.greatest(F.coalesce(F.max("sd_").over(w_r), sdc), sdc)
        - 2 * sdc
    )
    depth = simd.select("doc_id", "g", "sim", depth_col.alias("d"))
    stats = depth.agg(
        F.sum("d").cast("double").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.count("*").cast("long").alias("n"),
    )
    cut = (
        F.col("sd") / F.col("n")
        + F.sqrt(
            (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n"))
            / F.col("n")
        )
        / 2
    )
    thr = stats.select(cut.alias("cut"))
    return (
        depth.crossJoin(F.broadcast(thr))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum(
                F.when(F.col("d").cast("double") > F.col("cut"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_boundaries"),
            F.sum(F.col("sim").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_sim"),
            F.max("d").cast("double").alias("max_depth"),
        )
    )


# ---------------------------------------------------------------------------
# External clustering evaluation: purity + NMI
# ---------------------------------------------------------------------------

_NMI_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
), cent AS (
  SELECT vec_id AS cid, emb AS cvec FROM e WHERE vec_id < {K}
), dist AS (
  SELECT e.vec_id, e.label, c.cid,
         list_reduce(
           list_prepend(0.0,
             list_transform(generate_series(1, len(e.emb)),
               i -> (e.emb[i] - c.cvec[i]) * (e.emb[i] - c.cvec[i]))),
           (a, b) -> a + b) AS d2
  FROM e CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, label, cid FROM dist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
), cell AS (
  SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS n_cl
  FROM assigned GROUP BY cid, label
), marg_c AS (
  SELECT cid, CAST(SUM(n_cl) AS BIGINT) AS n_c FROM cell GROUP BY cid
), marg_l AS (
  SELECT label, CAST(SUM(n_cl) AS BIGINT) AS n_l FROM cell GROUP BY label
), tot AS (
  SELECT CAST(SUM(n_cl) AS BIGINT) AS n FROM cell
), pur AS (
  SELECT CAST(SUM(mx) AS BIGINT) AS pure_n
  FROM (SELECT cid, MAX(n_cl) AS mx FROM cell GROUP BY cid)
), mi AS (
  SELECT CAST(SUM(CAST(ROUND(
           (CAST(c.n_cl AS DOUBLE) / t.n)
           * log2(CAST(t.n AS DOUBLE) * c.n_cl
                  / (CAST(mc.n_c AS DOUBLE) * ml.n_l)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS mi
  FROM cell c
  JOIN marg_c mc ON c.cid = mc.cid
  JOIN marg_l ml ON c.label = ml.label
  CROSS JOIN tot t
), hc AS (
  SELECT CAST(SUM(CAST(ROUND(
           -(CAST(n_c AS DOUBLE) / t.n) * log2(CAST(n_c AS DOUBLE) / t.n), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS h_c
  FROM marg_c CROSS JOIN tot t
), hl AS (
  SELECT CAST(SUM(CAST(ROUND(
           -(CAST(n_l AS DOUBLE) / t.n) * log2(CAST(n_l AS DOUBLE) / t.n), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS h_l
  FROM marg_l CROSS JOIN tot t
)
SELECT t.n AS n_points,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM marg_c) AS n_clusters,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM marg_l) AS n_labels,
       ROUND(CAST(p.pure_n AS DOUBLE) / t.n, 6) AS purity,
       ROUND(m.mi, 6) AS mi_bits,
       ROUND(h.h_c, 6) AS h_cluster,
       ROUND(l.h_l, 6) AS h_label,
       ROUND(2.0 * m.mi / NULLIF(h.h_c + l.h_l, 0.0), 6) AS nmi
FROM tot t CROSS JOIN pur p CROSS JOIN mi m CROSS JOIN hc h CROSS JOIN hl l
"""


@register(
    "cluster_nmi_purity",
    oracle=_NMI_ORACLE,
    tags=("vector", "stats", "gate"),
)
def cluster_nmi_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation of the kmeans seed-center
    assignment against ground-truth labels: purity (majority-label
    mass per cluster) and normalized mutual information
    2·I(C;L)/(H(C)+H(L)) from one contingency table — the standard
    pair of external validity numbers, closing the evaluation loop
    the kmeans family (assignment, Lloyd steps, inertia) reports only
    internal measures for.

    Determinism: the contingency table and marginals are exact
    BIGINTs; every MI/entropy term is ROUND 6 → DECIMAL(18,6) sum
    (unigram_entropy pattern); the final NMI ratio and purity are
    single IEEE ops, NULLIF-guarded.

    Scale: assignment is the literal-center narrow projection (no
    shuffle); ONE hash-agg to the ≤K×|labels| contingency grain;
    marginals, entropies, and MI all run on that bounded grain with
    singleton broadcasts.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    centers = _seed_centers(e.select("vec_id", "embedding"))
    dist = _dists(centers)
    assigned = e.select(
        "label",
        (F.array_position(dist, F.array_min(dist)) - 1)
        .cast("int")
        .alias("cid"),
    )
    cell = assigned.groupBy("cid", "label").agg(
        F.count("*").cast("long").alias("n_cl")
    ).localCheckpoint()
    marg_c = cell.groupBy("cid").agg(F.sum("n_cl").cast("long").alias("n_c"))
    marg_l = cell.groupBy("label").agg(
        F.sum("n_cl").cast("long").alias("n_l")
    )
    tot = cell.agg(F.sum("n_cl").cast("long").alias("n"))
    pur = (
        cell.groupBy("cid")
        .agg(F.max("n_cl").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("pure_n"))
    )
    n = F.col("n")
    mi_term = F.round(
        (F.col("n_cl").cast("double") / n)
        * F.log2(
            n.cast("double")
            * F.col("n_cl")
            / (F.col("n_c").cast("double") * F.col("n_l"))
        ),
        6,
    ).cast("decimal(18,6)")
    mi = (
        cell.join(F.broadcast(marg_c), "cid")
        .join(F.broadcast(marg_l), "label")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mi_term).cast("double").alias("mi"))
    )
    hc_term = F.round(
        -(F.col("n_c").cast("double") / n)
        * F.log2(F.col("n_c").cast("double") / n),
        6,
    ).cast("decimal(18,6)")
    hc = (
        marg_c.crossJoin(F.broadcast(tot))
        .agg(F.sum(hc_term).cast("double").alias("h_c"))
    )
    hl_term = F.round(
        -(F.col("n_l").cast("double") / n)
        * F.log2(F.col("n_l").cast("double") / n),
        6,
    ).cast("decimal(18,6)")
    hl = (
        marg_l.crossJoin(F.broadcast(tot))
        .agg(F.sum(hl_term).cast("double").alias("h_l"))
    )
    nc = marg_c.agg(F.count("*").cast("long").alias("n_clusters"))
    nl = marg_l.agg(F.count("*").cast("long").alias("n_labels"))
    return (
        tot.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nl))
        .select(
            F.col("n").alias("n_points"),
            "n_clusters",
            "n_labels",
            F.round(F.col("pure_n").cast("double") / F.col("n"), 6).alias(
                "purity"
            ),
            F.round("mi", 6).alias("mi_bits"),
            F.round("h_c", 6).alias("h_cluster"),
            F.round("h_l", 6).alias("h_label"),
            F.round(
                F.lit(2.0)
                * F.col("mi")
                / F.nullif(F.col("h_c") + F.col("h_l"), F.lit(0.0)),
                6,
            ).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# Rank-biased overlap between the two lexical rankers
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_DEPTH = 20
_RBO_WEIGHTS = [(1 - _RBO_P) * _RBO_P ** (d - 1) for d in range(1, _RBO_DEPTH + 1)]
_SQL_RBO_WEIGHTS = "[" + ", ".join(repr(w) for w in _RBO_WEIGHTS) + "]"

# Composes both rankers' full oracle statements as nested-CTE
# subqueries, so the agreement numbers are cross-checked end-to-end
# (ranking included), not just the overlap algebra.
_RBO_ORACLE = f"""
WITH ra AS (
  SELECT doc_id, rank AS r_a FROM ({_BM25_ORACLE})
), rb AS (
  SELECT doc_id, rank AS r_b FROM ({_QL_ORACLE})
), bothr AS (
  SELECT GREATEST(ra.r_a, rb.r_b) AS d_min
  FROM ra JOIN rb ON ra.doc_id = rb.doc_id
), depths AS (
  SELECT unnest(generate_series(1, {_RBO_DEPTH})) AS d
), xd AS (
  SELECT d.d, CAST(COUNT(b.d_min) AS BIGINT) AS x_d
  FROM depths d LEFT JOIN bothr b ON b.d_min <= d.d
  GROUP BY d.d
), curve AS (
  SELECT d, x_d,
         ROUND(CAST(x_d AS DOUBLE) / d, 6) AS agreement,
         CAST(ROUND(({_SQL_RBO_WEIGHTS})[d]
                    * (CAST(x_d AS DOUBLE) / d), 6) AS DECIMAL(18,6)) AS t
  FROM xd
)
SELECT CAST(d AS INTEGER) AS d, x_d, agreement,
       ROUND(CAST(SUM(t) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE), 6) AS rbo_prefix
FROM curve
"""


@register(
    "rbo_ranker_agreement",
    oracle=_RBO_ORACLE,
    tags=("llm", "text", "stats", "window"),
)
def rbo_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p = {p}, truncated at depth {d}) between
    ``bm25_doc_ranking`` and ``query_likelihood_dirichlet`` for the
    shared fixed query: per depth d, the prefix intersection size X_d,
    the agreement X_d/d, and the truncated-RBO prefix sum
    (1−p)·Σ_{{i≤d}} p^(i−1)·X_i/i — the top-weighted ranker-agreement
    curve (Webber et al. 2010). Low agreement at shallow depths with
    convergence deeper is the signature of the length-normalization
    disagreement the QL docstring predicts.

    Determinism: both rankings are registered oracle-exact queries
    with total tie-break orders; X_d counts are exact (a doc ranked
    r_a by BM25 and r_b by QL joins both prefixes from depth
    max(r_a, r_b)); agreements ROUND 6; the geometric weights enter
    both engines as module literals; the RBO prefix sum adds ROUND-6
    per-depth terms in DECIMAL(18,6) via a bounded 20-row window.

    Scale: two TakeOrdered top-20 frames joined on doc_id (≤20 rows),
    exploded to the 20-row depth grain via a broadcast sequence —
    everything after the rankers is constant-size.
    """
    a = bm25_doc_ranking(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("ra")
    )
    b = query_likelihood_dirichlet(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("rb")
    )
    both = a.join(b, "doc_id").select(
        F.greatest("ra", "rb").alias("d_min")
    )
    depths = read_table(spark, sf_dir, "documents").sparkSession.range(
        1, _RBO_DEPTH + 1
    ).select(F.col("id").cast("int").alias("d"))
    xd = (
        depths.join(
            F.broadcast(both), F.col("d_min") <= F.col("d"), "left"
        )
        .groupBy("d")
        .agg(F.count("d_min").cast("long").alias("x_d"))
    )
    weights = F.array(*[F.lit(w) for w in _RBO_WEIGHTS])
    term = F.round(
        F.element_at(weights, F.col("d"))
        * (F.col("x_d").cast("double") / F.col("d")),
        6,
    ).cast("decimal(18,6)")
    w_pre = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        xd.select(
            "d",
            "x_d",
            F.round(F.col("x_d").cast("double") / F.col("d"), 6).alias(
                "agreement"
            ),
            term.alias("t"),
        )
        .select(
            "d",
            "x_d",
            "agreement",
            F.sum("t").over(w_pre).cast("double").alias("rbo_prefix"),
        )
        .select(
            F.col("d").cast("int").alias("d"),
            "x_d",
            "agreement",
            F.round("rbo_prefix", 6).alias("rbo_prefix"),
        )
    )
