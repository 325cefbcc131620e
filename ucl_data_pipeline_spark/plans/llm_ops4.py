"""Round-3 training-data pipeline operators over ``documents``:
context-window chunking, deterministic stratified train/val/test
splitting, and temperature-based mixture resampling.

Like plans.llm_ops/llm_ops2/llm_ops3 these are first-class engine
capabilities beyond the reference's surface: the stages that turn a
curated corpus into training shards. Everything is a pure Catalyst
expression with an exact DuckDB oracle; cross-engine determinism
follows plans.registry's conventions (hash-derived uniforms via the
width-safe Knuth bucket — no RNG state — decimal-exact sums where
accumulation order could differ, atomic output columns only).

Scale design (100 TB):
- chunking is scan-side (tokens → start offsets → explode): the only
  row-count growth is the chunk fan-out itself, there is no shuffle;
- the split is a pure projection (hash bucket → CASE) aggregated once
  by (source, split) — the assignment never materializes a shuffle of
  the corpus, and the same hash rule applied at read time reproduces
  the split with zero stored state;
- resampling needs one tiny per-source aggregate (20 rows) broadcast
  back over the scan — acceptance is then a scan-side predicate, the
  same shape deterministic_sample uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions import vector as VX
from ucl_data_pipeline_spark.functions.scalar import knuth_bucket
from ucl_data_pipeline_spark.plans.registry import register, sql_knuth_bucket
from ucl_data_pipeline_spark.sources.io import read_table

_SQL_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

# ---------------------------------------------------------------------------
# Context-window chunking (training-sequence windowing with overlap)
# ---------------------------------------------------------------------------

_CHUNK_W = 32  # window size (tokens)
_CHUNK_S = 24  # stride (8-token overlap)

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
)
SELECT
  t.doc_id,
  CAST(s // {_CHUNK_S} AS INTEGER) AS chunk_id,
  CAST(s AS INTEGER) AS chunk_start,
  CAST(LEAST({_CHUNK_W}, len(t.toks) - s) AS INTEGER) AS n_chunk_tokens,
  array_to_string(
    list_slice(t.toks, s + 1, LEAST(s + {_CHUNK_W}, len(t.toks))), ' ')
    AS chunk_text
FROM t, unnest(generate_series(0, len(t.toks) - 1, {_CHUNK_S})) AS g(s)
"""


@register("doc_chunk_windows", oracle=_CHUNK_ORACLE, tags=("text", "llm"))
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document split into overlapping
    {W}-token windows on a {S}-token stride (the training-sequence /
    RAG-passage windowing step). Pure scan-side: tokens → start-offset
    array → one explode; no shuffle, no Python — the chunk fan-out is
    the only row growth, so cost is linear in emitted-token volume at
    any scale. Chunk ids and boundaries are pure arithmetic, so the
    same chunking is reproducible engine-wide.
    """
    d = read_table(spark, sf_dir, "documents")

    # Let-bind the token array (TX._let): referenced inside the
    # per-chunk transform lambda, an inline tokens("text") would be
    # re-split once per emitted chunk — O(len × chunks) per doc.
    def chunks_of(t):
        starts = F.sequence(F.lit(0), F.size(t) - 1, F.lit(_CHUNK_S))
        return F.transform(
            starts,
            lambda s: F.struct(
                s.cast("int").alias("chunk_start"),
                F.least(F.lit(_CHUNK_W), F.size(t) - s).cast("int").alias(
                    "n_chunk_tokens"
                ),
                F.concat_ws(" ", F.slice(t, s + 1, _CHUNK_W)).alias(
                    "chunk_text"
                ),
            ),
        )

    chunk = TX._let(TX.tokens("text"), chunks_of)
    return d.select("doc_id", F.posexplode(chunk).alias("chunk_id", "c")).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("c.chunk_start").alias("chunk_start"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
WITH t AS (
  SELECT
    doc_id,
    source,
    len({_SQL_TOKS}) AS n_toks,
    CASE WHEN {sql_knuth_bucket('doc_id', 100)} < 80 THEN 'train'
         WHEN {sql_knuth_bucket('doc_id', 100)} < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM t
GROUP BY source, split
"""


@register("train_val_test_split", oracle=_SPLIT_ORACLE, tags=("llm", "agg"))
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split keyed on the
    width-safe Knuth hash of doc_id, reported as per-(source, split)
    document and token counts — the stratification audit a training
    pipeline runs before sharding. The assignment is a pure projection
    (no RNG state, no stored split table): any job at any scale
    re-derives the same membership from the key alone, which is what
    makes held-out contamination checks reproducible across reruns.
    """
    d = read_table(spark, sf_dir, "documents")
    u = knuth_bucket("doc_id", 100)
    split = (
        F.when(u < 80, "train").when(u < 90, "val").otherwise("test")
    )
    return (
        d.select(
            "source",
            split.alias("split"),
            F.size(TX.tokens("text")).cast("long").alias("n_toks"),
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture resampling
# ---------------------------------------------------------------------------

_TAU_SQL = "sqrt(CAST(n_s AS DOUBLE))"  # n_s^tau at tau = 0.5

_RESAMPLE_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), weighted AS (
  SELECT source, n_s, ROUND({_TAU_SQL}, 6) AS w_s FROM counts
), totals AS (
  SELECT CAST(SUM(n_s) AS DOUBLE) AS total,
         CAST(SUM(CAST(w_s AS DECIMAL(18,6))) AS DOUBLE) AS w_total
  FROM weighted
), rates AS (
  SELECT w.source,
         LEAST(1.0, w.w_s / t.w_total * (0.5 * t.total) / CAST(w.n_s AS DOUBLE))
           AS a_s
  FROM weighted w CROSS JOIN totals t
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE ({sql_knuth_bucket('d.doc_id', 1000000)} + 0.5) / 1000000.0 < r.a_s
"""


@register("mixture_resample", oracle=_RESAMPLE_ORACLE, tags=("llm",))
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (tau = 0.5, target half the
    corpus): per-source acceptance rate ``min(1, p_s·N/n_s)`` with
    ``p_s ∝ n_s^tau`` — the up/down-weighting step that rebalances
    domain mixtures before training. Acceptance is a hash-derived
    uniform per doc (no RNG state), so the sample is reproducible and
    consistent across engines and reruns.

    Determinism of the rates: per-source weights are rounded to 6 dp
    then summed as exact decimals (a double sum over sources would be
    accumulation-order-dependent), and the rate expression evaluates in
    the identical left-to-right IEEE order on both engines.

    Scale shape: one tiny per-source aggregate broadcast back over the
    scan; acceptance is then a scan-side predicate — the corpus itself
    never shuffles.
    """
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    weighted = d.groupBy("source").agg(F.count("*").alias("n_s")).select(
        "source",
        "n_s",
        F.round(F.sqrt(F.col("n_s").cast("double")), 6).alias("w_s"),
    )
    totals = weighted.agg(
        F.sum("n_s").cast("double").alias("total"),
        F.sum(F.col("w_s").cast("decimal(18,6)")).cast("double").alias("w_total"),
    )
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.col("w_s")
            / F.col("w_total")
            * (0.5 * F.col("total"))
            / F.col("n_s").cast("double"),
        ).alias("a_s"),
    )
    u = (knuth_bucket("doc_id", 1_000_000) + 0.5) / 1_000_000.0
    return (
        d.join(F.broadcast(rates), "source")
        .filter(u < F.col("a_s"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# IVF + PQ (product quantization) ANN
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_SUB = 8  # dims per subspace (8 x 8 = 64)
_PQ_K = 16  # codewords per subspace (codebook: embeddings of vec_id < 16)


def _sql_pq_dists(m: str) -> str:
    """DuckDB: per-codeword squared distance of e.emb's m-th subvector
    to each codeword — a left fold from 0.0 (identical IEEE order to
    the Spark ``aggregate`` spelling)."""
    term = f"(e.emb[{m}*{_PQ_SUB}+j] - cb.cbm[{m}+1][k][j])"
    return (
        f"list_transform(generate_series(1, {_PQ_K}), k -> "
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(generate_series(1, {_PQ_SUB}), j -> {term} * {term})), "
        f"(a, b) -> a + b))"
    )


_PQ_DEQ_SQL = (
    f"flatten(list_transform(generate_series(0, {_PQ_M - 1}), m -> "
    f"cb.cbm[m+1][list_position({_sql_pq_dists('m')}, "
    f"list_min({_sql_pq_dists('m')}))]))"
)

_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cbrows AS (
  SELECT m, e.vec_id AS k,
         list_transform(generate_series(1, {_PQ_SUB}), j -> e.emb[m*{_PQ_SUB}+j])
           AS sub
  FROM e, unnest(generate_series(0, {_PQ_M - 1})) AS t(m)
  WHERE e.vec_id < {_PQ_K}
), cb AS (
  SELECT list(subs ORDER BY m) AS cbm FROM (
    SELECT m, list(sub ORDER BY k) AS subs FROM cbrows GROUP BY m
  )
), cent AS (
  SELECT label, list(centroid_val ORDER BY pos) AS cvec
  FROM (
    SELECT e.label, i AS pos,
           CAST(SUM(CAST(e.emb[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
             AS centroid_val
    FROM e, unnest(generate_series(1, len(e.emb))) AS t(i)
    GROUP BY e.label, i
  )
  GROUP BY label
), deq AS (
  SELECT e.vec_id, e.label, e.emb, {_PQ_DEQ_SQL} AS deq
  FROM e CROSS JOIN cb
), probe AS (
  SELECT q.vec_id AS query_id, q.emb AS q_emb, c.label AS probe_label
  FROM e q CROSS JOIN cent c
  WHERE q.vec_id % 100 = 0
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id
    ORDER BY list_dot_product(q.emb, c.cvec)
               / nullif(sqrt(list_dot_product(q.emb, q.emb))
                        * sqrt(list_dot_product(c.cvec, c.cvec)), 0.0) DESC,
             c.label
  ) = 1
), approx AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         p.q_emb, c.emb AS c_emb,
         list_dot_product(p.q_emb, c.deq)
           / nullif(sqrt(list_dot_product(p.q_emb, p.q_emb))
                    * sqrt(list_dot_product(c.deq, c.deq)), 0.0) AS approx_sim
  FROM probe p
  JOIN deq c ON c.label = p.probe_label AND c.vec_id <> p.query_id
  QUALIFY row_number() OVER (
    PARTITION BY p.query_id ORDER BY approx_sim DESC, c.vec_id) <= 10
)
SELECT query_id, neighbor_id,
       list_dot_product(q_emb, c_emb)
         / nullif(sqrt(list_dot_product(q_emb, q_emb))
                  * sqrt(list_dot_product(c_emb, c_emb)), 0.0) AS cos_sim
FROM approx
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= 3
"""


def _spark_pq_dists(m: str) -> str:
    """Spark-SQL twin of _sql_pq_dists (element_at is 1-based, matching
    DuckDB list indexing; the fold starts at 0.0D)."""
    cw = f"element_at(element_at(element_at(cbm, {m}+1), k), j)"
    term = f"(element_at(emb, {m}*{_PQ_SUB}+j) - {cw})"
    return (
        f"transform(sequence(1, {_PQ_K}), k -> "
        f"aggregate(sequence(1, {_PQ_SUB}), 0.0D, (acc, j) -> "
        f"acc + {term} * {term}))"
    )


# The per-subspace distance array is let-bound (functions/text.py
# _let, spelled in SQL text: transform(array(e), d -> body)[0]) so the
# K x SUB fold runs ONCE per (row, m) instead of twice — Catalyst has
# no common-subexpression elimination inside higher-order-function
# lambdas, and array_position(dists, array_min(dists)) mentions the
# fold twice. Values, argmin, and first-index tie-break are
# bit-identical to the unbound spelling (same fold, same IEEE order).
# Measured on a 100k-row replicated embeddings frame: 7.1-7.4 s ->
# 3.7-4.5 s (~1.9x) — the per-row win that dominates at scale. The
# sf0.1 COLD number barely moves (2.43 -> 2.29 best-of-3) because at
# 2k rows the query is driver-overhead-bound: codegen + the
# 1024-literal codebook parse + 5 distinct job compilations (~1.5-2 s
# of the cold total), which is also why its calibration-normalized
# bench drifts with single-core host speed while scan-bound queries
# don't (round-11 pq_topk drift adjudication, SCALE_NOTES).
_PQ_DEQ_SPARK = (
    f"flatten(transform(sequence(0, {_PQ_M - 1}), m -> "
    f"transform(array({_spark_pq_dists('m')}), d -> "
    f"element_at(element_at(cbm, m+1), "
    f"cast(array_position(d, array_min(d)) as int)))[0]))"
)


@register("embedding_pq_topk", oracle=_PQ_ORACLE, tags=("vector", "llm"))
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ (product quantization) ANN: each vector is encoded as
    {M} uint4-scale codes — one per {SUB}-dim subspace, the nearest of
    {K} codewords (here the subvectors of the first {K} embeddings; a
    trained codebook at scale) — and the first-pass similarity scans
    codeword reconstructions, 8-64x smaller than raw floats. The coarse
    quantizer (per-label centroids, nprobe=1) prunes candidates to the
    probed inverted list first; exact cosine re-ranks top-10 → top-3.
    Completes the ANN family: brute (exactness baseline), sign-LSH,
    IVF, IVF+SQ8 (per-dim grid), IVF+PQ (subspace codebooks).

    Cross-engine determinism: codeword assignment is an argmin over
    left-fold-from-0.0 squared distances with first-index tie-break —
    bit-identical on both engines (the kmeans_assign pattern, per
    subspace); the codebook enters the Spark plan as ONE parsed SQL
    literal (k-means' py4j lesson) while the oracle rebuilds it from
    the same rows.

    Scale shape: codebook and centroids are tiny broadcast aggregates;
    encoding is scan-side; the candidate join key is the probed list
    id, so lists partition the corpus at 100 TB and the PQ codes (M
    bytes/vector) are what the scan actually reads.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", VX.as_double("embedding").alias("emb")
    )
    # Codebook: subvectors of the first K embeddings, as ONE SQL literal
    # (nested per-element lit() calls would be ~1k py4j round-trips).
    cb = [
        list(r.emb)
        for r in e.filter(F.col("vec_id") < _PQ_K).orderBy("vec_id").collect()
    ]
    cb_lit = (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array("
                + ",".join(
                    f"{float(cb[k][m * _PQ_SUB + j])!r}D" for j in range(_PQ_SUB)
                )
                + ")"
                for k in range(_PQ_K)
            )
            + ")"
            for m in range(_PQ_M)
        )
        + ")"
    )
    cent = (
        e.select("label", F.posexplode("emb").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("val").cast("decimal(18,9)")).cast("double") / F.count("*"))
            .alias("centroid_val")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s["centroid_val"],
            ).alias("cvec")
        )
    )
    deq = (
        fan_out(e)
        .withColumn("cbm", F.expr(cb_lit))
        .select("vec_id", "label", "emb", F.expr(_PQ_DEQ_SPARK).alias("deq"))
    )
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    from pyspark.sql import Window

    probe_w = Window.partitionBy("query_id").orderBy(
        VX.cosine("q_emb", "cvec").desc(), F.col("label")
    )
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") == 1)
        .select("query_id", "q_emb", F.col("label").alias("probe_label"))
    )
    c = deq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("emb").alias("c_emb"),
        F.col("deq").alias("c_deq"),
    )
    approx_sim = VX.dot("q_emb", "c_deq") / F.nullif(
        F.sqrt(VX.dot("q_emb", "q_emb")) * F.sqrt(VX.dot("c_deq", "c_deq")),
        F.lit(0.0),
    )
    w10 = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id")
    )
    shortlist = (
        c.join(
            F.broadcast(probe),
            (F.col("c_label") == F.col("probe_label"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id", "neighbor_id", "q_emb", "c_emb",
            approx_sim.alias("approx_sim"),
        )
        .withColumn("rn", F.row_number().over(w10))
        .filter(F.col("rn") <= 10)
    )
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        shortlist.select(
            "query_id",
            "neighbor_id",
            VX.cosine("q_emb", "c_emb").alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w3))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Decontamination removal step (anti-join companion to the overlap stats)
# ---------------------------------------------------------------------------

_DECON_ORACLE = """
WITH gram AS (
  SELECT doc_id, UNNEST(list_distinct(g5)) AS g FROM (
    SELECT doc_id,
           list_transform(
             generate_series(1, GREATEST(0, len(toks) - 4)),
             i -> array_to_string(list_slice(toks, i, i + 4), ' ')) AS g5,
           toks
    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
          FROM documents)
  )
), bench AS (
  SELECT DISTINCT g FROM gram WHERE doc_id % 97 = 0
), dirty AS (
  SELECT DISTINCT gram.doc_id
  FROM gram JOIN bench ON gram.g = bench.g
  WHERE gram.doc_id % 97 <> 0
)
SELECT d.doc_id, d.source
FROM documents d
WHERE d.doc_id % 97 <> 0
  AND NOT EXISTS (SELECT 1 FROM dirty WHERE dirty.doc_id = d.doc_id)
"""


@register("decontaminate_docs", oracle=_DECON_ORACLE, tags=("text", "llm", "join"))
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL step of benchmark decontamination (companion to
    contamination_ngram_overlap's statistics): training docs that share
    even one distinct 5-gram with the benchmark split (doc_id % 97 = 0)
    are dropped via LEFT ANTI join; survivors pass through. Scale
    shape: benchmark grams are distinct (set semantics, broadcastable
    in practice); the gram equi-join bounds work by eval-gram volume;
    the anti join keys on doc_id only — no text moves through the
    shuffle.
    """
    from ucl_data_pipeline_spark.sources.io import fan_out

    d = read_table(spark, sf_dir, "documents")
    # 5-grams are equality keys only (bench semi-join) — shuffle
    # xxhash64 digests, not ~40-byte strings (collision-safe at 64
    # bits; the string-keyed oracle is the collision check).
    gram = fan_out(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(TX.shingles(TX.tokens("text"), 5))).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("g"))
    bench = gram.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    dirty = (
        gram.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "g")
        .select("doc_id")
        .distinct()
    )
    return (
        d.filter(F.col("doc_id") % 97 != 0)
        .join(dirty, "doc_id", "left_anti")
        .select("doc_id", "source")
    )
