"""Round-7 operators: tuning-frontier queries — the knob-vs-quality
curves a 100 TB training-data pipeline actually turns, each emitted as
one driver-verifiable result set (the pattern ``ann_recall_frontier``
established for IVF nprobe):

- ``minhash_size_frontier``: MinHash estimator error vs signature size
  (k = 2/4/6 hashes) over the SAME LSH candidate pairs — how many
  hashes a signature needs before the Jaccard estimate stabilizes.
- ``pack_budget_frontier``: packing fill-rate vs token budget
  (B = 256/512/1024) for the greedy contiguous packer — the
  sequence-length tradeoff when building pretraining batches.
- ``contamination_gram_frontier``: benchmark-contamination rate vs
  n-gram length (n = 3/5/8) — longer grams are more distinctive, so
  the rate falling with n is the knob that separates true leakage
  from coincidental phrase overlap.

Plus ``curation_pipeline``: the engine's whole use case as ONE lazy
DAG — benchmark holdout → contamination gate → quality gate →
fingerprint near-dedup → split + pack assignment, every doc leaving
with a disposition, composed from the registered single-stage
operators' exact spellings.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on division outputs, atomic columns, BIGINT/DOUBLE oracle
casts. All per-row statistics are exact integer ratios, so the only
float steps are single divisions evaluated in the same IEEE order on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.plans.llm_ops import (
    _rep_features,
    _SQL_SHINGLES,
    _SQL_TOKS,
    _sql_minhash,
)
from ucl_data_pipeline_spark.plans.llm_ops2 import _sql_kgrams
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table, stats_barrier

# ---------------------------------------------------------------------------
# MinHash signature-size frontier (estimator error vs hash count)
# ---------------------------------------------------------------------------

_MH_SIZES = (2, 4, 6)

_MH_SIZE_ORACLE = rf"""
WITH rep AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
), tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM rep
), feat AS (
  SELECT doc_id, {_SQL_SHINGLES.format(t='toks')} AS feats FROM tok
), sig AS (
  SELECT doc_id, feats,
    {_sql_minhash(0)} AS mh_0, {_sql_minhash(1)} AS mh_1,
    {_sql_minhash(2)} AS mh_2, {_sql_minhash(3)} AS mh_3,
    {_sql_minhash(4)} AS mh_4, {_sql_minhash(5)} AS mh_5
  FROM feat
), banded AS (
  SELECT *,
    md5(mh_0 || mh_1) AS band_0,
    md5(mh_2 || mh_3) AS band_1,
    md5(mh_4 || mh_5) AS band_2
  FROM sig
), bucket AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_key FROM banded WHERE band_0 IS NOT NULL
  UNION ALL
  SELECT doc_id, 1, band_1 FROM banded WHERE band_1 IS NOT NULL
  UNION ALL
  SELECT doc_id, 2, band_2 FROM banded WHERE band_2 IS NOT NULL
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bucket a
  JOIN bucket b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
), err AS (
  SELECT
    (CASE WHEN sa.mh_0 = sb.mh_0 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_1 = sb.mh_1 THEN 1 ELSE 0 END) AS m2,
    (CASE WHEN sa.mh_0 = sb.mh_0 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_1 = sb.mh_1 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_2 = sb.mh_2 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_3 = sb.mh_3 THEN 1 ELSE 0 END) AS m4,
    (CASE WHEN sa.mh_0 = sb.mh_0 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_1 = sb.mh_1 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_2 = sb.mh_2 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_3 = sb.mh_3 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_4 = sb.mh_4 THEN 1 ELSE 0 END
     + CASE WHEN sa.mh_5 = sb.mh_5 THEN 1 ELSE 0 END) AS m6,
    CAST(len(list_filter(sa.feats, x -> list_contains(sb.feats, x))) AS DOUBLE)
      / CAST(len(sa.feats) + len(sb.feats)
             - len(list_filter(sa.feats, x -> list_contains(sb.feats, x)))
        AS DOUBLE) AS exact_j
  FROM cand c
  JOIN banded sa ON c.doc_a = sa.doc_id
  JOIN banded sb ON c.doc_b = sb.doc_id
), ks AS (
  SELECT unnest([{', '.join(str(k) for k in _MH_SIZES)}]) AS n_hashes
), per AS (
  SELECT ks.n_hashes,
    ROUND(ABS(
      CASE ks.n_hashes WHEN 2 THEN m2 / 2.0
                       WHEN 4 THEN m4 / 4.0
                       ELSE m6 / 6.0 END - exact_j), 6) AS abs_err
  FROM err CROSS JOIN ks
)
SELECT CAST(n_hashes AS INTEGER) AS n_hashes,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND(CAST(SUM(CAST(abs_err AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
    AS mean_abs_err,
  ROUND(MAX(abs_err), 6) AS max_abs_err
FROM per
GROUP BY n_hashes
"""


@register(
    "minhash_size_frontier",
    oracle=_MH_SIZE_ORACLE,
    tags=("dedup", "llm", "gate"),
)
def minhash_size_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator error vs signature size, as one result set:
    for k ∈ {2, 4, 6} hashes, the mean and max |estimate − exact
    Jaccard| over the SAME LSH candidate pairs — the sketch-budget
    curve that says how many hashes a signature needs (expected error
    scales ~1/√k; the mean column is that law made driver-visible,
    the companion of ``minhash_jaccard_error``'s per-pair view).

    Cost shape: signatures and bands are ONE scan-side pass (prefixes
    of the same 6-hash signature — a k-hash estimate is the first k
    minhashes, so no extra hashing per frontier point); candidates
    come from the same banded bucket join as ``dedup_minhash_lsh``
    (never all-pairs); the per-k variants are arithmetic over the one
    joined pair set, exploded by a 3-row literal. Mean abs-err
    accumulates via 6dp-decimal sums so partition order can't perturb
    the reported mean.
    """
    feats = _rep_features(spark, sf_dir).persist()
    mh = [TX.minhash(F.col("feats"), s) for s in range(6)]
    sig = (
        feats.select(
            "doc_id", "feats", *[mh[s].alias(f"mh_{s}") for s in range(6)]
        )
        .select(
            "*",
            F.md5(F.concat("mh_0", "mh_1")).alias("band_0"),
            F.md5(F.concat("mh_2", "mh_3")).alias("band_1"),
            F.md5(F.concat("mh_4", "mh_5")).alias("band_2"),
        )
        .persist()
    )
    bucket = sig.select(
        "doc_id",
        F.posexplode(F.array("band_0", "band_1", "band_2")).alias(
            "band_idx", "band_key"
        ),
    ).filter(F.col("band_key").isNotNull())
    # stats-barriered (r13, replacing the r12 merge hint): both sides
    # of the band self-join are corpus-sized with a Generate-blind
    # static estimate (the ×100-smoke broadcast class — see
    # llm_ops.lsh_candidate_pairs); the barrier keeps the static plan
    # SMJ while AQE's size-measured runtime BHJ conversion stays free.
    bucket = stats_barrier(bucket)
    a = bucket.alias("a")
    b = bucket.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ssrc = stats_barrier(sig)
    sa = ssrc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("feats").alias("fa"),
        *[F.col(f"mh_{s}").alias(f"a_mh_{s}") for s in range(6)],
    )
    sb = ssrc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("feats").alias("fb"),
        *[F.col(f"mh_{s}").alias(f"b_mh_{s}") for s in range(6)],
    )
    m = [
        F.when(F.col(f"a_mh_{s}") == F.col(f"b_mh_{s}"), 1).otherwise(0)
        for s in range(6)
    ]
    inter = F.size(F.array_intersect("fa", "fb"))
    exact = inter.cast("double") / (
        F.size("fa") + F.size("fb") - inter
    ).cast("double")
    err = (
        # stats-barriered above: sa/sb carry corpus-sized feature
        # arrays the static planner would broadcast on a Generate-
        # blind estimate (the r12 ×100-smoke class — see
        # dedup_minhash_lsh/extras9); the barrier replaces the r12
        # merge hints and re-enables AQE's runtime conversion.
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            (m[0] + m[1]).alias("m2"),
            (m[0] + m[1] + m[2] + m[3]).alias("m4"),
            (m[0] + m[1] + m[2] + m[3] + m[4] + m[5]).alias("m6"),
            exact.alias("exact_j"),
        )
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _MH_SIZES])).alias("n_hashes")
    )
    est = (
        F.when(F.col("n_hashes") == 2, F.col("m2") / 2.0)
        .when(F.col("n_hashes") == 4, F.col("m4") / 4.0)
        .otherwise(F.col("m6") / 6.0)
    )
    per = err.crossJoin(F.broadcast(ks)).select(
        "n_hashes",
        F.round(F.abs(est - F.col("exact_j")), 6).alias("abs_err"),
    )
    return per.groupBy("n_hashes").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.col("abs_err").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_abs_err"),
        F.round(F.max("abs_err"), 6).alias("max_abs_err"),
    ).select(
        F.col("n_hashes").cast("int").alias("n_hashes"),
        "n_pairs",
        "mean_abs_err",
        "max_abs_err",
    )


# ---------------------------------------------------------------------------
# Packing fill-rate frontier (efficiency vs token budget)
# ---------------------------------------------------------------------------

_PACK_BUDGETS = (256, 512, 1024)

_PACK_FRONTIER_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, source, len({_SQL_TOKS}) AS n_tokens FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum_tokens
  FROM tok
), budgets AS (
  SELECT unnest([{', '.join(str(b) for b in _PACK_BUDGETS)}]) AS budget
), packed AS (
  SELECT b.budget, c.source, c.n_tokens,
    FLOOR((c.cum_tokens - c.n_tokens) / (b.budget * 1.0)) AS pack_id
  FROM cum c CROSS JOIN budgets b
)
SELECT CAST(budget AS INTEGER) AS budget,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT source || '#' || CAST(pack_id AS VARCHAR)) AS BIGINT)
    AS n_packs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE)
        / (COUNT(DISTINCT source || '#' || CAST(pack_id AS VARCHAR))
           * budget), 6) AS fill_rate
FROM packed
GROUP BY budget
"""


@register(
    "pack_budget_frontier",
    oracle=_PACK_FRONTIER_ORACLE,
    tags=("llm", "window"),
)
def pack_budget_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-packer efficiency vs token budget, as one result set:
    for B ∈ {256, 512, 1024}, the pack count and fill rate
    (total tokens ÷ pack capacity) under ``pack_sequences_greedy``'s
    start-pack assignment — the sequence-length knob when building
    pretraining batches: small budgets waste capacity on boundary
    fragmentation, large budgets amortize it (fill rate rises toward
    1 as B grows past the doc-length scale).

    Cost shape: the per-shard cumulative-token window runs ONCE
    (budget-independent — pack membership is pure arithmetic on the
    shared running sum), then the 3-row budget table fans out
    scan-side into one hash-agg per budget grain. One shuffle on
    ``source`` total, same as the single-budget packer.
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
    budgets = spark.range(1).select(
        F.explode(F.array(*[F.lit(b) for b in _PACK_BUDGETS])).alias("budget")
    )
    packed = cum.crossJoin(F.broadcast(budgets)).select(
        "budget",
        "source",
        "n_tokens",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens"))
            / (F.col("budget") * 1.0)
        ).alias("pack_id"),
    )
    pack_key = F.concat_ws("#", "source", F.col("pack_id").cast("string"))
    return packed.groupBy("budget").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(pack_key).cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tokens").cast("double")
            / (F.countDistinct(pack_key) * F.col("budget")),
            6,
        ).alias("fill_rate"),
    ).select(
        F.col("budget").cast("int").alias("budget"),
        "n_docs",
        "n_packs",
        "total_tokens",
        "fill_rate",
    )


# ---------------------------------------------------------------------------
# Contamination rate vs n-gram length frontier
# ---------------------------------------------------------------------------

_CONTAM_NS = (3, 5, 8)


def _contam_branch_sql(n: int) -> str:
    return (
        f"SELECT doc_id, {n} AS gram_len, "
        f"unnest(list_distinct({_sql_kgrams(n)})) AS g FROM tok"
    )


_CONTAM_FRONTIER_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), gram AS (
  {' UNION ALL '.join(_contam_branch_sql(n) for n in _CONTAM_NS)}
), bench AS (
  SELECT DISTINCT gram_len, g FROM gram WHERE doc_id % 97 = 0
), ev AS (
  SELECT gram_len, doc_id, g FROM gram WHERE doc_id % 97 <> 0
), tot AS (
  SELECT gram_len, COUNT(*) AS n_grams, COUNT(DISTINCT doc_id) AS n_docs
  FROM ev GROUP BY 1
), hit AS (
  SELECT e.gram_len, COUNT(*) AS n_hit, COUNT(DISTINCT e.doc_id) AS docs_hit
  FROM ev e JOIN bench b ON e.gram_len = b.gram_len AND e.g = b.g
  GROUP BY 1
)
SELECT CAST(t.gram_len AS INTEGER) AS gram_len,
  CAST(t.n_docs AS BIGINT) AS n_eval_docs,
  CAST(COALESCE(h.docs_hit, 0) AS BIGINT) AS n_docs_hit,
  CAST(t.n_grams AS BIGINT) AS n_eval_grams,
  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_contaminated_grams,
  ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_grams, 6)
    AS contamination_rate
FROM tot t LEFT JOIN hit h ON t.gram_len = h.gram_len
"""


@register(
    "contamination_gram_frontier",
    oracle=_CONTAM_FRONTIER_ORACLE,
    tags=("llm", "text", "join"),
)
def contamination_gram_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination rate vs n-gram length, as one result
    set: for n ∈ {3, 5, 8}, the fraction of eval-side distinct n-gram
    instances (and of eval docs) that collide with the benchmark
    split — THE knob in decontamination policy: 3-grams flag
    coincidental phrase overlap, 8-grams only near-verbatim leakage,
    so the rate must fall monotonically with n and the gap quantifies
    how aggressive a given gram length is
    (``contamination_ngram_overlap`` is the per-doc view at n=5).

    Cost shape: the token array materializes once per row; the three
    gram lengths are scan-side shingle passes over it unioned into ONE
    (gram_len, digest)-keyed flow — the bench build, semi-join, and
    both aggs all key on (gram_len, g), so AQE reuses one partitioning.
    Grams shuffle as 8-byte xxhash64 digests (equality keys only; the
    string-keyed oracle is the collision check).
    """
    tok = read_table(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens("text").alias("toks")
    )
    gram = None
    for n in _CONTAM_NS:
        br = tok.select(
            "doc_id",
            F.lit(n).alias("gram_len"),
            F.explode(
                F.array_distinct(TX.shingles(F.col("toks"), n))
            ).alias("g"),
        )
        gram = br if gram is None else gram.unionByName(br)
    gram = gram.select(
        "doc_id", "gram_len", F.xxhash64("g").alias("g")
    )
    bench = (
        gram.filter(F.col("doc_id") % 97 == 0)
        .select("gram_len", "g")
        .distinct()
    )
    ev = gram.filter(F.col("doc_id") % 97 != 0)
    tot = ev.groupBy("gram_len").agg(
        F.count("*").alias("n_grams"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    hit = (
        ev.join(bench, ["gram_len", "g"])
        .groupBy("gram_len")
        .agg(
            F.count("*").alias("n_hit"),
            F.countDistinct("doc_id").alias("docs_hit"),
        )
    )
    return (
        tot.join(hit, "gram_len", "left")
        .select(
            F.col("gram_len").cast("int").alias("gram_len"),
            F.col("n_docs").cast("bigint").alias("n_eval_docs"),
            F.coalesce("docs_hit", F.lit(0))
            .cast("bigint")
            .alias("n_docs_hit"),
            F.col("n_grams").cast("bigint").alias("n_eval_grams"),
            F.coalesce("n_hit", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_grams"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (the engine's use case as ONE DAG)
# ---------------------------------------------------------------------------

_CUR_Q_THRESH = 0.48   # ≈ corpus p25 — drops the worst quality quartile
_CUR_PACK_B = 512      # pack budget for kept docs

# Quality formula: EXACTLY text_quality_score's (llm_ops.py) spelling.
_CUR_QSCORE_SQL = """
    0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
    + 0.3 * ttr
    + 0.2 * least(1.0, stopword_ratio * 5.0)
    + 0.1 * (1.0 - least(1.0, CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)))
"""

_CURATION_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, source, text, n_chars, {{toks}} AS toks FROM documents
), q AS (
  SELECT doc_id, source, n_chars, toks,
    CAST(len(toks) AS INTEGER) AS n_tokens,
    len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
    CAST(len(list_filter(toks, t -> list_contains({{stoplist}}, t))) AS DOUBLE)
      / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
    CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS ttr,
    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
  FROM tok
), scored AS (
  SELECT doc_id, source, n_tokens, toks, fp,
    ({_CUR_QSCORE_SQL}) AS qscore,
    (doc_id % 97 = 0) AS is_bench
  FROM q
), bench_grams AS (
  SELECT DISTINCT unnest(list_distinct({{kgrams5}})) AS g
  FROM scored WHERE is_bench
), ev_gram AS (
  SELECT doc_id, unnest(list_distinct({{kgrams5}})) AS g
  FROM scored WHERE NOT is_bench
), dirty AS (
  SELECT DISTINCT e.doc_id FROM ev_gram e JOIN bench_grams b ON e.g = b.g
), s2 AS (  -- survivors past benchmark + contamination
  SELECT s.* FROM scored s
  LEFT JOIN dirty d ON s.doc_id = d.doc_id
  WHERE NOT s.is_bench AND d.doc_id IS NULL
), s3 AS (  -- survivors past the quality gate
  SELECT * FROM s2 WHERE qscore >= {_CUR_Q_THRESH}
), rep AS (
  SELECT fp, MIN(doc_id) AS rep_id FROM s3 GROUP BY fp
), kept AS (
  SELECT s.doc_id, s.source, s.n_tokens FROM s3 s
  JOIN rep r ON s.fp = r.fp AND s.doc_id = r.rep_id
), packed AS (
  SELECT doc_id, source, n_tokens,
    CASE WHEN {{knuth}} < 80 THEN 'train'
         WHEN {{knuth}} < 90 THEN 'val'
         ELSE 'test' END AS split,
    CAST(FLOOR((SUM(n_tokens) OVER (
        PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) - n_tokens) / {_CUR_PACK_B}.0) AS INTEGER) AS pack_id
  FROM kept
)
SELECT s.doc_id, s.source,
  CAST(s.n_tokens AS INTEGER) AS n_tokens,
  CASE WHEN s.is_bench THEN 'benchmark'
       WHEN d.doc_id IS NOT NULL THEN 'contaminated'
       WHEN s.qscore < {_CUR_Q_THRESH} THEN 'low_quality'
       WHEN p.doc_id IS NULL THEN 'near_dup'
       ELSE 'kept' END AS disposition,
  p.split,
  p.pack_id
FROM scored s
LEFT JOIN dirty d ON s.doc_id = d.doc_id
LEFT JOIN packed p ON s.doc_id = p.doc_id
"""


def _curation_oracle() -> str:
    from ucl_data_pipeline_spark.plans.llm_ops import _SQL_STOPLIST
    from ucl_data_pipeline_spark.plans.registry import sql_knuth_bucket

    return _CURATION_ORACLE.format(
        toks=_SQL_TOKS,
        stoplist=_SQL_STOPLIST,
        kgrams5=_sql_kgrams(5),
        knuth=sql_knuth_bucket("doc_id", 100),
    )


def curation_doc_signals(d: DataFrame) -> DataFrame:
    """Scan-side curation signals shared by the batch pipeline and the
    streaming gate (streaming/windows.py ``curation_gate_stream``):
    from (doc_id, source, text, n_chars) compute n_tokens, the exact
    text_quality_score formula, the distinct 5-gram array, the
    order-insensitive token fingerprint, and the benchmark flag — one
    projection, works identically on a bounded or unbounded DataFrame
    (no shuffle, no state). ONE implementation so stream ≡ batch holds
    by construction for every stateless gate.
    """
    from ucl_data_pipeline_spark.plans.llm_ops import _STOPWORDS

    base = d.select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        TX.tokens("text").alias("toks"),
    )
    n_tokens = F.size("toks")
    stop_ratio = TX.stopword_hits(F.col("toks"), _STOPWORDS).cast(
        "double"
    ) / n_tokens.cast("double")
    ttr = F.size(F.array_distinct("toks")).cast("double") / n_tokens.cast(
        "double"
    )
    qscore = (
        0.4 * F.least(F.lit(1.0), n_tokens.cast("double") / 100.0)
        + 0.3 * ttr
        + 0.2 * F.least(F.lit(1.0), stop_ratio * 5.0)
        + 0.1
        * (
            F.lit(1.0)
            - F.least(
                F.lit(1.0),
                TX.punct_count("text").cast("double")
                / F.col("n_chars").cast("double"),
            )
        )
    )
    return base.select(
        "doc_id",
        "source",
        "text",
        n_tokens.cast("int").alias("n_tokens"),
        F.array_distinct(TX.shingles(F.col("toks"), 5)).alias("g5"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct("toks")), " ")
        ).alias("fp"),
        qscore.alias("qscore"),
        (F.col("doc_id") % 97 == 0).alias("is_bench"),
    )


@register(
    "curation_pipeline",
    oracle=_curation_oracle(),
    tags=("llm", "text", "join", "flagship"),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's whole use case as ONE lazy DAG: every document
    enters and leaves with a disposition —

      benchmark    → held out (doc_id % 97), its 5-grams become the
                     contamination reference,
      contaminated → shares ≥1 distinct 5-gram with the benchmark
                     (checked FIRST so leakage can't hide behind a
                     later gate — policy order, explicit by design),
      low_quality  → text_quality_score's exact formula < {t},
      near_dup     → not the lowest-doc_id representative of its
                     order-insensitive token fingerprint (catches the
                     shuffled near-copies byte-dedup misses),
      kept         → assigned its deterministic 80/10/10 split (Knuth
                     hash) and greedy 512-token pack id.

    Each stage sees only the previous stage's survivors, exactly like
    the production pipeline it models — and the whole ladder is one
    Catalyst plan: the scan-side pass computes tokens, quality terms
    and the fingerprint together; contamination is a digest semi-join
    bounded by the (tiny) benchmark side; dedup is a fingerprint-grain
    hash-agg + self-equi-join; the pack window runs only over kept
    docs. Composes the registered single-stage operators
    (text_quality_score, doc_fingerprint, decontaminate_docs,
    train_val_test_split, pack_sequences_greedy) with their exact
    spellings, so the composite can't drift from the pieces the
    driver already checks.
    """
    from ucl_data_pipeline_spark.functions.scalar import knuth_bucket

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    scored = curation_doc_signals(d).persist()
    gram = scored.select(
        "doc_id", "is_bench", F.explode("g5").alias("g")
    ).select("doc_id", "is_bench", F.xxhash64("g").alias("g"))
    bench_grams = gram.filter("is_bench").select("g").distinct()
    dirty = (
        gram.filter(~F.col("is_bench"))
        .join(bench_grams, "g")
        .select("doc_id")
        .distinct()
        .withColumn("is_dirty", F.lit(True))
    )
    flagged = scored.join(dirty, "doc_id", "left")
    s3 = flagged.filter(
        ~F.col("is_bench")
        & F.col("is_dirty").isNull()
        & (F.col("qscore") >= _CUR_Q_THRESH)
    )
    rep = s3.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    kept = s3.join(
        rep, (s3["fp"] == rep["fp"]) & (s3["doc_id"] == rep["rep_id"])
    ).select(s3["doc_id"], s3["source"], s3["n_tokens"])
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = knuth_bucket("doc_id", 100)
    packed = kept.select(
        "doc_id",
        F.when(u < 80, "train").when(u < 90, "val").otherwise("test").alias(
            "split"
        ),
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / float(_CUR_PACK_B)
        )
        .cast("int")
        .alias("pack_id"),
        F.lit(True).alias("is_kept"),
    )
    return (
        flagged.join(packed, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.when(F.col("is_bench"), "benchmark")
            .when(F.col("is_dirty"), "contaminated")
            .when(F.col("qscore") < _CUR_Q_THRESH, "low_quality")
            .when(F.col("is_kept").isNull(), "near_dup")
            .otherwise("kept")
            .alias("disposition"),
            "split",
            "pack_id",
        )
    )


curation_pipeline.__doc__ = curation_pipeline.__doc__.format(t=_CUR_Q_THRESH)
