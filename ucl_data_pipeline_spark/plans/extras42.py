"""Round-8 batch 9: content-fingerprint selection, subword-vocabulary
induction, and unsupervised keyword extraction — three text-pipeline
operators the reference's corpus tooling implies but never spells:

- ``winnowing_fingerprints``: MOSS-style winnowing (Schleimer,
  Wilkerson & Aiken, SIGMOD'03) — slide a w-window over the k-gram
  hash sequence and keep each window's minimum hash (rightmost on
  ties); the selected set is the document fingerprint with the
  guarantee that any match of length ≥ w+k-1 shares a fingerprint,
  at expected density 2/(w+1). The local-selection step that turns
  "hash every k-gram" (doc_fingerprint / dup-span family) into a
  storage-bounded sketch.
- ``bpe_merge_training``: the TRAINING side of byte-pair encoding —
  three unrolled merge steps, each = count adjacent symbol pairs over
  the word-frequency-weighted vocabulary, take the argmax pair, merge
  it greedily left-to-right in every word. Companion to the
  apply-side ``bpe_token_count`` (llm_ops): that query assumes a
  merge table; this one derives it.
- ``rake_keywords``: RAKE (Rose et al. 2010) — split each document
  into candidate phrases at stopwords, score words by
  degree/frequency over phrase co-occurrence, rank phrases by the sum
  of member-word scores; top-15 corpus keywords.

Registry conventions (plans/registry.py): all counts exact BIGINT;
divisions of exact integers ROUND 6; the RAKE phrase score is a sum of
ROUND-6 terms in DECIMAL(18,6) (the ``unigram_entropy`` pattern) so
member order cannot perturb the float sum; argmax/top-k orders are
total (count DESC then lexicographic; score DESC then phrase).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX
from ucl_data_pipeline_spark.functions.text import _let
from ucl_data_pipeline_spark.plans.llm_ops import _SQL_TOKS, _STOPWORDS
from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Winnowing fingerprint selection (MOSS)
# ---------------------------------------------------------------------------

_WIN_K = 4  # tokens per gram
_WIN_W = 4  # grams per winnowing window; expected density 2/(w+1) = 0.4

_WINNOW_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), gr AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {_WIN_K} THEN
           list_transform(generate_series(0, len(t) - {_WIN_K}),
             i -> md5(t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
         ELSE [] END AS g
  FROM tok
), sel AS (
  SELECT doc_id, len(g) AS n_grams,
         CASE WHEN len(g) >= {_WIN_W} THEN
           list_transform(generate_series(0, len(g) - {_WIN_W}), i ->
             lpad(CAST(i + list_max(list_filter(generate_series(1, {_WIN_W}),
                          j -> g[i+j] = list_min(g[i+1:i+{_WIN_W}]))) AS VARCHAR),
                  6, '0')
             || ':' || list_min(g[i+1:i+{_WIN_W}]))
         ELSE [] END AS s
  FROM gr
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(CASE WHEN n_grams >= {_WIN_W} THEN n_grams - {_WIN_W} + 1
                 ELSE 0 END AS BIGINT) AS n_windows,
       CAST(len(list_distinct(s)) AS BIGINT) AS n_fps,
       CAST(len(list_distinct(list_transform(s, x -> x[8:39]))) AS BIGINT)
         AS n_fp_hashes,
       ROUND(CAST(len(list_distinct(s)) AS DOUBLE)
             / NULLIF(CAST(CASE WHEN n_grams >= {_WIN_W}
                                THEN n_grams - {_WIN_W} + 1
                                ELSE 0 END AS DOUBLE), 0.0), 6) AS fp_density
FROM sel
"""


def _gram_hashes(t: Column) -> Column:
    """md5 hashes of the k-gram sequence of a (let-bound) token array.
    Positional — NOT distinct: winnowing selects by position."""
    idx = F.sequence(F.lit(0), F.size(t) - _WIN_K)
    gram = lambda i: F.md5(  # noqa: E731
        F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(_WIN_K)])
    )
    return F.when(F.size(t) >= _WIN_K, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def _winnow_select(g: Column) -> Column:
    """Per window [i, i+w): encode the selected fingerprint as
    'pos:hash' where pos is the RIGHTMOST position of the window's
    minimum hash (the robust-winnowing tie rule — rightmost keeps the
    selection stable as the window slides)."""

    def pick(i: Column) -> Column:
        return _let(
            F.slice(g, i + 1, _WIN_W),
            lambda s: _let(
                F.array_min(s),
                lambda m: F.concat(
                    F.lpad(
                        (
                            i
                            + F.array_max(
                                F.filter(
                                    F.sequence(F.lit(1), F.lit(_WIN_W)),
                                    lambda j: F.element_at(s, j) == m,
                                )
                            )
                        ).cast("string"),
                        6,
                        "0",
                    ),
                    F.lit(":"),
                    m,
                ),
            ),
        )

    idx = F.sequence(F.lit(0), F.size(g) - _WIN_W)
    return F.when(F.size(g) >= _WIN_W, F.transform(idx, pick)).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "winnowing_fingerprints",
    oracle=_WINNOW_ORACLE,
    tags=("llm", "text", "dedup"),
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection per document: hash every
    {k}-token gram, slide a {w}-gram window, select each window's
    minimum hash (rightmost on ties), and report the selected-set
    sizes and density. The guarantee (Schleimer et al., SIGMOD'03):
    every substring match of ≥ w+k-1 tokens shares at least one
    selected fingerprint, and expected density is 2/(w+1) — so the
    fingerprint index is a CONSTANT-FACTOR sample of the gram stream
    with a recall contract, the storage story that makes
    fingerprint-based near-dup indexes affordable at corpus scale.

    Determinism: grams hash with md5 (identical hex cross-engine);
    the window argmin is a total order (hash string, then RIGHTMOST
    position); selections are encoded 'pos:hash' with zero-padded
    fixed-width positions so distinct-counting is string equality.

    Scale: one narrow projection — everything happens inside
    per-row higher-order expressions (no explode, no shuffle at all:
    the plan is scan → project). Token and gram arrays are let-bound
    (_let) per the lambda-CSE rule; the O(w²) inner argmin runs on
    w=4 elements. Fingerprint-index CONSTRUCTION (explode selected
    fps → invert) would add one hash-shuffle of 0.4×grams rows —
    the density column is exactly the sizing input for that step.
    """
    d = read_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", _let(TX.tokens("text"), _gram_hashes).alias("g")
    )
    sel = base.select(
        "doc_id",
        F.size("g").alias("n_grams"),
        _let(F.col("g"), _winnow_select).alias("s"),
    )
    n_windows = F.when(
        F.col("n_grams") >= _WIN_W, F.col("n_grams") - _WIN_W + 1
    ).otherwise(F.lit(0))
    n_fps = F.size(F.array_distinct("s"))
    return sel.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        n_windows.cast("long").alias("n_windows"),
        n_fps.cast("long").alias("n_fps"),
        F.size(
            F.array_distinct(
                F.transform(F.col("s"), lambda x: F.substring(x, 8, 32))
            )
        )
        .cast("long")
        .alias("n_fp_hashes"),
        F.round(
            n_fps.cast("double")
            / F.nullif(n_windows.cast("double"), F.lit(0.0)),
            6,
        ).alias("fp_density"),
    )


# ---------------------------------------------------------------------------
# BPE pair-merge training (3 unrolled steps at vocabulary grain)
# ---------------------------------------------------------------------------

_BPE_STEPS = 3

# Greedy left-to-right merge of one (l, r) pair in a symbol sequence,
# as a list fold: DuckDB's reduce() has no init accumulator, so the
# init (an empty VARCHAR[]) is PREPENDED as the first element and every
# symbol is lifted to a one-element list — acc and element then share
# the VARCHAR[] type the lambda needs.
_SQL_MERGE_FOLD = (
    "reduce(list_concat([CAST([] AS VARCHAR[])],"
    " list_transform(syms, s -> [s])),"
    " (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = {b}.l AND x[1] = {b}.r"
    " THEN list_concat(acc[1:len(acc)-1], [{b}.l || {b}.r])"
    " ELSE list_concat(acc, x) END)"
)


def _sql_bpe_step(s: int, prev: str) -> str:
    """One unrolled BPE training step: pair counts over vocab `prev`,
    argmax CTE b{s}, merged vocab v{s}."""
    return f"""p{s} AS (
  SELECT s.l AS l, s.r AS r, CAST(SUM(wfreq) AS BIGINT) AS pair_count
  FROM (
    SELECT wfreq,
           unnest(CASE WHEN len(syms) >= 2 THEN
                    list_transform(generate_series(1, len(syms) - 1),
                      i -> {{'l': syms[i], 'r': syms[i+1]}})
                  ELSE [] END) AS s
    FROM {prev})
  GROUP BY s.l, s.r
), b{s} AS (
  SELECT l, r, pair_count FROM p{s}
  ORDER BY pair_count DESC, l, r LIMIT 1
), v{s} AS (
  SELECT word, wfreq, {_SQL_MERGE_FOLD.format(b=f'b{s}')} AS syms
  FROM {prev}, b{s}
)"""


_BPE_ORACLE = (
    f"""WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wfreq
  FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents)
  GROUP BY w
), v0 AS (
  SELECT word, wfreq,
         list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms
  FROM words
), """
    + ",\n".join(
        _sql_bpe_step(s, f"v{s - 1}") for s in range(1, _BPE_STEPS + 1)
    )
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({s} AS INTEGER) AS step, l AS left_sym, r AS right_sym,"
        f" l || r AS merged_sym, pair_count FROM b{s}"
        for s in range(1, _BPE_STEPS + 1)
    )
)


def _merge_fold(syms: Column, pa: Column, pb: Column) -> Column:
    """Greedy left-to-right merge of adjacent (pa, pb) into pa||pb —
    the exact merge rule BPE training applies per step. try_element_at
    (ANSI-neutral) for the peek at acc's last element; the when()
    branches both stay index-safe on the empty accumulator."""

    def step(acc: Column, s: Column) -> Column:
        last = F.try_element_at(acc, F.lit(-1))
        return F.when(
            (F.size(acc) > 0) & (last == pa) & (s == pb),
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                F.array(F.concat(last, s)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


@register(
    "bpe_merge_training", oracle=_BPE_ORACLE, tags=("llm", "text", "agg")
)
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding TRAINING: starting from character symbols,
    three unrolled merge steps — each counts adjacent symbol pairs
    over the frequency-weighted vocabulary, takes the most frequent
    pair (count DESC, then lexicographic — a total order), and merges
    it greedily left-to-right in every word. Output: one row per
    learned merge (step, pair, merged symbol, weighted count) — the
    merge table that the apply-side ``bpe_token_count`` consumes.

    Scale: this is the shape real BPE trainers (SentencePiece et al.)
    exploit — after ONE corpus-grain hash-agg (token → frequency),
    every step runs at VOCABULARY grain: pair counting explodes
    |V|·avg_len rows, the argmax is a TakeOrdered of the pair-stat
    frame, and the merge applies via a broadcast of the 1-ROW winner
    crossed into the vocab frame — no driver loop, no collect; the
    whole 3-step training is one Catalyst DAG. At 100 TB the corpus
    agg dominates and is embarrassingly partial-aggregable; vocab
    work is constant in corpus size.

    Fold semantics pinned cross-engine: greedy left-to-right ('a a a'
    with merge (a,a) → ['aa','a'], never ['a','aa']) — the Spark
    F.aggregate fold and the DuckDB reduce() (init prepended, symbols
    lifted to singleton lists) walk the same chain.
    """
    d = read_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wfreq"))
        .select(
            "word",
            "wfreq",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substring(F.col("word"), i, F.lit(1)),
            ).alias("syms"),
        )
        # vocab-grain frames are consumed by BOTH the step's pair-stat
        # agg and the next step's merge lineage; a lazy superstep chain
        # would re-execute the corpus scan once per branch (1+2+4
        # TakeOrdered for 3 steps — the iterative-chain re-execution
        # trap). localCheckpoint (the CC-loop convention) materializes
        # the |V|-row frame AND truncates the plan so the per-step
        # lineage stays constant-size.
        .localCheckpoint()
    )

    step_rows: list[DataFrame] = []
    cur = vocab
    for s in range(1, _BPE_STEPS + 1):
        sy = F.col("syms")
        pair_arr = F.when(
            F.size(sy) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sy) - 1),
                lambda i: F.struct(
                    F.element_at(sy, i).alias("l"),
                    F.element_at(sy, i + 1).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        stats = (
            cur.select("wfreq", F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wfreq").cast("long").alias("pair_count"))
        )
        # consumed twice (output row + next step's merge):
        # localCheckpoint the 1-row argmax so each step's stats agg
        # runs exactly once and the unrolled plan doesn't nest
        best = (
            stats.orderBy(F.desc("pair_count"), "l", "r")
            .limit(1)
            .localCheckpoint()
        )
        step_rows.append(
            best.select(
                F.lit(s).cast("int").alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged_sym"),
                "pair_count",
            )
        )
        if s < _BPE_STEPS:
            b = F.broadcast(
                best.select(
                    F.col("l").alias("_pa"), F.col("r").alias("_pb")
                )
            )
            cur = (
                cur.crossJoin(b)
                .select(
                    "word",
                    "wfreq",
                    _merge_fold(
                        F.col("syms"), F.col("_pa"), F.col("_pb")
                    ).alias("syms"),
                )
                .localCheckpoint()
            )

    out = step_rows[0]
    for extra in step_rows[1:]:
        out = out.unionAll(extra)
    return out


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

_RAKE_TOPN = 15
_SQL_RAKE_STOPS = ", ".join(f"'{w}'" for w in _STOPWORDS)

_RAKE_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), tk AS (
  SELECT doc_id, s.pos AS pos, s.tok AS tok,
         CASE WHEN s.tok IN ({_SQL_RAKE_STOPS}) THEN 1 ELSE 0 END AS is_stop
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t)),
                                 i -> {{'pos': i, 'tok': t[i]}})) AS s
    FROM tok)
), ph AS (
  SELECT doc_id, pos, tok,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS phrase_id
  FROM tk
  QUALIFY is_stop = 0
), mem AS (
  SELECT doc_id, phrase_id, pos, tok,
         COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS plen
  FROM ph
), ws AS (
  SELECT tok,
         ROUND(CAST(SUM(plen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS wscore
  FROM mem GROUP BY tok
), phrases AS (
  SELECT doc_id, phrase_id, string_agg(tok, ' ' ORDER BY pos) AS phrase
  FROM mem GROUP BY doc_id, phrase_id
), pc AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM phrases GROUP BY phrase
), scored AS (
  SELECT pc.phrase, pc.n_occ,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(CAST(ws.wscore AS DECIMAL(18,6))) AS DOUBLE) AS score
  FROM (SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS w
        FROM pc) pc
  JOIN ws ON ws.tok = pc.w
  GROUP BY pc.phrase, pc.n_occ
)
SELECT phrase, n_words, n_occ, score
FROM scored
ORDER BY score DESC, phrase
LIMIT {_RAKE_TOPN}
"""


@register("rake_keywords", oracle=_RAKE_ORACLE, tags=("llm", "text"))
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus: documents split into
    candidate phrases at stopword boundaries (gaps-and-islands via a
    per-doc prefix sum of the stopword indicator), each word scored
    degree/frequency (degree = Σ phrase length over its phrase
    occurrences — co-occurrence including self), each distinct phrase
    scored as the sum of member-word scores, top-{n} emitted with
    corpus occurrence counts.

    Determinism: word scores are ROUND-6 divisions of exact BIGINTs;
    the phrase score sums those 6-dp terms in DECIMAL(18,6) — exact
    and member-order-free — then casts to DOUBLE; the top-{n} order
    (score DESC, phrase ASC) is total because phrases are distinct.

    Scale: one posexplode (corpus-token grain) feeds a doc-partitioned
    prefix-sum window — the per-doc sort is Spark's standard
    window-exec path, bounded by document length; word stats are one
    vocabulary-grain hash-agg; phrase scoring re-joins members to the
    vocabulary-sized score table via BROADCAST; the final top-15 is a
    TakeOrderedAndProject, never a global sort.
    """
    d = read_table(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos", "tok")
    ).withColumn(
        "is_stop", F.when(F.col("tok").isin(_STOPWORDS), 1).otherwise(0)
    )
    w_prefix = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mem = (
        tk.withColumn("phrase_id", F.sum("is_stop").over(w_prefix))
        .filter(F.col("is_stop") == 0)
        .select("doc_id", "phrase_id", "pos", "tok")
        .withColumn(
            "plen",
            F.count("*").over(Window.partitionBy("doc_id", "phrase_id")),
        )
    )
    ws = mem.groupBy("tok").agg(
        F.round(
            F.sum("plen").cast("double") / F.count("*").cast("double"), 6
        ).alias("wscore")
    )
    phrases = mem.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase")
    )
    pc = phrases.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occ")
    )
    scored = (
        pc.select(
            "phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("w")
        )
        .join(F.broadcast(ws), F.col("w") == F.col("tok"))
        .groupBy("phrase", "n_occ")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.col("wscore").cast("decimal(18,6)"))
            .cast("double")
            .alias("score"),
        )
    )
    return scored.select("phrase", "n_words", "n_occ", "score").orderBy(
        F.desc("score"), "phrase"
    ).limit(_RAKE_TOPN)
