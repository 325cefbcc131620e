"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2 inventory + the
training-data operators) registers here; the driver harness compares
each Spark result against its oracle SQL on the same parquet tables
(row count + schema + order-insensitive value hash).

Cross-engine float determinism convention (critical for value-hash
equality — Spark and DuckDB sum doubles in different orders):

- Aggregates over money/ratio doubles are computed EXACTLY by casting
  inputs to DECIMAL before SUM and casting the final result to DOUBLE.
  Decimal addition is exact, so both engines produce bit-identical
  doubles regardless of partitioning. Helper: ``dsum``/``davg`` below,
  mirrored in oracle SQL as
  ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
- Per-row transcendental math (haversine, cosine) differs in the last
  ulp between libm and the JVM; such outputs are wrapped in
  ``ROUND(x, 6)`` on both sides.
- **Atomic output columns only**: a registered query's result schema
  must contain no ArrayType / MapType / StructType column. The driver
  canonicalizes results with pandas ``sort_values``/``factorize``,
  which cannot hash list cells (``TypeError: unhashable type``), so an
  array column makes the hard correctness signal blind even when the
  values match. Serialize collections deterministically instead:
  ``concat_ws``/``to_json`` after ``array_sort`` on the Spark side,
  ``array_to_string(list_sort(...))``/``to_json`` in the oracle.
  Enforced by tests/test_plans.py::test_registered_outputs_atomic.
- **Oracle aggregate outputs must be CAST to BIGINT/DOUBLE/VARCHAR —
  never HUGEINT or wide DECIMAL.** DuckDB types a bare ``SUM(BIGINT)``
  as HUGEINT, which pandas converts to float64, while Spark returns
  int64; the driver's dtype-sensitive canonicalizer then hashes
  ``60000 != 60000.0`` even though every value matches. Write
  ``CAST(SUM(x) AS BIGINT)``. Values wider than 15-16 significant
  digits (e.g. a DECIMAL(38,0) checksum) must be emitted as strings on
  BOTH sides — float64 transport silently truncates them. Enforced by
  tests/test_queries_oracle.py::test_query_matches_oracle's dtype
  check (compares ``duckdb .df()`` vs ``toPandas()`` dtypes — the
  driver's view).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query and its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


# ---------------------------------------------------------------------------
# Export ordering
# ---------------------------------------------------------------------------
# The verification driver checks a bounded prefix (first 50) of the
# exported query dict each round, so export order is rotated per round to
# maximize cumulative driver-verified coverage: queries that are new,
# changed this round, or never driver-checked come first; queries with a
# green CORRECTNESS row from a prior round come last (they stay registered
# and locally verified — tools/verify_local.py covers the full inventory).
#
# Round-7 priority (the driver checks the first 50): (1) the
# twenty-six NEW round-7 registrations — the end-to-end
# curation_pipeline composite, the tuning-frontier family
# (ann_recall_frontier, minhash_size_frontier, pack_budget_frontier,
# contamination_gram_frontier, dedup_threshold_frontier,
# watermark_lateness_frontier), the extras22 monitoring-statistics
# batch (theil_sen_slope_daily, kendall_tau_via_grain,
# benjamini_hochberg_promo, brown_forsythe_priority,
# degree_assortativity_trade, page_hinkley_drift_daily), the extras23
# mixture/retrieval pair (source_jsd_matrix, ann_rrf_fusion), the
# extras25 pair (logrank_survival_ab, tokenizer_fertility), the
# extras26 pair (srm_check_split, bm25_doc_ranking), the extras27
# source-overlap matrix (source_minhash_overlap), the extras28
# CBO join-cardinality audit, its extras29 companion
# join_skew_advisor, the extras30 corpus-LM perplexity filter
# (doc_lm_cross_entropy), the extras31/extras32 KMV sketch pair
# (ndv_kmv_sketch_error, kmv_merge_parity), and the extras33
# sampled-quantile audit (quantile_sample_error) — twenty-six
# total;
# (2) dedup_embedding_cosine, CHANGED this round (corpus-sized LSH
# bucket ladder — the ×100 saturation fix), re-checked while changed;
# (3) the twelve end-of-round-6
# extras19/extras20 registrations that have never had a driver
# CORRECTNESS row (zipf_vocab_slope, gini_impurity_feature_split,
# segment_drift_decomposition, dedup_minhash_pr, ngram_novelty_rate,
# dictionary_encoding_planner, runs_test_daily_revenue,
# mann_kendall_trend, changepoint_single_split, subsample_mean_ci_hash,
# histogram_strategy_compare, powerlaw_alpha_user_activity — all
# re-verified oracle-exact locally; a green row for these closes every
# pre-round-7 registration's driver coverage); (4) the stalest green
# rows — round-1-vintage queries whose only driver evidence is six
# rounds old, refreshed so no green row ages past ~5 rounds.
# ngram_novelty_rate and dedup_minhash_pr additionally changed this
# round (shingle shuffle re-keyed to xxhash64 digests), so their
# placement doubles as the regression check for that rewrite.
# Everything later in the dict has a green row from rounds 1-6
# (cumulative 263 driver-checked pre-round-7 of the 275 then
# registered; the registry now holds 301 with 26 new + 3 changed in
# the round-7 prefix) and stays locally verified by
# tools/verify_local.py / the parametrized pytest oracle suite —
# 300/301 oracle-exact in both ANSI modes this session, 1 rows-only
# by design (kmeans_clusters).
EXPORT_FIRST: tuple[str, ...] = (
    # new in round 7
    "curation_pipeline",
    "ann_recall_frontier",
    "minhash_size_frontier",
    "pack_budget_frontier",
    "contamination_gram_frontier",
    # new in round 7, batch 2 (extras22): monitoring statistics
    "theil_sen_slope_daily",
    "kendall_tau_via_grain",
    "benjamini_hochberg_promo",
    "brown_forsythe_priority",
    "degree_assortativity_trade",
    "page_hinkley_drift_daily",
    # new in round 7, batch 3 (extras23): mixture JSD + rank fusion
    "source_jsd_matrix",
    "ann_rrf_fusion",
    # new in round 7, batch 4 (extras24): dedup + watermark frontiers
    "dedup_threshold_frontier",
    "watermark_lateness_frontier",
    # new in round 7, batch 5 (extras25): log-rank A/B + fertility
    "logrank_survival_ab",
    "tokenizer_fertility",
    # new in round 7, batch 6 (extras26): split SRM gate + BM25
    "srm_check_split",
    "bm25_doc_ranking",
    # new in round 7, batch 7 (extras27): source-overlap matrix
    "source_minhash_overlap",
    # new in round 7, batch 8 (extras28): CBO join-cardinality audit
    "join_cardinality_audit",
    # new in round 7, batch 9 (extras29): shuffle-skew advisor
    "join_skew_advisor",
    # new in round 7, batch 10 (extras30): corpus-LM perplexity filter
    "doc_lm_cross_entropy",
    # new in round 7, batch 12 (extras32): KMV union-merge parity gate
    "kmv_merge_parity",
    # new in round 7, batch 13 (extras33): sampled-quantile audit
    "quantile_sample_error",
    # new in round 7, batch 11 (extras31): KMV distinct-count sketch
    "ndv_kmv_sketch_error",
    # CHANGED in round 7: corpus-sized LSH bucket ladder (the 100×
    # saturation fix) — must be re-driver-checked while changed
    "dedup_embedding_cosine",
    # CHANGED in round 7: basket self-join (AQE was broadcasting a
    # fact-sized build side) replaced by scan-side array pairing —
    # re-driver-checked while changed
    "copurchase_pairs",
    # CHANGED in round 7: per-group percentile_disc cuts collapsed to
    # the single-buffer array form (extras33 precedent) —
    # re-driver-checked while changed (histogram_strategy_compare,
    # changed the same way, is already in the never-checked block)
    "winsorize_prices",
    # never driver-checked (12): closes the registry to 275/275
    "zipf_vocab_slope",
    "gini_impurity_feature_split",
    "segment_drift_decomposition",
    "dedup_minhash_pr",
    "ngram_novelty_rate",
    "dictionary_encoding_planner",
    "runs_test_daily_revenue",
    "mann_kendall_trend",
    "changepoint_single_split",
    "subsample_mean_ci_hash",
    "histogram_strategy_compare",
    "powerlaw_alpha_user_activity",
    # stalest green rows: round-1 vintage, unrefreshed since r1
    "anti_join_no_orders",
    "union_all_entities",
    "except_nations",
    "name_regex_strip",
    "date_parse_multi",
    "hybrid_two_seasons",
    "group_agg_basic",
    "count_distinct_agg",
    "rollup_region_nation",
    # (rank_function_surface yielded its slot to source_minhash_overlap,
    # and rest_days_lag, moving_avg_frame, rank_customers_by_balance,
    # lead_and_share_of_total, conditional_agg, zscore_by_group,
    # grouping_sets_status_priority, cube_status_priority yielded
    # theirs to the extras28-32 batches + the copurchase_pairs rewrite —
    # new/changed queries must be driver-checked while new. All of them
    # rejoin the stale rotation next round along with
    # dedup_exact, dedup_exact_normalized, doc_fingerprint,
    # minhash_signatures, dedup_minhash_lsh, text_token_stats,
    # bpe_token_count, text_quality_score, lang_id_heuristic,
    # embedding_topk_cosine and the remaining r1 vintage.)
)


def _export_order() -> list[str]:
    first = [n for n in EXPORT_FIRST if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in EXPORT_FIRST]
    return first + rest


def all_queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _export_order()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _export_order()
        if REGISTRY[name].oracle is not None
    }


# ---------------------------------------------------------------------------
# Cross-engine deterministic aggregate helpers (see module docstring)
# ---------------------------------------------------------------------------

DEC = "decimal(18,6)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a (≤6-decimal) double column."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum ÷ count, in double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def r6(c: Column) -> Column:
    """Round transcendental-math output to 6 dp (cross-libm safety)."""
    return F.round(c, 6)


# Oracle-SQL spellings of the same helpers
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"


def sql_knuth_bucket(expr: str, m: int) -> str:
    """DuckDB spelling of functions.scalar.knuth_bucket (width-safe
    Knuth multiplicative hash bucket — see its docstring).

    The first modulo is pmod-wrapped: DuckDB ``%`` keeps the dividend's
    sign while Spark ``pmod`` is always non-negative, so a bare ``%``
    diverges for negative keys (key -7: DuckDB -3 vs Spark 13 at m=20).
    After the wrap every intermediate is non-negative, so the remaining
    plain ``%`` are identical on both engines over the full 64-bit
    signed domain.
    """
    k = f"((({expr}) % 4294967296 + 4294967296) % 4294967296)"
    return (
        f"((((({k} // 65536) * 2654435761) % 4294967296) * 65536"
        f" + ({k} % 65536) * 2654435761) % 4294967296) % {m}"
    )
