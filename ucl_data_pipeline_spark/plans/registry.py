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
# Round-5 priority: (1) new registrations (TPC-H Q6/Q12/Q15 completing
# the 22/22 sweep, kmeans_lloyd5 full-depth unrolled oracle, the three
# new ANN recall gates, the sketch-based robust z-score); (2) queries
# whose code or oracle changed this round (bounded brute-force
# baseline + its recall gate's synced oracle spelling, degree-ordered
# triangle counting, MAD=0 guard, kmeans seed-id assert); (3) the
# stalest green rows — queries last driver-checked in round 1 — so the
# 50-slot budget refreshes cumulative coverage oldest-first. Everything
# later in the dict has a green row from rounds 2-4 (cumulative: all
# 163 pre-round-5 queries checked, 162 exact on latest check).
EXPORT_FIRST: tuple[str, ...] = (
    # new in round 5 (twelfth session batch: Spark 4 SQL surfaces)
    "variant_extract_surface",
    "listagg_surface",
    "group_by_all_surface",
    "bag_set_ops_surface",
    "bitmap_distinct_counts",
    # new in round 5 (eleventh session batch)
    "join_size_from_histograms",
    "market_concentration_hhi",
    "calendar_dim_coverage",
    "share_of_parent_rollup",
    # new in round 5 (tenth session batch)
    "epoch_shuffle_shards",
    "doc_language_mix",
    "embedding_norm_quantiles",
    # new in round 5 (ninth session batch)
    "chi_square_independence",
    "mutual_information_flags",
    "churn_resurrection_stats",
    "out_of_order_stats",
    # new in round 5 (eighth session batch)
    "recursive_reachability_sql",
    "event_pattern_vvp",
    "session_length_histogram",
    # new in round 5 (seventh session batch)
    "hll_distinct_error_gate",
    "trade_modularity_score",
    "crosscorr_event_series",
    "constraint_violation_audit",
    "trending_event_types_hourly",
    # new in round 5 (fifth/sixth session batches)
    "sliding_distinct_users_7d",
    "largest_remainder_apportion",
    "count_min_estimate_error",
    "zorder_layout_stats",
    "scd2_point_in_time_join",
    "holt_linear_forecast",
    "cheapest_route_nations",
    "jaccard_prefix_filter_pairs",
    "range_partition_boundaries",
    # new in round 5 (fourth session batch)
    "ann_ndcg_at_10",
    "assoc_rules_lift",
    "iqr_outlier_fences",
    "rfm_segmentation",
    "ship_latency_quantiles",
    "embedding_centroid_shift",
    # new in round 5 (third session batch)
    "seasonal_dow_decompose",
    "corr_matrix_lineitem",
    "ols_slope_per_nation",
    "psi_price_drift",
    "weighted_median_price",
    # new in round 5 (second session batch)
    # new in round 5
    "top_supplier_revenue",
    "kmeans_lloyd5",
    "ann_recall_ivf_at_3",
    "ann_recall_sq8_at_3",
    "ann_recall_pq_at_3",
    "robust_zscore_outliers_approx",
    # 76 queries are NEW in round 5 vs the driver's 50-slot checked
    # prefix; the twenty-six deferred to the round-6 rotation
    # (additionally: ohlc_resample_hourly — its stream-equals-batch
    # pytest pins the same selection logic — weekly_revenue_growth,
    # conversion_wilson_ci, langid_confusion_f1, welch_ttest_promo,
    # cusum_drift_daily, doc_bigram_likelihood,
    # forecast_revenue_change, late_shipment_priority) are the
    # lowest-risk integer-arithmetic / single-agg shapes or ones whose
    # exact float convention is already driver-covered by a same-math
    # sibling in the prefix (readability_scores,
    # null_safe_join_surface, not_in_null_semantics, skew_key_profile,
    # argmax_surface, bayesian_smoothed_rating,
    # cumulative_distinct_users, benford_first_digit,
    # interval_union_coverage, l_diversity_check,
    # quantile_normalize_feature, rolling_median_frame,
    # neighbor_jaccard_nodes, weighted_sample_ares,
    # gini_revenue_concentration, autocorr_daily_revenue — its exact-
    # decimal Pearson spelling is in-prefix via crosscorr_event_series
    # — minhash_jaccard_error), and the round-5
    # re-touched names (embedding_topk_cosine, triangle_count_trade,
    # robust_zscore_outliers, ann_recall_at_3, kmeans_lloyd2,
    # kmeans_assign, token_pmi_pairs) also roll forward. ALL of them
    # were verified oracle-exact at sf0.01 in BOTH ANSI modes this
    # session by tools/verify_local.py sweeps.
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
