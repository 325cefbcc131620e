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
# Round-3 priority: the four round-2 red rows (array outputs now
# serialized to atomic columns — the fix itself needs a green driver row),
# then the 34 queries that have never had a driver CORRECTNESS row (all
# round-2-new modules: tpch2/tpch3, llm_ops2/llm_ops3, pagerank, SCD2/CDC,
# interval join, text surface), then the two queries whose behavior
# depends on round-2's normalize_names dedup change (ADVICE item:
# dict_lookup_join / enrich_pipeline shipped without driver verification),
# then round-3-new queries as they land.
EXPORT_FIRST: tuple[str, ...] = (
    # round-2 red rows, now with serialized array outputs
    "map_functions",
    "array_functions",
    "collect_sorted_list",
    "user_event_sequences",
    # never driver-checked: TPC-H shapes added in round 2
    "min_cost_supplier",
    "order_priority_check",
    "important_part_value",
    "promo_revenue_share",
    "supplier_count_by_part",
    "excess_share_suppliers",
    "product_profit_by_nation",
    "order_count_distribution",
    "small_quantity_revenue",
    "disjunctive_predicate_revenue",
    "dormant_rich_customers",
    # never driver-checked: LLM curation / ANN (llm_ops2 + llm_ops3)
    "contamination_ngram_overlap",
    "pack_sequences_greedy",
    "repetition_score",
    "unigram_entropy",
    "bigram_lm_stats",
    "vocab_coverage",
    "embedding_sq8_topk",
    "shingle_containment_pairs",
    "url_normalize",
    "domain_mixture_weights",
    "boilerplate_chunk_removal",
    "quality_filter_pipeline",
    # never driver-checked: graph / warehouse / temporal / text
    "pagerank_trade_network",
    "scd2_history",
    "snapshot_diff_cdc",
    "view_click_interval_join",
    "linear_interpolate",
    "approx_percentile_bounded",
    "string_functions",
    "text_clean",
    "pii_redaction",
    # never driver-checked: rows-only-by-design multimodal Python stages
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    # normalize_names-dependent queries (round-2 enrich.py dedup change)
    "dict_lookup_join",
    "enrich_pipeline",
    # round-3 additions get slots here as they land
    "kmeans_assign",
    "doc_chunk_windows",
    "train_val_test_split",
    "mixture_resample",
    "embedding_pq_topk",
    "bfs_reach_hops",
    "sessionize_gaps_islands",
    "histogram_fixed_bins",
    "checksum_table",
    "window_frame_surface",
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
