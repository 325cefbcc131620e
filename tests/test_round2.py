"""Round-2 regression tests: ANSI-neutral coercions, export ordering,
width-safe sampling hash, map-join cardinality safety, column-name
conformance, conf hygiene, and the new llm_ops2 operators."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ucl_data_pipeline_spark import plans
from ucl_data_pipeline_spark.functions.scalar import (
    fractional_to_decimal_odds,
    knuth_bucket,
    try_double,
)
from ucl_data_pipeline_spark.operators.enrich import normalize_names
from ucl_data_pipeline_spark.plans.registry import (
    EXPORT_FIRST,
    REGISTRY,
    sql_knuth_bucket,
)
from ucl_data_pipeline_spark.sources.io import conform_column_names, read_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Export ordering (driver checks a 50-query prefix)
# ---------------------------------------------------------------------------


def test_export_first_names_all_registered():
    missing = [n for n in EXPORT_FIRST if n not in REGISTRY]
    assert missing == []
    assert len(EXPORT_FIRST) == len(set(EXPORT_FIRST)) == 50


def test_export_order_prefix_is_priority_list():
    names = list(plans.all_queries().keys())
    assert names[: len(EXPORT_FIRST)] == list(EXPORT_FIRST)
    # every registered query is exported exactly once
    assert sorted(names) == sorted(REGISTRY)
    # oracle dict ordering mirrors the query dict
    osqls = list(plans.oracle_sqls())
    assert osqls == [n for n in names if REGISTRY[n].oracle is not None]


# ---------------------------------------------------------------------------
# ANSI-neutral coercions
# ---------------------------------------------------------------------------


@pytest.fixture()
def ansi_on(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_fractional_odds_ansi_on(ansi_on):
    df = ansi_on.createDataFrame(
        [("5/2",), ("evens",), ("2.5",), ("1/0",), (None,)], ["odds"]
    )
    got = [
        r.dec
        for r in df.select(
            fractional_to_decimal_odds("odds").alias("dec")
        ).collect()
    ]
    assert got == [3.5, None, 2.5, None, None]


def test_try_double_ansi_on(ansi_on):
    df = ansi_on.createDataFrame([("1.5",), ("garbage",), (None,)], ["x"])
    got = [r.d for r in df.select(try_double("x").alias("d")).collect()]
    assert got == [1.5, None, None]


# ---------------------------------------------------------------------------
# Width-safe deterministic sampling hash
# ---------------------------------------------------------------------------


def test_knuth_bucket_matches_python_and_duckdb_for_huge_keys(spark):
    keys = [0, 1, 19, 3_470_000_000, 2**40 + 7, 2**62 + 12345, 2**63 - 1]
    expected = [(k * 2654435761 % 2**32) % 100 for k in keys]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = [
        r.b
        for r in df.select("k", knuth_bucket("k", 100).alias("b"))
        .orderBy("k")
        .collect()
    ]
    assert got == expected
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"({k}::BIGINT)" for k in keys) + ") v(k)")
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_knuth_bucket('k', 100)} FROM t ORDER BY k"
        ).fetchall()
    ]
    assert duck == expected


def test_knuth_bucket_ansi_on_no_overflow(ansi_on):
    df = ansi_on.createDataFrame([(2**63 - 1,)], ["k"])
    assert df.select(knuth_bucket("k", 20).alias("b")).collect()[0].b == (
        ((2**63 - 1) * 2654435761 % 2**32) % 20
    )


# ---------------------------------------------------------------------------
# normalize_names cardinality safety
# ---------------------------------------------------------------------------


def test_normalize_names_duplicate_map_rows_keep_cardinality(spark):
    fact = spark.createDataFrame([("A",), ("B",), ("C",)], ["team"])
    dup_map = spark.createDataFrame(
        [("A", "Alpha"), ("A", "Azure"), ("B", "Beta")], ["raw", "canonical"]
    )
    out = normalize_names(fact, dup_map, ("team",))
    rows = sorted(r.team for r in out.collect())
    assert len(rows) == 3  # a dict lookup can never change cardinality
    assert rows == ["Alpha", "Beta", "C"]  # min(canonical) deterministic


# ---------------------------------------------------------------------------
# conform_column_names (P1)
# ---------------------------------------------------------------------------


def test_conform_column_names(spark):
    df = spark.createDataFrame([(1, "x")], ["Col_One", "colTwo"])
    assert conform_column_names(df, "upper").columns == ["COL_ONE", "COLTWO"]
    assert conform_column_names(df, "lower").columns == ["col_one", "coltwo"]
    with pytest.raises(ValueError):
        conform_column_names(df, "title")


# ---------------------------------------------------------------------------
# read_table conf hygiene
# ---------------------------------------------------------------------------


def test_read_table_restores_nanos_conf_and_pins_utc(spark):
    df = read_table(spark, SF, "events")
    # the legacy conf must not leak into the session after the call
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # and the frame must still execute AFTER the conf was restored
    assert df.limit(1).count() == 1
    assert dict(df.dtypes)["ts"] == "timestamp"


# ---------------------------------------------------------------------------
# llm_ops2 semantics (oracle equality is covered by verify_local /
# test_queries_oracle; these pin intrinsic properties)
# ---------------------------------------------------------------------------


def test_pack_sequences_budget_structure(spark):
    from ucl_data_pipeline_spark.plans.llm_ops2 import (
        _PACK_BUDGET,
        pack_sequences_greedy,
    )

    out = pack_sequences_greedy(spark, SF).collect()
    by_pack: dict[tuple, list] = {}
    for r in out:
        by_pack.setdefault((r.source, r.pack_id), []).append(r)
    for (src, pid), rows in by_pack.items():
        rows.sort(key=lambda r: r.doc_id)
        # pack_pos is 1..n within the pack
        assert [r.pack_pos for r in rows] == list(range(1, len(rows) + 1))
        # a document starts in pack p iff the tokens BEFORE it (in its
        # shard) total in [p*B, (p+1)*B)
        start = sum(
            x.n_tokens
            for x in out
            if x.source == src and x.doc_id < rows[0].doc_id
        )
        assert start // _PACK_BUDGET == pid


def test_repetition_and_entropy_bounds(spark):
    from ucl_data_pipeline_spark.plans.llm_ops2 import (
        repetition_score,
        unigram_entropy,
    )

    rep = repetition_score(spark, SF).collect()
    assert all(0.0 <= r.dup_frac <= 1.0 for r in rep)
    ent = unigram_entropy(spark, SF).collect()
    for r in ent:
        assert 0.0 <= r.unigram_entropy <= 25.0
        # entropy is bounded by log2(n_tokens) (+ rounding slack)
        import math

        assert r.unigram_entropy <= math.log2(r.n_tokens) + 1e-6


def test_contamination_fraction_bounds(spark):
    from ucl_data_pipeline_spark.plans.llm_ops2 import contamination_ngram_overlap

    out = contamination_ngram_overlap(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.n_contaminated <= r.n_grams
        assert abs(r.contamination_frac - r.n_contaminated / r.n_grams) < 1e-12
        # benchmark docs never appear in the eval output
        assert r.doc_id % 97 != 0
