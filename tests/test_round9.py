"""Round-9 consolidation tests: the bounded-grain global-rank
machinery (registry.range_bucket / bucket_offsets /
bucketed_row_number) against the single-partition spellings it
replaces, and the bucket-first KS twin's substitution audit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans import REGISTRY
from ucl_data_pipeline_spark.plans.registry import (
    bucket_offsets,
    bucketed_row_number,
    range_bucket,
)
from ucl_data_pipeline_spark.sources.io import read_table


def test_bucketed_row_number_matches_global_window(spark, sf_dir):
    # The bucketed spelling must be BIT-identical to the global-window
    # row_number it replaces, for any bucket count (including buckets
    # that end up empty at tiny SF).
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    want = {
        r["o_orderkey"]: r["rk"]
        for r in o.select(
            "o_orderkey",
            F.row_number().over(Window.orderBy("o_orderkey")).alias("rk"),
        ).collect()
    }
    # None = the round-10 auto-size path (max-resolution sketch +
    # count in one agg, subsampled split points).
    for n_buckets in (1, 4, 16, None):
        got = {
            r["o_orderkey"]: r["rk"]
            for r in bucketed_row_number(
                o, "o_orderkey", n_buckets=n_buckets
            ).collect()
        }
        assert got == want, f"n_buckets={n_buckets}"


def test_range_bucket_autosize_matches_fixed16_below_target(spark, sf_dir):
    # Below the 250k-row target the auto-size resolves to 16 buckets
    # AND its subsampled split points land on exactly the i/16
    # quantiles the fixed knob used — identical bucket assignment, so
    # bench plans at test SFs are unchanged by the auto-size.
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    fixed = {
        r["o_orderkey"]: r["__bkt"]
        for r in range_bucket(o, "o_orderkey", 16).collect()
    }
    auto = {
        r["o_orderkey"]: r["__bkt"]
        for r in range_bucket(o, "o_orderkey").collect()
    }
    assert auto == fixed


def test_range_bucket_is_monotone_in_key(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer").select(
        (-F.col("c_acctbal")).alias("neg")
    )
    rows = range_bucket(c, "neg", 16).orderBy("neg").collect()
    bks = [r["__bkt"] for r in rows]
    assert bks == sorted(bks)
    # equal keys always share a bucket
    seen: dict = {}
    for r in rows:
        if r["neg"] in seen:
            assert seen[r["neg"]] == r["__bkt"]
        seen[r["neg"]] = r["__bkt"]


def test_bucket_offsets_exclusive_prefix(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    bucketed = range_bucket(o, "o_orderkey", 8)
    per = {
        r["__bkt"]: r["cnt"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offs = {
        r["__bkt"]: r["__off"]
        for r in bucket_offsets(bucketed, F.lit(1)).collect()
    }
    for bkt, off in offs.items():
        assert off == sum(c for b, c in per.items() if b < bkt), bkt


def test_decile_formula_matches_spark_ntile(spark, sf_dir):
    # The integer NTILE formula inside decile_lift_table vs Spark's own
    # F.ntile over the same total order — pins the SQL-standard
    # first-r-tiles-get-one-extra assignment.
    c = read_table(spark, sf_dir, "customer")
    want = {
        r["c_custkey"]: r["d"]
        for r in c.select(
            "c_custkey",
            F.ntile(10)
            .over(Window.orderBy(F.desc("c_acctbal"), "c_custkey"))
            .alias("d"),
        ).collect()
    }
    ranked = bucketed_row_number(
        c.select("c_custkey", (-F.col("c_acctbal")).alias("neg")).withColumn(
            "ck", F.col("c_custkey")
        ),
        "neg",
        out="g_rk",
    )
    n = c.count()
    got_rows = (
        ranked.select(
            "c_custkey",
            F.expr(
                f"CASE WHEN g_rk <= ({n} % 10) * ({n} DIV 10 + 1)"
                f" THEN (g_rk + {n} DIV 10) DIV ({n} DIV 10 + 1)"
                f" ELSE {n} % 10 + (g_rk - ({n} % 10) * ({n} DIV 10 + 1)"
                f" + {n} DIV 10 - 1) DIV ({n} DIV 10) END"
            ).alias("d"),
        )
        .collect()
    )
    # bucketed_row_number requires a UNIQUE key; negated balance is
    # not unique, so compare the decile SIZES (the formula's output
    # distribution) instead of per-row assignment here — per-row
    # equality is covered end-to-end by the decile_lift_table oracle.
    from collections import Counter

    assert Counter(r["d"] for r in got_rows) == Counter(want.values())


def test_ks_bucketed_twin_audits_exact(spark, sf_dir):
    row = REGISTRY["ks_bucketed_drift"].fn(spark, sf_dir).collect()[0]
    assert row["within_bound"] is True
    assert row["decision_agrees"] is True
    assert row["ks_d_bucketed"] <= row["ks_d_exact"]
    assert (
        row["ks_d_exact"] - row["ks_d_bucketed"] <= row["gap_bound"] + 1e-12
    )
    # $100 buckets on this price distribution: the bound must be tight
    # enough that the twin is USEFUL, not just valid.
    assert row["gap_bound"] <= 0.05
    assert row["n_buckets"] >= 100
