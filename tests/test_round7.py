"""Round-7 regression pins.

1. The shingle CSE fix (functions/text.py ``_let``): Catalyst has no
   common-subexpression elimination across references inside
   higher-order-function lambdas, so the pre-fix
   ``shingles(tokens(text))`` re-evaluated the tokenizing regex split
   once per OUTPUT SHINGLE (O(len × shingles) per row — measured
   10.0 s → 0.3 s at sf0.1 for the corpus shingle scan). The pin
   asserts the optimized plan contains exactly ONE ``split(`` call, so
   a future refactor that drops the let-binding (or a CollapseProject
   behavior change that re-inlines it) fails loudly instead of
   silently going quadratic.
2. ``ann_recall_frontier`` invariants: recall@3 monotone
   non-decreasing in nprobe (probing another list only adds
   candidates) and candidate counts strictly increasing — the
   driver-visible recall/latency curve must actually curve the right
   way.
3. bench.py's absolute-seconds regression floor: a sub-half-second
   query can never be flagged regardless of norm ratio (round-6's
   doc_language_mix "confirmed" a 2× on a 0.35 s query that was pure
   JIT jitter), while slow queries still flag.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ucl_data_pipeline_spark.functions import text as TX


def test_shingles_plan_evaluates_tokenizer_once(spark):
    df = spark.createDataFrame(
        [("a b c d e f",)], "text string"
    ).select(F.explode(TX.shingles(TX.tokens("text"))).alias("g"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_splits = plan.count("split(")
    assert n_splits == 1, (
        f"tokenizer split() appears {n_splits}× in the optimized plan — "
        "the shingles() let-binding (functions/text.py _let) is not "
        "protecting the input from per-element re-evaluation"
    )


def test_shingles_values_and_short_input_guard(spark):
    rows = (
        spark.createDataFrame(
            [("one two three four",), ("one two",), (None,)],
            "text string",
        )
        .select(TX.shingles(TX.tokens("text")).alias("gs"))
        .collect()
    )
    assert rows[0]["gs"] == ["one two three", "two three four"]
    assert rows[1]["gs"] == []  # shorter than k → empty, not garbage
    assert rows[2]["gs"] == []  # NULL text → empty


def test_ann_recall_frontier_monotone(spark, sf_dir):
    from ucl_data_pipeline_spark.plans.extras17 import ann_recall_frontier

    rows = sorted(
        ann_recall_frontier(spark, sf_dir).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3]
    recalls = [r["mean_recall_at_3"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert recalls == sorted(recalls), "recall must be monotone in nprobe"
    assert cands == sorted(cands) and len(set(cands)) == 3, (
        "candidate work must strictly grow with nprobe"
    )
    assert len({r["n_queries"] for r in rows}) == 1


def test_bench_regression_floor_ignores_subsecond_queries(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "HISTORY_PATH", str(tmp_path / "hist.json"))
    sf = 0.1
    # Seed 3 prior samples at norm 1.0 for both queries.
    for _ in range(3):
        bench._flag_and_update_history(
            {"fast_q": 1.0, "slow_q": 1.0},
            sf,
            raw={"fast_q": 0.3, "slow_q": 2.0},
        )
    # Both now run at 3× their median norm; only the ≥0.5 s query flags.
    regs, reseeded = bench._flag_and_update_history(
        {"fast_q": 3.0, "slow_q": 3.0},
        sf,
        raw={"fast_q": 0.3, "slow_q": 6.0},
    )
    assert not reseeded
    flagged = {r["query"] for r in regs}
    assert flagged == {"slow_q"}, (
        "sub-half-second queries must never flag; slow ones still must"
    )


def test_bench_summary_line_fits_driver_tail():
    # The driver archives only the last ~2 KB of bench stdout; the
    # summary line (printed LAST on full runs) must always fit whole,
    # even with the longest query names in the slowest-10 map and a
    # flag-storm of regressions (capped at 8 entries).
    import json

    import bench
    from ucl_data_pipeline_spark.plans import REGISTRY

    longest = sorted(REGISTRY, key=len, reverse=True)
    timings = {n: 123.456 for n in longest}
    out = {
        "metric": "engine_query_suite_runtime",
        "value": 99999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(timings),
        "mean_query_sec": 123.4567,
        "mean_query_sec_headline": 123.4567,
        "protocol": "cold-cache-per-run",
        "calib_sec_median": 12.345,
        "regression_candidates": 40,
        "history_reseeded": False,
        "regressions": [
            {
                "query": n,
                "norm": 99.999,
                "median_norm": 88.888,
                "ratio": 9.99,
                "recheck_norm": 77.777,
            }
            for n in longest[:40]
        ],
    }
    summary = bench._summary_line(out, timings)
    line = json.dumps(summary)
    assert len(line) < 2000, f"summary line {len(line)} bytes"
    assert summary["regressions_truncated"] == 40
    assert len(summary["regressions"]) == 8
    assert len(summary["queries"]) == 10


def test_frontier_family_curves(spark, sf_dir):
    # The three round-7 tuning frontiers must hold their STRUCTURAL
    # invariants on the driver fixture:
    # - MinHash: every k grades the SAME candidate pair set and errors
    #   stay in [0, 1]. (The ~1/sqrt-k error decay is an expectation —
    #   at sf0.001's handful of candidate pairs a single lucky hash
    #   can invert it, so monotonicity is NOT pinned per-fixture; the
    #   sf0.01 curve in the docstring shows the law.)
    # - Pack count is non-increasing in the budget (256|512|1024 nest,
    #   so coarser pack boundaries can only merge packs).
    # - Contamination rate falls as grams lengthen (an 8-gram match
    #   contains 5-gram matches; distinct-instance rates on the
    #   fixture follow).
    from ucl_data_pipeline_spark.plans.extras21 import (
        contamination_gram_frontier,
        minhash_size_frontier,
        pack_budget_frontier,
    )

    mh = sorted(
        minhash_size_frontier(spark, sf_dir).collect(),
        key=lambda r: r["n_hashes"],
    )
    assert [r["n_hashes"] for r in mh] == [2, 4, 6]
    assert len({r["n_pairs"] for r in mh}) == 1
    for r in mh:
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] <= 1.0, r

    pk = sorted(
        pack_budget_frontier(spark, sf_dir).collect(),
        key=lambda r: r["budget"],
    )
    assert [r["budget"] for r in pk] == [256, 512, 1024]
    assert len({r["n_docs"] for r in pk}) == 1
    packs = [r["n_packs"] for r in pk]
    assert packs == sorted(packs, reverse=True), packs

    ct = sorted(
        contamination_gram_frontier(spark, sf_dir).collect(),
        key=lambda r: r["gram_len"],
    )
    assert [r["gram_len"] for r in ct] == [3, 5, 8]
    rates = [r["contamination_rate"] for r in ct]
    assert rates == sorted(rates, reverse=True), rates


def test_curation_pipeline_ladder(spark, sf_dir):
    # Structural invariants of the end-to-end composite: one row per
    # input doc; kept rows (and ONLY kept rows) carry split + pack_id;
    # the benchmark count matches the doc_id % 97 rule.
    from ucl_data_pipeline_spark.plans.extras21 import curation_pipeline
    from ucl_data_pipeline_spark.sources.io import read_table

    rows = curation_pipeline(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    n_bench = sum(1 for r in rows if r["disposition"] == "benchmark")
    assert n_bench == sum(1 for r in rows if r["doc_id"] % 97 == 0)
    for r in rows:
        if r["disposition"] == "kept":
            assert r["split"] in ("train", "val", "test") and r["pack_id"] >= 0
        else:
            assert r["split"] is None and r["pack_id"] is None
    assert {r["disposition"] for r in rows} <= {
        "benchmark", "contaminated", "low_quality", "near_dup", "kept"
    }
