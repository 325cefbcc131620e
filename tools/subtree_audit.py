"""Duplicated-subtree audit: rank queries by physical-plan node
duplication (Scan/Window/Aggregate counts vs wall seconds).

How the r12 optimization round found ann_recall_frontier's 2x
candidate rebuild: a frame consumed by BOTH an aggregate and a window
has non-canonically-equal exchanges, so ReuseExchange cannot collapse
the copies and everything above the last shared exchange re-executes
per consumer. High Scan/Window counts are only a LEAD, not a verdict
— persisted frames print their cached child plan inside
InMemoryRelation (triangle_count_trade shows 181 Scan tokens and
re-executes none of them), so every hit must be confirmed with an
interleaved same-JVM A/B before changing code (see
OPTIMIZATION_r12.md "Measurement discipline").

Usage: python tools/subtree_audit.py [--top 40] [--sf-dir DIR]
Reads bench_full.json for wall seconds when present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ucl_data_pipeline_spark import get_spark
    from ucl_data_pipeline_spark.plans import REGISTRY

    spark = get_spark("subtree-audit")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        with open(os.path.join(ROOT, "bench_full.json")) as f:
            secs = json.load(f)["queries"]
    except (OSError, ValueError, KeyError):
        secs = {}

    names = sorted(
        REGISTRY, key=lambda n: -secs.get(n, 0.0)
    )[: max(args.top * 2, 80)]
    rows = []
    for n in names:
        try:
            df = REGISTRY[n].fn(spark, args.sf_dir)
            s = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — audit must not die on one query
            print(f"SKIP {n}: {str(ex)[:80]}")
            continue
        rows.append(
            (
                s.count("Scan parquet"),
                s.count("Window"),
                s.count("HashAggregate") + s.count("ObjectHashAggregate"),
                s.count("InMemoryTableScan"),
                round(secs.get(n, 0.0), 2),
                n,
            )
        )
    rows.sort(reverse=True)
    print("scans  win  agg  imts  bench_s  query")
    for sc, w, ag, im, t, n in rows[: args.top]:
        print(f"{sc:5d} {w:4d} {ag:4d} {im:5d} {t:8.2f}  {n}")


if __name__ == "__main__":
    main()
