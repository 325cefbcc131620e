"""Engine-wide physical-plan census from bench_full.json's counters.

Reads the per-query AQE-final plan token counts the bench archives
(bench.py `_plan_counters`) and prints the registry-level shuffle /
join-strategy picture a plan reviewer wants in one screen:

- totals per token (how many Exchange/Broadcast/SMJ/... nodes the
  whole 300+-query registry compiles to);
- join-strategy mix (broadcast vs sort-merge vs shuffled-hash vs
  nested-loop) — on this engine nested-loops must all be bounded
  band/probe tables and cartesians must be zero;
- top-N queries by shuffle count (the plans worth re-reading first);
- any query with a CartesianProduct (expected: none — the plan-smell
  pytest gate enforces it, this is the cross-check from the bench
  artifact side).

Usage: python tools/plan_census.py [--top 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    path = os.path.join(ROOT, "bench_full.json")
    try:
        with open(path) as f:
            full = json.load(f)
    except OSError:
        sys.exit("bench_full.json not found — run `python bench.py` first")
    plans: dict[str, dict] = full.get("plan_counters") or {}
    if not plans:
        sys.exit("bench_full.json has no plan_counters (pre-r8 artifact?)")

    totals: Counter = Counter()
    for c in plans.values():
        totals.update(c)

    print(f"queries with plan counters: {len(plans)}")
    print("\ntoken totals across the registry:")
    for tok, n in totals.most_common():
        print(f"  {n:6d}  {tok}")

    shuffles = {
        n: c.get("Exchange hashpartitioning", 0)
        + c.get("Exchange rangepartitioning", 0)
        + c.get("Exchange SinglePartition", 0)
        for n, c in plans.items()
    }
    print(f"\ntop {args.top} queries by shuffle (Exchange) count:")
    for n, s in sorted(shuffles.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {s:4d}  {n}")

    cartesians = [n for n, c in plans.items() if c.get("CartesianProduct")]
    print(f"\nqueries with CartesianProduct: {len(cartesians)}")
    for n in cartesians:
        print(f"  !! {n}")


if __name__ == "__main__":
    main()
