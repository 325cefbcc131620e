"""Census: single-partition Window nodes per registered query.

For every registered query, walk the prepared physical plan
(queryExecution().executedPlan() with the AdaptiveSparkPlanExec
wrapper unwrapped via .executedPlan() — sparkPlan() is
pre-EnsureRequirements and contains NO Exchange nodes) and count
Window nodes whose
downward single-child chain reaches an Exchange with SinglePartition
output partitioning. This is the mechanical detector behind
tests/test_plans.py::test_single_partition_windows_are_allowlisted —
an unpartitioned ranking/cumulative window over a fact/corpus-grain
input is the one-task-sorts-everything scale killer, so every site
that legitimately remains (bounded day/bucket/cell/top-k grains) must
be declared.

Usage: python tools/window_census.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.plans import REGISTRY


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.length())]


def single_partition_windows(df) -> int:
    """Count Window nodes fed (through a single-child chain) by an
    Exchange SinglePartition. Stacked windows over one exchange count
    once per Window group (the chain breaks at an inner Window, which
    is counted on its own visit)."""
    n_hits = 0
    top = df._jdf.queryExecution().executedPlan()
    if top.nodeName() == "AdaptiveSparkPlan":
        top = top.executedPlan()
    stack = [top]
    while stack:
        node = stack.pop()
        kids = _children(node)
        if node.nodeName() == "Window":
            cur = kids[0] if kids else None
            while cur is not None:
                name = cur.nodeName()
                if name == "Exchange":
                    part = cur.outputPartitioning().toString()
                    if "SinglePartition" in part:
                        n_hits += 1
                    break
                if name == "Window":
                    break
                ck = _children(cur)
                if len(ck) != 1:
                    break
                cur = ck[0]
        stack.extend(kids)
    return n_hits


def main() -> None:
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names = sys.argv[1:] or list(REGISTRY)
    for name in names:
        try:
            n = single_partition_windows(REGISTRY[name].fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{exc}")
            continue
        if n:
            print(f"{name}\t{n}")


if __name__ == "__main__":
    main()
