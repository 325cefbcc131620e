"""Shared physical-plan auditing walkers.

Single source of truth for the single-partition-Window detector used
by BOTH the CI gate (tests/test_plans.py::
test_single_partition_windows_are_allowlisted) and the census tool
(tools/window_census.py) — previously two hand-kept copies that could
silently drift apart (round-9 advisor finding).

The detector: walk the PREPARED physical plan
(queryExecution().executedPlan(), AdaptiveSparkPlanExec unwrapped via
.executedPlan() — sparkPlan() is pre-EnsureRequirements and contains
NO Exchange nodes) and count Window nodes whose downward single-child
chain reaches an Exchange — or a ReusedExchange, which re-emits a
previously planned exchange's output and has ZERO children, so a
duplicated offending site would otherwise be invisible (round-9
advisor finding) — whose output partitioning is SinglePartition. An
unpartitioned ranking/cumulative window over a fact/corpus-grain
input is the one-task-sorts-everything scale killer; every site that
legitimately remains (bounded day/bucket/cell/top-k grains) must be
declared in the gate's allowlist. Bounded top-k via
TakeOrderedAndProject needs no Exchange and is invisible here by
construction — the right spelling never needs allowlisting.
"""

from __future__ import annotations


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.length())]


def single_partition_windows(df) -> int:
    """Count Window nodes fed (through a single-child chain) by an
    Exchange/ReusedExchange with SinglePartition output partitioning.
    Stacked windows over one exchange count once per Window group
    (the chain breaks at an inner Window, which is counted on its own
    visit)."""
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
                if name in ("Exchange", "ReusedExchange"):
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
