"""Static-broadcast audit: find joins the planner would broadcast on a
size estimate it cannot actually compute (r12).

The ×100 smoke's real find this round: Catalyst's STATIC size
estimates cannot see through Generate (explode) — an explode-fed
aggregate or window looks tiny on paper however big it really is, so
the static planner picks BroadcastHashJoin for corpus-growing build
sides (token vocabularies, per-doc feature arrays, prefix indexes).
At bench SFs those broadcasts fit and the plan LOOKS right; at ×100
the broadcast build kills the driver — and on a real cluster it is a
guaranteed failure long before 100 TB. AQE cannot save these: the
bogus decision is made statically and a BroadcastExchange is not a
re-plannable shuffle stage.

This tool walks the static (pre-execution) physical plan of every
registered query and reports each BroadcastExchange whose build
subtree contains a Generate or Window — the estimate-blind class.
Broadcasts over plain scans (true dims) or scalar/grain-bounded
aggregates (no Generate/Window in the subtree) are not reported:
those estimates are honest, and the explicitly-F.broadcast()-hinted
scalar crossJoins fall in that bucket.

A reported entry is a CANDIDATE, not automatically a bug — a human
adjudicates whether the subtree's true cardinality is corpus-growing
(bug: hint the join or restructure) or provably bounded (fine: e.g. a
bounded label/bucket grain that happens to sit above an explode).
Adjudications live in SCALE_NOTES (round-12 entry).

Usage:
    python tools/broadcast_audit.py [--sf-dir /root/testdata/sf0.1] \
        [query ...] 2>/dev/null
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAG_TOKENS = ("Generate", "Window")


def _walk(node, fn, depth=0):
    fn(node, depth)
    name = node.nodeName()
    # AdaptiveSparkPlan exposes NO children() — the static plan hangs
    # off inputPlan(). Without this unwrap the walk sees exactly one
    # node per query and the audit is vacuous (the first run of this
    # tool reported 0 findings suite-wide for precisely that reason).
    if name == "AdaptiveSparkPlan":
        try:
            _walk(node.inputPlan(), fn, depth + 1)
        except Exception:
            pass
    # persist() hides the cached lineage behind InMemoryTableScan —
    # exactly where this class lives (the near-dup feature frames are
    # persisted, and Catalyst derives the IMR's size estimate from the
    # same Generate-blind child stats). Descend into the cached plan.
    if "InMemoryTableScan" in name:
        try:
            _walk(node.relation().cachedPlan(), fn, depth + 1)
        except Exception:
            pass
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), fn, depth + 1)


def _subtree_names(node) -> list[str]:
    names: list[str] = []
    _walk(node, lambda n, d: names.append(n.nodeName()))
    return names


def audit_query(spark, sf_dir: str, name: str, fn) -> list[dict]:
    """Static-plan broadcast findings for one query (may be empty).

    Detection is on Broadcast*Join nodes, not BroadcastExchange: in
    the AQE inputPlan the broadcast exchanges are not yet materialized
    as nodes, so the join's BUILD-side child subtree is what gets
    shipped to the driver. BroadcastNestedLoopJoin flags on either
    side containing the tokens (its build side also broadcasts)."""
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
    findings: list[dict] = []

    def visit(node, depth):
        node_name = node.nodeName()
        if not node_name.startswith("Broadcast") or "Join" not in node_name:
            return
        try:
            build = str(node.buildSide())
        except Exception:
            build = "BuildRight"
        child = node.children().apply(1 if build == "BuildRight" else 0)
        names = _subtree_names(child)
        hits = sorted({n for n in names if any(t in n for t in FLAG_TOKENS)})
        if hits:
            findings.append(
                {
                    "query": name,
                    "join": node_name,
                    "build_side": build,
                    "flagged_ops": hits,
                    "build_subtree_ops": sorted(set(names)),
                }
            )

    _walk(plan, visit)
    return findings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from ucl_data_pipeline_spark import get_spark
    from ucl_data_pipeline_spark.plans import REGISTRY

    spark = get_spark("broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or sorted(REGISTRY)
    all_findings: list[dict] = []
    errors: list[str] = []
    for n in names:
        try:
            all_findings.extend(audit_query(spark, args.sf_dir, n, REGISTRY[n].fn))
        except Exception as e:  # audit must cover the full registry
            errors.append(f"{n}: {type(e).__name__}")
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_queries": len(names),
                "n_flagged_broadcasts": len(all_findings),
                "findings": all_findings,
                "plan_errors": errors,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
