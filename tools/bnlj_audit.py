"""BroadcastNestedLoopJoin census: prove every BNLJ build side is bounded (r13).

The r12 closing plan census counted 225 BNLJ nodes across 119 queries.
A BNLJ build side is collected to the driver and shipped to every
executor — fine for the scalar/literal-frame crossJoins the engine uses
everywhere (1-row stat frames, literal parameter grids, day spines),
fatal if a corpus-growing frame ever rides one (same failure mode as
the r12 Generate-blind static broadcasts, but worse: BNLJ is quadratic
in the probe side too).

This tool walks the STATIC physical plan of every registered query
(the broadcast_audit walker: unwraps AdaptiveSparkPlan.inputPlan and
InMemoryTableScan.relation.cachedPlan), finds each
BroadcastNestedLoopJoin, and classifies its BUILD-side subtree:

- ``literal``      — no scan/Range source at all (literal frames,
                     ``spark.range`` grids): bounded by construction.
- ``scalar-gated`` — every path from the join to a scan passes through
                     a grouping-key-free aggregate (``keys=[]`` in the
                     HashAggregate/SortAggregate/ObjectHashAggregate
                     simpleString): ≤1 row per aggregate regardless of
                     input size.
- ``limit-gated``  — a GlobalLimit / TakeOrderedAndProject / top-k
                     WindowGroupLimit bounds the subtree.
- ``UNBOUNDED?``   — none of the above: a scan/Generate reaches the
                     build side ungated. Adjudicate (SCALE_NOTES) or fix.

Usage:
    python tools/bnlj_audit.py [--sf-dir /root/testdata/sf0.1] [query ...] 2>/dev/null
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Adjudicated r13 census (SCALE_NOTES r13): every "UNBOUNDED?" finding
# below is an EXPLICIT F.broadcast / literal crossJoin whose build
# grain is bounded by construction; the classifier just cannot see the
# gate (literal predicates, createDataFrame literals, bounded-grain
# aggregates, calendar grains). query -> (max allowed UNBOUNDED?
# findings, the bounded grain). A query exceeding its allowance makes
# the tool exit 1 — the mechanical gate for new regressions.
ADJUDICATED: dict[str, tuple[int, str]] = {
    # literal-predicate-bounded probe/query frames (vec_id/doc_id < K)
    "ann_recall_frontier": (2, "literal vec_id<K probe set"),
    "ann_recall_ivf2_at_3": (1, "literal vec_id<K probe set"),
    "ann_recall_ivf_at_3": (1, "literal vec_id<K probe set"),
    "ann_recall_pq_at_3": (1, "literal vec_id<K probe set"),
    "ann_recall_sq8_at_3": (1, "literal vec_id<K probe set"),
    "ann_rrf_fusion": (1, "literal vec_id<K probe set"),
    "embedding_ivf2_topk": (1, "literal vec_id<K probe set"),
    "embedding_ivf_topk": (1, "literal vec_id<K probe set"),
    "embedding_pq_topk": (1, "literal vec_id<K probe set"),
    "embedding_sq8_topk": (1, "literal vec_id<K probe set"),
    # literal parameter frames (createDataFrame -> Scan ExistingRDD)
    "acf_table_daily": (1, "literal lag spine"),
    "hurst_rs_exponent": (1, "literal window-size grid"),
    "periodogram_fixed_freqs": (1, "literal frequency grid"),
    "range_join_bands": (1, "3-row literal band table"),
    "quality_gate_disparity": (2, "literal threshold frame"),
    # bounded-grain aggregates, explicitly broadcast by design
    "err_cascade_metric": (1, "threshold-grain stats"),
    "hard_negative_mining": (1, "query-grain stats"),
    "isotonic_calibration_bins": (2, "bin-grain offsets (<=1024)"),
    "langid_confusion_f1": (1, "label-grain confusion cells"),
    "mann_kendall_trend": (1, "calendar-day grain"),
    "query_likelihood_dirichlet": (1, "scalar mu stats over doc grain"),
    "rbo_ranker_agreement": (1, "depth-grain rank lists"),
    "rocchio_prf_rerank": (5, "top-k PRF centroid / query grain"),
    "source_minhash_overlap": (1, "source-grain sketch table"),
    "t_closeness_check": (1, "bucket-grain distributions"),
    # calendar-bounded daily series (pair generator broadcast)
    "theil_sen_slope_daily": (8, "calendar-day daily aggregate"),
}

_SOURCE_TOKENS = ("Scan parquet", "Scan csv", "Scan json", "Scan text")
_LIMIT_TOKENS = ("GlobalLimit", "TakeOrderedAndProject", "WindowGroupLimit")
_AGG_TOKENS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def _children(node):
    kids = []
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        try:
            kids.append(node.inputPlan())
        except Exception:
            pass
    if "InMemoryTableScan" in name:
        try:
            kids.append(node.relation().cachedPlan())
        except Exception:
            pass
    cs = node.children()
    for i in range(cs.size()):
        kids.append(cs.apply(i))
    return kids


def _walk(node, fn):
    fn(node)
    for k in _children(node):
        _walk(k, fn)


def _is_scalar_agg(node) -> bool:
    if not any(t in node.nodeName() for t in _AGG_TOKENS):
        return False
    s = node.simpleString(120)
    return "keys=[]" in s or "keys=[], " in s


def _classify(node) -> tuple[str, list[str]]:
    """Classify a build subtree. Returns (verdict, subtree op names).

    The gate check is PATH-WISE: a scan is fine iff some scalar
    aggregate or limit sits between the build root and that scan.
    """
    names: list[str] = []
    _walk(node, lambda n: names.append(n.nodeName()))

    def paths_gated(n) -> bool:
        name = n.nodeName()
        if _is_scalar_agg(n) or any(t in name for t in _LIMIT_TOKENS):
            return True  # everything below is bounded by this gate
        if name.startswith("Scan") or name == "Range":
            # Range with literal bounds is bounded; parquet scans are not
            return name == "Range"
        kids = _children(n)
        if not kids:
            return True  # leaf that is not a scan (literal relation)
        return all(paths_gated(k) for k in kids)

    has_source = any(
        n.startswith("Scan") and n != "Range" for n in names
    )
    if not has_source:
        return "literal", sorted(set(names))
    if paths_gated(node):
        # every scan path passes a scalar agg or limit gate
        gate = (
            "scalar-gated"
            if any(a in n for n in names for a in _AGG_TOKENS)
            else "limit-gated"
        )
        return gate, sorted(set(names))
    return "UNBOUNDED?", sorted(set(names))


def audit_query(spark, sf_dir: str, name: str, fn) -> list[dict]:
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
    findings: list[dict] = []

    def visit(node):
        if node.nodeName() != "BroadcastNestedLoopJoin":
            return
        try:
            build = str(node.buildSide())
        except Exception:
            build = "BuildRight"
        child = node.children().apply(1 if build == "BuildRight" else 0)
        verdict, ops = _classify(child)
        findings.append(
            {
                "query": name,
                "build_side": build,
                "verdict": verdict,
                "build_subtree_ops": ops,
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

    spark = get_spark("bnlj-audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or sorted(REGISTRY)
    all_findings: list[dict] = []
    errors: list[str] = []
    for n in names:
        try:
            all_findings.extend(audit_query(spark, args.sf_dir, n, REGISTRY[n].fn))
        except Exception as e:
            errors.append(f"{n}: {type(e).__name__}")
    by_verdict: dict[str, int] = {}
    for f in all_findings:
        by_verdict[f["verdict"]] = by_verdict.get(f["verdict"], 0) + 1
    counts: dict[str, int] = {}
    for f in all_findings:
        if f["verdict"] == "UNBOUNDED?":
            counts[f["query"]] = counts.get(f["query"], 0) + 1
    offenders = {
        q: n for q, n in counts.items() if n > ADJUDICATED.get(q, (0, ""))[0]
    }
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_queries": len(names),
                "n_bnlj": len(all_findings),
                "by_verdict": by_verdict,
                "unbounded": [
                    f for f in all_findings if f["verdict"] == "UNBOUNDED?"
                ],
                "offenders_beyond_adjudicated": offenders,
                "plan_errors": errors,
            },
            indent=1,
        )
    )
    if offenders:
        sys.exit(1)


if __name__ == "__main__":
    main()
