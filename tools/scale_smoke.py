"""Scale-up smoke: how do the heavy operators behave at 10× bench data?

Synthesizes an ~sf1 dataset in a temp dir by replicating sf0.1 with
key-space offsets (row counts ×10, key cardinalities ×10 — preserving
join fan-in per key, which is what actually stresses plans), writes it
as MULTI-split parquet (so scans parallelize the way real 100 TB tables
do, without fan_out), then times a representative heavy subset and
prints per-query times plus the time ratio vs sf0.1.

A ratio ≈ 10 means linear scaling (good for scans/aggs); join/window
queries should stay well under ~10× thanks to partial aggregation and
broadcast dims. Superlinear ratios flag operators whose plans won't
survive a 100× scale-up.

Usage: python tools/scale_smoke.py [--keep] 2>/dev/null
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.plans import REGISTRY
from ucl_data_pipeline_spark.sources.io import read_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SCALE_COPIES", "10"))

# (table, [key columns to offset per copy]) — offsets keep per-key
# fan-in constant instead of multiplying duplicates onto the same keys.
TABLES = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

OFFSET = 10_000_000  # far above any sf0.1 key

# --------------------------------------------------------------------
# Per-copy CONTENT perturbation (r12, SMOKE_PERTURB=documents,...).
# Key offsets alone are the WRONG stressor for similarity queries, in
# both directions at once:
#   - text: replicated documents are byte-identical, so the exact-dup
#     collapse (_rep_features) folds all copies back to ONE
#     representative — the candidate/verify stages then run on
#     UNSCALED data and the smoke trivially reads flat;
#   - vectors: there is no exact-dup collapse in the embedding family
#     (exact dedup is an upstream stage by design), so C identical
#     copies of every vector share cluster+bucket+csim and candidate
#     pairs grow C² per original — a quadratic blowup no real 100×
#     corpus exhibits (real corpora don't hold every vector 100×).
# The realistic 100× corpus is "100 shards with the same INTERNAL
# near-dup structure": each copy keeps its geometry exactly, copies
# are mutually dissimilar.
#   - documents: suffix every whitespace token with a copy tag
#     (lowercased, so the tokenizer keeps it). Token counts, df
#     distribution and shingle structure are preserved per copy;
#     shingle vocab cardinality ×C with per-key fan-in constant (the
#     same philosophy as the key offsets). Caveat recorded in
#     SCALE_NOTES: a real merged corpus also shares COMMON shingles
#     across shards, but those sit at the tail of the df order and
#     are provably excluded from rarest-first prefixes, so
#     shard-disjoint vocab is the faithful stressor for the
#     prefix-join stage.
#   - embeddings: per-copy deterministic sign reflection s[c,d]∈{±1}
#     per dimension (an orthogonal transform — within-copy cosines
#     and norms are bit-preserved) — cross-copy cosines collapse to
#     ~N(0, 1/dim) noise, far below any dedup threshold.
PERTURB = {}


def _perturb_documents(df, c: int):
    if c == 0:
        return df
    return df.withColumn(
        "text", F.regexp_replace("text", r"(\S+)", f"$1c{c}")
    )


def _perturb_embeddings(df, c: int):
    if c == 0:
        return df
    return df.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(
                F.pmod(F.xxhash64(F.lit(int(c)), i), F.lit(2)) == 0, x
            ).otherwise(-x),
        ),
    )


if os.environ.get("SMOKE_PERTURB"):
    _avail = {
        "documents": _perturb_documents,
        "embeddings": _perturb_embeddings,
    }
    for _t in os.environ["SMOKE_PERTURB"].split(","):
        if _t not in _avail:
            sys.exit(f"SMOKE_PERTURB table without a perturbation: {_t}")
        PERTURB[_t] = _avail[_t]

HEAVY = [
    "pricing_summary",
    "group_agg_basic",
    "local_supplier_volume",
    "returned_items_top20",
    "window_top2_per_key",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "jaccard_shingle_pairs",
    "embedding_topk_cosine",
    "embedding_ivf_topk",
    "session_window_agg",
    "as_of_join",
    "salted_skew_join",
    "contamination_ngram_overlap",
    "large_volume_customers",
    "kmeans_clusters",
]

if os.environ.get("SMOKE_QUERIES"):
    HEAVY = os.environ["SMOKE_QUERIES"].split(",")

# SMOKE_TABLES limits which tables are materialized at COPIES× — for
# high-copy runs (SCALE_COPIES=100) where replicating the text-heavy
# documents table would dominate wall-clock even though the queries
# under test never read it. Unlisted tables are staged at 1× so any
# accidental read still works (and is obviously unscaled).
if os.environ.get("SMOKE_TABLES"):
    _only = set(os.environ["SMOKE_TABLES"].split(","))
    _unknown = _only - set(TABLES)
    if _unknown:
        # A typo here would silently stage EVERYTHING at 1× while the
        # report still claims a COPIES× result — fail loudly instead.
        sys.exit(f"SMOKE_TABLES names not in TABLES: {sorted(_unknown)}")
else:
    _only = set(TABLES)


def main() -> None:
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        for name, keys in TABLES.items():
            src = read_table(spark, SRC, name)
            if name not in _only:
                keys = []  # stage at 1× (dims / tables not under test)
            if keys:
                parts = []
                for c in range(COPIES):
                    df = src
                    for k in keys:
                        df = df.withColumn(k, F.col(k) + F.lit(c * OFFSET))
                    if name in PERTURB:
                        df = PERTURB[name](df, c)
                    parts.append(df)
                import functools

                big = functools.reduce(lambda a, b: a.unionByName(b), parts)
            else:
                big = src  # dims stay dims
            n_files = 32 if keys else 1
            big.repartition(n_files).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )

        # Baseline timings at sf0.1 (same session, same code path)
        def run(sf_dir: str) -> dict[str, float]:
            t = {}
            for q in HEAVY:
                fn = REGISTRY[q].fn
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                t[q] = round(best, 3)
            return t

        small = run(SRC)
        big_t = run(out_dir)
        report = {
            "copies": COPIES,
            "queries": {
                q: {
                    "sf0.1_sec": small[q],
                    "x10_sec": big_t[q],
                    "ratio": round(big_t[q] / small[q], 2) if small[q] else None,
                }
                for q in HEAVY
            },
        }
        print(json.dumps(report, indent=2))
    finally:
        if "--keep" not in sys.argv:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
