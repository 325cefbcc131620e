"""Dump .explain("formatted") for named queries into plans/r13/.

Usage: python tools/r13_explain.py <suffix> <query> [<query> ...]
  suffix: "before" or "after" (file becomes plans/r13/<query>_<suffix>.txt)

Runs at the bench SF (sf0.1 by default, override SPARK_GRAFT_SF_DIR) so
the plan shapes match what the bench measures. Initial (pre-execution)
AQE plan — the same artifact `df.explain("formatted")` prints; the
bench's plan_counters in bench_full.json remain the AQE-final record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.plans import REGISTRY

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("r13-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
