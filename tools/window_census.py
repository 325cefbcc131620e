"""Census: single-partition Window nodes per registered query.

Thin CLI over ucl_data_pipeline_spark.plan_audit.
single_partition_windows — the ONE shared walker also used by the CI
gate tests/test_plans.py::test_single_partition_windows_are_allowlisted
(previously two hand-kept copies; round-9 advisor finding). See the
plan_audit module docstring for detector semantics (prepared plan,
AQE unwrap, Exchange AND ReusedExchange SinglePartition feeds).

Usage: python tools/window_census.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.plan_audit import single_partition_windows
from ucl_data_pipeline_spark.plans import REGISTRY


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
