#!/usr/bin/env python3
"""Landing-proof closing-gate protocol (round-11 verdict task 1b).

Rounds 10 and 11 both shipped trees where pytest was green at
gate-time and went red the moment the driver's CORRECTNESS artifact
for the CURRENT prefix landed — the gate had only ever been run
against the pre-landing archive. This script makes the landed state
part of the closing gate itself:

1. predict the next round's driver artifact (all current-prefix rows
   green — exactly what the prefix-prediction gate asserts the driver
   will produce) and write it as CORRECTNESS_r{N+1}.json;
2. run the full pytest suite WITH the artifact present;
3. delete the synthetic artifact unconditionally (it must never be
   left on disk where it could be mistaken for real driver output —
   the driver writes the real one at round end).

Exit status is pytest's. Usage:

    python tools/landing_gate.py              # full suite
    python tools/landing_gate.py tests/test_registry_rotation.py -q
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DRIVER_PREFIX = 50


def _next_round() -> int:
    rounds = [
        int(os.path.basename(p).split("_r")[1].split(".")[0])
        for p in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) if rounds else 0) + 1


def main(argv: list[str]) -> int:
    sys.path.insert(0, _ROOT)
    from ucl_data_pipeline_spark.plans import REGISTRY
    from ucl_data_pipeline_spark.plans.registry import EXPORT_FIRST

    predicted = {}
    for name in EXPORT_FIRST[:_DRIVER_PREFIX]:
        if REGISTRY[name].oracle is None:
            # rows-only-by-design rows (kmeans_clusters) get the
            # weaker no-oracle row shape the driver writes for them.
            predicted[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": 1,
                "oracle_rows": None,
                "err": "no_oracle",
            }
        else:
            predicted[name] = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "spark_rows": 1,
                "oracle_rows": 1,
                "err": None,
            }

    path = os.path.join(_ROOT, f"CORRECTNESS_r{_next_round():02d}.json")
    if os.path.exists(path):
        print(f"refusing to overwrite existing artifact: {path}", file=sys.stderr)
        return 2
    with open(path, "w") as f:
        json.dump(predicted, f, indent=2)
    print(f"[landing-gate] synthetic landed artifact: {path}")
    try:
        args = argv or ["tests/"]
        return subprocess.call(
            [sys.executable, "-m", "pytest", *args], cwd=_ROOT
        )
    finally:
        os.remove(path)
        print(f"[landing-gate] removed {path}")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
