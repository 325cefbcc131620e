"""Witness-rotation gate (round-9 verdict's optional task 8).

The verification driver checks only the first 50 exported queries per
round, so EXPORT_FIRST is rotated to maximize cumulative driver
evidence. Round 8 showed the rotation can silently drift from its own
comment; this test makes the invariant mechanical, from the archived
CORRECTNESS_r*.json artifacts themselves:

1. every EXPORT_FIRST name is registered, no duplicates;
2. the prefix fills all 50 driver slots while there is backlog;
3. every never-witnessed registered query is in the prefix (new
   registrations cannot silently skip the driver);
4. every other prefix slot goes to either the declared
   REWITNESS_CHANGED set (plans changed this round) or the oldest-
   vintage backlog — no slot is wasted re-witnessing a fresher row
   than the stalest row left outside.
"""

from __future__ import annotations

import glob
import json
import os

from ucl_data_pipeline_spark.plans import REGISTRY
from ucl_data_pipeline_spark.plans.registry import (
    EXPORT_FIRST,
    REWITNESS_CHANGED,
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DRIVER_PREFIX = 50


def _latest_green_vintage() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            hash_ok = v.get("hash_match")
            green = (
                v.get("rows_match")
                and v.get("schema_match")
                and hash_ok in (True, None)
            )
            # rows-only-by-design queries (no oracle_sql entry) get a
            # weaker driver row: err == 'no_oracle' with a row count —
            # that IS their witnessed state (kmeans_clusters).
            rows_only = (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            )
            if green or rows_only:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_export_first_is_valid_and_spends_slots_on_backlog():
    assert len(EXPORT_FIRST) == len(set(EXPORT_FIRST)), "duplicate slots"
    unknown = [n for n in EXPORT_FIRST if n not in REGISTRY]
    assert not unknown, f"EXPORT_FIRST names not in REGISTRY: {unknown}"
    assert set(REWITNESS_CHANGED) <= set(REGISTRY)

    latest = _latest_green_vintage()
    if not latest:  # no driver artifacts (fresh clone) — nothing to gate
        return
    witnessed = {n: r for n, r in latest.items() if n in REGISTRY}
    never = [n for n in REGISTRY if n not in witnessed]
    # Every registered query is witnessable (never-witnessed or
    # re-witnessable), so while the registry holds >= 50 queries there
    # is always a full prefix worth of slots to spend — the count must
    # not be derived from EXPORT_FIRST itself (a truncated prefix would
    # then shrink its own requirement and pass vacuously).
    if len(REGISTRY) >= _DRIVER_PREFIX:
        assert len(EXPORT_FIRST) >= _DRIVER_PREFIX, (
            "driver slots unfilled while witnessable queries remain"
        )

    missing_never = [n for n in never if n not in EXPORT_FIRST[:_DRIVER_PREFIX]]
    assert not missing_never, (
        f"never-witnessed queries outside the driver prefix: {missing_never}"
    )

    prefix = list(EXPORT_FIRST[:_DRIVER_PREFIX])
    outside = [n for n in REGISTRY if n not in prefix and n in witnessed]
    if outside:
        stalest_outside = min(witnessed[n] for n in outside)
        wasted = [
            n
            for n in prefix
            if n in witnessed
            and n not in REWITNESS_CHANGED
            and witnessed[n] > stalest_outside
        ]
        assert not wasted, (
            "prefix slots spent on rows fresher than the stalest backlog "
            f"row (vintage r{stalest_outside}) without a REWITNESS_CHANGED "
            f"declaration: {[(n, witnessed[n]) for n in wasted]}"
        )
