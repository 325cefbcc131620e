"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local core count (default all)
  BENCH_QUERIES       comma-separated subset (default: all registered)
  BENCH_RUNS          per-query runs, best kept (default 2)
  BENCH_CHUNK         queries per fresh-JVM chunk (default 25; 0 = one
                      session for everything, the pre-round-4 behavior)

Isolation (round-4 fix): running the full 150-query suite in ONE
session inflated every timing ~1.5-1.7x by round 3 — accumulated
codegen classes, GC pressure and catalog state, not plan regressions
(VERDICT r3: isolated re-runs of identical plans measured ~2x faster
than their in-suite numbers, and the inflation was uniform across
queries with zero plan changes). The suite therefore runs in chunks of
BENCH_CHUNK queries, each in a FRESH python+JVM subprocess, and the
parent merges the per-chunk timings. Query order is alphabetical —
stable across rounds — so a query's chunk position never shifts with
the registry's per-round export rotation; round-over-round deltas now
mean plan changes, not suite-position changes.

Within a chunk, each query is forced end-to-end with a noop sink (full
computation, no collect/serialization cost — the same way a cluster
job would terminate in a write) and runs BENCH_RUNS times keeping the
fastest — the first run of a plan shape pays one-time Janino codegen
compilation, amortized to nothing over a real workload, so
steady-state is the honest engine-speed number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ucl_data_pipeline_spark.plans import REGISTRY

# Per-query best-ever isolated timings (regression tracker). Seeded in
# round 5 from a full fresh-JVM chunked run at sf0.1; every subsequent
# full run flags queries >1.5x their best prior number in the output
# JSON ("regressions") and ratchets the stored best downward — drift
# can never hide for a round again. History is only consulted/updated
# for full-suite runs at the default sf0.1 (subset and off-SF runs
# aren't comparable).
HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_history.json"
)
REGRESSION_RATIO = 1.5


def _load_history() -> dict:
    try:
        with open(HISTORY_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"epoch": None, "best": {}}


def _flag_and_update_history(timings: dict[str, float], sf: float | None):
    """Return the regression list and ratchet the stored bests."""
    hist = _load_history()
    if sf != hist.get("sf", 0.1):
        return None  # not comparable to the stored epoch
    best = hist.setdefault("best", {})
    regressions = []
    for name, t in timings.items():
        b = best.get(name)
        if b is not None and b > 0 and t > REGRESSION_RATIO * b:
            regressions.append(
                {
                    "query": name,
                    "sec": t,
                    "best_sec": b,
                    "ratio": round(t / b, 2),
                }
            )
        if b is None or t < b:
            best[name] = t
    regressions.sort(key=lambda r: -r["ratio"])
    try:
        with open(HISTORY_PATH, "w") as f:
            json.dump(hist, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: still report, just don't ratchet
    return regressions


def _sf_of(sf_dir: str) -> float | None:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return None


def _run_in_process(names: list[str], sf_dir: str) -> dict[str, float]:
    """Measure `names` in this process's (fresh) Spark session."""
    from pyspark.sql import functions as F

    from ucl_data_pipeline_spark import get_spark
    from ucl_data_pipeline_spark.sources.io import read_table

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session (codegen, parquet reader, shuffle machinery)
    # so query 1 measures steady-state engine speed, not JIT startup.
    spark.range(1).collect()
    warm = read_table(spark, sf_dir, "nation")
    warm.groupBy("n_regionkey").agg(F.count("*")).write.format("noop").mode(
        "overwrite"
    ).save()

    runs = max(1, int(os.environ.get("BENCH_RUNS", "2")))
    max_runs = max(runs, int(os.environ.get("BENCH_MAX_RUNS", "4")))
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        best = float("inf")
        done = 0
        spent = 0.0
        while True:
            # Convergence-based repeats: keep re-running while each new
            # run still improves the best by >15% (JIT/codegen warm-up —
            # measured convergence 7.2 -> 1.9 -> 1.4 -> 1.3 s on a fresh
            # session; the round-3 "perf regressions" were exactly this
            # artifact). Caps: 4 runs and a 15 s per-query time budget —
            # run 3-4 captures nearly all of the convergence, and the
            # full 157-query suite must stay well inside any harness
            # wall-clock limit. Reported number = steady state.
            # Cold-cache per timed run: several queries .persist()
            # intermediates and never unpersist, so without this the
            # chunk JVM accumulates cache entries across queries AND
            # repeats — later queries in a chunk then measure GC/memory
            # pressure that depends on CHUNK COMPOSITION, which shifts
            # every round as the registry grows (observed: same query
            # 1.7 s vs 3.8 s in two full runs with different chunk
            # boundaries). Clearing before each run makes per-query
            # numbers chunk-independent; persist still works WITHIN a
            # run, which is what it is for.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            improved = t < best * 0.85
            best = min(best, t)
            done += 1
            spent += t
            if done < runs:
                continue
            if done >= max_runs or spent > 15.0 or not improved:
                break
        timings[name] = round(best, 3)
    return timings


def _run_chunked(names: list[str], chunk: int) -> dict[str, float]:
    """Measure `names` in fresh-JVM subprocesses of `chunk` queries."""
    timings: dict[str, float] = {}
    for i in range(0, len(names), chunk):
        part = names[i : i + chunk]
        env = dict(os.environ)
        env["BENCH_QUERIES"] = ",".join(part)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=False,
        )
        line = next(
            (
                ln
                for ln in reversed(proc.stdout.splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            sys.stderr.write(
                f"bench chunk {part[0]}..{part[-1]} failed "
                f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}\n"
            )
            continue
        timings.update(json.loads(line)["queries"])
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    subset = os.environ.get("BENCH_QUERIES")
    chunk = int(os.environ.get("BENCH_CHUNK", "25"))

    if subset:
        # Child-chunk / explicit-subset mode: measure in THIS process.
        names = [n.strip() for n in subset.split(",") if n.strip()]
        timings = _run_in_process(names, sf_dir)
    else:
        names = sorted(REGISTRY)  # stable order across rounds
        if chunk > 0:
            timings = _run_chunked(names, chunk)
            missing = [n for n in names if n not in timings]
            if missing:
                # Safety net: if subprocess isolation failed in this
                # environment (spawn limits, etc.), measure the missing
                # queries in-process rather than reporting a hole.
                sys.stderr.write(
                    f"bench: {len(missing)} queries missing from chunked "
                    "run; measuring in-process\n"
                )
                timings.update(_run_in_process(missing, sf_dir))
        else:
            timings = _run_in_process(names, sf_dir)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "engine_query_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "n_queries": len(timings),
        # Total grows with operator coverage; mean is the
        # coverage-independent engine-speed number.
        "mean_query_sec": round(total / max(1, len(timings)), 4),
        # r5+: every timed run starts with a cleared cache, so each
        # query is priced at honest cold single-execution cost.
        # r1-r4 numbers measured warm-cache repeats (persisted
        # intermediates survived between runs) and are NOT comparable
        # — they under-priced every query that persists.
        "protocol": "cold-cache-per-run",
    }
    if not subset:
        regressions = _flag_and_update_history(timings, out["sf"])
        if regressions is not None:
            out["regressions"] = regressions
    print(json.dumps(out))


if __name__ == "__main__":
    main()
