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

Within a chunk, each query is forced end-to-end through its OWN
QueryExecution (an RDD count over the executed plan — full
computation, every InternalRow consumed, nothing shipped to the
driver but a count; r9, replacing the noop write whose separate
write-command QueryExecution left df's plan AQE-initial and blinded
the plan fingerprint to runtime SMJ→BHJ/skew decisions) and runs
BENCH_RUNS times keeping the fastest — the first run of a plan shape
pays one-time Janino codegen compilation, amortized to nothing over a
real workload, so steady-state is the honest engine-speed number.

Calibration (round-6 fix): the r5 regression tracker stored RAW best
seconds, seeded in one mid-round run that happened to land on a fast
session — 11 queries then reproduced 1.5-2.0x their stored bests in
EVERY later session and the downward-only ratchet could never
self-correct (VERDICT r5 "What's wrong" 1). Absolute wall-clock on a
shared box drifts ±2x session-to-session for reasons that have nothing
to do with plans (host load, CPU frequency, page cache). Each chunk
JVM therefore also times one FIXED calibration plan (a TPC-H-Q1-shaped
lineitem aggregation, spelled inline here so registry edits can't move
it), and the history stores each query's best NORMALIZED time
t_query / t_calib-of-its-chunk. Session speed multiplies numerator and
denominator equally, so the ratio isolates plan drift — a real
regression moves the ratio, a slow session doesn't. The raw-seconds
"queries" map in the output is unchanged (the driver's contract);
regression flags are computed on ratios.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ucl_data_pipeline_spark.plans import REGISTRY

# Per-query NORMALIZED timing history (regression tracker) — see the
# calibration note in the module docstring. A history whose epoch
# differs from EPOCH is discarded and re-seeded from the current run
# (r5's raw-seconds epoch is exactly such a discard: its bests were
# provably a fast-session artifact, not faster plans).
#
# v2 (same round): the reference is the MEDIAN of the last
# HISTORY_DEPTH runs, not the best-ever. Best-ever ratchets downward
# monotonically, so any lucky sample permanently hardens the bar —
# and mixed-bound workloads drift differently than the scan-bound
# calibration query (measured across three same-code runs: CPU-bound
# queries' norms rose 1.5-2x while scan-bound ones held), so a single
# optimistic best plus environmental drift yields unfixable false
# flags. A rolling median tracks the query's own recent distribution:
# real plan regressions still jump >1.5x above it, while slow drift
# and one-off jitter do not.
HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_history.json"
)
# v3 (r12): calibration changed from best-of-3 to MEDIAN-of-3 (see
# _calibrate) — norms divide by a systematically larger, less noisy
# yardstick, so best-of-3-era histories are not comparable and are
# re-seeded on first contact.
EPOCH = "r12-median-calib-v3"
REGRESSION_RATIO = 1.5
HISTORY_DEPTH = 5
# Absolute-seconds floor (r7): norm ratios are meaningless below the
# JIT/codegen noise floor — r6 "confirmed" doc_language_mix at 2.01x
# on a 0.35 s query that re-measured clean in isolation. A query whose
# raw best is under this floor is never flagged. History append rule
# (r8): an observation that exceeds REGRESSION_RATIO x median but is
# suppressed only by the floors is NOT appended — absorbing it would
# re-baseline the median and permanently hide a sub-floor regression
# that later drifts past the floor; the pre-regression baseline is
# preserved until the query becomes flaggable.
MIN_FLAG_SECONDS = 0.5

# Calibration-relative floor (r7, second iteration): the absolute
# floor still let cohort_retention "confirm" at 0.55 s in-suite while
# re-measuring at 0.47 s in a fresh session — queries within a few
# multiples of the calibration query's own runtime are dominated by
# scheduler/stage overhead (~50 ms/stage × a handful of stages), not
# by their plan, and their norm wobbles 2x between identical runs. A
# query whose CURRENT norm is below this multiple of calibration is
# never flagged; a real plan regression on such a query would push it
# past the floor anyway (ngram_novelty_rate flagged at norm 30,
# copurchase_pairs at 5). Machine-independent because norm already is.
MIN_FLAG_NORM = 2.5

# Queries whose cost is priced separately from the headline mean:
# "baseline" = deliberately-unoptimized exact reference implementations
# that exist only to grade ANN variants; "iterative" = multi-job
# iterative algorithms (Lloyd loops, label propagation, PageRank
# supersteps) whose cost is iteration depth, not per-pass plan quality.
_EXCLUDED_MEAN_TAGS = ("baseline", "iterative")


# Physical-plan token counts recorded per query in bench_full.json —
# deterministic at fixed code+SF, so "plan unchanged" becomes a machine
# check instead of an adjudication cycle (r7 spent one proving
# robust_zscore's drift was environment-not-plan). Tokens chosen to
# capture exactly what a plan regression would move: shuffle count and
# kind, join strategy, aggregate/window/sort operators.
_PLAN_TOKENS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "Sort ",
    "TakeOrderedAndProject",
    "InMemoryTableScan",
)


def _execute(df) -> None:
    """Force df end-to-end through its OWN QueryExecution. A noop
    write executes a SEPARATE write-command QueryExecution and leaves
    df's own plan un-executed — with AQE, _plan_counters would then
    stringify the INITIAL plan (isFinalPlan=false) and runtime
    SMJ→BHJ conversions / skew splits could never move the
    fingerprint (round-8 advisor finding). Executing the plan's RDD
    and counting materializes every adaptive stage and finalizes
    executedPlan; like the noop sink it consumes every InternalRow
    and ships nothing to the driver but a count."""
    df._jdf.queryExecution().executedPlan().execute().count()


def _plan_counters(df) -> dict[str, int] | None:
    """Nonzero token counts of the POST-EXECUTION physical plan — AQE
    FINAL, guaranteed by _execute() having run df's own
    QueryExecution — the per-query plan fingerprint archived next to
    its wall-time. None = extraction failed (the query is then
    excluded from plan-based auto-clearing rather than recorded with a
    fake pure-scan fingerprint); an EMPTY dict is a real fingerprint
    (no exchange/join/agg tokens — the pure-scan shape)."""
    try:
        s = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return None
    # An executed AdaptiveSparkPlanExec stringifies BOTH its final and
    # its initial plan — count tokens in the final section only.
    s = s.split("== Initial Plan ==")[0]
    out = {t.strip(): s.count(t) for t in _PLAN_TOKENS}
    return {k: v for k, v in out.items() if v}


# Helper modules whose edits must also invalidate the source hash:
# query functions lean on registry helpers (range_bucket /
# bucket_offsets / knuth_bucket / dsum) and the functions/ package,
# so a cost regression introduced THERE moves neither the operator
# tokens nor the query fn's own source (round-9 advisor finding —
# the r9 source gate, blind one level down).
#
# plans.registry is deliberately NOT digested at module grain: it also
# hosts EXPORT_FIRST / REWITNESS_CHANGED, which the witnessing rotation
# edits EVERY round — a whole-module digest would invalidate all 393
# source hashes each round and permanently disable the auto-clear gate
# it exists to serve. Its cost-bearing HELPER FUNCTIONS are digested
# individually instead (below).
_SHARED_HELPER_MODULES: tuple[str, ...] = (
    "ucl_data_pipeline_spark.functions.scalar",
    "ucl_data_pipeline_spark.functions.text",
    "ucl_data_pipeline_spark.functions.vector",
)
# Registry callables whose source feeds every query's hash (rotation
# tuples and the register/export plumbing are excluded on purpose —
# they cannot change a query's cost).
_REGISTRY_HELPER_FNS: tuple[str, ...] = (
    "dsum",
    "davg",
    "r6",
    "sql_dsum",
    "sql_davg",
    "sql_knuth_bucket",
    "range_bucket",
    "_bucket_search",
    "bucket_offsets",
    "bucketed_running_sum",
    "bucketed_row_number",
)
# Module-level constants those helpers READ (round-10 advisor): the
# function-grain digest sees only the helpers' source text, so editing
# DEC changes dsum/davg result precision and editing the bucket knobs
# changes every bucketed query's cost without moving any digested
# source line. Their repr()s are digested alongside the sources.
_REGISTRY_HELPER_CONSTS: tuple[str, ...] = (
    "DEC",
    "_BUCKET_TARGET_ROWS",
    "_BUCKET_MIN",
    "_BUCKET_MAX",
)
_MODULE_DIGEST_CACHE: dict[str, str] = {}


def _registry_helpers_digest() -> str:
    """md5 over the source of the registry's cost-bearing helper
    functions plus the repr of the module constants they read (cached
    under a synthetic module-cache key so the round-10 gate tests can
    perturb it like any module digest)."""
    import inspect

    key = "ucl_data_pipeline_spark.plans.registry#helpers"
    if key not in _MODULE_DIGEST_CACHE:
        from ucl_data_pipeline_spark.plans import registry as _reg

        srcs = []
        for fn_name in _REGISTRY_HELPER_FNS:
            try:
                srcs.append(inspect.getsource(getattr(_reg, fn_name)))
            except (OSError, TypeError, AttributeError):
                srcs.append(f"<missing:{fn_name}>")
        for const in _REGISTRY_HELPER_CONSTS:
            srcs.append(f"{const}={getattr(_reg, const, '<missing>')!r}")
        _MODULE_DIGEST_CACHE[key] = hashlib.md5(
            "\x00".join(srcs).encode()
        ).hexdigest()
    return _MODULE_DIGEST_CACHE[key]


def _module_digest(module) -> str:
    """md5 of a module's full source ('' when unavailable), cached —
    the whole-module grain is deliberately coarse: a false
    invalidation only costs one round of suppression power, while a
    missed one silently absorbs a regression into the median."""
    import inspect

    key = getattr(module, "__name__", repr(module))
    if key not in _MODULE_DIGEST_CACHE:
        try:
            src = inspect.getsource(module)
        except (OSError, TypeError):
            src = ""
        _MODULE_DIGEST_CACHE[key] = hashlib.md5(src.encode()).hexdigest()
    return _MODULE_DIGEST_CACHE[key]


def _source_hash(name: str) -> str | None:
    """md5 over the query function's source text PLUS its defining
    module's source PLUS the shared helper modules it may call.
    Plan-unchanged auto-clearing additionally requires the SOURCE to
    be unchanged: expression-level edits (projection math, lambda
    bodies) leave every operator token count identical, so without
    this gate a real code regression would be silently absorbed into
    the rolling median (round-8 advisor finding). The module-level
    digests extend the gate to edits in shared helpers and
    module-level constants/oracle strings (round-9 advisor finding)."""
    try:
        import importlib
        import inspect

        fn = REGISTRY[name].fn
        parts = [inspect.getsource(fn)]
        mod = inspect.getmodule(fn)
        if mod is not None:
            parts.append(_module_digest(mod))
        for mod_name in _SHARED_HELPER_MODULES:
            parts.append(_module_digest(importlib.import_module(mod_name)))
        parts.append(_registry_helpers_digest())
        return hashlib.md5("\x00".join(parts).encode()).hexdigest()[:12]
    except (OSError, TypeError, KeyError, ImportError):
        return None


def _plan_hash(counters: dict[str, int]) -> str:
    return hashlib.md5(
        json.dumps(counters, sort_keys=True).encode()
    ).hexdigest()[:12]


def _load_history() -> dict:
    try:
        with open(HISTORY_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _flag_and_update_history(
    norms: dict[str, float],
    sf: float | None,
    raw: dict[str, float] | None = None,
    plans: dict[str, dict] | None = None,
):
    """Return (regressions, reseeded) and append to the rolling
    history.

    `norms` maps query → t_query / t_calib for this run. A query is
    flagged when its current norm exceeds REGRESSION_RATIO × the
    MEDIAN of its stored last-HISTORY_DEPTH norms AND its raw best
    seconds (from `raw`) is at least MIN_FLAG_SECONDS AND its current
    norm is at least MIN_FLAG_NORM (the calibration-relative noise
    floor); the current norm is then appended (oldest dropped). `reseeded` is True when
    the stored epoch was absent/foreign and the history was
    re-initialized from this run (no flags reported — nothing
    comparable to flag against).

    `plans` maps query → plan-counter dict for this run (r8). When a
    query's plan hash equals the stored hash from the prior run AND
    its source hash is also unchanged (r9 — expression-level edits
    move no operator token, so plan identity alone cannot prove
    "environment"), an over-ratio observation is NOT flagged —
    plan+source-unchanged drift is environment by definition (the r7
    robust_zscore adjudication, mechanized) — and IS appended, so the
    rolling median absorbs the new environmental level; it is
    reported once in the `suppressed` return value (r9 — the human
    sees every auto-cleared over-ratio instead of a silent clear).
    Flags therefore mean "slower AND (the physical plan or the query
    source moved)". Queries with no stored/current plan hash flag as
    before.
    """
    hist = _load_history()
    reseeded = hist.get("epoch") != EPOCH or hist.get("sf") != sf
    if reseeded:
        hist = {"epoch": EPOCH, "sf": sf, "norms": {}}
    store = hist.setdefault("norms", {})
    plan_store = hist.setdefault("plans", {})
    src_store = hist.setdefault("sources", {})
    regressions = []
    suppressed = []
    for name, r in norms.items():
        prior = store.get(name) or []
        # Require ≥3 prior samples before flagging: a 1-2 sample
        # "median" is a single noisy observation and newly-registered
        # queries would be judged against whatever session they
        # happened to land in first.
        raw_sec = (raw or {}).get(name, float("inf"))
        ref = statistics.median(prior) if len(prior) >= 3 else None
        exceeds = ref is not None and ref > 0 and r > REGRESSION_RATIO * ref
        below_floor = raw_sec < MIN_FLAG_SECONDS or r < MIN_FLAG_NORM
        # An EMPTY counter dict is still a fingerprint ("no exchange /
        # join / agg tokens at all" — the pure-scan shape); only a
        # missing entry (query not measured this run) yields None.
        cur_plan = (plans or {}).get(name)
        cur_hash = _plan_hash(cur_plan) if cur_plan is not None else None
        cur_src = _source_hash(name)
        plan_unchanged = (
            cur_hash is not None
            and plan_store.get(name) == cur_hash
            and cur_src is not None
            and src_store.get(name) == cur_src
        )
        if cur_hash is not None:
            plan_store[name] = cur_hash
        if cur_src is not None:
            src_store[name] = cur_src
        if not reseeded and exceeds and not below_floor:
            entry = {
                "query": name,
                "norm": round(r, 3),
                "median_norm": round(ref, 3),
                "ratio": round(r / ref, 2),
            }
            if plan_unchanged:
                suppressed.append(entry)
            else:
                regressions.append(entry)
        # Skip the append when the observation exceeds the regression
        # ratio but is shielded by a floor: appending would absorb the
        # regressed norms into the rolling median and a 1.0->2.0-norm
        # regression could never be flagged even after drifting past
        # MIN_FLAG_NORM. Keeping the pre-regression history means the
        # ratio test still fires the first run the floors stop
        # shielding it. Plan-unchanged over-ratio drift DOES append —
        # it is adjudicated environment, and the median should track
        # the new environmental level.
        if plan_unchanged or not (exceeds and below_floor):
            store[name] = (prior + [round(r, 4)])[-HISTORY_DEPTH:]
    regressions.sort(key=lambda r: -r["ratio"])
    suppressed.sort(key=lambda r: -r["ratio"])
    try:
        with open(HISTORY_PATH, "w") as f:
            json.dump(hist, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: still report, just don't append
    return regressions, suppressed, reseeded


def _subset_remeasure(names: list[str], sf_dir: str) -> dict | None:
    """Run a comma-separated subset of queries in a FRESH python+JVM
    subprocess (the child-chunk mode of this very script) and return
    its parsed payload, or None when the subprocess fails — shared by
    the regression-confirm and suppressed-entry rechecks."""
    env = dict(os.environ)
    env["BENCH_QUERIES"] = ",".join(names)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
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
        return None
    return json.loads(line)


def _confirm_regressions(
    regressions: list[dict],
    sf_dir: str,
    timings: dict[str, float] | None = None,
) -> list[dict]:
    """Re-measure flagged queries once in a FRESH JVM and keep only
    flags that reproduce (recheck norm still > REGRESSION_RATIO × the
    median of the runs stored BEFORE the flagged one). Rationale: with
    250+ sub-second queries, the run-to-run noise tail alone flags ~5%
    of the suite at 1.5-2× (measured: 13/263 on back-to-back runs with
    ZERO plan changes — calibration cancels session-level drift but
    not per-query GC/JIT jitter). A real plan regression reproduces on
    an immediate fresh-JVM re-measure; noise almost never does twice
    in a row. The recheck sample is appended to the rolling history
    like any other observation.

    When `timings` (the archived raw-seconds map) is passed, each
    rechecked query's entry is updated to the best of (in-suite,
    recheck) — r12: a contention-window raw second must not survive
    in the driver artifact once a fresh-JVM re-measure disproves it.
    """
    names = [r["query"] for r in regressions]
    payload = _subset_remeasure(names, sf_dir)
    if payload is None:
        return regressions  # recheck unavailable: keep original flags
    calib = payload.get("calib_sec") or 0.0
    if calib <= 0:
        return regressions
    hist = _load_history()
    store = hist.get("norms", {})
    confirmed = []
    for r in regressions:
        t = payload["queries"].get(r["query"])
        prior = store.get(r["query"]) or []
        if t is None or not prior:
            confirmed.append(r)
            continue
        if timings is not None and r["query"] in timings:
            r["suite_sec"] = timings[r["query"]]
            timings[r["query"]] = round(min(timings[r["query"]], t), 3)
        # `prior` already contains this run's (flagged) norm — compare
        # the recheck against the median of the runs BEFORE it.
        base = prior[:-1] or prior
        ref = statistics.median(base)
        recheck = t / calib
        store[r["query"]] = (prior + [round(recheck, 4)])[-HISTORY_DEPTH:]
        # Same floors as the initial flag: a recheck below the
        # absolute OR calibration-relative noise floor cannot confirm
        # a regression regardless of ratio.
        if (
            ref > 0
            and recheck > REGRESSION_RATIO * ref
            and t >= MIN_FLAG_SECONDS
            and recheck >= MIN_FLAG_NORM
        ):
            confirmed.append({**r, "recheck_norm": round(recheck, 3)})
    try:
        with open(HISTORY_PATH, "w") as f:
            json.dump(hist, f, indent=1, sort_keys=True)
    except OSError:
        pass
    return confirmed


def _recheck_suppressed(
    suppressed: list[dict], sf_dir: str, timings: dict[str, float]
) -> None:
    """Fresh-JVM re-measure for suppressed-by-plan over-ratio entries,
    archiving the best of (in-suite, recheck) raw seconds in `timings`
    (r12 — the round-11 verdict's task 3b). The suppression verdict
    itself is already settled — plan+source unchanged means the drift
    is environment by adjudication — but BENCH_r11 archived
    jaccard_prefix_filter_pairs at 49.64 s (9.5× its level, ~9% of the
    suite total) in the driver artifact's `queries` map even though
    the tracker had adjudicated it environment: the archived totals
    were polluted by host state with no in-artifact correction. Each
    entry is annotated with its in-suite and recheck seconds (the
    adjudication stays auditable), the recheck norm is appended to the
    rolling history like any other observation, and the caller
    recomputes the headline aggregates from the corrected map.
    Mutates `suppressed` entries and `timings` in place."""
    payload = _subset_remeasure([s["query"] for s in suppressed], sf_dir)
    if payload is None:
        return  # recheck unavailable: archived raws stay as measured
    calib = payload.get("calib_sec") or 0.0
    hist = _load_history()
    store = hist.get("norms", {})
    for s in suppressed:
        t = payload["queries"].get(s["query"])
        if t is None:
            continue
        s["suite_sec"] = timings.get(s["query"])
        s["recheck_sec"] = round(t, 3)
        if s["query"] in timings:
            timings[s["query"]] = round(min(timings[s["query"]], t), 3)
        if calib > 0:
            s["recheck_norm"] = round(t / calib, 3)
            prior = store.get(s["query"]) or []
            store[s["query"]] = (prior + [round(t / calib, 4)])[
                -HISTORY_DEPTH:
            ]
    if calib > 0:
        try:
            with open(HISTORY_PATH, "w") as f:
                json.dump(hist, f, indent=1, sort_keys=True)
        except OSError:
            pass


def _sf_of(sf_dir: str) -> float | None:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return None


def _calibrate(spark, sf_dir: str) -> float:
    """Time the fixed calibration plan (MEDIAN of 3, cold cache each) —
    the per-JVM speed yardstick every query in this chunk divides by.
    Spelled inline (NOT a registry lookup) so the yardstick can never
    change shape when the registry evolves.

    Median, not best (r12 — the round-11 judge measured a 1.8× swing
    between two best-of-3 calibrations on a quiet host while the
    measured queries moved <15%): best-of is biased by a single lucky
    sample, and EVERY stored norm divides by this one number, so
    calibration noise multiplies straight into the history. The median
    of three back-to-back runs is robust to one outlier in either
    direction at identical cost. Yardstick semantics changed →
    EPOCH bumped (r12-median-calib-v3) so best-of-3-era norms are
    re-seeded, never compared against."""
    from pyspark.sql import functions as F

    from ucl_data_pipeline_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    samples = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # Same execution protocol as the measured queries (_execute:
        # the frame's own QueryExecution, RDD count sink) so norms
        # divide like by like.
        _execute(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_price"),
                F.count("*").alias("n"),
            )
        )
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def _run_in_process(
    names: list[str], sf_dir: str
) -> tuple[dict[str, float], float, dict[str, dict]]:
    """Measure `names` in this process's (fresh) Spark session.
    Returns (timings, calibration_sec, plan_counters)."""
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
    calib = _calibrate(spark, sf_dir)

    runs = max(1, int(os.environ.get("BENCH_RUNS", "2")))
    max_runs = max(runs, int(os.environ.get("BENCH_MAX_RUNS", "4")))
    timings: dict[str, float] = {}
    plans: dict[str, dict] = {}
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
            _execute(df)
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
        # Post-execution fingerprint (AQE-final): the last run's df.
        counters = _plan_counters(df)
        if counters is not None:
            plans[name] = counters
    return timings, calib, plans


def _run_chunked(
    names: list[str], chunk: int
) -> tuple[dict[str, float], dict[str, float], dict[str, dict]]:
    """Measure `names` in fresh-JVM subprocesses of `chunk` queries.
    Returns (timings, norms, plan_counters): norms divide each query
    by ITS OWN chunk's calibration, so per-JVM speed variance cancels
    too."""
    timings: dict[str, float] = {}
    norms: dict[str, float] = {}
    plans: dict[str, dict] = {}
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
        payload = json.loads(line)
        timings.update(payload["queries"])
        plans.update(payload.get("plan_counters") or {})
        calib = payload.get("calib_sec") or 0.0
        if calib > 0:
            for n, t in payload["queries"].items():
                norms[n] = t / calib
    return timings, norms, plans


def _summary_line(out: dict, timings: dict[str, float]) -> dict:
    """Compact summary payload for the LAST stdout line.

    r7: the driver archives only the LAST ~2 KB of stdout, and the
    full per-query "queries"/"tags" maps (~275 entries) grew past that
    in r5 — BENCH_r05 and BENCH_r06 both recorded `"parsed": null`
    with the headline scalars truncated away. Full runs therefore
    print TWO JSON lines: the full map first (also persisted to
    bench_full.json), then this summary LAST — same metric contract,
    "queries" bounded to the slowest 10 (the ones a reader actually
    wants in a tail), guaranteed to fit the tail window whole
    (pinned < 2000 bytes by tests/test_round7.py and the emit-time
    assert in main()). The regressions list is capped at 8 entries so
    a pathological flag-storm cannot push the scalars out of the tail.
    """
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    summary = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        "n_queries": out["n_queries"],
        "mean_query_sec": out["mean_query_sec"],
        "mean_query_sec_headline": out["mean_query_sec_headline"],
        "protocol": out["protocol"],
        "queries": {n: round(t, 3) for n, t in slowest.items()},
        "queries_truncated_to_slowest": len(slowest),
        "queries_full": "bench_full.json",
    }
    for k in (
        "calib_sec_median",
        "regression_candidates",
        "history_reseeded",
    ):
        if k in out:
            summary[k] = out[k]
    if "regressions" in out:
        summary["regressions"] = out["regressions"][:8]
        if len(out["regressions"]) > 8:
            summary["regressions_truncated"] = len(out["regressions"])
    if out.get("suppressed_by_plan"):
        summary["suppressed_by_plan"] = out["suppressed_by_plan"][:4]
    return summary


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    subset = os.environ.get("BENCH_QUERIES")
    chunk = int(os.environ.get("BENCH_CHUNK", "25"))

    calibs: list[float] = []
    norms: dict[str, float] = {}
    plans: dict[str, dict] = {}
    if subset:
        # Child-chunk / explicit-subset mode: measure in THIS process.
        # (The parent derives norms from calib_sec itself — no norms
        # are computed here.)
        names = [n.strip() for n in subset.split(",") if n.strip()]
        timings, calib, plans = _run_in_process(names, sf_dir)
        calibs.append(calib)
    else:
        names = sorted(REGISTRY)  # stable order across rounds
        if chunk > 0:
            timings, norms, plans = _run_chunked(names, chunk)
            missing = [n for n in names if n not in timings]
            if missing:
                # Safety net: if subprocess isolation failed in this
                # environment (spawn limits, etc.), measure the missing
                # queries in-process rather than reporting a hole.
                sys.stderr.write(
                    f"bench: {len(missing)} queries missing from chunked "
                    "run; measuring in-process\n"
                )
                extra, calib, extra_plans = _run_in_process(missing, sf_dir)
                timings.update(extra)
                plans.update(extra_plans)
                if calib > 0:
                    norms.update(
                        {n: t / calib for n, t in extra.items()}
                    )
        else:
            timings, calib, plans = _run_in_process(names, sf_dir)
            calibs.append(calib)
            if calib > 0:
                norms = {n: t / calib for n, t in timings.items()}

    total = round(sum(timings.values()), 3)
    tags = {n: list(REGISTRY[n].tags) for n in timings if n in REGISTRY}
    headline = [
        n
        for n in timings
        if not any(t in _EXCLUDED_MEAN_TAGS for t in tags.get(n, ()))
    ]
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
        # Headline mean excludes "baseline"-tagged rows (deliberately
        # unoptimized exact references that only exist to grade ANN
        # recall) and "iterative"-tagged rows (multi-job Lloyd/PageRank
        # loops priced by iteration depth) — per-query "tags" lets any
        # reader slice differently.
        "mean_query_sec_headline": round(
            sum(timings[n] for n in headline) / max(1, len(headline)), 4
        ),
        "tags": tags,
        # r5+: every timed run starts with a cleared cache, so each
        # query is priced at honest cold single-execution cost.
        # r1-r4 numbers measured warm-cache repeats (persisted
        # intermediates survived between runs) and are NOT comparable
        # — they under-priced every query that persists.
        "protocol": "cold-cache-per-run",
        # r8: per-query physical-plan token counts (AQE-final), so
        # "plan unchanged since last run" is a machine check. Goes to
        # bench_full.json / the child payload only — never the
        # summary tail line.
        "plan_counters": plans,
    }
    if subset and calibs:
        out["calib_sec"] = round(calibs[0], 3)
    if not subset and norms:
        out["calib_sec_median"] = round(
            statistics.median(
                t / norms[n]
                for n, t in timings.items()
                if n in norms and norms[n] > 0
            ),
            3,
        )
        if out["sf"] == 0.1:
            # The history epoch tracks the default driver SF only —
            # full runs at other SFs are not comparable and must not
            # touch (let alone reseed) the stored bests.
            regressions, suppressed, reseeded = _flag_and_update_history(
                norms, out["sf"], raw=timings, plans=plans
            )
            out["regression_candidates"] = len(regressions)
            rechecked_any = bool(regressions)
            if regressions:
                regressions = _confirm_regressions(
                    regressions, sf_dir, timings
                )
            out["regressions"] = regressions
            # Over-ratio observations auto-cleared because plan AND
            # source were unchanged (environment by adjudication) —
            # surfaced once for a human instead of vanishing. r12:
            # they are also RE-MEASURED in a fresh JVM so the archived
            # raw-seconds map records best-of-2, not the contention
            # window (BENCH_r11's jaccard at 49.64 s).
            if suppressed:
                _recheck_suppressed(suppressed, sf_dir, timings)
                rechecked_any = True
            out["suppressed_by_plan"] = suppressed
            out["history_reseeded"] = reseeded
            if rechecked_any:
                # The rechecks may have corrected archived raw seconds
                # (timings is the same dict out["queries"] points at) —
                # recompute the aggregates from the corrected map.
                total = round(sum(timings.values()), 3)
                out["value"] = total
                out["mean_query_sec"] = round(
                    total / max(1, len(timings)), 4
                )
                out["mean_query_sec_headline"] = round(
                    sum(timings[n] for n in headline)
                    / max(1, len(headline)),
                    4,
                )
    print(json.dumps(out))
    if not subset:
        # bench_full.json FIRST: if summary shaping ever fails, the
        # full artifact is already on disk for post-mortem.
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_full.json",
                ),
                "w",
            ) as f:
                json.dump(out, f, indent=1, sort_keys=True)
        except OSError:
            pass
        summary = _summary_line(out, timings)
        # Explicit size check, NOT an assert (asserts vanish under
        # python -O and an oversized line would be silently cut by the
        # driver's ~2 KB tail — the exact failure this guards). Shrink
        # the optional payloads until the line provably fits: drop
        # slowest-queries entries (least-slow first), then regression
        # entries, then whole optional keys.
        while len(json.dumps(summary)) >= 2000:
            if summary.get("queries"):
                summary["queries"].popitem()
                summary["queries_truncated_to_slowest"] = len(
                    summary["queries"]
                )
            elif summary.get("regressions"):
                summary["regressions"].pop()
                summary["regressions_truncated"] = out.get(
                    "regression_candidates", 0
                )
            else:
                for k in (
                    "plan_counters_note",
                    "suppressed_by_plan",
                    "regressions_truncated",
                    "regressions",
                    "history_reseeded",
                    "queries_full",
                    "queries_truncated_to_slowest",
                    "queries",
                ):
                    if k in summary:
                        del summary[k]
                        break
                else:
                    break  # nothing droppable left; emit as-is
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
