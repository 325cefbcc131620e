"""Scans, sinks and schema conformance (SURVEY.md §2.1).

Re-expresses the reference's CSV-file dataflow Spark-first:

- S2 local CSV scan → ``read_csv`` with a declared StructType and
  PERMISSIVE mode (the reference infers types; we declare them).
- missing-file tolerance (reference ``safe_read``,
  scripts/enrich_features.py:17-18) → ``safe_read_csv`` returning an
  empty typed DataFrame.
- S5/S6 sinks → ``write_csv`` / ``write_parquet``; an empty DataFrame
  with a declared schema IS the "empty-but-valid" file (reference
  scripts/fetch_the_odds_api.py:23-29).
- S7 preflight repair (scripts/ensure_min_files.py:10-44) dissolves into
  ``conform`` — declared schemas + default stamping make "repair" a pure
  projection.
- S8 in-place overwrite is deliberately NOT reproduced: Spark cannot
  overwrite a path it is reading; pipelines here stage immutable outputs
  (raw → enriched → final), which also fixes the reference's
  non-idempotent re-run behavior (SURVEY.md §7 "What's hard" (b)).

Scale notes: Parquet is the interchange format (columnar, predicate
pushdown, partition pruning); CSV is kept for ingest/egress only. Fact
writes partition by a date-derived column so downstream scans prune.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ucl_data_pipeline_spark.schemas import TESTDATA_SCHEMAS


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver synthetic table (parquet) from ``sf_dir``.

    Parquet scans get predicate pushdown + column pruning from Catalyst
    for free; callers should select/filter as early as convenient but
    correctness never depends on it.

    ``events.ts`` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
    in all current sf dirs, which reads directly as ``timestamp_ntz`` —
    the naive-timestamp semantic every events oracle assumes. Earlier
    driver testdata shipped TIMESTAMP(NANOS), which the JVM reader
    rejects outright; that shape is handled by a guarded fallback
    (``_read_events_legacy_nanos``) kept because the testdata's
    physical type has already changed once between rounds.

    Defense-in-depth: the engine does not own the SparkSession it is
    handed (the verification driver builds its own), so the one conf
    value correctness depends on — a UTC session timezone for
    naive-timestamp semantics (SURVEY F6) — is re-asserted here rather
    than assumed from ``session.py``. ANSI mode is deliberately NOT
    touched: every coercion path uses ``try_*`` functions, so plans are
    ANSI-neutral by construction.
    """
    tz = spark.conf.get("spark.sql.session.timeZone", None)
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            return spark.read.parquet(path)
        except Exception as exc:
            # Only the TIMESTAMP(NANOS) schema rejection goes through the
            # legacy fallback; any other failure (missing file, corrupt
            # footer, permissions) re-raises unchanged so the real error
            # surfaces instead of a confusing second-attempt one.
            msg = str(exc)
            if "NANOS" in msg or "Illegal Parquet type" in msg:
                return _read_events_legacy_nanos(spark, path)
            raise
    return spark.read.parquet(path)


def _read_events_legacy_nanos(spark: SparkSession, path: str) -> DataFrame:
    """Fallback for TIMESTAMP(NANOS) events parquet: read nanos as long
    and floor-convert to microsecond timestamps (identical to DuckDB's
    ns→µs truncation). The legacy conf is scoped to this one schema
    resolution and restored so an unrelated later read in the same
    session is not retyped.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        nanos_cols = [
            f.name
            for f in df.schema.fields
            if f.name == "ts" and isinstance(f.dataType, T.LongType)
        ]
        for c in nanos_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df


def fan_out(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition a compute-bound stage to full parallelism.

    The driver testdata ships one row group per parquet file, so scans
    arrive as a single partition and CPU-heavy per-row work (md5
    minhashing, Arrow decode batches) would run on one core. At 100 TB
    the scan itself yields thousands of splits and this becomes a
    near-no-op (Spark skips the exchange when partitioning already
    suffices is not guaranteed — keep fan_out on stages whose per-row
    cost dwarfs one row-shuffle, where it is always worth it).
    """
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def stats_barrier(df: DataFrame) -> DataFrame:
    """Make a frame's STATIC size estimate conservatively unknown
    (huge) without changing its runtime behavior: union with an empty
    RDD-backed frame of the same schema.

    Why this exists (r13, guide §3): Catalyst's static sizeInBytes
    propagation cannot see through Generate / Window / localCheckpoint
    lineages — an explode-fed build side "looks tiny" at any true
    size, and the static planner broadcasts it (the r12 ×100
    driver-kill class, SCALE_NOTES). Round 12 pinned those joins with
    merge hints, which also blocks AQE's runtime SMJ→BHJ conversion,
    overpaying at every scale below the hazard point (the r12
    verdict's #3 "what's wrong"). The empty LogicalRDD carries no
    origin stats, so its static estimate is ``spark.sql.
    defaultSizeInBytes`` (max); the union's estimate is the sum
    (huge); the static planner therefore plans a sort-merge join — and
    AQE, which re-plans each stage from ACTUAL shuffle sizes, converts
    to broadcast at runtime exactly when the side really fits (and
    never when it doesn't: the estimate the conversion uses is
    measured, not derived). The empty RDD has zero partitions — no
    tasks, no rows, no runtime cost. Verified at sf0.1: static plan
    has 0 BroadcastExchange over the barriered subtrees, AQE-final
    plan converts every join back to BroadcastHashJoin
    (plans/r13/*_before/after.txt).
    """
    spark = df.sparkSession
    empty = spark.createDataFrame(spark.sparkContext.emptyRDD(), df.schema)
    return df.unionByName(empty)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: Any,
) -> DataFrame:
    """S2: headered CSV scan with declared schema, permissive parse."""
    opts = {"header": "true", "mode": "PERMISSIVE", **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def empty_df(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """S6: an empty-but-valid table (schema, zero rows)."""
    return spark.createDataFrame([], schema)


def safe_read_csv(
    spark: SparkSession, path: str, schema: T.StructType, **options: Any
) -> DataFrame:
    """S2 + missing-file tolerance: absent/unreadable path → empty typed df.

    Reference: ``safe_read`` (scripts/enrich_features.py:17-18) returns an
    empty frame when the file is missing so downstream joins no-op.
    """
    try:
        if not os.path.exists(path):
            return empty_df(spark, schema)
        return read_csv(spark, path, schema=schema, **options)
    except Exception:
        return empty_df(spark, schema)


def conform(
    df: DataFrame,
    schema: T.StructType,
    defaults: dict[str, Any] | None = None,
) -> DataFrame:
    """Project ``df`` onto ``schema``: add missing columns (default or
    NULL), cast present ones, emit canonical column order.

    Replaces the reference's ``ensure_cols`` (scripts/enrich_features.py:
    20-24), default stamping (scripts/fetch_football_data.py:48-52) and
    preflight repair (scripts/ensure_min_files.py:10-44) with one pure
    projection — no shuffle, fully codegen'd.
    """
    defaults = defaults or {}
    existing = {f.name for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        if field.name in existing:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif field.name in defaults:
            cols.append(
                F.lit(defaults[field.name]).cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def conform_column_names(df: DataFrame, case: str = "upper") -> DataFrame:
    """P1: conform every column NAME to one case (values untouched).

    Reference: ``df.columns = [c.upper() ...]``
    (scripts/fetch_football_data.py:31-32) normalizes header spelling
    before candidate-column selection. A pure rename — zero-cost at any
    scale (metadata-only, no expression evaluated).
    """
    if case == "upper":
        names = [c.upper() for c in df.columns]
    elif case == "lower":
        names = [c.lower() for c in df.columns]
    else:
        raise ValueError(f"case must be 'upper' or 'lower', got {case!r}")
    # Input names differing only by case would silently map to duplicate
    # output names, making every later reference ambiguous at analysis
    # time, far from the cause — fail here and name the colliders.
    seen: dict[str, str] = {}
    collisions = []
    for old, new in zip(df.columns, names):
        if new in seen:
            collisions.append(f"{seen[new]!r}/{old!r} -> {new!r}")
        else:
            seen[new] = old
    if collisions:
        raise ValueError(
            "conform_column_names case collision(s): " + ", ".join(collisions)
        )
    return df.toDF(*names)


def read_json_records(
    spark: SparkSession, json_str: str, schema: T.ArrayType
) -> DataFrame:
    """S3/S4: one JSON document (e.g. a REST response body) → rows.

    The fetch itself stays driver-side (control flow + rate limiting,
    reference scripts/fetch_the_odds_api.py:59-71); parsing/flattening is
    DataFrame work: ``from_json`` with a declared nested schema, then
    ``explode``(see operators.json_flatten). At scale, responses land on
    object storage and this becomes ``spark.read.json`` with the same
    element schema.
    """
    df = spark.createDataFrame([(json_str,)], ["raw"])
    return df.select(
        F.explode(F.from_json(F.col("raw"), schema)).alias("rec")
    ).select("rec.*")


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Stage an immutable parquet output (the engine's interchange sink).

    ``partition_by`` a low-cardinality date-derived column for facts so
    downstream scans partition-prune (SURVEY.md §4.2 scale notes).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table —
    the co-located-join layout: two tables bucketed the same way on
    the join key join WITHOUT an exchange (asserted in
    tests/test_plans.py). This is the 100 TB answer to the
    orderkey-spine shuffle in every fact-fact join: pay the shuffle
    once at write time, never at read time. Bucket count is a layout
    contract — both sides must match (Spark won't coalesce unequal
    bucket counts without shuffling one side).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: headered CSV egress sink."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC egress sink (zlib default) — the columnar interchange format
    for Hive-ecosystem consumers; same predicate-pushdown/column-
    pruning properties as parquet on re-scan."""
    df.write.mode(mode).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan (declared schema optional — ORC is self-describing)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines egress sink — the common text-corpus interchange
    format (one document object per line). Columnar pushdown does NOT
    apply on re-scan; use parquet for anything re-read hot."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan. Always pass ``schema`` at scale: without it
    Spark runs a full inference pre-pass over the data (twice the IO),
    and drifting inputs silently change the inferred types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All driver synthetic tables as a name→DataFrame dict."""
    return {name: read_table(spark, sf_dir, name) for name in TESTDATA_SCHEMAS}
