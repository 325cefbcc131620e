"""Local oracle-differential harness (mimics the driver's verify).

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, sorted column names,
and an order-insensitive multiset of rows (floats compared both exactly
and with tolerance so we can tell "bitwise mismatch only" from "wrong
values").

Usage:
    python tools/verify_local.py [--sf-dir /root/testdata/sf0.01]
                                 [--ansi] [query ...]

--ansi runs the queries under spark.sql.ansi.enabled=true — the
verification driver's real session semantics (Spark 4 default; it never
loads session.py's confs). Every query must pass BOTH modes: the engine
is ANSI-neutral by construction (try_* for every coercion that can see
malformed input).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.plans import REGISTRY
from ucl_data_pipeline_spark.schemas import TESTDATA_TABLES


def _norm_cell(v, exact: bool):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if exact:
            return v
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x, exact) for x in v)
    return v


def _pandas_kind(series) -> str:
    """Collapse a pandas dtype to the classes the driver's canonicalizer
    distinguishes (mirror of tests/test_queries_oracle.py)."""
    import datetime

    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    vals = [v for v in series if v is not None]
    if vals and all(
        isinstance(v, (datetime.date, datetime.datetime)) for v in vals
    ):
        return "datetime"
    return "other"


def _multiset(rows, colnames, exact: bool) -> Counter:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(
        tuple(_norm_cell(row[i], exact) for i in order) for row in rows
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--ansi",
        action="store_true",
        help="run under spark.sql.ansi.enabled=true (the driver's semantics)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("verify-local")
    if args.ansi:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = args.names or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(REGISTRY)}")
        return 2
    n_pass = n_fail = n_nocheck = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            n_nocheck += 1
            continue
        try:
            cur = con.execute(q.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        # Driver's-eye dtype check (see tests/test_queries_oracle.py):
        # the driver canonicalizes through pandas dtype-sensitively, so
        # an int64-vs-float64 column hash-fails even with equal values.
        if not problems:
            try:
                ddf = con.execute(q.oracle).df()
                spdf = sdf.toPandas()
                for c in dcols:
                    dk, sk = _pandas_kind(ddf[c]), _pandas_kind(spdf[c])
                    if {dk, sk} == {"int", "float"} and (
                        ddf[c].isna().all() or spdf[c].isna().all()
                    ):
                        continue
                    if dk != sk:
                        problems.append(
                            f"dtype[{c}] duck={ddf[c].dtype} spark={spdf[c].dtype}"
                        )
            except Exception as e:  # pragma: no cover - diagnostics only
                problems.append(f"dtype check error: {e}")
        if not problems:
            exact = _multiset(srows, scols, True) == _multiset(drows, dcols, True)
            approx = exact or (
                _multiset(srows, scols, False) == _multiset(drows, dcols, False)
            )
            if exact:
                print(f"PASS  {name}: {len(srows)} rows exact ({dt:.1f}s)")
                n_pass += 1
            elif approx:
                print(f"WARN  {name}: values match only at 6dp tolerance — "
                      f"driver hash may fail ({dt:.1f}s)")
                n_fail += 1
            else:
                sm = _multiset(srows, scols, False)
                dm = _multiset(drows, dcols, False)
                only_s = list((sm - dm).items())[:3]
                only_d = list((dm - sm).items())[:3]
                print(f"FAIL  {name}: value mismatch; spark-only={only_s} "
                      f"duck-only={only_d}")
                n_fail += 1
        else:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_nocheck} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
