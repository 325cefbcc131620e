"""Column-expression factories for the reference's scalar surface.

Every row-wise Python callable in the reference is re-expressed as a
native Catalyst column expression — zero Python UDFs (SURVEY.md §2.10).
This keeps the whole plan inside whole-stage codegen, which is the
difference between JVM-speed and 10-100x-slower Python at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_km(
    lat1: ColumnOrName, lon1: ColumnOrName, lat2: ColumnOrName, lon2: ColumnOrName
) -> Column:
    """Great-circle distance in km (R=6371).

    Reference: ``haversine`` (scripts/enrich_features.py:8-15) applied
    row-wise via ``df.apply(axis=1)`` (:114-119). Here it is a pure
    column expression — codegen'd, vectorized, no serialization.
    """
    phi1 = F.radians(_col(lat1))
    phi2 = F.radians(_col(lat2))
    dphi = F.radians(_col(lat2) - _col(lat1))
    dlam = F.radians(_col(lon2) - _col(lon1))
    a = (
        F.pow(F.sin(dphi / F.lit(2.0)), 2)
        + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlam / F.lit(2.0)), 2)
    )
    return F.lit(2.0 * 6371.0) * F.asin(F.sqrt(a))


def fractional_to_decimal_odds(c: ColumnOrName) -> Column:
    """F4: ``"5/2"`` → 3.5; numeric strings pass through; garbage → NULL.

    Reference: ``fractional_to_decimal`` (scripts/utils.py:10-17).
    Uses ``try_cast`` throughout so garbage ('evens') → NULL under ANY
    session ANSI setting — the verification driver runs ANSI-on (Spark 4
    default) and plain ``cast`` would raise CAST_INVALID_INPUT there.
    Ill-formed fractions — zero denominator, non-numeric part, or not
    exactly two '/'-parts ('1/2/3', hypothesis-found) — coerce to NULL;
    the reference raises an uncaught exception on those (its try only
    wraps the non-fraction branch), which a distributed pipeline must
    not reproduce.
    """
    c = _col(c).cast("string")
    parts = F.split(c, "/")
    num = parts.getItem(0).try_cast("double")
    den = parts.getItem(1).try_cast("double")
    frac = F.when(
        F.size(parts) == 2, F.lit(1.0) + num / F.nullif(den, F.lit(0.0))
    )
    return F.when(c.contains("/"), frac).otherwise(c.try_cast("double"))


def try_double(c: ColumnOrName) -> Column:
    """F7: pandas ``to_numeric(errors="coerce")`` — invalid → NULL.

    Reference: scripts/fetch_fbr_team_xg.py:110-111. ``try_cast`` gives
    coerce-to-NULL semantics regardless of the session's ANSI config
    (the engine must not assume it owns the SparkSession's confs).
    """
    return _col(c).try_cast("double")


def clamp(c: ColumnOrName, lo: float, hi: float) -> Column:
    """max(lo, min(hi, v)) — reference scripts/bootstrap_team_priors.py:8-11."""
    return F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), _col(c)))


def clamp_with_midpoint(c: ColumnOrName, lo: float, hi: float) -> Column:
    """F11: clamp to [lo,hi]; unparseable/NULL → (lo+hi)/2.

    Reference: ``clamp`` (scripts/bootstrap_team_priors.py:8-11).
    """
    mid = (float(lo) + float(hi)) / 2.0
    return clamp(F.coalesce(try_double(c), F.lit(mid)), lo, hi)


def weighted_hybrid(
    cur: ColumnOrName, last: ColumnOrName, w_cur: float = 0.60
) -> Column:
    """A2: w·cur + (1-w)·last, degrading to whichever side is non-null;
    NULL when both are NULL.

    Reference: ``w()`` zip-loop (scripts/fetch_fbr_team_xg.py:113-123).
    """
    cur_c, last_c = _col(cur), _col(last)
    both = F.lit(float(w_cur)) * cur_c + F.lit(1.0 - float(w_cur)) * last_c
    return F.when(cur_c.isNotNull() & last_c.isNotNull(), both).otherwise(
        F.coalesce(cur_c, last_c)
    )


def sign_score(c: ColumnOrName, base: float = 0.55, step: float = 0.10) -> Column:
    """F13: base + step·sign(x), NULL treated as 0.

    Reference: setpiece prior (scripts/bootstrap_team_priors.py:27).
    """
    return F.lit(float(base)) + F.lit(float(step)) * F.signum(
        F.coalesce(_col(c), F.lit(0.0))
    )


def ratio_with_floor(
    c: ColumnOrName, base: float = 0.80, step: float = 0.15, denom: float = 34.0
) -> Column:
    """F14: base − step·max(0, x/denom), null-safe (NULL → 0).

    Reference: gk prior (scripts/bootstrap_team_priors.py:28).
    """
    ratio = F.coalesce(_col(c) / F.lit(float(denom)), F.lit(0.0))
    return F.lit(float(base)) - F.lit(float(step)) * F.greatest(F.lit(0.0), ratio)


def parse_date_multi(c: ColumnOrName, formats: tuple[str, ...] = ("d/M/yy", "d/M/yyyy", "yyyy-MM-dd")) -> Column:
    """F5: UK dayfirst date parsing with candidate formats, invalid → NULL.

    Reference: ``pd.to_datetime(dayfirst=True)``
    (scripts/fetch_football_data.py:45). Spark has no dayfirst inference,
    so we coalesce over explicit formats (non-ANSI: bad parse → NULL).
    """
    c = _col(c)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)).cast("date") for fmt in formats])


def to_naive_timestamp(c: ColumnOrName) -> Column:
    """F6: ISO8601 (with Z/offset) → session-tz-naive timestamp.

    Reference: tz_localize(None) (scripts/enrich_features.py:147-149,
    fetch_the_odds_api.py:46,148). With session tz pinned to UTC the
    naive timestamp equals the UTC instant.
    """
    return F.to_timestamp(_col(c))


def epoch_us(c: ColumnOrName) -> Column:
    """Microseconds since epoch, accepting TIMESTAMP **or** TIMESTAMP_NTZ.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ (which is what Spark ≥3.4
    infers for parquet ``timestamp[us]`` columns written without a
    timezone, e.g. the testdata ``events.ts``). With the session tz
    pinned to UTC (session.py), casting NTZ→TIMESTAMP is value-exact, and
    the cast is a no-op on an already-tz-aware column — so this helper is
    safe for both and all call sites use it instead of raw unix_micros.
    """
    return F.unix_micros(_col(c).cast("timestamp"))


def epoch_s(c: ColumnOrName) -> Column:
    """Whole seconds since epoch, accepting TIMESTAMP **or**
    TIMESTAMP_NTZ — the second-granularity sibling of :func:`epoch_us`
    (same NTZ→TIMESTAMP cast rationale; see its docstring). Shared by
    the batch and streaming interval-join ``lag_s`` projections so an
    NTZ-related fix lands in one place."""
    return F.unix_timestamp(_col(c).cast("timestamp"))


def knuth_bucket(key: ColumnOrName, m: int) -> Column:
    """Deterministic sampling bucket: ``(key · 2654435761 mod 2³²) mod m``,
    overflow-safe over the FULL 64-bit key domain.

    A naive ``key * 2654435761`` wraps (non-ANSI) or raises (ANSI) in
    BIGINT for keys above ~3.47e9 — reachable at 100 TB scale — while
    DuckDB promotes to INT128, silently breaking cross-engine
    membership. Split multiply instead: with k = key mod 2³² =
    k_hi·2¹⁶ + k_lo,

        (k·C) mod 2³² = ((k_hi·C mod 2³²)·2¹⁶ + k_lo·C) mod 2³²

    and every intermediate stays below 2⁴⁹, so BIGINT arithmetic is
    exact on both engines for every key. (Mathematically identical to
    the infinite-precision product: mod distributes over ·.)
    Mirror: ``sql_knuth_bucket`` in plans/registry.py.
    """
    c_knuth, m32 = 2654435761, 4294967296
    k = F.pmod(_col(key), F.lit(m32))
    k_hi = F.shiftright(k, 16)
    k_lo = k.bitwiseAND(F.lit(65535))
    h = F.pmod(
        F.pmod(k_hi * F.lit(c_knuth), F.lit(m32)) * F.lit(65536)
        + k_lo * F.lit(c_knuth),
        F.lit(m32),
    )
    return F.pmod(h, F.lit(m))


def coalesce_candidates(df_columns: list[str], candidates: list[str]) -> Column:
    """P2: first present-and-non-null of the candidate columns.

    Reference: odds column selection (scripts/fetch_football_data.py:33-35)
    picks the first candidate column that exists; we additionally fall
    through NULLs per row, which subsumes the reference behavior.
    """
    present = [F.col(c) for c in candidates if c in df_columns]
    if not present:
        return F.lit(None).cast("double")
    return F.coalesce(*present)
