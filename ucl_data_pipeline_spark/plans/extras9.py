"""Round-5 inventory depth, fifth batch: engagement windows, budget
apportionment, frequency sketches, multi-dim data layout, and
dimension time-travel — the storage-layout / planning shapes of a
large-scale pipeline (plus their everyday analytics cousins).

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Trailing 7-day distinct users (sliding COUNT DISTINCT)
# ---------------------------------------------------------------------------

_SLIDE_DAYS = 7

_SLIDING_DAU_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT d.day AS obs_day, du.user_id
  FROM du JOIN days d ON d.day BETWEEN du.day AND du.day + {_SLIDE_DAYS - 1}
)
SELECT obs_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
FROM contrib GROUP BY obs_day
"""


@register(
    "sliding_distinct_users_7d", oracle=_SLIDING_DAU_ORACLE, tags=("temporal", "agg")
)
def sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day (the canonical
    WAU-by-day metric). COUNT DISTINCT over a sliding window cannot be
    computed with a window frame (distinct state is not subtractable),
    so the classic rewrite applies: collapse the fact table to the
    (day, user) grain first, then let each active day CONTRIBUTE to the
    7 observation days it falls in and re-aggregate.

    Scale: the expansion is a constant ×7 of the already-collapsed
    (day, user) table — NOT of the raw fact table — expressed as an
    `explode(sequence(...))` so the contribution join is a pure
    equi-shuffle on the day key (never an inequality/range join, which
    Spark would plan as a nested-loop). Semi-join against observed
    days prunes partial windows that precede the data.
    """
    e = read_table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select(F.col("day").alias("obs_day")).distinct()
    contrib = du.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {_SLIDE_DAYS - 1}), interval 1 day)")
        ).alias("obs_day"),
        "user_id",
    )
    return (
        contrib.join(days, "obs_day")
        .groupBy("obs_day")
        .agg(F.count_distinct("user_id").alias("users_7d"))
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment of a sampling budget
# ---------------------------------------------------------------------------

_APPORTION_BUDGET = 10_000

_APPORTION_ORACLE = f"""
WITH cnt AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS total FROM cnt),
shares AS (
  SELECT source, n_docs,
         (n_docs * {_APPORTION_BUDGET}) // total AS floor_seats,
         (n_docs * {_APPORTION_BUDGET}) % total AS remainder
  FROM cnt, tot
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY remainder DESC, source) AS rem_rank,
         SUM(floor_seats) OVER () AS floor_total
  FROM shares
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor_seats
            + CASE WHEN rem_rank <= {_APPORTION_BUDGET} - floor_total
                   THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM ranked
"""


@register(
    "largest_remainder_apportion", oracle=_APPORTION_ORACLE, tags=("llm", "sampling")
)
def largest_remainder_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split a fixed
    sampling budget across document sources proportionally to corpus
    counts, with the integer leftovers going to the largest fractional
    remainders (tie-broken by source name). This is the deterministic
    integer allocator a training-data mixer needs BEFORE
    mixture_resample can draw per-source quotas: quotas sum to the
    budget exactly, no float drift, reproducible across engines.

    All arithmetic is integer (scaled products, `div`/`pmod`) — no
    floating shares anywhere. The windows are keyless but run on the
    per-source aggregate (domain-bounded: one row per source, ~20),
    after the only fact-table pass (the count). At 100 TB the count is
    a map-side-combined hash-agg; everything after is driver-trivial.
    """
    d = read_table(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").alias("total"))
    scaled = F.col("n_docs") * F.lit(_APPORTION_BUDGET)
    shares = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"(n_docs * {_APPORTION_BUDGET}) div total").alias("floor_seats"),
        F.pmod(scaled, F.col("total")).alias("remainder"),
    )
    w_all = Window.partitionBy(F.lit(1))
    ranked = shares.select(
        "source",
        "n_docs",
        "floor_seats",
        F.row_number()
        .over(w_all.orderBy(F.col("remainder").desc(), "source"))
        .alias("rem_rank"),
        F.sum("floor_seats").over(w_all).alias("floor_total"),
    )
    return ranked.select(
        "source",
        "n_docs",
        (
            F.col("floor_seats")
            + F.when(
                F.col("rem_rank")
                <= F.lit(_APPORTION_BUDGET) - F.col("floor_total"),
                1,
            ).otherwise(0)
        ).alias("quota"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: SQL-expressed CMS + overestimate gate vs exact counts
# ---------------------------------------------------------------------------

# Four public odd 32-bit multipliers (Knuth 2654435761 + xxHash primes)
# drive the d=4 hash rows; w=64 buckets per row.
_CMS_MULTIPLIERS = (2654435761, 2246822519, 3266489917, 668265263)
_CMS_W = 64
_CMS_TRACKED = 20


def _cms_hash(key: Column, c: int, w: int) -> Column:
    """Overflow-safe ``(key·c mod 2³²) mod w`` — the split-multiply
    scheme of functions.scalar.knuth_bucket generalized to any odd
    multiplier (see its docstring for the 2⁴⁹-bound argument)."""
    m32 = 4294967296
    k = F.pmod(key, F.lit(m32))
    k_hi = F.shiftright(k, 16)
    k_lo = k.bitwiseAND(F.lit(65535))
    h = F.pmod(
        F.pmod(k_hi * F.lit(c), F.lit(m32)) * F.lit(65536) + k_lo * F.lit(c),
        F.lit(m32),
    )
    return F.pmod(h, F.lit(w))


def _sql_cms_hash(key: str, c: int, w: int) -> str:
    return (
        f"(((({key} % 4294967296) >> 16) * {c} % 4294967296) * 65536"
        f" + (({key} % 4294967296) & 65535) * {c}) % 4294967296 % {w}"
    )


_CMS_ORACLE = f"""
WITH kc AS (
  SELECT l_partkey AS key, COUNT(*) AS exact_cnt FROM lineitem GROUP BY 1
),
cells AS (
  SELECT j, h, SUM(exact_cnt) AS cell FROM (
    {" UNION ALL ".join(
        f"SELECT {j} AS j, {_sql_cms_hash('key', c, _CMS_W)} AS h, exact_cnt FROM kc"
        for j, c in enumerate(_CMS_MULTIPLIERS)
    )}
  ) GROUP BY j, h
),
tracked AS (
  SELECT key, exact_cnt,
         ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, key) AS rnk
  FROM kc QUALIFY rnk <= {_CMS_TRACKED}
),
est AS (
  SELECT t.key, t.exact_cnt, MIN(cells.cell) AS cms_est
  FROM tracked t JOIN cells ON (
    {" OR ".join(
        f"(cells.j = {j} AND cells.h = {_sql_cms_hash('t.key', c, _CMS_W)})"
        for j, c in enumerate(_CMS_MULTIPLIERS)
    )}
  )
  GROUP BY t.key, t.exact_cnt
)
SELECT key AS l_partkey, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overestimate
FROM est
"""


@register("count_min_estimate_error", oracle=_CMS_ORACLE, tags=("sketch", "gate"))
def count_min_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch expressed as pure relational algebra — d=4 hash
    rows × w=64 buckets over part-key frequencies — plus the quality
    gate: for the 20 hottest keys, the CMS point estimate (min over
    the d cells) against the exact count. CMS never underestimates, so
    ``overestimate`` ≥ 0 row-wise is the sketch's correctness
    invariant, and its magnitude is the collision error a heavy-hitter
    monitor would pay at this (d, w).

    Scale: the sketch is built from the per-key AGGREGATE (one
    map-side-combined pass over the fact table), then exploded ×d over
    the distinct-key table only; the sketch itself is d·w = 256 cells
    — mergeable across partitions/days by cell-wise addition, which is
    the whole point of CMS at 100 TB. Everything is integer arithmetic
    on shared public constants, so both engines agree bit-for-bit.
    """
    li = read_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("exact_cnt")
    )
    hashes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cms_hash(F.col("key"), c, _CMS_W).alias("h")
            )
            for j, c in enumerate(_CMS_MULTIPLIERS)
        ]
    )
    exploded = kc.select("key", "exact_cnt", F.explode(hashes).alias("jh"))
    cells = exploded.groupBy(
        F.col("jh.j").alias("j"), F.col("jh.h").alias("h")
    ).agg(F.sum("exact_cnt").alias("cell"))
    tracked = (
        kc.orderBy(F.col("exact_cnt").desc(), "key")
        .limit(_CMS_TRACKED)
        .select("key", "exact_cnt", F.explode(hashes).alias("jh"))
        .select(
            "key",
            "exact_cnt",
            F.col("jh.j").alias("tj"),
            F.col("jh.h").alias("th"),
        )
    )
    return (
        tracked.join(
            F.broadcast(cells),
            (tracked["tj"] == cells["j"]) & (tracked["th"] == cells["h"]),
        )
        .groupBy("key", "exact_cnt")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            F.col("key").alias("l_partkey"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: interleaved-bit clustering key + file stats
# ---------------------------------------------------------------------------

_Z_BITS = 4  # 16 buckets per dimension → 8-bit z-key → 16 files of 16 keys


def _morton(px: Column, sx: Column) -> Column:
    z = F.lit(0)
    for i in range(_Z_BITS):
        z = (
            z
            + F.shiftright(px, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
            + F.shiftright(sx, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
    return z


_SQL_MORTON = " + ".join(
    f"((px >> {i}) & 1) * {1 << (2 * i + 1)} + ((sx >> {i}) & 1) * {1 << (2 * i)}"
    for i in range(_Z_BITS)
)

_ZORDER_ORACLE = f"""
WITH b AS (
  SELECT l_partkey % 16 AS px, l_suppkey % 16 AS sx FROM lineitem
),
z AS (
  SELECT px, sx, ({_SQL_MORTON}) // 16 AS file_id FROM b
)
SELECT CAST(file_id AS INTEGER) AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(px) AS INTEGER) AS px_min, CAST(MAX(px) AS INTEGER) AS px_max,
       CAST(MIN(sx) AS INTEGER) AS sx_min, CAST(MAX(sx) AS INTEGER) AS sx_max,
       CAST((MAX(px) - MIN(px) + 1) * (MAX(sx) - MIN(sx) + 1) AS INTEGER)
         AS bbox_area
FROM z GROUP BY file_id
"""


@register("zorder_layout_stats", oracle=_ZORDER_ORACLE, tags=("layout", "scale"))
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key + the per-file min/max stats it
    yields — the multi-dimensional data-layout trick behind Delta/
    Iceberg `OPTIMIZE ZORDER BY`. Interleaving the bits of two bucket
    keys and range-splitting the result gives every file a TIGHT
    bounding box in BOTH dimensions (bbox_area ≤ 16 per 16-key file
    here vs 16×16 for files split on either single key), so min/max
    file statistics prune point/range scans on either predicate column
    — the property this query's output makes checkable.

    Scale: the z-key is a pure bitwise projection (no shuffle); the
    stats roll up with one hash-agg, exactly the manifest-building
    pass a 100 TB table write performs. Bit arithmetic is identical
    integer math in both engines.
    """
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.pmod("l_partkey", F.lit(16)).alias("px"),
        F.pmod("l_suppkey", F.lit(16)).alias("sx"),
    )
    z = b.select("px", "sx", F.shiftright(_morton(F.col("px"), F.col("sx")), 4).alias("file_id"))
    return z.groupBy(F.col("file_id").cast("int").alias("file_id")).agg(
        F.count("*").alias("n_rows"),
        F.min("px").cast("int").alias("px_min"),
        F.max("px").cast("int").alias("px_max"),
        F.min("sx").cast("int").alias("sx_min"),
        F.max("sx").cast("int").alias("sx_max"),
        ((F.max("px") - F.min("px") + 1) * (F.max("sx") - F.min("sx") + 1))
        .cast("int")
        .alias("bbox_area"),
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time join (time-travel dimension lookup)
# ---------------------------------------------------------------------------

_SCD2_PIT_ORACLE = """
WITH v1 AS (
  SELECT c_custkey, c_acctbal, 1 AS version FROM customer
),
v2 AS (
  SELECT c_custkey, ROUND(c_acctbal * 1.1, 2) AS c_acctbal, 2 AS version
  FROM customer WHERE c_custkey % 3 = 0
),
scd AS (
  SELECT c_custkey, c_acctbal, version AS valid_from,
         COALESCE(
           LEAD(version) OVER (PARTITION BY c_custkey ORDER BY version) - 1,
           2147483647) AS valid_to
  FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(1 + o.o_orderkey % 2 AS INTEGER) AS as_of_version,
       s.c_acctbal AS acctbal_as_of
FROM orders o
JOIN scd s
  ON s.c_custkey = o.o_custkey
 AND 1 + o.o_orderkey % 2 BETWEEN s.valid_from AND s.valid_to
"""


@register("scd2_point_in_time_join", oracle=_SCD2_PIT_ORACLE, tags=("join", "pipeline"))
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) fact→dimension lookup against an
    SCD2 history: every order reads the customer attribute that was
    VALID AT its as-of version — the query shape that makes SCD2
    worth building (scd2_history constructs the intervals; this
    consumes them). Interval containment is resolved as an EQUI-join
    on the customer key followed by the validity predicate: each key
    has at most a handful of versions, so the bounded post-join filter
    beats a range-join plan (which Spark would nested-loop). At 100 TB
    both sides bucket on the key and the join is exchange-free.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    v1 = c.select("c_custkey", "c_acctbal", F.lit(1).alias("version"))
    v2 = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 1.1, 2).alias("c_acctbal"),
        F.lit(2).alias("version"),
    )
    w = Window.partitionBy("c_custkey").orderBy("version")
    scd = (
        v1.unionByName(v2)
        .select(
            "c_custkey",
            "c_acctbal",
            F.col("version").alias("valid_from"),
            F.coalesce(
                F.lead("version").over(w) - 1, F.lit(2147483647)
            ).alias("valid_to"),
        )
    )
    fact = o.select(
        "o_orderkey",
        "o_custkey",
        (1 + F.pmod("o_orderkey", F.lit(2))).cast("int").alias("as_of_version"),
    )
    return (
        fact.join(scd, fact["o_custkey"] == scd["c_custkey"])
        .filter(
            F.col("as_of_version").between(
                F.col("valid_from"), F.col("valid_to")
            )
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "as_of_version",
            F.col("c_acctbal").alias("acctbal_as_of"),
        )
    )
