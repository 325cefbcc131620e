"""Round-8 batch 2: physical-layout planning — the Z-order audit.

``zorder_layout_audit`` quantifies the file-skipping power of a
Z-ORDERED table layout against a linear single-key sort — the
decision behind ``OPTIMIZE ZORDER BY`` in lakehouse table formats and
the third member of the engine's write-layout planning family
(``range_partition_boundaries``: sorted-write split points;
``dictionary_encoding_planner``: per-column encoding choice). At
100 TB the scan cost of a 2-D selective query is decided before the
query runs, by how the writer clustered the data; this operator
measures that decision as min/max-pruning numbers, per layout and
per probe predicate.

Method: bucket both sort keys (o_totalprice, o_orderdate-days) into
256 equi-width buckets from broadcast min/max stats; interleave the
two 8-bit bucket ids into a 16-bit Morton code (pure integer
div/mod/multiply — no bit builtins, so the spelling is identical in
Spark and DuckDB); assign each cell to one of 64 files under each
layout (linear: top 6 bits of qx; zorder: top 6 bits of z); then for
each probe window count the files whose min/max box intersects it,
the rows those files hold (what a min-max-pruned scan must read),
and the rows that actually match (what the query wanted).
scan_amplification = scanned/matched is the layout's quality.

The two probes are a 32×32 bucket window (1/64 of the grid) in an
ALIGNED position (Morton-ideal: the window is one contiguous
Z-segment → 1 file) and an UNALIGNED position (the honest case: the
Z-curve fragments across files). Expected shape: linear prunes to
~1/8 of files (perfect on its sort key, blind on the other); zorder
lands 1 file aligned and a handful unaligned, with far lower row
amplification — the multi-dimensional-clustering trade measured.

Registry conventions (plans/registry.py): bucketing is the broadcast
min/max floor-divide idiom (extras22's histogram spelling — identical
IEEE arithmetic both engines, least-capped at the top edge); Morton
and file ids are exact integer arithmetic; all outputs are BIGINT
counts except the final ROUND-6 division of exact integers.

Scale: ONE fact scan → one hash-agg at (qx, qy) cell grain (≤65,536
cells regardless of table size, map-side combinable); every layout /
file / probe statistic derives from that bounded cell table. The
probe tables are broadcast literals. Nothing downstream of the first
aggregation touches fact-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register
from ucl_data_pipeline_spark.sources.io import read_table

_NB = 256  # buckets per dimension (8 bits)
_NFILES = 64  # files per layout (6 bits)
_EPOCH = "1990-01-01"

# Probe windows in bucket coordinates: (name, x_lo, x_hi, y_lo, y_hi),
# both 32×32 = 1/64 of the grid. "aligned" sits on a 32-multiple (one
# contiguous Morton segment); "unaligned" straddles boundaries.
_PROBES = (
    ("aligned_32x32", 96, 127, 96, 127),
    ("unaligned_32x32", 100, 131, 90, 121),
)


def _sql_morton(qx: str, qy: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"(({qx} // {2 ** i}) % 2) * {2 ** (2 * i + 1)}")
        terms.append(f"(({qy} // {2 ** i}) % 2) * {2 ** (2 * i)}")
    return "(" + " + ".join(terms) + ")"


_PROBES_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS probe, {xl} AS x_lo, {xh} AS x_hi,"
    f" {yl} AS y_lo, {yh} AS y_hi"
    for n, xl, xh, yl, yh in _PROBES
)

_ZORDER_ORACLE = f"""
WITH src AS (
  SELECT o_totalprice AS x,
         CAST(datediff('day', DATE '{_EPOCH}', o_orderdate) AS DOUBLE) AS y
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
), stats AS (
  SELECT MIN(x) AS xlo, MAX(x) AS xhi, MIN(y) AS ylo, MAX(y) AS yhi
  FROM src
), cells AS (
  SELECT
    CAST(LEAST(FLOOR((x - xlo) * {_NB} / (xhi - xlo)), {_NB - 1}) AS BIGINT)
      AS qx,
    CAST(LEAST(FLOOR((y - ylo) * {_NB} / (yhi - ylo)), {_NB - 1}) AS BIGINT)
      AS qy,
    COUNT(*) AS n
  FROM src CROSS JOIN stats
  GROUP BY 1, 2
), filed AS (
  SELECT qx, qy, n,
         qx // {_NB // _NFILES} AS file_lin,
         {_sql_morton("qx", "qy")} // {_NB * _NB // _NFILES} AS file_z
  FROM cells
), long AS (
  SELECT 'linear' AS layout, file_lin AS file_id, qx, qy, n FROM filed
  UNION ALL
  SELECT 'zorder' AS layout, file_z AS file_id, qx, qy, n FROM filed
), files AS (
  SELECT layout, file_id,
         MIN(qx) AS fx_lo, MAX(qx) AS fx_hi,
         MIN(qy) AS fy_lo, MAX(qy) AS fy_hi,
         SUM(n) AS rows_in_file
  FROM long GROUP BY layout, file_id
), probes AS ({_PROBES_SQL}
), hit AS (
  SELECT f.layout, p.probe,
         CAST(COUNT(*) AS BIGINT) AS n_files_hit,
         CAST(SUM(f.rows_in_file) AS BIGINT) AS rows_scanned
  FROM files f JOIN probes p
    ON f.fx_lo <= p.x_hi AND f.fx_hi >= p.x_lo
   AND f.fy_lo <= p.y_hi AND f.fy_hi >= p.y_lo
  GROUP BY f.layout, p.probe
), matched AS (
  SELECT p.probe, CAST(SUM(c.n) AS BIGINT) AS rows_matched
  FROM cells c JOIN probes p
    ON c.qx BETWEEN p.x_lo AND p.x_hi
   AND c.qy BETWEEN p.y_lo AND p.y_hi
  GROUP BY p.probe
)
SELECT h.layout, h.probe, h.n_files_hit, h.rows_scanned, m.rows_matched,
       ROUND(CAST(h.rows_scanned AS DOUBLE)
             / NULLIF(CAST(m.rows_matched AS DOUBLE), 0.0), 6)
         AS scan_amplification
FROM hit h JOIN matched m USING (probe)
"""


def _morton_col(qx, qy):
    z = F.lit(0).cast("bigint")
    for i in range(8):
        z = (
            z
            + ((qx / F.lit(2 ** i)).cast("bigint") % 2)
            * F.lit(2 ** (2 * i + 1))
            + ((qy / F.lit(2 ** i)).cast("bigint") % 2) * F.lit(2 ** (2 * i))
        )
    return z


@register(
    "zorder_layout_audit",
    oracle=_ZORDER_ORACLE,
    tags=("layout", "scale", "plan"),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear-sort file-skipping audit over
    (o_totalprice, o_orderdate): per layout × probe window, the files
    a min/max-pruned scan must read, the rows inside them, the rows
    that actually match, and the resulting scan amplification. See
    the module docstring for the method and the expected shape.

    Everything derives from ONE cell-grain aggregate (≤256×256 cells
    for any table size): file boxes, hit counts, and exact matched
    rows — the fact table is scanned once and nothing fact-sized is
    ever shuffled. Morton interleave is spelled as integer
    div/mod/multiply identically in both engines; bucketing is the
    broadcast-min/max floor idiom; the only double op is the final
    ROUND-6 division of exact integer counts.
    """
    o = read_table(spark, sf_dir, "orders")
    src = o.filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    ).select(
        F.col("o_totalprice").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date"))
        .cast("double")
        .alias("y"),
    )
    stats = src.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.min("y").alias("ylo"),
        F.max("y").alias("yhi"),
    )
    qx = F.least(
        F.floor((F.col("x") - F.col("xlo")) * _NB / (F.col("xhi") - F.col("xlo"))),
        F.lit(_NB - 1),
    ).cast("bigint")
    qy = F.least(
        F.floor((F.col("y") - F.col("ylo")) * _NB / (F.col("yhi") - F.col("ylo"))),
        F.lit(_NB - 1),
    ).cast("bigint")
    cells = (
        src.crossJoin(F.broadcast(stats))
        .select(qx.alias("qx"), qy.alias("qy"))
        .groupBy("qx", "qy")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    filed = cells.select(
        "qx",
        "qy",
        "n",
        (F.col("qx") / F.lit(_NB // _NFILES)).cast("bigint").alias("file_lin"),
        (_morton_col(F.col("qx"), F.col("qy")) / F.lit(_NB * _NB // _NFILES))
        .cast("bigint")
        .alias("file_z"),
    )
    long = filed.select(
        F.expr(
            "stack(2, 'linear', file_lin, 'zorder', file_z) "
            "AS (layout, file_id)"
        ),
        "qx",
        "qy",
        "n",
    )
    files = long.groupBy("layout", "file_id").agg(
        F.min("qx").alias("fx_lo"),
        F.max("qx").alias("fx_hi"),
        F.min("qy").alias("fy_lo"),
        F.max("qy").alias("fy_hi"),
        F.sum("n").alias("rows_in_file"),
    )
    probes = None
    for name, xl, xh, yl, yh in _PROBES:
        row = spark.range(1).select(
            F.lit(name).alias("probe"),
            F.lit(xl).cast("bigint").alias("x_lo"),
            F.lit(xh).cast("bigint").alias("x_hi"),
            F.lit(yl).cast("bigint").alias("y_lo"),
            F.lit(yh).cast("bigint").alias("y_hi"),
        )
        probes = row if probes is None else probes.unionByName(row)
    hit = (
        files.join(
            F.broadcast(probes),
            (F.col("fx_lo") <= F.col("x_hi"))
            & (F.col("fx_hi") >= F.col("x_lo"))
            & (F.col("fy_lo") <= F.col("y_hi"))
            & (F.col("fy_hi") >= F.col("y_lo")),
        )
        .groupBy("layout", "probe")
        .agg(
            F.count("*").cast("bigint").alias("n_files_hit"),
            F.sum("rows_in_file").cast("bigint").alias("rows_scanned"),
        )
    )
    matched = (
        cells.join(
            F.broadcast(probes),
            F.col("qx").between(F.col("x_lo"), F.col("x_hi"))
            & F.col("qy").between(F.col("y_lo"), F.col("y_hi")),
        )
        .groupBy("probe")
        .agg(F.sum("n").cast("bigint").alias("rows_matched"))
    )
    return hit.join(F.broadcast(matched), "probe").select(
        "layout",
        "probe",
        "n_files_hit",
        "rows_scanned",
        "rows_matched",
        F.round(
            F.col("rows_scanned").cast("double")
            / F.nullif(F.col("rows_matched").cast("double"), F.lit(0.0)),
            6,
        ).alias("scan_amplification"),
    )
