"""Round-5 inventory depth, eighth batch: recursive-CTE SQL surface,
join-key skew diagnostics, consecutive event-pattern matching,
argmax aggregates, Bayesian-smoothed leaderboards, and session-length
distributions.

Registry conventions apply (plans/registry.py): exact decimal sums,
ROUND 6 on transcendental/division outputs, atomic columns,
BIGINT/DOUBLE/VARCHAR oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.plans.registry import register, sql_davg, sql_dsum
from ucl_data_pipeline_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# Recursive CTE reachability (WITH RECURSIVE surface)
# ---------------------------------------------------------------------------

_REC_DEPTH = 3
_REC_SOURCE = 0

_RECURSIVE_SQL = """
WITH RECURSIVE reach(node, depth) AS (
  SELECT {src} AS node, 0 AS depth
  UNION ALL
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN {edges} e ON e.src = r.node
  WHERE r.depth < {maxd}
)
SELECT node, CAST(MIN(depth) AS INTEGER) AS min_depth
FROM reach GROUP BY node
"""

_RECURSIVE_ORACLE = f"""
WITH edge_base AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
),
result AS (
  {_RECURSIVE_SQL.format(src=_REC_SOURCE, edges="edge_base", maxd=_REC_DEPTH)}
)
SELECT * FROM result
"""


@register(
    "recursive_reachability_sql", oracle=_RECURSIVE_ORACLE, tags=("sql", "graph")
)
def recursive_reachability_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure through the WITH RECURSIVE surface (new in
    Spark 4): minimum hop depth from nation {SRC} over the distinct
    trade edges, depth-bounded at {D}. Same semantics as
    bfs_reach_hops' unrolled Pregel loop, but expressed as the
    STANDARD SQL recursion both engines execute natively — the
    capability row proving hierarchical/graph queries need no manual
    unrolling on this engine anymore. The depth guard bounds the
    UNION ALL frontier (path-counting, not node-counting, so an
    unguarded recursion on a cyclic graph never terminates).

    Scale: the recursive member is a repeated equi-join of the
    frontier against the node-bounded edge relation; for fact-scale
    edge tables the iterative DataFrame loop (graph.py) with persisted
    edges remains the tuned path — this registers the SQL surface and
    pins its semantics against DuckDB's reference implementation.
    """
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .distinct()
    )
    edges.createOrReplaceTempView("rec_trade_edges")
    return spark.sql(
        _RECURSIVE_SQL.format(
            src=_REC_SOURCE, edges="rec_trade_edges", maxd=_REC_DEPTH
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew profile
# ---------------------------------------------------------------------------

_SKEW_TOP = 10

_SKEW_ORACLE = f"""
WITH kc AS (
  SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1
),
tot AS (
  SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM kc
)
SELECT l_partkey, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cnt AS DOUBLE) / total, 6) AS pct_of_rows,
       ROUND(CAST(cnt AS DOUBLE) * n_keys / total, 6) AS skew_factor
FROM kc, tot
ORDER BY cnt DESC, l_partkey
LIMIT {_SKEW_TOP}
"""


@register("skew_key_profile", oracle=_SKEW_ORACLE, tags=("scale", "agg"))
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the {K} heaviest part keys with their
    row share and skew factor (count ÷ mean-per-key) — the planning
    input for every skew mitigation this engine documents (AQE skew
    split, salting, broadcast thresholds). A skew_factor ≫ 1 key is
    the one that turns a shuffle join into a straggler at 100 TB; a
    monitor alerting on this profile catches it before the job does.
    One map-combined hash-agg + a 2-value broadcast total; top-k via
    TakeOrderedAndProject (never a global sort).
    """
    li = read_table(spark, sf_dir, "lineitem")
    kc = li.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    tot = kc.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        kc.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias(
                "pct_of_rows"
            ),
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total"), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(_SKEW_TOP)
    )


# ---------------------------------------------------------------------------
# Consecutive event-pattern match (view → view → purchase)
# ---------------------------------------------------------------------------

_PATTERN_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS e1,
         LEAD(event_type, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM seq
WHERE event_type = 'view' AND e1 = 'view' AND e2 = 'purchase'
GROUP BY user_id
"""


@register("event_pattern_vvp", oracle=_PATTERN_ORACLE, tags=("events", "window"))
def event_pattern_vvp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSECUTIVE event-pattern matching (MATCH_RECOGNIZE-lite): per
    user, occurrences of the strict sequence view → view → purchase
    with NO intervening event — lead(1)/lead(2) over the per-user
    time order turns the pattern into a row predicate. Complements
    funnel_analysis (first-occurrence ordering, gaps allowed): strict
    adjacency is the shape for intent detection and bot fingerprints,
    where what matters is the uninterrupted run. One window shuffle
    keyed by user; the pattern check is scan-side on the windowed
    rows; k-step patterns cost k-1 leads on the SAME window spec (one
    sort).
    """
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "view")
            & (F.col("e2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_matches"))
    )


# ---------------------------------------------------------------------------
# max_by / min_by (argmax) aggregate surface
# ---------------------------------------------------------------------------

# Composite integer ordering key: cents * 10^7 + custkey is strictly
# monotone in (acctbal, custkey) while custkey < 10^7, making the
# argmax UNIQUE — max_by/arg_max tie-breaking is engine-defined, so
# determinism must come from the ordering key, not the engine.
_ARGMAX_ORD = "CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey"

_ARGMAX_ORACLE = f"""
SELECT c_nationkey,
       arg_max(c_name, {_ARGMAX_ORD}) AS richest_customer,
       arg_min(c_name, {_ARGMAX_ORD}) AS poorest_customer,
       MAX(c_acctbal) AS max_bal,
       MIN(c_acctbal) AS min_bal
FROM customer GROUP BY c_nationkey
"""


@register("argmax_surface", oracle=_ARGMAX_ORACLE, tags=("agg",))
def argmax_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) aggregate surface: per nation,
    WHICH customer holds the extreme balance — the "value at the
    extremum" aggregate that otherwise costs a window-rank pass or a
    self-join back to the max. One hash-agg, map-side combinable.
    Both engines leave argmax ties engine-defined, so the ordering
    key is a composite integer (cents·10⁷ + custkey, strictly monotone
    in (balance, key)) that makes the winner unique by construction.
    """
    c = read_table(spark, sf_dir, "customer")
    ordk = (
        F.round(F.col("c_acctbal") * 100).cast("bigint") * F.lit(10000000)
        + F.col("c_custkey")
    )
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", ordk).alias("richest_customer"),
        F.min_by("c_name", ordk).alias("poorest_customer"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )


# ---------------------------------------------------------------------------
# Bayesian-smoothed (IMDB-style) brand price leaderboard
# ---------------------------------------------------------------------------

_BAYES_M = 25

_BAYES_ORACLE = f"""
WITH prior AS (
  SELECT {sql_davg("p_retailprice")} AS c FROM part
),
per_brand AS (
  SELECT p_brand, COUNT(*) AS n,
         {sql_dsum("p_retailprice")} AS s
  FROM part GROUP BY p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
       ROUND(s / n, 6) AS raw_mean,
       ROUND((s + {_BAYES_M} * prior.c) / (n + {_BAYES_M}), 6)
         AS smoothed_mean
FROM per_brand, prior
"""


@register("bayesian_smoothed_rating", oracle=_BAYES_ORACLE, tags=("agg", "stats"))
def bayesian_smoothed_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian-smoothed group means (the IMDB top-250 formula):
    per-brand average retail price shrunk toward the global prior by
    pseudo-count m={M} — the leaderboard correction that stops a
    2-item group from topping the chart. smoothed = (Σx + m·prior) /
    (n + m), algebraically identical to the weighted form but
    computed from the exact-decimal sufficient statistics (sums and
    counts), so both engines evaluate identical doubles; divisions
    ROUND 6. One hash-agg pass + a 1-row broadcast prior.
    """
    p = read_table(spark, sf_dir, "part")
    dec = F.col("p_retailprice").cast("decimal(18,6)")
    prior = p.agg(
        (F.sum(dec).cast("double") / F.count("p_retailprice")).alias("c")
    )
    per_brand = p.groupBy("p_brand").agg(
        F.count("*").alias("n"), F.sum(dec).cast("double").alias("s")
    )
    return per_brand.crossJoin(F.broadcast(prior)).select(
        "p_brand",
        F.col("n").alias("n_parts"),
        F.round(F.col("s") / F.col("n"), 6).alias("raw_mean"),
        F.round(
            (F.col("s") + F.lit(_BAYES_M) * F.col("c"))
            / (F.col("n") + F.lit(_BAYES_M)),
            6,
        ).alias("smoothed_mean"),
    )


# ---------------------------------------------------------------------------
# Session-length histogram (gaps-and-islands sessionization rollup)
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSION_HIST_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL {_SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
lens AS (
  SELECT user_id, session_id, COUNT(*) AS len
  FROM sess GROUP BY user_id, session_id
)
SELECT CAST(LEAST(len, 10) AS INTEGER) AS session_len_capped,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM lens GROUP BY 1
"""


@register(
    "session_length_histogram", oracle=_SESSION_HIST_ORACLE, tags=("events", "window")
)
def session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution: gaps-and-islands sessionization
    ({G}-minute inactivity cut) rolled up to a capped histogram of
    events-per-session — the engagement-depth curve (and the
    downstream of sessionize_gaps_islands, which emits the sessions
    themselves). The session id is a running SUM of start markers
    over the SAME per-user shuffle the lag marker used — one exchange
    powers both windows; the two rollups after it are hash-aggs on
    collapsing grains (sessions, then lengths).
    """
    from ucl_data_pipeline_spark.functions.scalar import epoch_us

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_s = (epoch_us("ts") - epoch_us(prev_ts)) / F.lit(1_000_000)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_ts.isNull() | (gap_s > _SESSION_GAP_MIN * 60), 1
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id", F.sum("is_start").over(w_run).alias("session_id")
    )
    lens = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("len"))
    return lens.groupBy(
        F.least(F.col("len"), F.lit(10)).cast("int").alias("session_len_capped")
    ).agg(F.count("*").alias("n_sessions"))
