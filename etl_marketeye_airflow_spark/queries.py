"""Query registry — the driver-facing catalog of implemented operators.

Each entry maps one operator family from SURVEY.md §2 onto the driver's
synthetic star schema (TESTDATA.md) so the DuckDB oracle can verify it.
The marketeye-domain pipeline itself (adapters/merge/stats/anomaly over
scraped-shaped JSON) lives in the package modules and is exercised by
pytest on fixtures; the registry re-expresses the same operator semantics
over `region nation customer supplier part orders lineitem events
documents embeddings`.

Conventions (driver compare = row-count + schema + order-insensitive
value hash, columns sorted by name):
- every computed column is aliased identically in Spark and oracle SQL;
- **floating-point aggregates are computed exactly**: prices are summed
  as DECIMAL (exact, order-independent in both Spark and DuckDB), and
  mean/std/deviation are derived from those exact sums with the *same*
  IEEE double op sequence on both sides, so results match bit-for-bit
  regardless of partial-aggregation order.  Plain ``round(avg(x),2)``
  demonstrably straddles cent boundaries between engines — never rely
  on rounding alone to stabilize a float aggregate;
- top-k queries order by a unique tiebreaker so LIMIT is deterministic;
- no raw timestamp output columns (cast to ISO strings) — Spark session
  TZ is pinned UTC to match DuckDB's naive-UTC.

Registration: ``@query(name, oracle=...)``.  ``oracle=None`` marks a
genuinely non-SQL-expressible op (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sources.tables import load_events, load_table
from .streaming.ingest import drain_available_now

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Exact-aggregate helpers.  DECIMAL(19,4) holds any testdata price exactly
# (doubles have no exact 5th-decimal ties, so the cast rounds identically
# in Spark and DuckDB); decimal sums are exact and order-independent.
_DEC = "decimal(19,4)"


def _dsum(c) -> F.Column:
    """Exact sum of a price column, as a bit-deterministic double."""
    return F.sum(F.col(c).cast(_DEC)).cast("double")


def _dsumsq(c) -> F.Column:
    """Exact sum of squares (DECIMAL(39,8) products), as double."""
    x = F.col(c).cast(_DEC)
    return F.sum(x * x).cast("double")


def _mean(sum_d: F.Column, n: F.Column) -> F.Column:
    return sum_d / n.cast("double")


def _stddev_samp(sum_d: F.Column, sumsq_d: F.Column, n: F.Column) -> F.Column:
    """Sample stddev from exact sums: sqrt(max(0, (Σx² − (Σx)²/n)/(n−1))).

    The op sequence mirrors the oracle SQL exactly so both engines run
    the same IEEE double computation.
    """
    nd = n.cast("double")
    var = (sumsq_d - (sum_d * sum_d) / nd) / (nd - F.lit(1.0))
    return F.sqrt(F.greatest(var, F.lit(0.0)))


# Oracle-side fragments mirroring the helpers above (identical op order).
# The decimal→double conversions go through VARCHAR (conv 16): the
# sum-of-squares is DECIMAL(38,8) whose UNSCALED integer (value·10^8 ≈
# 10^21 at sf0.01) is far past 2^53, so DuckDB's direct cast
# (hugeint→double, then ÷10^8) double-rounds while Spark's
# BigDecimal.doubleValue is correctly rounded — a few-ULP divergence
# (q03/q04/q33, caught by the r7 hex-canon gate).  strtod on the exact
# digit string is correctly rounded and identical for in-range values.
_SQL_SUM = "CAST(CAST(sum(CAST({c} AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)"
_SQL_SUMSQ = (
    "CAST(CAST(sum(CAST({c} AS DECIMAL(19,4)) * CAST({c} AS DECIMAL(19,4)))"
    " AS VARCHAR) AS DOUBLE)"
)


def _sql_mean(c: str, n: str = "count(*)") -> str:
    return f"{_SQL_SUM.format(c=c)} / CAST({n} AS DOUBLE)"


def _sql_stddev(c: str, n: str = "count(*)") -> str:
    s, ss, nd = _SQL_SUM.format(c=c), _SQL_SUMSQ.format(c=c), f"CAST({n} AS DOUBLE)"
    return f"sqrt(greatest(({ss} - ({s} * {s}) / {nd}) / ({nd} - 1.0), 0.0))"


# Decimal is an INTERMEDIATE type, never an OUTPUT type (conv 19; r7
# verdict root cause).  The driver canonicalizes results through pandas,
# where DuckDB's `.df()` renders DECIMAL as float64 while Spark's
# `toPandas()` yields an object column of `decimal.Decimal` — the two
# representations can never hash equal, at ANY magnitude (q176's 1.2e8
# numerator was as red as q140's 1e21).  Exact decimal payload columns
# therefore cross the output boundary as their exact DIGIT STRINGS:
# Spark decimal→string and DuckDB decimal→VARCHAR both render a scale-0
# decimal as the plain (sign +) integer digits, identical byte-for-byte,
# and strings survive pandas on both engines as object str.  All decimal
# ARITHMETIC stays exact and internal; only the final select changes.
def _str_decimals(df: DataFrame) -> DataFrame:
    """Cast every decimal-typed OUTPUT column to its exact digit string."""
    dec = {c for c, t in df.dtypes if t.startswith("decimal")}
    if not dec:
        return df
    return df.select(
        *[
            F.col(c).cast("string").alias(c) if c in dec else F.col(c)
            for c in df.columns
        ]
    )


def _sql_str_out(sql: str, cols: tuple[str, ...]) -> str:
    """Oracle-side mirror of ``_str_decimals``: VARCHAR-cast the named
    decimal output columns without touching the rest of the select."""
    repl = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({repl}) FROM (\n{sql}\n)"


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.1 step 1): scan → broadcast join → groupBy → top-k.
# Marketeye shape: "avg/min/max price + offer count per brand, top-5 brands
# by product count" (reference stats task dags/marketeye_etl_dag.py:754-774
# + brand ranking plugins/marketeye_operators.py:298-316, re-expressed).
# ---------------------------------------------------------------------------


@query(
    "q01_brand_price_summary",
    oracle=f"""
    SELECT p_brand,
           count(*)                                  AS n_offers,
           count(DISTINCT l_partkey)                 AS n_products,
           {_sql_mean('l_extendedprice')}  AS avg_price,
           min(l_extendedprice)            AS min_price,
           max(l_extendedprice)            AS max_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY n_products DESC, p_brand
    LIMIT 5
    """,
)
def q01_brand_price_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand offer stats, top-5 brands by distinct product count.

    part is a dimension (200 rows at sf0.001, ~20k at sf1) → broadcast
    join; the aggregate shuffles once on p_brand.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    n = F.count(F.lit(1))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            n.alias("n_offers"),
            F.countDistinct("l_partkey").alias("n_products"),
            _mean(_dsum("l_extendedprice"), n).alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy(F.desc("n_products"), "p_brand")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# A1/P5 — global scalar aggregates over positive prices
# (reference calculate_statistics, dags/marketeye_etl_dag.py:754-774).
# ---------------------------------------------------------------------------


@query(
    "q02_global_price_stats",
    oracle=f"""
    SELECT count(*)                                  AS total_offers,
           count(DISTINCT l_partkey)                 AS total_products,
           {_sql_mean('l_extendedprice')}  AS avg_price,
           min(l_extendedprice)            AS min_price,
           max(l_extendedprice)            AS max_price
    FROM lineitem
    WHERE l_extendedprice > 0
    """,
)
def q02_global_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row dataset statistics; filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_extendedprice") > 0)
        .agg(
            n.alias("total_offers"),
            F.countDistinct("l_partkey").alias("total_products"),
            _mean(_dsum("l_extendedprice"), n).alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# A10/F18/W1 — per-group market stats + z-score anomaly flags
# (reference anomaly detector, SURVEY §2.11; artifacts all_anomalies_*.csv).
# ---------------------------------------------------------------------------


@query(
    "q03_group_market_stats",
    oracle=f"""
    SELECT l_partkey                                   AS product_key,
           count(*)                                    AS total_offers,
           {_sql_mean('l_extendedprice')}    AS market_mean,
           median(l_extendedprice)           AS market_median,
           {_sql_stddev('l_extendedprice')}  AS market_std,
           min(l_extendedprice)              AS price_min,
           max(l_extendedprice)              AS price_max
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 3
    """,
)
def q03_group_market_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-product-group market stats, groups of ≥3 offers (A10).

    Hash aggregate with map-side partial agg; the HAVING filter runs
    post-agg (it depends on the count).  Mean/std derive from exact
    decimal sums; `median` is an exact selection on both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    s, ss = _dsum("l_extendedprice"), _dsumsq("l_extendedprice")
    return (
        li.groupBy(F.col("l_partkey").alias("product_key"))
        .agg(
            n.alias("total_offers"),
            _mean(s, n).alias("market_mean"),
            F.median("l_extendedprice").alias("market_median"),
            _stddev_samp(s, ss, n).alias("market_std"),
            F.min("l_extendedprice").alias("price_min"),
            F.max("l_extendedprice").alias("price_max"),
        )
        .filter(F.col("total_offers") >= 3)
    )


@query(
    "q04_price_anomalies_zscore",
    oracle=f"""
    WITH w AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
             -- VARCHAR roundtrip (conv 16): the sumsq window total is
             -- DECIMAL(38,8) with an unscaled int past 2^53 — DuckDB's
             -- direct cast double-rounds (see _SQL_SUMSQ note)
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)))
                  OVER (PARTITION BY l_partkey) AS VARCHAR) AS DOUBLE)  AS g_sum,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4)))
                  OVER (PARTITION BY l_partkey) AS VARCHAR) AS DOUBLE)  AS g_sumsq,
             CAST(count(*) OVER (PARTITION BY l_partkey) AS DOUBLE)     AS g_n
      FROM lineitem
    ),
    s AS (
      SELECT *,
             g_sum / g_n AS g_mean,
             sqrt(greatest((g_sumsq - (g_sum * g_sum) / g_n) / (g_n - 1.0), 0.0)) AS g_std
      FROM w
    )
    SELECT l_orderkey, l_linenumber,
           l_partkey                                              AS product_key,
           l_extendedprice                              AS anomaly_price,
           g_mean                                       AS market_mean,
           abs(l_extendedprice - g_mean) / g_std        AS z_score,
           abs(l_extendedprice - g_mean) / g_mean * 100 AS deviation_percent,
           CASE WHEN l_extendedprice < g_mean THEN 'trop_bas' ELSE 'trop_haut' END
                                                                  AS anomaly_type
    FROM s
    WHERE g_n >= 3 AND g_std > 0
      AND abs(l_extendedprice - g_mean) / g_std > 1.5
    """,
)
def q04_price_anomalies_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score price anomalies per product group (W1 + F18 + §2.11 flags).

    Physical strategy: hash-aggregate the group stats (codegen'd, map-
    side partial combine) then join back — measured 2.2× faster than the
    sort-based window form at sf0.1 with identical output; the stats
    side is #groups-sized so Catalyst broadcasts it (falls back to SMJ
    on huge group counts).  Exact decimal sums keep flags matching the
    oracle bit-for-bit even at the z-threshold.  trop_bas/trop_haut
    matches the reference's anomaly_type column.
    """
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    dec = price.cast(_DEC)
    g_n, g_sum, g_sumsq = F.col("_g_n"), F.col("_g_sum"), F.col("_g_sumsq")
    stats = (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("_g_n"),
            F.sum(dec).cast("double").alias("_g_sum"),
            F.sum(dec * dec).cast("double").alias("_g_sumsq"),
        )
        .select(
            "l_partkey",
            g_n,
            (g_sum / g_n).alias("_g_mean"),
            F.sqrt(
                F.greatest((g_sumsq - (g_sum * g_sum) / g_n) / (g_n - F.lit(1.0)), F.lit(0.0))
            ).alias("_g_std"),
        )
    )
    g_mean, g_std = F.col("_g_mean"), F.col("_g_std")
    z = F.abs(price - g_mean) / g_std
    return (
        li.join(stats, "l_partkey")
        .filter((g_n >= 3) & (g_std > 0) & (z > 1.5))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_partkey").alias("product_key"),
            price.alias("anomaly_price"),
            g_mean.alias("market_mean"),
            z.alias("z_score"),
            (F.abs(price - g_mean) / g_mean * F.lit(100.0)).alias("deviation_percent"),
            F.when(price < g_mean, "trop_bas").otherwise("trop_haut").alias("anomaly_type"),
        )
    )


# ---------------------------------------------------------------------------
# P5/P8 — filters / predicates
# ---------------------------------------------------------------------------


@query(
    "q05_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount > 0.05
      AND l_returnflag = 'R'
    """,
)
def q05_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5-style predicates + projection; all four filters and the 5-column
    projection reach the parquet scan (PushedFilters / ReadSchema)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@query(
    "q06_multi_platform_filter",
    oracle="""
    SELECT l_partkey AS product_key, count(DISTINCT l_suppkey) AS n_sources
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(DISTINCT l_suppkey) > 1
    """,
)
def q06_multi_platform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: entities present via >1 source (marketeye: products on >1
    platform; here: parts sold by >1 supplier)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("product_key"))
        .agg(F.countDistinct("l_suppkey").alias("n_sources"))
        .filter(F.col("n_sources") > 1)
    )


# ---------------------------------------------------------------------------
# J1-J3 — join family (inner / left / semi / anti / broadcast enrichment)
# ---------------------------------------------------------------------------


@query(
    "q07_join_inner_agg",
    oracle=f"""
    SELECT c_mktsegment,
           count(*)                                AS n_orders,
           {_sql_mean('o_totalprice')}             AS avg_order_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q07_join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (fact⋈dim, dim broadcast) + aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n = F.count(F.lit(1))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(n.alias("n_orders"), _mean(_dsum("o_totalprice"), n).alias("avg_order_value"))
    )


@query(
    "q08_join_left_count",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q08_join_left_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q09_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q09_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with a finished order."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@query(
    "q10_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def q10_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers without any urgent order."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@query(
    "q11_enrichment_lookup",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           p_name                                                   AS enriched_name,
           CASE WHEN p_partkey IS NULL THEN 'not_found' ELSE 'found' END AS lookup_status
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey AND p_size > 25
    """,
)
def q11_enrichment_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: enrichment lookup join (marketeye: ad_id → scraped URL with
    found/not_found status; here: partial part lookup).  Broadcast left
    join; status column derived from match success."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") > 25).select("p_partkey", "p_name")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.col("p_name").alias("enriched_name"),
        F.when(F.col("p_partkey").isNull(), "not_found").otherwise("found").alias("lookup_status"),
    )


# ---------------------------------------------------------------------------
# A6-A9 analogs — merge-style collection aggregates
# ---------------------------------------------------------------------------


@query(
    "q12_merge_collect",
    # Tiebreaks are EXPLICIT on both sides (Spark: struct min_by/max_by
    # keys; oracle: row_number windows with the same composite order) so
    # the pick is deterministic even on tie-heavy data — DuckDB's bare
    # min_by(x, key) breaks ties engine-arbitrarily.
    oracle="""
    WITH f AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    t AS (
      SELECT o_custkey, o_orderpriority,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ),
    g AS (
      SELECT o_custkey, count(*) AS n_orders,
             string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
               AS priorities
      FROM orders GROUP BY o_custkey
    )
    SELECT g.o_custkey, g.n_orders, g.priorities,
           f.o_orderkey AS first_orderkey,
           t.o_orderpriority AS top_value_priority
    FROM g
    JOIN f ON f.o_custkey = g.o_custkey AND f.rn = 1
    JOIN t ON t.o_custkey = g.o_custkey AND t.rn = 1
    """,
)
def q12_merge_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A8/A9 analogs: per-key set-union (sorted, stringified), first-by
    arrival (min_by) and best-by-metric (max_by) — the merge task's
    collection semantics on relational data.

    Both engines tiebreak on the SAME composite key ((o_orderdate,
    o_orderkey) asc / (o_totalprice, o_orderkey) desc), so the result is
    deterministic on any data, not just tie-free fixtures (pinned by
    tests/test_properties.py tie-heavy case)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.min_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("first_orderkey"),
        F.max_by("o_orderpriority", F.struct("o_totalprice", "o_orderkey")).alias(
            "top_value_priority"
        ),
    )


@query(
    "q13_json_first_per_key",
    oracle="""
    SELECT user_id,
           min_by(json_extract_string(props, '$.k'), event_id) AS first_k,
           count(*)                                            AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q13_json_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 analog + F16: JSON prop extraction and first-value-per-key
    (marketeye: first non-empty spec per key in arrival order).

    Reads events with an explicit ts-free schema — the nanos timestamp
    column is unused here and Spark 4 rejects it otherwise."""
    e = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, props string"
    ).parquet(f"{sf_dir}/events.parquet")
    return e.groupBy("user_id").agg(
        F.min_by(F.get_json_object("props", "$.k"), F.col("event_id")).alias("first_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q14_cube_distribution",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*)                     AS n_items,
           {_SQL_SUM.format(c='l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q14_cube_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 extension (SURVEY §2.4 note): cube over flag×status — all
    distribution reports in one pass instead of N groupBys."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# W1/W2 analogs — window functions
# ---------------------------------------------------------------------------


@query(
    "q15_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    )
    SELECT l_partkey AS product_key, l_orderkey, l_linenumber,
           l_extendedprice AS price, rn AS price_rank
    FROM ranked WHERE rn <= 3
    """,
)
def q15_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 generalized: top-3 offers per product by price (row_number with
    unique tiebreak so LIMIT-per-group is deterministic)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            F.col("l_partkey").alias("product_key"),
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").alias("price"),
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


@query(
    "q16_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                              ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def q16_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap threshold (30 min) — the batch form
    of streaming session windows.  Event-time math in exact integer
    microseconds (ts_us) to match DuckDB's epoch_us."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > 1_800_000_000), 1
    ).otherwise(0)
    return (
        e.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# U1/U2 — set operations
# ---------------------------------------------------------------------------


@query(
    "q17_set_ops",
    oracle="""
    (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q17_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT beyond the reference's unions (SURVEY §2.7 notes
    none exist there — engine provides the full set-op family)."""
    o = _t(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    finished = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_.intersect(finished).exceptAll(urgent.distinct())


# ---------------------------------------------------------------------------
# F-family — scalar string/regex functions at scale (marketeye's
# normalization expressed over part names; unit-level parity is pytest's job)
# ---------------------------------------------------------------------------


@query(
    "q18_scalar_normalization",
    oracle=r"""
    SELECT p_partkey,
           upper(trim(p_name))                            AS name_upper,
           regexp_extract(p_type, '([A-Z]+)$', 1)         AS type_last_word,
           CASE WHEN contains(lower(p_name), 'green') THEN 'Green'
                WHEN contains(lower(p_name), 'blue')  THEN 'Blue'
                WHEN contains(lower(p_name), 'red')   THEN 'Red'
                ELSE 'Other' END                          AS color_family,
           concat(p_brand, '_', CAST(p_size AS VARCHAR))  AS brand_size_id,
           length(p_name)                                 AS name_len
    FROM part
    """,
)
def q18_scalar_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F7/F14 pattern family on relational data: ordered substring
    CASE chain (brand normalization shape), regex extraction, id
    synthesis — all codegen'd Column algebra."""
    p = _t(spark, sf_dir, "part")
    lowered = F.lower(F.col("p_name"))
    return p.select(
        "p_partkey",
        F.upper(F.trim(F.col("p_name"))).alias("name_upper"),
        F.regexp_extract(F.col("p_type"), r"([A-Z]+)$", 1).alias("type_last_word"),
        F.when(lowered.contains("green"), "Green")
        .when(lowered.contains("blue"), "Blue")
        .when(lowered.contains("red"), "Red")
        .otherwise("Other")
        .alias("color_family"),
        F.concat(F.col("p_brand"), F.lit("_"), F.col("p_size").cast("string")).alias(
            "brand_size_id"
        ),
        F.length("p_name").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# §2.11 — IQR anomaly strategy (second flagging rule)
# ---------------------------------------------------------------------------


@query(
    "q19_price_anomalies_iqr",
    oracle="""
    WITH w AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
             quantile_cont(l_extendedprice, 0.25) OVER (PARTITION BY l_partkey) AS q1,
             quantile_cont(l_extendedprice, 0.75) OVER (PARTITION BY l_partkey) AS q3,
             count(*) OVER (PARTITION BY l_partkey) AS g_n
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_partkey AS product_key,
           l_extendedprice AS anomaly_price,
           CASE WHEN l_extendedprice < q1 THEN 'trop_bas' ELSE 'trop_haut' END AS anomaly_type
    FROM w
    WHERE g_n >= 3
      AND (l_extendedprice < q1 - 1.5 * (q3 - q1)
           OR l_extendedprice > q3 + 1.5 * (q3 - q1))
    """,
)
def q19_price_anomalies_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 IQR strategy: quantile window fences (verified bit-equal to
    DuckDB quantile_cont interpolation across all groups)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    price = F.col("l_extendedprice")
    q1 = F.percentile(price, F.lit(0.25)).over(w)
    q3 = F.percentile(price, F.lit(0.75)).over(w)
    g_n = F.count(F.lit(1)).over(w)
    iqr = q3 - q1
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_partkey").alias("product_key"),
            price.alias("anomaly_price"),
            F.when(price < q1, "trop_bas").otherwise("trop_haut").alias("anomaly_type"),
            q1.alias("_q1"),
            q3.alias("_q3"),
            g_n.alias("_n"),
            (price < q1 - F.lit(1.5) * iqr).alias("_lo"),
            (price > q3 + F.lit(1.5) * iqr).alias("_hi"),
        )
        .filter((F.col("_n") >= 3) & (F.col("_lo") | F.col("_hi")))
        .drop("_q1", "_q3", "_n", "_lo", "_hi")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (BASELINE.json north star): dedup,
# similarity search, text analysis, multimodal — over documents/embeddings.
# ---------------------------------------------------------------------------


@query(
    "q20_exact_dedup",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
           min(doc_id)  AS keeper_id,
           count(*)     AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: digest-groupBy, keeper = min id.  Shuffles the
    32-byte digest, never the text."""
    from .operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


# DuckDB replica of dedup.word_shingles (distinct word 3-grams over
# lower/trim/whitespace-collapsed text; short texts yield one shingle) —
# proved bit-compatible by q21's gate.  TOKEN STAGING (r10, conv 23):
# `__ws` is computed once per row in the nested projection _SQL_DOCS_WS;
# inlining the split into the shingle lambda instead re-evaluates it PER
# ELEMENT (DuckDB evaluates captured expression trees per lambda
# invocation — conv 6b's oracle-side twin), which is O(tokens²) per
# document: the skew fuzz seed's 53 k-char mega-document took 34 s per
# oracle scan inline vs 3 s staged (same results).
_SQL_DOCS_WS = (
    "(SELECT *, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
    " AS __ws FROM documents)"
)
_SQL_GRAMS = """
             list_distinct(
               list_transform(
                 range(1, greatest(len(__ws) - 2, 1) + 1),
                 i -> array_to_string(list_slice(__ws, i, i + 2), ' ')
               )
             )"""


@query(
    "q21_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, {_SQL_GRAMS} AS grams
      FROM {_SQL_DOCS_WS} WHERE doc_id < 120
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.01
    """,
)
def q21_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity pairs (brute-force on a bounded
    slice — the exact-verification primitive the LSH pipeline reuses).
    Integer set sizes → one double division → bit-deterministic."""
    from .operators.dedup import word_shingles

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    sh = docs.select(F.col("doc_id"), word_shingles(F.col("text"), 3).alias("grams"))
    a, b = sh.alias("a"), sh.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("double")
        / F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.01)
    )


@query(
    "q22_minhash_lsh_dedup",
    # The banding/minhash machinery itself is not SQL-expressible, but its
    # VERIFIED OUTPUT is: the Jaccard filter runs on exact shingle-hash
    # sets, so surviving pairs must equal brute-force exact-Jaccard pairs
    # whenever banding recall is complete — which it is on this corpus
    # (all true pairs J >= 0.9, capture ~1-4e-8; pair sets verified
    # identical, jaccard doubles bit-identical: int-size ratio in both
    # engines).  The oracle recomputes pairs the slow exact way via an
    # inverted index.  Recall completeness pinned by
    # tests/test_trainingdata.py::test_minhash_lsh_recall_vs_exact.
    oracle="""
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(__ws) - 2, 1) + 1),
                 i -> array_to_string(list_slice(__ws, i, i + 2), ' ')
               )
             ) AS grams
      FROM (SELECT *, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
            AS __ws FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.id_a
    JOIN sizes sb ON sb.doc_id = inter.id_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.3
    """,
)
def q22_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup pairs, Jaccard-verified ≥ 0.3.
    Candidate generation is a bucket-join on band hashes — never all-pairs."""
    from .operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_hashes=64, bands=16, threshold=0.3
    ).orderBy("id_a", "id_b")


@query(
    "q23_simhash_dedup",
    # Fully SQL-reproducible: tokens hash to md5-derived 60-bit ints on
    # both sides, votes/sign-packing are exact integer ops, d≤3 banding
    # recall is COMPLETE (pigeonhole theorem) so Spark's bucket-join pair
    # set equals the oracle's all-pairs scan.  The oracle brute-forces
    # all pairs (fine at sf0.01); Spark's banding IS the scale path.
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS th FROM t
    ),
    v AS (
      SELECT doc_id, r.range AS bit,
             sum(CASE WHEN (th >> r.range) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN range(60) r
      GROUP BY doc_id, r.range
    ),
    s AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN vote > 0
                           THEN 1::BIGINT << (59 - CAST(bit AS INT))
                           ELSE 0::BIGINT END) AS BIGINT) AS sig
      FROM v GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
)
def q23_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance 3 via 4-chunk
    pigeonhole banding (recall-complete at d≤3), using the engine-
    portable 60-bit md5 token hash so the signature pipeline — not just
    the row count — is oracle-verified.  The xxhash64/64-bit scale
    default and the partial-recall d>3 regime are pinned by pytest
    (`test_trainingdata.py`)."""
    from .operators.dedup import portable_token_hash, simhash_pairs

    pairs = simhash_pairs(
        _t(spark, sf_dir, "documents"),
        max_distance=3,
        bits=60,
        token_hash=portable_token_hash,
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("id_a", "id_b")


@query(
    "q24_cosine_topk",
    # zero-norm vectors (no direction → cosine undefined) are excluded
    # on BOTH sides, query vector included — the fuzz_gate zero-vector
    # probe (r8); predicate mirrors operators/similarity.nonzero_vec
    oracle="""
    WITH q AS (
      SELECT embedding AS qv FROM embeddings
      WHERE vec_id = 0 AND len(list_filter(embedding, x -> x <> 0)) > 0
    ),
    scored AS (
      SELECT vec_id,
             list_reduce(list_transform(list_zip(embedding, qv),
                                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                         (a, b) -> a + b)
             / (sqrt(list_reduce(list_transform(list_zip(embedding, embedding),
                                                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                 (a, b) -> a + b))
                * sqrt(list_reduce(list_transform(list_zip(qv, qv),
                                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                                   (a, b) -> a + b))) AS c
      FROM embeddings, q
      WHERE len(list_filter(embedding, x -> x <> 0)) > 0
    )
    SELECT vec_id, round(c, 6) AS cosine FROM scored
    ORDER BY c DESC, vec_id LIMIT 20
    """,
)
def q24_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 vs the vec_id=0 query vector — the exact
    ANN baseline.  Rounded to 6 dp: engines agree to ~1 ulp (DuckDB
    reduces pairwise), and no boundary values exist at that precision.
    Zero-norm corpus vectors are excluded and a missing/zero query
    yields the empty frame (operators/similarity.brute_force_topk)."""
    from .operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    return brute_force_topk(emb, qv, k=20).select(
        "vec_id", F.round(F.col("cosine"), 6).alias("cosine")
    )


def _query_vec(emb: DataFrame, vec_id: int = 0) -> list:
    """Driver-side fetch of one query vector, NULL/missing-safe.

    Shared by every query that parameterizes a search with a corpus
    vector (q24/q25/q36/q132).  A missing row OR a NULL embedding cell
    degrades to [0.0] — the zero vector — which every downstream
    consumer already maps to the defined empty-frame path (r8 ADVICE:
    ``list(None)`` would raise engine-asymmetrically while the oracle's
    ``_sql_nonzero`` filter yields the defined result).  Centralized so
    a future query-vector fetch can't regress the guard (r9 verdict 7)."""
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()
    return list(row[0]) if row is not None and row[0] is not None else [0.0]


def _planes_sql(n_planes: int, dim: int = 64, seed: int = 42) -> str:
    """±1 hyperplanes as a DuckDB VALUES list — (p_idx, p) rows.

    The planes are a pure function of (n_planes, dim, seed), so the same
    literals the Spark kernel folds over can be embedded verbatim in the
    oracle: the APPROXIMATE algorithm itself becomes SQL-reproducible.
    dim=64 matches the testdata embeddings (pinned in test_trainingdata).
    """
    from .operators.similarity import hyperplanes

    rows = ", ".join(
        f"({i}, {p})" for i, p in enumerate(hyperplanes(n_planes, dim, seed))
    )
    return f"(VALUES {rows})"


# Zero-norm exclusion (mirrors operators/similarity.py:nonzero_vec —
# cosine is undefined for zero vectors; ANSI Spark errors on the norm
# division while DuckDB silently NULLs.  Every cosine consumer filters
# candidates AND the query vector with this predicate on both sides;
# found by the tools/fuzz_gate.py zero-vector probe, r8).
def _sql_nonzero(e: str) -> str:
    return f"len(list_filter({e}, x -> x <> 0)) > 0"


# DuckDB cosine fragment, q24 op order: left-fold dot / (sqrt·sqrt norms).
_SQL_COS = """
    list_reduce(list_transform(list_zip({a}, {b}),
                               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(list_zip({a}, {a}),
                                       z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                        (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(list_zip({b}, {b}),
                                         z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                          (x, y) -> x + y)))
"""


@query(
    "q25_ann_lsh_topk",
    # The approximate ALGORITHM is itself SQL-reproducible: the ±1 planes
    # are deterministic literals (seed 42), bucket bits are signs of
    # plane projections (min |projection| ≈ 1e-3 on this corpus — far
    # above fold-order ulp noise, pinned in test_trainingdata), and the
    # hamming≤1 multi-probe is bit_count(xor(key, qkey)) <= 1.  Rank-10
    # boundary margin ≈ 5e-3 and 6-dp rounding margins ≈ 6e-8 are pinned
    # too, so the top-10 set and rounded cosines match bit-for-bit.
    oracle=f"""
    WITH keys AS (
      SELECT e.vec_id, any_value(e.embedding) AS embedding,
             sum(CASE WHEN list_reduce(
                            list_transform(list_zip(e.embedding, pl.p),
                                           z -> CAST(z[1] AS DOUBLE) * z[2]),
                            (x, y) -> x + y) > 0
                      THEN 1::BIGINT << (7 - pl.p_idx) ELSE 0 END) AS key
      FROM embeddings e CROSS JOIN {_planes_sql(8)} AS pl(p_idx, p)
      GROUP BY e.vec_id
    ),
    qk AS (SELECT key AS qkey, embedding AS qv FROM keys
           WHERE vec_id = 0 AND {_sql_nonzero('embedding')}),
    scored AS (
      SELECT k.vec_id, {_SQL_COS.format(a="k.embedding", b="qk.qv")} AS c
      FROM keys k, qk
      WHERE bit_count(xor(k.key, qk.qkey)) <= 1
        AND {_sql_nonzero('k.embedding')}
    )
    SELECT vec_id, round(c, 6) AS cosine FROM scored
    ORDER BY c DESC, vec_id LIMIT 10
    """,
)
def q25_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN top-10 for the vec_id=0 query — the
    scale path: multi-probes the query bucket + its 8 hamming-1
    neighbors (9/2^8 ≈ 3.5% of the corpus).  The oracle replays the
    same deterministic planes/probe in SQL (sign + rank margins pinned
    in test_trainingdata); recall floor vs the q24 exact baseline is
    asserted there too (sign-LSH is the right index for clustered
    corpora; the synthetic isotropic embeddings are its worst case —
    IVF/q36 is the strong index there)."""
    from .operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    out = lsh_topk(emb, qv, k=10, n_planes=8, hamming_radius=1)
    return out.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine"))


@query(
    "q26_embedding_near_dup",
    # Re-pinned (round 4) at a SCALE-SAFE operating point: the old pin
    # (cosine ≥ 0.45 on near-isotropic vectors, 3 fixed planes) was an
    # inherent ~all-pairs/8 collision regime — 67× cost at 10× data,
    # root-caused in SCALE.md; it survives only as a pytest-only
    # negative example (test_trainingdata).  The corpus now plants
    # CLUSTERS: every 10th vector gets 3 deterministic elementwise
    # perturbations (ids +1M/+2M/+3M), giving 4-member groups whose
    # intra-cluster cosines sit at ≈0.994-0.99998 while everything else
    # stays ≤ 0.61 — the tight-angle regime where auto-sized planes
    # lose nothing.  Threshold margin ≥ 4.4e-2 and 6-dp rounding
    # margins ≥ 2e-10 (≈10^5 × engine ulp noise), recall completeness
    # at (auto planes, 8 tables, seed 42) verified at sf0.001/0.01/0.1
    # — all pinned in test_trainingdata.  The ORACLE recomputes the
    # same corpus and brute-forces all-pairs exact cosine; Spark's
    # banded bucket-join is the scale path.
    oracle=f"""
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
      UNION ALL
      SELECT vec_id + t.t * 1000000,
             list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE)
                    + CAST(0.002 AS DOUBLE) * t.t
                      * CAST(((vec_id * 31 + (i - 1) + 13 * t.t) % 7) - 3 AS DOUBLE))
      FROM embeddings CROSS JOIN (VALUES (1), (2), (3)) AS t(t)
      WHERE vec_id % 10 = 0
    ),
    cc AS (
      -- mirror Spark's nonzero_vec on the UNIONED corpus (conv 21/22):
      -- NULL or all-zero members have no direction and are excluded
      -- BEFORE any cosine list_reduce can see a NULL/empty zip
      SELECT * FROM c WHERE {_sql_nonzero('e')}
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_SQL_COS.format(a="a.e", b="b.e")} AS c2
      FROM cc a JOIN cc b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(c2, 6) AS cosine FROM p WHERE c2 >= 0.95
    """,
)
def q26_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate CLUSTER detection at the scale-safe
    operating point: tight-angle groups (cosine ≥ 0.95) found with
    ``n_planes=None`` auto-sizing and 8 independent tables — the
    multi-member sibling of q72's twin-pair pin (clusters stress
    transitive bucket collisions; q72 stresses 1:1 twins).  Every 10th
    vector is planted with 3 deterministic perturbations (recomputed
    identically in the oracle); the exact pair set is the 6 pairs per
    4-member cluster.  Candidates remain a (table, bucket) equi-join —
    never all-pairs; precision exact by cosine verify; recall complete
    at this angle (asserted vs numpy brute force at 3 SFs in pytest AND
    by the oracle hash).  eager=True: the auto-size count() probe and
    both fan-out branches read one persisted projection, released
    before return."""
    from .operators.similarity import embedding_near_dup_pairs

    base = _t(spark, sf_dir, "embeddings")
    orig = base.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    tens = base.filter(F.col("vec_id") % 10 == 0)

    def _perturb(t: int):
        # closure factory: a `_t=t` default arg would add a 3rd lambda
        # parameter, which Spark rejects (transform passes exactly 2)
        return lambda x, i: x.cast("double") + F.lit(0.002 * t) * (
            ((F.col("vec_id") * 31 + i + 13 * t) % 7) - 3
        ).cast("double")

    twins = []
    for t in (1, 2, 3):
        # perturb FIRST (original vec_id in scope), shift the id in a
        # second select — a sibling `... AS vec_id` alias would rebind
        # the lambda's vec_id ref (lateral column aliases, conv #6c)
        twins.append(
            tens.select(
                "vec_id",
                F.transform(F.col("embedding"), _perturb(t)).alias("embedding"),
            ).select((F.col("vec_id") + F.lit(t * 1000000)).alias("vec_id"), "embedding")
        )
    corpus = orig
    for tw in twins:
        corpus = corpus.unionByName(tw)
    pairs = embedding_near_dup_pairs(
        corpus, threshold=0.95, n_planes=None, n_tables=8, eager=True
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    ).orderBy("id_a", "id_b")


@query(
    "q27_text_metrics",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks)                                                    AS n_tokens_ws,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
           CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','for','with'))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE)                                AS stopword_ratio,
           0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             + 0.3 * least(CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','for','with'))) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) * 3.0, 1.0)
             + 0.3 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                        / CAST(length(text) AS DOUBLE))                 AS quality_score
    FROM t
    """,
)
def q27_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), stopword ratio, and
    the composite quality score — per-doc scan-speed expressions."""
    from .operators import text as tx

    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        tx.whitespace_token_count(c).alias("n_tokens_ws"),
        tx.regex_token_count(c).alias("n_tokens_bpe"),
        tx.stopword_ratio(c).alias("stopword_ratio"),
        tx.quality_score(c).alias("quality_score"),
    )


@query(
    "q28_language_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','for','with')))   AS h_en,
        len(list_filter(toks, x -> x IN ('le','la','les','de','des','et','un','une','est','pour'))) AS h_fr,
        len(list_filter(toks, x -> x IN ('el','la','los','de','y','un','una','es','en','para')))    AS h_es,
        len(list_filter(toks, x -> x IN ('der','die','das','und','ein','eine','ist','mit','für','von'))) AS h_de
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de AND h_en > 0 THEN 'en'
                WHEN h_fr >= h_es AND h_fr >= h_de AND h_fr > 0 THEN 'fr'
                WHEN h_es >= h_de AND h_es > 0 THEN 'es'
                WHEN h_de > 0 THEN 'de'
                ELSE 'und' END AS predicted_lang
    FROM h
    """,
)
def q28_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled lang column.
    Hit counts staged as one struct column (computed once per row), the
    argmax CASE runs over the staged attributes — convention #2."""
    from .operators.dedup import spread
    from .operators.text import language_from_hits, language_hits

    docs = spread(_t(spark, sf_dir, "documents"))
    return (
        docs.withColumn("_h", language_hits(F.col("text")))
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            language_from_hits(F.col("_h")).alias("predicted_lang"),
        )
    )


@query(
    "q29_doc_fingerprint",
    # NULL-text docs are excluded on both sides (conv 22): a missing
    # document has no fingerprint — Spark's fold yields NULL while
    # DuckDB's list_concat([0], NULL) degrades to a 0 fingerprint.
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_concat([CAST(0 AS BIGINT)],
               list_transform(
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                 w -> CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def q29_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (md5-derived
    word ints, polynomial fold mod p — engine-portable, overflow-free)."""
    from .operators.dedup import spread
    from .operators.text import doc_fingerprint

    # spread: the per-word interpreted fold is the cost here — a single
    # parquet file must not serialize it onto one core (no-op at scale)
    docs = spread(
        _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "q30_multimodal_decode",
    # The stub decode is DETERMINISTIC (dims derive from the sha256 of
    # the content bytes), so the whole pipeline is SQL-checkable: DuckDB
    # recomputes n_bytes/sha/width/height from the same utf-8 bytes.
    # ('0x'||hex)::BIGINT mirrors the digest-byte extraction exactly.
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           sha256(coalesce(text, '')) AS sha256,
           CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 1, 2) AS BIGINT) % 192 AS INT) AS width,
           CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 3, 2) AS BIGINT) % 192 AS INT) AS height,
           3 AS n_channels,
           'fake' AS decoder,
           16 AS feature_dim
    FROM documents
    """,
)
def q30_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary content column → Arrow-
    batched decode (stubbed, marked 'fake') → byte-histogram features.
    Exercises mapInPandas schema/batch contracts on real binary data."""
    from .operators.multimodal import attach_binary_content, decode_media, extract_features

    media = attach_binary_content(_t(spark, sf_dir, "documents"), kind="image")
    decoded = decode_media(media)
    feats = extract_features(media).select("media_id", "feature_dim")
    return decoded.join(feats, "media_id").orderBy("media_id")


# ---------------------------------------------------------------------------
# §2.9 extension — Structured Streaming (AvailableNow drains the batch
# synchronously so the registry can hash-compare the final state).
# ---------------------------------------------------------------------------


@query(
    "q31_streaming_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)                          AS n_events,
           {_SQL_SUM.format(c='value')}      AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q31_streaming_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts via Structured Streaming,
    drained with Trigger.AvailableNow into a memory sink — the final
    state equals the batch date_trunc aggregation (the oracle)."""
    import uuid

    from .sources.tables import load_events_stream
    from .streaming.ingest import windowed_event_counts

    # window_start strings render in the SESSION timezone; pin UTC so a
    # driver session running under any system TZ matches the oracle
    # (load_events_stream handles the nanosAsLong save/restore itself)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        stream = (
            load_events_stream(spark, sf_dir)
            .withColumn("ts", F.col("_t"))
            .withColumn("value", F.col("value").cast("decimal(19,4)"))
        )
        out = windowed_event_counts(stream, "1 hour", "10 minutes").withColumn(
            "total_value", F.col("total_value").cast("double")
        )
        name = f"q31_out_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


# ---------------------------------------------------------------------------
# S9 — rate-limited HTTP enrichment (deterministic injected client so the
# full mapInPandas fetch→join pipeline is oracle-verifiable).
# ---------------------------------------------------------------------------


@query(
    "q32_enrichment_http",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR)              AS part_key,
           p_brand,
           concat('payload-for:', CAST(p_partkey AS VARCHAR)) AS enriched_payload,
           'found'                                  AS enrich_status
    FROM part
    """,
)
def q32_enrichment_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 pipeline shape end-to-end: distinct keys → rate-limited
    mapInPandas fetch (deterministic offline client here) → broadcast
    join back.  The real HTTP client is the injectable default."""
    from .operators.enrich import enrich_with_http

    def offline_client(url, payload=None, timeout=None):
        return True, f"payload-for:{url.rsplit('/', 1)[-1]}"

    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("part_key"), "p_brand"
    )
    return enrich_with_http(
        p,
        key_col="part_key",
        url_template="http://lookup.invalid/api/{key}",
        client=offline_client,
        rate_limit_per_sec=0,
    )


# ---------------------------------------------------------------------------
# Skew path — salted two-phase aggregation must equal the plain aggregate
# (the oracle IS the unsalted SQL; exact partials make them identical).
# ---------------------------------------------------------------------------


@query(
    "q33_salted_group_stats",
    oracle=f"""
    SELECT l_partkey                                  AS l_partkey,
           count(*)                                   AS total_count,
           {_sql_mean('l_extendedprice')}             AS value_mean,
           {_sql_stddev('l_extendedprice')}           AS value_std,
           min(l_extendedprice)                       AS value_min,
           max(l_extendedprice)                       AS value_max
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 3
    """,
)
def q33_salted_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe group stats: groupBy(key, salt) partials then combine
    — identical results to the one-phase aggregate, but a 995-offer hot
    group (the reference's real skew) spreads over 16 reducers."""
    from .operators.skew import salted_group_stats

    li = _t(spark, sf_dir, "lineitem")
    return salted_group_stats(
        li, "l_partkey", "l_extendedprice", n_salts=16, min_group_size=3
    )


@query(
    "q34_stateful_running_totals",
    # The stream drains fully (AvailableNow over one file = one batch), so
    # the final per-user state MUST equal the batch GROUP BY.  Exactness:
    # the operator accumulates dyadic ticks floor(v·2^20) (conv 14 —
    # engine-free, unlike decimal rounding whose x.xx5 ties split
    # HALF_UP vs numpy HALF_EVEN: the r8 fuzz tie probe), the oracle
    # replays the identical tick rule; one division per key at the end.
    oracle="""
    SELECT user_id,
           count(*) AS total_events,
           CAST(coalesce(sum(CAST(floor(coalesce(value, 0)
                  * 1048576.0) AS BIGINT)), 0) AS DOUBLE) / 1048576.0
             AS total_value
    FROM events GROUP BY user_id
    """,
)
def q34_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running per-user totals, drained with
    AvailableNow.  Single-batch catch-up here; state carries across
    batches when files arrive incrementally (tested with 2-batch run in
    tests/test_sinks_streaming.py)."""
    import uuid

    from .streaming.stateful import (
        compact_running_totals_sink,
        running_user_totals,
    )

    prev_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = spark.readStream.schema(
        "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    name = f"q34_out_{uuid.uuid4().hex[:8]}"
    # Stateful streams pay a per-partition state-store cost each batch;
    # at this key cardinality 8 partitions beats the session default
    # (shuffle-partition conf is fixed at stream START — restore after,
    # same for the nanos conf once the stream has fully terminated).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            running_user_totals(stream, exact_bits=20)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_nanos is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)
    # The append-mode sink holds one CUMULATIVE snapshot per (user,
    # batch) — correct raw only for a single-batch drain; compact to the
    # final per-user state so any batch split reads right (q117's fix,
    # same hazard class).
    return compact_running_totals_sink(spark.table(name))


# ---------------------------------------------------------------------------
# TPC-H Q1 — the canonical OLAP aggregate, exact-decimal throughout.
# ---------------------------------------------------------------------------


@query(
    "q35_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_SQL_SUM.format(c='l_quantity')}            AS sum_qty,
           {_SQL_SUM.format(c='l_extendedprice')}       AS sum_base_price,
           count(*)                                     AS count_order,
           {_sql_mean('l_quantity')}                    AS avg_qty,
           {_sql_mean('l_extendedprice')}               AS avg_price,
           {_sql_mean('l_discount')}                    AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q35_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (discounted-revenue columns omitted where
    they'd need decimal×decimal row products — sums/avgs shown are the
    exact-decimal forms; the pattern matches the guide's canonical shape)."""
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            n.alias("count_order"),
            _mean(_dsum("l_quantity"), n).alias("avg_qty"),
            _mean(_dsum("l_extendedprice"), n).alias("avg_price"),
            _mean(_dsum("l_discount"), n).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q36_ivf_topk",
    # The deterministic-sample quantizer (centroids = first 16 vectors
    # by id, a standard IVF init) makes the whole approximate pipeline
    # SQL-reproducible: assignment argmin of d2 = ‖c‖² − 2·x·c (the
    # kernel's exact formula; min per-row argmin margin ≈ 2e-4 on this
    # corpus), probe = 4 nearest centroids to the query by full squared
    # distance (4th/5th margin ≈ 2.3e-3), exact cosine within probed
    # cells.  All margins + rank-10 boundary pinned in
    # test_trainingdata; ulp noise is ~1e-15.
    oracle=f"""
    WITH cents AS (
      -- NULL embeddings excluded (conv 22, mirrors ivf_assign's entry
      -- filter): a missing vector can neither seed nor join a cell
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS c
      FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, e.embedding, c.cell_idx,
             list_reduce(list_transform(c.c,
                                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (x, y) -> x + y)
             - 2.0 * list_reduce(list_transform(list_zip(e.embedding, c.c),
                                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                                 (x, y) -> x + y) AS d2
      FROM embeddings e CROSS JOIN cents c
      WHERE e.embedding IS NOT NULL
    ),
    assigned AS (
      SELECT vec_id, embedding, cell_idx FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell_idx) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    qv AS (SELECT embedding AS q FROM embeddings
           WHERE vec_id = 0 AND {_sql_nonzero('embedding')}),
    probe AS (
      SELECT cell_idx FROM cents, qv
      ORDER BY list_reduce(list_transform(list_zip(c, q),
                                          z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))
                                               * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))),
                           (x, y) -> x + y), cell_idx
      LIMIT 4
    ),
    scored AS (
      SELECT a.vec_id, {_SQL_COS.format(a="a.embedding", b="qv.q")} AS c
      FROM assigned a JOIN probe p ON a.cell_idx = p.cell_idx, qv
      WHERE {_sql_nonzero('a.embedding')}
    )
    SELECT vec_id, round(c, 6) AS cosine FROM scored
    ORDER BY c DESC, vec_id LIMIT 10
    """,
)
def q36_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN top-10 (nprobe=4 of 16 cells) — the partition-pruned
    scale path.  The oracled config uses the deterministic-sample
    quantizer (train_iters=0) so assignment/probe/scoring are fully
    SQL-replayed; the k-means-trained variant (3 Lloyd iterations in
    DataFrame algebra, recall@10 vs q24 exact ≥ 0.8) and the
    materialized partitionBy(_centroid) index stay pinned in
    test_trainingdata."""
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    out = ivf_topk(emb, qv, k=10, n_centroids=16, nprobe=4, train_iters=0)
    return out.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine"))


# ---------------------------------------------------------------------------
# Temporal joins Spark lacks natively (as-of / range) + pivot family.
# ---------------------------------------------------------------------------


@query(
    "q37_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           e.ts_us AS asof_ts_us, e.value AS asof_value
    FROM purchases p
    ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND p.ts_us >= e.ts_us
    """,
)
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent error before each purchase, per user) via
    the tagged-union + running-last window composition — one shuffle,
    verified against DuckDB's native ASOF JOIN."""
    from .operators.temporal import asof_join

    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts_us", "value")
    return asof_join(purchases, errors, "user_id", "ts_us", ["ts_us", "value"])


@query(
    "q38_range_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts_us, count(e.ts_us) AS n_in_range
    FROM purchases p
    LEFT JOIN errors e
      ON p.user_id = e.user_id AND abs(e.ts_us - p.ts_us) <= 600000000
    GROUP BY 1, 2, 3
    """,
)
def q38_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (errors within ±10 min of each purchase, same user)
    via time-bucketed equi-join + exact filter — candidates ≤ 3× matches
    instead of a per-key cartesian."""
    from .operators.temporal import range_join_count

    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts_us")
    return range_join_count(purchases, errors, "user_id", "ts_us", 600_000_000)


@query(
    "q39_pivot_unpivot",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'O' AS status, status_O AS n FROM p
    UNION ALL SELECT o_orderpriority, 'F', status_F FROM p
    UNION ALL SELECT o_orderpriority, 'P', status_P FROM p
    """,
)
def q39_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status columns per priority) then unpivot back via stack —
    round-trips the wide↔long reshaping pair in one plan."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s}") for s in ("O", "F", "P")],
        )
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'O', status_O, 'F', status_F, 'P', status_P) AS (status, n)",
    )


# ---------------------------------------------------------------------------
# Dataset profiling — one-pass per-column quality stats.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("p_brand", "p_type", "p_size", "p_retailprice")
_PROFILE_ORACLE_ROW = """
    SELECT '{c}' AS column_name,
           count(*)                          AS n_rows,
           count({c})                        AS n_non_null,
           count(DISTINCT {c})               AS n_distinct,
           {minr}                            AS min_value,
           {maxr}                            AS max_value,
           CAST(count(*) - count({c}) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS null_fraction
    FROM part
"""

# float columns render fx20 (conv 14 — see operators/profile.py: plain
# double→VARCHAR diverges on notation thresholds, decimal rounding on
# conv-6d ties); the rest render as plain VARCHAR casts
_PROFILE_FLOAT_COLS = {"p_retailprice"}


def _profile_render(c: str, agg: str) -> str:
    if c in _PROFILE_FLOAT_COLS:
        return (
            f"'fx20:' || CAST(CAST(floor({agg}({c}) * 1048576.0) "
            f"AS BIGINT) AS VARCHAR)"
        )
    return f"CAST({agg}({c}) AS VARCHAR)"


@query(
    "q40_column_profile",
    oracle=" UNION ALL ".join(
        _PROFILE_ORACLE_ROW.format(
            c=c,
            minr=_profile_render(c, "min"),
            maxr=_profile_render(c, "max"),
        )
        for c in _PROFILE_COLS
    ),
)
def q40_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile (rows/nulls/distincts/min-max) — the
    first question a pipeline asks about a new data drop; a per-column
    loop of count queries would scan N×."""
    from .operators.profile import profile_columns

    return profile_columns(_t(spark, sf_dir, "part"), list(_PROFILE_COLS))


# ---------------------------------------------------------------------------
# Grouped Pandas path (applyInPandas) — Arrow-batched per-group compute,
# oracle-verified: pandas float64 ops are the same IEEE ops as SQL's.
# ---------------------------------------------------------------------------


@query(
    "q41_grouped_pandas_normalize",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN max(value) OVER (PARTITION BY user_id)
                     = min(value) OVER (PARTITION BY user_id)
                THEN 0.0
                ELSE (value - min(value) OVER (PARTITION BY user_id))
                     / (max(value) OVER (PARTITION BY user_id)
                        - min(value) OVER (PARTITION BY user_id))
           END AS value_pos
    FROM events
    """,
)
def q41_grouped_pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization via applyInPandas — the grouped-
    Arrow path with bit-exact parity (min/max are selections; the one
    division is the same IEEE op in pandas float64 and SQL doubles).
    Use this path only for logic SQL can't express — the oracle shows
    the equivalent (faster) built-in window form."""
    e = spark.read.schema(
        "event_id long, user_id long, event_type string, value double, props string"
    ).parquet(f"{sf_dir}/events.parquet")

    def normalize(pdf):
        lo, hi = pdf["value"].min(), pdf["value"].max()
        span = hi - lo
        pos = (pdf["value"] - lo) / span if span != 0 else 0.0
        return pdf.assign(value_pos=pos)[["event_id", "user_id", "value_pos"]]

    return e.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        normalize, schema="event_id long, user_id long, value_pos double"
    )


@query(
    "q42_running_totals_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(19,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                                                    AS running_spend,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                                                    AS order_seq
    FROM orders
    """,
)
def q42_running_totals_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-customer spend (running window frame) — the
    unbounded-preceding running-aggregate shape, exact-decimal sums."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(running).cast("double").alias(
            "running_spend"
        ),
        F.row_number().over(w).alias("order_seq"),
    )


_Q43_SH_SQL = f"""
  SELECT doc_id, {_SQL_GRAMS} AS grams
  FROM {_SQL_DOCS_WS} WHERE doc_id < 120
"""


@query(
    "q43_dedup_clusters",
    # Connected components ARE SQL-expressible: transitive closure via
    # WITH RECURSIVE over the (bounded, deterministic) exact-Jaccard pair
    # set, cluster label = min reachable id — a full value check on the
    # iterative algorithm, not just a row count.
    oracle=f"""
    WITH RECURSIVE
    sh AS MATERIALIZED ({_Q43_SH_SQL}),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.01
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, x) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src
    )
    SELECT id, least(id, min(x)) AS cluster FROM reach GROUP BY id
    """,
)
def q43_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the q21 exact-Jaccard similarity graph
    (bounded slice) → cluster = min reachable doc id.  Distributed
    min-label propagation + pointer jumping, verified value-for-value
    against DuckDB's recursive transitive closure.  The corpus-scale
    pipeline (MinHash-LSH candidates → clusters → survivors) is q47."""
    from .operators.dedup import near_dup_clusters, word_shingles

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    sh = docs.select(F.col("doc_id"), word_shingles(F.col("text"), 3).alias("grams"))
    a, b = sh.alias("a"), sh.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("double")
        / F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
    )
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.01)
    )
    return near_dup_clusters(pairs).orderBy("id")


# ---------------------------------------------------------------------------
# Fuzzy string matching — the brand-typo problem (samsng→Samsung) as a
# scalable similarity join: length-band blocking + edit-distance verify.
# ---------------------------------------------------------------------------


@query(
    "q44_fuzzy_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part WHERE p_partkey < 400)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q44_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical name pairs via edit distance, length-band BLOCKED.

    Edit distance ≤ k forces |len(a)−len(b)| ≤ k, which forces the
    floor(len/(k+1)) band ids to differ by at most 1 — so the LEFT side
    explodes to its {band−1, band, band+1} probe set and equi-joins the
    RIGHT side's exact band (a hash/sort-merge join, shuffling on the
    band key; NEVER a nested-loop cross join — asserted in
    tests/test_plans.py).  One-sided explode → each qualifying pair
    meets exactly once, no dedup needed.  Length + levenshtein run as
    post-filters on candidates only.
    """
    k = 3
    names = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select("p_name")
        .distinct()
        .withColumn("_b", F.floor(F.length("p_name") / F.lit(k + 1)))
    )
    left = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("_band"),
    )
    right = names.select(F.col("p_name").alias("name_b"), F.col("_b").alias("_band"))
    return (
        left.join(right, "_band")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= k)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= k)
    )


# ---------------------------------------------------------------------------
# Rank-function family — percent_rank / ntile / dense_rank (W-coverage
# depth; rank math is integer-derived → engine-exact).
# ---------------------------------------------------------------------------


@query(
    "q45_rank_family",
    # NULLS LAST pinned on both sides (conv 22): Spark's asc default is
    # NULLS FIRST, DuckDB's is NULLS LAST — any rank over a nullable
    # order key silently shifts every non-NULL rank otherwise.
    oracle="""
    SELECT o_custkey, o_orderkey,
           dense_rank()   OVER w AS price_dense_rank,
           percent_rank() OVER w AS price_pct_rank,
           ntile(4)       OVER w AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice NULLS LAST, o_orderkey)
    """,
)
def q45_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / percent_rank / ntile per customer by order value —
    the remaining window-rank family (unique ORDER BY tiebreak keeps
    every rank deterministic; percent_rank = (rank-1)/(n-1) is one
    integer-derived division, engine-exact).  NULL order values rank
    LAST on both sides (conv 22)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc_nulls_last(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


# ---------------------------------------------------------------------------
# Forward as-of join — the "next event at-or-after" direction (backward is
# q37); verified against DuckDB's native forward ASOF (flipped comparison).
# ---------------------------------------------------------------------------


@query(
    "q46_asof_join_forward",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           e.ts_us AS asof_ts_us, e.value AS asof_value
    FROM purchases p
    ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND p.ts_us <= e.ts_us
    """,
)
def q46_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (earliest error at-or-after each purchase, per
    user) — the descending-sort variant of the tagged-union window
    composition, verified against DuckDB's native forward ASOF JOIN."""
    from .operators.temporal import asof_join

    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts_us", "value")
    return asof_join(
        purchases, errors, "user_id", "ts_us", ["ts_us", "value"], direction="forward"
    )


# ---------------------------------------------------------------------------
# Corpus-scale dedup pipeline: MinHash-LSH candidates → Jaccard verify →
# connected components → keep one representative per cluster.
# ---------------------------------------------------------------------------


_Q47_SH_FULL_SQL = _Q43_SH_SQL.replace("WHERE doc_id < 120", "")


@query(
    "q47_dedup_pipeline",
    # The oracle recomputes the SAME semantics the slow exact way:
    # all-pairs Jaccard >= 0.35, recursive closure, drop non-representative
    # members.  Banding (16 bands × 4 rows) captures a pair with prob
    # 1-(1-J^4)^16; every true pair on this corpus has J >= 0.90 (capture
    # ~1-4e-8, and there are NO pairs in [0.2, 0.9) — a wide dead zone
    # around the 0.35 threshold).  Verified pair-set-identical at sf0.01;
    # pinned by tests/test_trainingdata.py::test_lsh_recall_vs_exact.
    oracle=f"""
    WITH RECURSIVE
    sh AS MATERIALIZED ({_Q47_SH_FULL_SQL}),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.35
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, x) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src
    ),
    labels AS (
      SELECT id, least(id, min(x)) AS cluster FROM reach GROUP BY id
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id FROM labels WHERE id <> cluster)
    """,
)
def q47_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup endgame over the WHOLE corpus: MinHash(64)+LSH(16)
    candidates, exact-Jaccard verify ≥ 0.35, connected components, keep
    the min-id representative per cluster.  Returns surviving doc_ids."""
    from .operators.dedup import dedup_by_clusters, minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.35)
    return dedup_by_clusters(docs, pairs).select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Text-quality depth: repetition signals (Gopher-style filters) and
# per-language corpus reporting — the remaining pieces of a training-data
# quality pipeline, all exact-integer-derived → fully oracle-checkable.
# ---------------------------------------------------------------------------


_SQL_WORDS = (
    "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
)


def _sql_dup_frac(n: int, ws: str = "ws") -> str:
    grams = (
        f"list_transform(range(1, greatest(len({ws}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({ws}, i, i + {n - 1}), ' '))"
    )
    return (
        f"1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) "
        f"/ CAST(len({grams}) AS DOUBLE)"
    )


@query(
    "q48_repetition_quality",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
    tok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
    cnts AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
    top AS (
      SELECT doc_id, max(cnt) AS max_cnt, CAST(sum(cnt) AS BIGINT) AS n_tokens
      FROM cnts GROUP BY 1
    ),
    g AS (
      SELECT doc_id,
             {_sql_dup_frac(2)} AS dup_2gram_frac,
             {_sql_dup_frac(3)} AS dup_3gram_frac
      FROM w
    )
    SELECT g.doc_id, top.n_tokens, g.dup_2gram_frac, g.dup_3gram_frac,
           CAST(top.max_cnt AS DOUBLE) / CAST(top.n_tokens AS DOUBLE) AS max_word_frac,
           (g.dup_3gram_frac > 0.18
            OR CAST(top.max_cnt AS DOUBLE) / CAST(top.n_tokens AS DOUBLE) > 0.2)
             AS is_repetitive
    FROM g JOIN top ON g.doc_id = top.doc_id
    """,
)
def q48_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters a pretraining pipeline runs per document:
    duplicate word-2/3-gram fractions (Column algebra, scan-speed) and
    top-word concentration (explode → two hash-aggs — the scalable form
    of an in-array mode), with a Gopher-style repetitive flag.  All
    metrics are exact-integer ratios → bit-reproducible in SQL."""
    from .operators import text as tx

    from .operators.dedup import spread

    # Tokenize ONCE (staged attribute) — inlining word_tokens into both
    # gram expressions and the explode would re-run the regexp split ~5×
    # per row (measured ~2× query cost).  spread: gram building is the
    # cost — don't serialize it onto a single-file scan's one core.
    base = spread(_t(spark, sf_dir, "documents")).select(
        "doc_id", tx.word_tokens(F.col("text")).alias("_w")
    )
    toks = base.select("doc_id", F.explode("_w").alias("tok"))
    top = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_cnt"), F.sum("cnt").alias("n_tokens"))
    )
    metrics = (
        base.withColumn("_g2", tx.ngrams_from_tokens(F.col("_w"), 2))
        .withColumn("_g3", tx.ngrams_from_tokens(F.col("_w"), 3))
        .select(
            "doc_id",
            tx.dup_fraction_from_grams(F.col("_g2")).alias("dup_2gram_frac"),
            tx.dup_fraction_from_grams(F.col("_g3")).alias("dup_3gram_frac"),
        )
    )
    mw = F.col("max_cnt").cast("double") / F.col("n_tokens").cast("double")
    return metrics.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_2gram_frac",
        "dup_3gram_frac",
        mw.alias("max_word_frac"),
        ((F.col("dup_3gram_frac") > 0.18) | (mw > 0.2)).alias("is_repetitive"),
    )


@query(
    "q49_corpus_stats_by_lang",
    # Spark percentile()/median() are bit-identical to DuckDB
    # median/quantile_cont over integer inputs (verified across 2000
    # groups in round 1) — safe to expose raw.
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens,
           median(n_tok) AS median_tokens,
           quantile_cont(n_tok, 0.25) AS p25_tokens,
           quantile_cont(n_tok, 0.75) AS p75_tokens
    FROM (SELECT lang, len({_SQL_WORDS}) AS n_tok FROM documents)
    GROUP BY lang
    """,
)
def q49_corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus reporting: token-count distribution per language (count,
    total, mean, median, quartiles) — the dataset card a training-data
    pipeline publishes.  One hash-agg; percentiles are per-group sorts
    of integer token counts, engine-exact."""
    from .operators import text as tx

    d = _t(spark, sf_dir, "documents").select(
        "lang", tx.whitespace_token_count(F.col("text")).alias("n_tok")
    )
    n = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        n.alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.sum("n_tok").cast("double") / n.cast("double")).alias("mean_tokens"),
        F.median("n_tok").alias("median_tokens"),
        F.percentile("n_tok", F.lit(0.25)).alias("p25_tokens"),
        F.percentile("n_tok", F.lit(0.75)).alias("p75_tokens"),
    )


@query(
    "q50_streaming_dedup",
    # Drained stream state == batch DISTINCT: same normalization, same
    # md5 hex in both engines.
    oracle="""
    SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
             AS content_hash
    FROM documents
    """,
)
def q50_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup AT INGEST: streaming dropDuplicates over content digests,
    drained with AvailableNow — each distinct normalized content emits
    exactly once across all micro-batches (cross-batch suppression
    tested in tests/test_sinks_streaming.py)."""
    import uuid

    from .sources.tables import load_documents_stream
    from .streaming.ingest import streaming_exact_dedup

    stream = load_documents_stream(spark, sf_dir)
    name = f"q50_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Dataset assembly: deterministic split / stratified downsampling / quality
# band / length packing / benchmark decontamination — the sampling stages
# between "clean corpus" and "training batches".  All hash-deterministic →
# fully oracle-checkable (operators/sampling.py, dedup.py).
# ---------------------------------------------------------------------------


_SQL_HASH_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@query(
    "q51_hash_split",
    # identical md5-hex→int derivation on both sides (verified: Spark
    # conv(hex,16,10) == DuckDB '0x…'::BIGINT)
    oracle=f"""
    WITH b AS (SELECT doc_id, {_SQL_HASH_BUCKET} AS bucket FROM documents)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q51_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: membership is a pure function
    of doc_id (md5 bucket), so reruns and incremental appends never
    migrate a document across splits.  Zero shuffle — a map column that
    can drive a partitionBy("split") write."""
    from .operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return hash_split(d, "doc_id").select("doc_id", "bucket", "split")


@query(
    "q52_stratified_sample",
    oracle="""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 30
    """,
)
def q52_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling cap: at most 30 docs per lang, picked
    by deterministic hash order — rebalancing over-represented domains
    without an RNG (reproducible across engines and runs)."""
    from .operators.sampling import stratified_cap

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_cap(d, "lang", "doc_id", cap=30).select(
        "doc_id", "lang", "sample_rank"
    )


@query(
    "q53_quantile_band_filter",
    # exact interpolated percentiles over integer n_chars are
    # engine-identical (same q49 discipline); the band bounds are scalar
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.05) FROM documents)
      AND n_chars <= (SELECT quantile_cont(n_chars, 0.95) FROM documents)
    """,
)
def q53_quantile_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-band trim: keep documents inside the corpus' [p05, p95]
    length band — the outlier cut (too short / machine-generated walls)
    every pretraining filter chain applies.  Exact percentile agg → two
    scalars broadcast into the filter."""
    from .operators.sampling import quantile_band

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return quantile_band(d, "n_chars", 0.05, 0.95)


@query(
    "q54_length_bucket_packing",
    oracle="""
    WITH agg AS (
      SELECT n_chars // 64 AS bucket,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS bucket_volume
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    )
    SELECT bucket, n_docs, bucket_volume,
           CAST(sum(bucket_volume) OVER (
             ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_volume
    FROM agg
    """,
)
def q54_length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan: fixed-width length buckets with per-bucket
    doc counts/volume and the cumulative volume in bucket order — the
    table a trainer uses to budget tokens per batch shape.  The window
    runs over the tiny bucket table, not corpus rows."""
    from .operators.sampling import length_buckets

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return length_buckets(d, "n_chars", 64).select(
        "bucket", "n_docs", "bucket_volume", "cum_volume"
    )


@query(
    "q55_decontamination",
    # same inverted-index semantics, gram strings in SQL vs xxhash64'd
    # grams in Spark (collision probability ~2^-64 — immaterial); per-doc
    # grams are distinct on both sides so count(*) = distinct overlap
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 4, 1) + 1),
               i -> array_to_string(list_slice(ws, i, i + 4), ' ')))) AS gram
      FROM w
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src1')
    SELECT g.doc_id, count(*) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.source <> 'src1'
    GROUP BY g.doc_id
    """,
)
def q55_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count 5-gram overlaps between each
    corpus doc and the benchmark slice (source='src1' stands in for an
    eval set).  Inverted-index equi-join on gram hashes, benchmark side
    broadcast — never an all-pairs document comparison."""
    from .operators.dedup import cross_corpus_contamination

    d = _t(spark, sf_dir, "documents")
    return cross_corpus_contamination(
        d.filter(F.col("source") != "src1"),
        d.filter(F.col("source") == "src1"),
        shingle_k=5,
    )


# ---------------------------------------------------------------------------
# PII redaction, corpus token statistics, and classic multi-join OLAP
# (TPC-H Q3/Q5 shapes) — breadth beyond the reference's single-table
# analytics; all exact-deterministic, all oracle-backed.
# ---------------------------------------------------------------------------

_SQL_TOKENIZE = _SQL_WORDS  # one oracle-side tokenizer — never let two copies drift


@query(
    "q56_pii_redaction",
    # the corpus has no natural PII, so both engines plant the SAME
    # deterministic email + 8-digit id (derived from doc_id) and the
    # oracle proves the redaction strips exactly those
    oracle="""
    WITH a AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com id '
                  || CAST(10000000 + (doc_id * 7919) % 90000000 AS VARCHAR) AS aug
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(aug, '[0-9]{8,}')) AS INT) AS n_ids,
           regexp_replace(
             regexp_replace(aug,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{8,}', '<ID>', 'g') AS redacted
    FROM a
    """,
)
def q56_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count then redact emails and long digit-run ids —
    scan-speed regexp work, zero shuffle.  The corpus text is synthetic
    word soup, so the query plants one deterministic email + id per doc
    (same derivation in the oracle) and the gate proves the scrub
    catches exactly those."""
    from .operators.text import count_pii, redact_pii

    docs = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com id "),
        (F.lit(10000000) + (F.col("doc_id") * 7919) % 90000000).cast("string"),
    )
    return (
        docs.withColumn("_aug", aug)
        .withColumn("_pii", count_pii(F.col("_aug")))
        .select(
            "doc_id",
            F.col("_pii.n_emails").alias("n_emails"),
            F.col("_pii.n_ids").alias("n_ids"),
            redact_pii(F.col("_aug")).alias("redacted"),
        )
    )


@query(
    "q57_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    c AS (
      SELECT source, token, count(*) AS cnt
      FROM tok WHERE token <> '' GROUP BY source, token
    )
    SELECT source, token, cnt, rank FROM (
      SELECT source, token, cnt,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY cnt DESC, token ASC) AS INT) AS rank
      FROM c
    ) WHERE rank <= 10
    """,
)
def q57_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source top-10 tokens: boilerplate spotting / domain
    vocabulary audit.  Token stream collapses in a hash agg FIRST
    (map-side partial combine bounds the shuffle); the rank window sorts
    the per-group VOCAB table, never corpus rows."""
    from .operators.corpus import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "documents"), group_col="source", k=10)


@query(
    "q58_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    c AS (
      SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token
    ),
    t AS (SELECT sum(cnt) AS total FROM c),
    r AS (
      SELECT token, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS INT) AS rank,
             CAST(sum(cnt) OVER (
               ORDER BY cnt DESC, token ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM c
    )
    SELECT token, cnt, rank, cum FROM r, t
    WHERE (cum - cnt) * 1000 < total * 500
    """,
)
def q58_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal frequency-ordered vocabulary covering 50% of corpus token
    mass (tokenizer/vocab building).  Exact-integer threshold (multiplied
    through by the coverage denominator — no float accumulation); the
    global window runs over the aggregated vocab table only."""
    from .operators.corpus import vocab_coverage

    return vocab_coverage(_t(spark, sf_dir, "documents"), coverage=0.5)


# Exact-decimal discounted revenue: operands sized so every engine's
# decimal arithmetic stays exact — price fits DECIMAL(12,4), (1-disc)
# fits DECIMAL(7,4); their product and its sum never round, and the
# final double cast of the same exact rational is bit-identical.
_REV_SPARK = None  # built inline; SQL twin below
# VARCHAR roundtrip (conv 16): the revenue sum is DECIMAL(_,8) — price
# (12,4) × (1−disc) (6,4) — whose UNSCALED value (revenue·10^8 ≈ 2e16
# per group at sf0.01) already exceeds 2^53, so DuckDB's direct
# decimal→double DOUBLE-ROUNDS while Spark's cast is correctly rounded.
# Which group lands in the divergent window is data luck per round
# (r8 fuzz ×100 magnitude probe pinned it on q145/q148 at 1 ulp).
_SQL_REV = (
    "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * "
    "(CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) "
    "AS VARCHAR) AS DOUBLE)"
)


def _rev_spark() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast("decimal(12,4)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    ).cast("double")


@query(
    "q59_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {_SQL_REV} AS revenue, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-15'
      AND l_shipdate  > TIMESTAMP '1998-06-15'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q59_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers x date-filtered orders
    x lineitem, top-10 orders by discounted revenue.

    Plan notes: both filters are pushed to the parquet scans; the
    customer side reduces to a projected keyset (AQE broadcasts it when
    it fits, as at any sane segment selectivity); orders-lineitem is the
    one big equi-join; orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-10 + driver merge, never a global sort).  Ties
    are impossible in the output ordering (l_orderkey is unique per
    group), so the top-10 SET is deterministic for the multiset hash."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1998-06-15")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > "1998-06-15")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(_rev_spark().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderpriority")
    )


@query(
    "q60_tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_SQL_REV} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q60_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way star join (region->nation->customer->
    orders->lineitem->supplier with the local-supplier co-nation
    condition), revenue per nation.

    Plan notes: region/nation are broadcast explicitly (they are tiny at
    ANY scale); customer and supplier joins stay equi-joins for AQE to
    size (supplier is ~1e7 rows at 100 TB — too big to force broadcast);
    the orders date filter is pushed to the scan and prunes before the
    big lineitem join."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nations = F.broadcast(
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        c.join(nations, c["c_nationkey"] == nations["n_nationkey"])
        .join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(_rev_spark().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q61_document_chunking",
    # NULL-text docs excluded on both sides (conv 22)
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents
      WHERE text IS NOT NULL
    ),
    k AS (
      SELECT doc_id, ws, (greatest(len(ws) - 32, 0) + 23) // 24 AS kmax FROM w
    ),
    e AS (
      SELECT doc_id, ws, unnest(range(0, kmax + 1)) AS chunk_id FROM k
    )
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(ws, chunk_id*24 + 1, chunk_id*24 + 32), ' ')
             AS chunk_text,
           CAST(len(list_slice(ws, chunk_id*24 + 1, chunk_id*24 + 32)) AS INT)
             AS n_chunk_tokens
    FROM e
    """,
)
def q61_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token windows, stride 24 (8-token
    overlap) — the corpus→training-sequence step.  Per-row map + explode,
    zero shuffle; token array staged once per row; exact integer index
    math makes every chunk byte-identical across engines."""
    from .operators.corpus import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=24
    )


@query(
    "q62_text_normalization",
    # the corpus is already-clean synthetic text, so both engines plant
    # the SAME mess (tab, smart quotes, em-dash, ellipsis, control char,
    # run of spaces) and the oracle proves the scrub canonicalizes it
    oracle="""
    WITH a AS (
      SELECT doc_id,
             text || chr(9) || chr(8220) || 'smart' || chr(8221) || '  '
                  || chr(8212) || ' dash ' || chr(8230) || chr(7) AS aug
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               translate(aug,
                 chr(8220) || chr(8221) || chr(8216) || chr(8217)
                   || chr(8211) || chr(8212) || chr(8230),
                 '""''''--.'),
               '[\\x00-\\x1F\\x7F]', ' ', 'g'),
             '\\s+', ' ', 'g')) AS cleaned
    FROM a
    """,
)
def q62_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/whitespace canonicalization (pretraining text hygiene):
    smart quotes/dashes/ellipsis → ASCII (1:1 translate), control chars
    → space, whitespace runs collapsed, trimmed.  Scan-speed, zero
    shuffle.  The synthetic corpus is already clean, so the query plants
    a deterministic mess (same construction in the oracle) and the gate
    proves the scrub canonicalizes exactly it."""
    from .operators.text import normalize_unicode

    docs = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit("\t“smart”  — dash …\x07"),
    )
    return docs.select(
        "doc_id", normalize_unicode(aug).alias("cleaned")
    )


@query(
    "q63_stream_stream_join",
    # drained stream-stream inner join == the batch interval self-join;
    # integer-µs time comparisons on both sides (no TZ surface)
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us, epoch_us(c.ts) AS click_ts_us
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
    """,
)
def q63_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (click→purchase
    attribution within 1 hour), drained with AvailableNow — per-key
    state bounded by watermark+lookback, never stream history; the
    drained pair set equals the batch interval self-join (oracle)."""
    import uuid

    from .sources.tables import load_events_stream
    from .streaming.joins import stream_interval_join

    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        purchases = (
            load_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                "user_id",
                F.col("_t").alias("p_ts"),
            )
        )
        clicks = (
            load_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                "user_id",
                F.col("_t").alias("c_ts"),
            )
        )
        joined = stream_interval_join(
            purchases, clicks, key="user_id", left_ts="p_ts", right_ts="c_ts",
            lookback="1 hour", watermark="2 hours",
        ).select(
            "purchase_id",
            "click_id",
            "user_id",
            F.unix_micros(F.col("p_ts")).alias("purchase_ts_us"),
            F.unix_micros(F.col("c_ts")).alias("click_ts_us"),
        )
        name = f"q63_out_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


@query(
    "q64_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           {_SQL_SUM.format(c='o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q64_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (detail / per-status / grand total in ONE
    pass) with grouping_id disambiguating the null-vs-rollup levels —
    completes the cube/rollup family (q14).  One shuffle; Spark expands
    the sets map-side and partial-aggregates before it."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total_price"),
    )


# Spark's session_window == gaps-and-islands in SQL: a session ends
# 30 min after its LAST event (exclusive end).  Integer-µs bounds,
# exact-decimal value sums — no TZ or float surface.  ONE oracle string
# shared by q65 (batch) and q154 (streaming twin) — single-copy rule.
_SQL_SESSION_WINDOWS = """
    WITH e AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
    ),
    g AS (
      -- BOTH windows order by (ts_us, event_id): Spark only ever sees
      -- microseconds, so nanosecond-resolution ordering here could
      -- disagree on same-microsecond ties
      SELECT user_id, event_id, value, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
                  OR lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    s AS (
      SELECT *, CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id,
           min(ts_us) AS session_start_us,
           max(ts_us) + 1800000000 AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(19,4))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_id
    """


@query("q65_session_windows", oracle=_SQL_SESSION_WINDOWS)
def q65_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window grouping (30-min inactivity gap): per-user
    sessions with integer-µs bounds and exact-decimal value totals —
    the engine-native form of q16's manual gaps-and-islands.  One
    shuffle on (user_id); Spark merges windows in the aggregation."""
    ev = load_events(spark, sf_dir).withColumn(
        "_t", F.timestamp_micros(F.col("ts_us"))
    )
    return (
        ev.groupBy("user_id", F.session_window("_t", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q66_multimodal_features",
    # the float32 feature vector itself is hash-fragile across engines;
    # the checked outputs (argmax bin, nonzero bins) are fully determined
    # by the INTEGER byte histogram, which SQL recomputes from the hex
    # high-nibbles of the same utf-8 bytes (hex char at odd positions)
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
             octet_length(encode(coalesce(text, ''))) AS n FROM documents
    ),
    nib AS (
      SELECT doc_id, n,
             list_transform(range(1, n + 1),
                            i -> substr(hx, 2*CAST(i AS INT) - 1, 1)) AS highs
      FROM h
    ),
    c AS (
      SELECT doc_id, n,
             list_transform(range(0, 16),
               b -> len(list_filter(highs,
                      ch -> ch = substr('0123456789ABCDEF', CAST(b AS INT) + 1, 1)))) AS cnt
      FROM nib
    )
    SELECT doc_id AS media_id,
           CAST(n AS BIGINT) AS n_bytes,
           16 AS feature_dim,
           CAST(list_position(cnt, list_max(cnt)) - 1 AS INT) AS argmax_bin,
           CAST(len(list_filter(cnt, x -> x > 0)) AS INT) AS n_nonzero_bins
    FROM c
    """,
)
def q66_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extraction stage (q30 covers decode): attach
    binary content, run the Arrow-batched byte-histogram featurizer
    (mapInPandas — the exact plumbing a learned-embedding UDF uses),
    then derive integer facts (argmax bin, nonzero bins) from the
    float32 vector.  argmax/nonzero are normalization-invariant, so the
    oracle checks the full featurize pipeline through integer outputs."""
    from .operators.multimodal import attach_binary_content, extract_features

    media = attach_binary_content(_t(spark, sf_dir, "documents"), kind="image")
    feats = extract_features(media)
    first_max = F.array_position(F.col("feature"), F.array_max(F.col("feature")))
    # missing content ≡ empty bytes — the multimodal stub contract the
    # featurize kernel and q30's decoder already follow (NULL text →
    # zero histogram); length(NULL) would emit NULL vs the oracle's 0
    return (
        media.select(
            "media_id",
            F.coalesce(F.length(F.col("content")), F.lit(0))
            .cast("long")
            .alias("n_bytes"),
        )
        .join(feats, "media_id")
        .select(
            "media_id",
            "n_bytes",
            F.col("feature_dim").cast("int").alias("feature_dim"),
            (first_max - 1).cast("int").alias("argmax_bin"),
            F.size(F.filter(F.col("feature"), lambda x: x > 0)).alias("n_nonzero_bins"),
        )
    )


@query(
    "q67_tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_SQL_REV} AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q67_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bi-directional trade volume between two nations
    per ship year — a 5-way join whose nation-PAIR filter is
    disjunctive.  The OR collapses each nation dim to 2 rows BEFORE the
    fact joins (broadcast both), so the disjunction never reaches the
    big join as a residual condition; year() runs under an explicitly
    pinned UTC session so timestamp→year is engine-identical."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        pair = ("NATION_1", "NATION_2")
        n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
        s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1998-01-01")
            )
            .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                    F.year("l_shipdate").alias("l_year"))
        )
        n1 = F.broadcast(n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")))
        n2 = F.broadcast(n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")))
        out = (
            li.join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(n1, s["s_nationkey"] == F.col("nk1"))
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(n2, c["c_nationkey"] == F.col("nk2"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(_rev_spark().alias("revenue"))
        )
        # ResolveTimeZone bakes the session TZ into year()/comparisons at
        # ANALYSIS, which is lazy — touch the schema while UTC is pinned
        # so restoring the conf can't retroactively change semantics
        out.schema
        return out
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


@query(
    "q68_udtf_token_offsets",
    # char_offset recomputed in SQL as the joined length of preceding
    # tokens (+1 separator) — exact integer math; the O(len²) slice-sum
    # is oracle-side only (Spark carries a running sum per row).
    # NULL-text docs excluded on both sides (conv 22).
    oracle="""
    WITH w AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    e AS (
      SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w
    )
    SELECT doc_id,
           CAST(i AS INT) AS token_idx,
           ws[CAST(i AS INT)] AS token,
           CAST(CASE WHEN i = 1 THEN 0
                ELSE len(array_to_string(list_slice(ws, 1, CAST(i AS INT) - 1), ' ')) + 1
                END AS INT) AS char_offset
    FROM e
    """,
)
def q68_udtf_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (the one Python-integration class the rest of
    the registry doesn't cover — scalar pandas_udf / mapInPandas /
    applyInPandas(+WithState) all appear elsewhere): a table function
    exploding each doc into (token_idx, token, char_offset) rows, where
    the offset is a running sum the UDTF carries per input row.  Lateral
    join in SQL; per-row Python generator — the UDTF tax is the point
    of the demo, and the oracle documents the set-based equivalent.
    Closure hygiene: the class body is stdlib-only (convention #3)."""
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="token_idx int, token string, char_offset int")
    class TokenOffsets:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            off = 0
            for i, t in enumerate(toks, start=1):
                yield i, t, off
                off += len(t) + 1

    fn = f"token_offsets_{uuid.uuid4().hex[:8]}"
    view = f"docs_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(fn, TokenOffsets)
    # conv 22: NULL-text docs excluded (the UDTF's `text or ""` shim
    # would otherwise fabricate a single empty token per missing doc
    # while the oracle's unnest path emits nothing)
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("_norm"),
        )
    )
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.doc_id, t.token_idx, t.token, t.char_offset "
        f"FROM {view} d, LATERAL {fn}(d._norm) t"
    )


@query(
    "q69_tpch_q8_market_share",
    oracle=f"""
    WITH vols AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,4)) *
               (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '2000-01-01'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           -- conv 16: scale-8 volume sums exceed 2^53 unscaled —
           -- VARCHAR roundtrip for the correctly-rounded conversion
           CAST(CAST(COALESCE(sum(volume) FILTER (WHERE supp_nation = 'NATION_3'),
                         0) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS mkt_share,
           CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE)     AS total_volume
    FROM vols
    GROUP BY o_year
    """,
)
def q69_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of the AMERICA-region
    ECONOMY-part market per order year — an 8-way join with a
    conditional-aggregate ratio.

    Plan notes: region→nation (customer side) collapses to a broadcast
    nationkey set; the supplier-side nation name map is broadcast too
    (nation is 25 rows at ANY scale).  The part join stays an equi-join
    for AQE to size — p_type selects ~1/6 of a table that is ~2×10^10
    rows at 100 TB, far past broadcast.  Both date bounds and p_type
    are pushed to scans.  Float discipline: volumes sum EXACTLY as
    decimals on both engines; the ONLY float ops are the final
    double casts and one division, identical IEEE ops either side —
    never a float accumulation (convention #1).  year() runs under a
    pinned UTC session (q67 precedent)."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        vol = F.col("l_extendedprice").cast("decimal(12,4)") * (
            F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)")
        )
        amer_keys = F.broadcast(
            _t(spark, sf_dir, "nation")
            .join(
                F.broadcast(
                    _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select(F.col("n_nationkey").alias("cnk"))
        )
        supp_nations = F.broadcast(
            _t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
            )
        )
        p = (
            _t(spark, sf_dir, "part")
            .filter(F.col("p_type") == "ECONOMY")
            .select("p_partkey")
        )
        o = (
            _t(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "2000-01-01")
            )
            .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
        )
        c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol))
        den = F.sum(vol)
        return (
            li.join(p, li["l_partkey"] == p["p_partkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(amer_keys, c["c_nationkey"] == F.col("cnk"))
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(supp_nations, s["s_nationkey"] == F.col("snk"))
            .groupBy("o_year")
            .agg(
                (
                    F.coalesce(num, F.lit(0).cast("decimal(6,4)")).cast("double")
                    / den.cast("double")
                ).alias("mkt_share"),
                den.cast("double").alias("total_volume"),
            )
            .select("o_year", "mkt_share", "total_volume")
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


@query(
    "q70_tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(19,4))) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q70_tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds a threshold (large-volume semi-join on an aggregate), top
    100 by order value.

    Plan notes: lineitem collapses FIRST in a (l_orderkey) hash
    aggregation with map-side partial combine — the HAVING filter then
    shrinks the fact side to the rare big orders BEFORE any join, which
    is the whole scale story (the aggregate-then-filter side is ~10^2
    smaller than lineitem; AQE broadcasts it into orders).  orderBy +
    limit compiles to TakeOrderedAndProject; o_orderkey (unique per
    row) breaks o_totalprice ties, so the top-100 SET is deterministic.
    Quantity sums as DECIMAL(19,4) — exact on both engines; the HAVING
    compares the exact decimal, not a float (convention #1)."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(19,4)")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "q71_temperature_mix",
    # identical fixed IEEE op sequence on both engines: exact-integer
    # W_s/n_s, sqrt (correctly rounded per IEEE-754), one multiply, one
    # divide, floor to an integer threshold; the coin is 40 bits of md5
    oracle="""
    WITH f AS (
      SELECT source,
             CAST(floor(LEAST(1.0,
                   (0.25 * sqrt(CAST(sum(n_chars) AS DOUBLE)))
                     / CAST(count(*) AS DOUBLE)) * 1099511627776.0) AS BIGINT)
               AS thresh
      FROM documents GROUP BY source
    )
    SELECT doc_id, source, n_chars
    FROM documents JOIN f USING (source)
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
          < thresh
    """,
)
def q71_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (alpha=0.5): the multi-source
    sampling step of dataset assembly — expected picks per source scale
    with sqrt of its char mass, flattening the source-size distribution.
    One map-side-combined hash agg, broadcast factor table, pure map
    filter; acceptance is a deterministic md5 coin against an integer
    threshold (no RNG state, no cross-group float accumulation)."""
    from .operators.sampling import temperature_mix

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return temperature_mix(
        d, "source", "doc_id", "n_chars", alpha=0.5, scale=0.25
    ).select("doc_id", "source", "n_chars")


@query(
    "q72_near_dup_scalable",
    # The SCALABLE near-dup configuration (auto-sized planes), oracle-
    # exact: a planted twin corpus (each vector + a deterministic small
    # perturbation) where true near-dups are tight-angle (cos ≈ 0.9998)
    # and everything else sits below ~0.55 — the regime where deep
    # bucketing loses nothing.  Margins pinned in test_trainingdata.
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE)
                    + 0.01 * CAST(((vec_id * 31 + (i - 1)) % 7) - 3 AS DOUBLE))
      FROM embeddings
    ),
    cc AS (
      -- mirror Spark's nonzero_vec on the UNIONED corpus (conv 21/22)
      SELECT * FROM c WHERE {_sql_nonzero('e')}
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_SQL_COS.format(a="a.e", b="b.e")} AS c2
      FROM cc a JOIN cc b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(c2, 6) AS cosine FROM p WHERE c2 >= 0.95
    """,
)
def q72_near_dup_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at the SCALABLE operating point: tight-angle
    twins (cosine ≥ 0.95) found with ``n_planes=None`` auto-sizing —
    the configuration the 10× probe showed q26's wide-angle regime can
    never have.  The corpus doubles each vector with a deterministic
    elementwise perturbation (recomputed identically in the oracle);
    the exact pair set is the 500 (orig, twin) pairs, margins pinned.
    Candidates remain a bucket equi-join; precision exact by cosine
    verify; recall complete at this angle (asserted vs brute force in
    pytest AND by the oracle hash)."""
    from .operators.similarity import embedding_near_dup_pairs

    base = _t(spark, sf_dir, "embeddings")
    orig = base.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    # perturb FIRST, shift the id in a second select: referencing
    # vec_id inside the lambda alongside an `... AS vec_id` alias would
    # resolve to the SHIFTED id (lateral column aliases), silently
    # changing the perturbation pattern vs the oracle
    twin = base.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            + F.lit(0.01)
            * (((F.col("vec_id") * 31 + i) % 7) - 3).cast("double"),
        ).alias("embedding"),
    ).select((F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding")
    corpus = orig.unionByName(twin)
    pairs = embedding_near_dup_pairs(
        corpus, threshold=0.95, n_planes=None, n_tables=8
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


@query(
    "q73_dataset_assembly",
    # end-to-end composition of four individually-oracled stages; every
    # stage is hash-deterministic so the WHOLE pipeline replays in SQL
    oracle=f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    ),
    d AS (SELECT documents.* FROM documents JOIN keep USING (doc_id)),
    q AS (SELECT * FROM d WHERE n_chars BETWEEN 100 AND 500),
    f AS (
      SELECT source,
             CAST(floor(LEAST(1.0,
                   (0.5 * sqrt(CAST(sum(n_chars) AS DOUBLE)))
                     / CAST(count(*) AS DOUBLE)) * 1099511627776.0) AS BIGINT)
               AS thresh
      FROM q GROUP BY source
    ),
    m AS (
      SELECT q.* FROM q JOIN f USING (source)
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
            < thresh
    ),
    tr AS (
      SELECT * FROM m
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100 < 80
    ),
    w AS (SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM tr),
    k AS (SELECT doc_id, ws, (greatest(len(ws) - 32, 0) + 23) // 24 AS kmax FROM w),
    e AS (SELECT doc_id, ws, unnest(range(0, kmax + 1)) AS chunk_id FROM k)
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(ws, chunk_id*24 + 1, chunk_id*24 + 32), ' ')
             AS chunk_text,
           CAST(len(list_slice(ws, chunk_id*24 + 1, chunk_id*24 + 32)) AS INT)
             AS n_chunk_tokens
    FROM e
    """,
)
def q73_dataset_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END dataset-assembly pipeline a training-data user
    actually runs, as ONE lazy plan: exact dedup (digest groupBy, min-id
    keeper) → quality band on length → temperature-weighted source
    mixing (alpha=0.5) → deterministic train split (md5 bucket < 80) →
    32/24 context-window chunking.  Every stage is hash-deterministic,
    so the full composition — not just the stages — is oracle-verified.

    Scale shape: digest shuffle (32 bytes/doc) + one factor agg +
    broadcast joins + a pure map+explode; the text column is carried
    once, never shuffled by the mix/split/chunk stages."""
    from .operators.corpus import chunk_documents
    from .operators.dedup import exact_dedup
    from .operators.sampling import hash_split, temperature_mix

    docs = _t(spark, sf_dir, "documents")
    d = exact_dedup(docs)
    q = d.filter((F.col("n_chars") >= 100) & (F.col("n_chars") <= 500))
    m = temperature_mix(q, "source", "doc_id", "n_chars", alpha=0.5, scale=0.5)
    tr = hash_split(m, "doc_id").filter(F.col("split") == "train")
    return chunk_documents(tr.select("doc_id", "text"), chunk_size=32, stride=24)


@query(
    "q74_tpch_q21_sole_late_supplier",
    # the oracle keeps the textbook EXISTS / NOT EXISTS correlation so
    # the gate proves the Spark aggregate decorrelation is equivalent
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 365 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sup_order AS (
      SELECT l_orderkey, l_suppkey, max(late) AS late
      FROM li GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM sup_order t
    JOIN supplier ON s_suppkey = t.l_suppkey
    WHERE t.late
      AND EXISTS (SELECT 1 FROM sup_order u
                  WHERE u.l_orderkey = t.l_orderkey
                    AND u.l_suppkey <> t.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM sup_order v
                      WHERE v.l_orderkey = t.l_orderkey
                        AND v.l_suppkey <> t.l_suppkey
                        AND v.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q74_tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — the EXISTS / NOT-EXISTS double correlation,
    decorrelated into aggregates.

    Instead of two correlated subqueries per row (which Spark would
    rewrite into two extra joins against the same fact), the per-order
    facts collapse ONCE: (order, supplier) → any-late, then order →
    (n_suppliers, n_late_suppliers); the predicate becomes
    late ∧ n_suppliers > 1 ∧ n_late = 1 — one extra hash agg instead of
    two semi/anti joins over lineitem, and the whole thing stays two
    shuffles (orderkey, then suppkey).  The oracle keeps the textbook
    correlated form, so the gate PROVES the decorrelation equivalent.
    Top-20 by (numwait desc, s_name) — s_name unique, set deterministic."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
            ).alias("late"),
        )
    )
    sup_order = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late")).alias("late")
    )
    order_stats = sup_order.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_sup"),
        F.sum(F.col("late").cast("int")).alias("_n_late"),
    )
    sole_late = (
        sup_order.filter(F.col("late"))
        .join(
            order_stats.filter((F.col("_n_sup") > 1) & (F.col("_n_late") == 1)),
            "l_orderkey",
        )
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(s, sole_late["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q75_tpch_q16_supplier_count",
    # NOT IN kept literal in the oracle; Spark decorrelates to an
    # anti-join (safe here: s_suppkey is never NULL — with nullable
    # columns NOT IN needs the null-aware anti-join Spark also has)
    oracle="""
    SELECT p_brand, p_type,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q75_tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type),
    excluding one brand and a NOT-IN supplier set.

    The NOT IN subquery becomes a LEFT ANTI join against the (tiny,
    broadcast) excluded-supplier keyset — the decorrelation Spark's
    optimizer would pick, made explicit; count(DISTINCT) expands to the
    standard two-level aggregate (partial distinct per partition, then
    merge) — no row ever carries more than (brand, type, suppkey)."""
    excluded = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select("p_partkey", "p_brand", "p_type")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(excluded, li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@query(
    "q76_tpch_q17_small_quantity_revenue",
    # correlated scalar subquery kept literal in the oracle; both
    # engines compute the same IEEE double 0.2*(sum/count) per part, and
    # the final sum is exact decimal with ONE double division at the end
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    WHERE p_type = 'ECONOMY'
      AND l1.l_quantity < (
        SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(19,4))) AS DOUBLE)
                      / CAST(count(l2.l_quantity) AS DOUBLE))
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q76_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity line items, where
    "small" is a correlated per-part scalar average.

    Decorrelated: per-part (sum, count) aggregate ONCE over lineitem,
    joined back — the quantity filter then runs as a map predicate.
    Float discipline: the threshold is the same fixed IEEE sequence on
    both engines (exact-integer sum and count → one divide, one multiply
    by the 0.2 literal); the revenue sums as exact DECIMAL with a single
    final double division by 7.0 (convention #1 — no float
    accumulation anywhere)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(19,4)")).cast("double")
                / F.count("l_quantity").cast("double")
            )
        ).alias("_threshold")
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(per_part.withColumnRenamed("l_partkey", "_pk"), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,4)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q77_scd2_history_merge",
    # the oracle rebuilds the same merge set-algebraically: closed =
    # changed-or-gone actives, unchanged = equal matches, fresh = the
    # incoming rows not kept open.  acctbal is never NULL here so <>
    # matches the operator's eqNullSafe-negation exactly.
    oracle="""
    WITH cur AS (
      SELECT s_suppkey, s_acctbal,
             '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
      FROM supplier WHERE s_suppkey % 7 <> 0
    ),
    inc AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 3 = 0 THEN s_acctbal + 100
                  ELSE s_acctbal END AS s_acctbal
      FROM supplier WHERE s_suppkey % 11 <> 0
    ),
    closed AS (
      SELECT c.s_suppkey, c.s_acctbal, c.valid_from,
             '2024-06-01' AS valid_to
      FROM cur c LEFT JOIN inc i USING (s_suppkey)
      WHERE i.s_suppkey IS NULL OR i.s_acctbal <> c.s_acctbal
    ),
    unchanged AS (
      SELECT c.* FROM cur c JOIN inc i USING (s_suppkey)
      WHERE i.s_acctbal = c.s_acctbal
    ),
    fresh AS (
      SELECT i.s_suppkey, i.s_acctbal,
             '2024-06-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
      FROM inc i LEFT JOIN unchanged u USING (s_suppkey)
      WHERE u.s_suppkey IS NULL
    )
    SELECT * FROM closed
    UNION ALL SELECT * FROM unchanged
    UNION ALL SELECT * FROM fresh
    """,
)
def q77_scd2_history_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history merge (Delta-MERGE semantics emulated with
    anti-join + union): a derived update batch — some suppliers change
    acctbal, some disappear, some are new — against an open history.
    Changed/absent actives close at the batch timestamp; new versions
    and new keys append open.  Promotes the pytest-only `scd2_merge`
    operator to oracle coverage: the gate proves the anti-join/union
    decomposition equals the set-algebraic MERGE."""
    from .operators.profile import scd2_merge

    s = _t(spark, sf_dir, "supplier")
    current = s.filter(F.col("s_suppkey") % 7 != 0).select(
        "s_suppkey",
        "s_acctbal",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    incoming = s.filter(F.col("s_suppkey") % 11 != 0).select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 3 == 0, F.col("s_acctbal") + 100)
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
    )
    return scd2_merge(current, incoming, "s_suppkey", ["s_acctbal"], "2024-06-01")


@query(
    "q78_doc_rarity_score",
    # exact-integer sums (corpus counts) with ONE final double division
    # per doc; the bucket CASE compares that same double on both sides
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    v AS (SELECT token, count(*) AS cnt FROM t2 GROUP BY token)
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                       AS n_tokens,
           CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                                                          AS mean_token_freq,
           CASE WHEN CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) < 8.0
                  THEN 'rare'
                WHEN CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) < 20.0
                  THEN 'mid'
                ELSE 'common' END                         AS rarity_bucket
    FROM t2 JOIN v USING (token)
    GROUP BY doc_id
    """,
)
def q78_doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document rarity scoring: each doc's mean CORPUS frequency of its
    tokens — the integer-exact cousin of unigram-LM perplexity scoring
    (log-prob needs libm log, which is NOT cross-engine bit-stable;
    mean frequency ranks documents the same way for bucketing).  Used to
    up-weight rare/specialist text and spot boilerplate (high mean
    frequency ⇒ stopword soup).

    Scale shape: the token stream collapses into the vocab ONCE
    (map-side combined), then joins back to the stream on token.  AQE
    broadcasts the vocab while it fits (it does at test SFs — see
    PLANS.md); past broadcast size the join degrades gracefully to a
    token-hash shuffle of the (doc_id, token) stream plus the per-doc
    re-aggregation: both key-partitioned, nothing global."""
    from .operators.corpus import token_counts
    from .operators.dedup import spread, words

    docs = _t(spark, sf_dir, "documents")
    tok = (
        spread(docs)
        .select("doc_id", F.explode(words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    vocab = token_counts(docs, "text", None)
    mean = F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")
    return (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            mean.alias("mean_token_freq"),
            F.when(mean < 8.0, "rare")
            .when(mean < 20.0, "mid")
            .otherwise("common")
            .alias("rarity_bucket"),
        )
    )


@query(
    "q79_token_offsets_set_based",
    # same contract as q68 — the oracle is the identical lateral
    # expansion, so the gate proves the two forms EQUAL row-for-row
    oracle="""
    WITH w AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    e AS (
      SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w
    )
    SELECT doc_id,
           CAST(i AS INT) AS token_idx,
           ws[CAST(i AS INT)] AS token,
           CAST(CASE WHEN i = 1 THEN 0
                ELSE len(array_to_string(list_slice(ws, 1, CAST(i AS INT) - 1), ' ')) + 1
                END AS INT) AS char_offset
    FROM e
    """,
)
def q79_token_offsets_set_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-based twin of q68's UDTF: identical (token_idx, token,
    char_offset) rows from posexplode + a per-doc running-sum window —
    zero Python, whole-stage codegen.  Exists so the registry QUANTIFIES
    the UDTF tax (bench q68 vs q79 at the same output) and so the fast
    form is itself oracle-verified, not just documented in q68's
    docstring.  The window partitions by doc_id — bounded by document
    token count, never corpus-global."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("_norm"),
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("_norm"), " ")).alias("_idx0", "token"),
    ).select(
        "doc_id",
        (F.col("_idx0") + 1).cast("int").alias("token_idx"),
        "token",
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("token_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.select(
        "doc_id",
        "token_idx",
        "token",
        F.coalesce(F.sum(F.length("token") + 1).over(w), F.lit(0))
        .cast("int")
        .alias("char_offset"),
    )


_Q80_SH_SQL = _Q47_SH_FULL_SQL.replace(
    "FROM documents", "FROM documents JOIN keep0 USING (doc_id)"
)


@query(
    "q80_full_pipeline_with_near_dup",
    # q73's assembly plus the FUZZY dedup stage: every piece of this
    # composition is an already-proven oracle (q20 digest keepers, q47
    # exact-Jaccard pairs + recursive closure, q71 mix, q51 split, q61
    # chunking) — composed here so the WHOLE modern pipeline, not just
    # its stages, is hash-verified.
    oracle=f"""
    WITH RECURSIVE
    keep0 AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    ),
    sh AS MATERIALIZED ({_Q80_SH_SQL}),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.35
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, x) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src
    ),
    labels AS (
      SELECT id, least(id, min(x)) AS cluster FROM reach GROUP BY id
    ),
    surv AS (
      SELECT d.* FROM documents d JOIN keep0 USING (doc_id)
      WHERE doc_id NOT IN (SELECT id FROM labels WHERE id <> cluster)
    ),
    q AS (SELECT * FROM surv WHERE n_chars BETWEEN 100 AND 500),
    f AS (
      SELECT source,
             CAST(floor(LEAST(1.0,
                   (0.5 * sqrt(CAST(sum(n_chars) AS DOUBLE)))
                     / CAST(count(*) AS DOUBLE)) * 1099511627776.0) AS BIGINT)
               AS thresh
      FROM q GROUP BY source
    ),
    m AS (
      SELECT q.* FROM q JOIN f USING (source)
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
            < thresh
    ),
    tr AS (
      SELECT * FROM m
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 100 < 80
    ),
    w AS (SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM tr),
    k AS (SELECT doc_id, ws, (greatest(len(ws) - 32, 0) + 23) // 24 AS kmax FROM w),
    e AS (SELECT doc_id, ws, unnest(range(0, kmax + 1)) AS chunk_id FROM k)
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(ws, chunk_id*24 + 1, chunk_id*24 + 32), ' ')
             AS chunk_text,
           CAST(len(list_slice(ws, chunk_id*24 + 1, chunk_id*24 + 32)) AS INT)
             AS n_chunk_tokens
    FROM e
    """,
)
def q80_full_pipeline_with_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q73's dataset assembly with the FUZZY dedup stage in: exact dedup
    → MinHash+LSH near-dup clustering (keep min-id representative) →
    length quality band → temperature mix → train split → 32/24
    chunking.  The complete modern training-data pipeline, end-to-end
    hash-verified against an oracle that brute-forces the near-dup
    stage (all-pairs exact Jaccard + recursive closure) — banding
    recall completeness carries over from q47 (the keeper subset's pair
    set is a subset of the full corpus's, which is pinned recall-
    complete)."""
    from .operators.corpus import chunk_documents
    from .operators.dedup import dedup_by_clusters, exact_dedup, minhash_lsh_pairs
    from .operators.sampling import hash_split, temperature_mix

    docs = _t(spark, sf_dir, "documents")
    d1 = exact_dedup(docs)
    pairs = minhash_lsh_pairs(d1, threshold=0.35)
    d2 = dedup_by_clusters(d1, pairs)
    q = d2.filter((F.col("n_chars") >= 100) & (F.col("n_chars") <= 500))
    m = temperature_mix(q, "source", "doc_id", "n_chars", alpha=0.5, scale=0.5)
    tr = hash_split(m, "doc_id").filter(F.col("split") == "train")
    return chunk_documents(tr.select("doc_id", "text"), chunk_size=32, stride=24)


# ---------------------------------------------------------------------------
# TPC-H completion block (q81–q93): the 13 query patterns not yet in the
# registry, adapted to the driver schema (no partsupp table; no
# l_shipmode/l_commitdate/l_receiptdate/c_phone/o_comment columns — each
# adaptation keeps the PATTERN of the original query and swaps in the
# nearest available column, noted per query).  With q35/q59/q60/q67/q69/
# q70/q74/q75/q76 this covers all 22 TPC-H query shapes.  Engine
# extension beyond reference parity (the reference has no SQL-analytics
# surface); float discipline per convention #1 throughout.
# ---------------------------------------------------------------------------

from contextlib import contextmanager


@contextmanager
def _utc(spark: SparkSession):
    """Pin the session TZ to UTC for year()/timestamp-literal stability
    (q67/q69 precedent, made reusable).  Restores the previous value —
    convention #5."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# Shared decimal-exact "volume" fragment (both engines): price*(1-disc).
_SQL_VOL = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)


def _vol() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)")
    )


@query(
    "q81_tpch_q2_min_cost_supplier",
    # cost is ONE double division per row (identical IEEE op both
    # engines); min() selects among identical doubles, so the cost =
    # min_cost equality is bit-safe cross-engine.
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, min(cost) AS min_cost FROM costs GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost
    FROM costs
    JOIN best USING (l_partkey)
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE cost = min_cost AND p_type = 'LARGE' AND p_size <= 25
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q81_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part (correlated-min
    subquery, decorrelated to an aggregate + equality join).

    Adaptation: no partsupp table, so supply cost per (part, supplier)
    is the minimum unit price (l_extendedprice / l_quantity) across
    their lineitems — same argmin-per-group pattern over a derived
    cost table.  Plan: region→nation collapses to a broadcast keyset;
    the part filter prunes BEFORE the output join (the min is computed
    per part over all European suppliers first, exactly like Q2's
    correlated subquery scoping); sort+LIMIT is a TakeOrderedAndProject
    with a total-order tiebreak so the top-100 is deterministic."""
    euro_keys = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("enk"))
    )
    s_euro = (
        _t(spark, sf_dir, "supplier")
        .join(euro_keys, F.col("s_nationkey") == F.col("enk"))
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    costs = (
        li.join(s_euro.select("s_suppkey"), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit").alias("cost"))
    )
    best = costs.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_brand")
    )
    nat = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("nnk"), "n_name"
        )
    )
    return (
        costs.join(best, "l_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .join(
            s_euro.withColumnRenamed("s_suppkey", "_sk"),
            F.col("l_suppkey") == F.col("_sk"),
        )
        .join(nat, F.col("s_nationkey") == F.col("nnk"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "cost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q82_tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q82_tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over an EXISTS semi-join.

    Adaptation: "l_commitdate < l_receiptdate" (late delivery) becomes
    "l_shipdate > o_orderdate + 30 days" (late shipment) — an EXISTS
    whose predicate references BOTH sides, so the decorrelation is a
    LEFT SEMI join with a compound (equi + range) condition, exactly
    the plan Spark gives the original Q4.  The quarter bound is pushed
    to the orders scan; lineitem ships only (l_orderkey, l_shipdate)."""
    with _utc(spark):
        o = (
            _t(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= "1996-07-01")
                & (F.col("o_orderdate") < "1996-10-01")
            )
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
        )
        li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
        return (
            o.join(
                li,
                (o["o_orderkey"] == li["l_orderkey"])
                & (
                    li["l_shipdate"]
                    > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")
                ),
                "left_semi",
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority")
        )


@query(
    "q83_tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                    * CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR)
               AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q83_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting-revenue-change — the canonical scan-only
    aggregate.  All four predicates are scan-pushable (PushedFilters);
    no join, no shuffle beyond the single-row final aggregate.  At
    100 TB this is the query shape that lives or dies on predicate
    pushdown + column pruning: the scan reads 4 of 11 columns.
    Revenue accumulates as exact DECIMAL(19,8) products."""
    with _utc(spark):
        li = _t(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        return li.agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * F.col("l_discount").cast("decimal(6,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )


@query(
    "q84_tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(CAST(sum({_SQL_VOL}
                    - CAST(p_retailprice AS DECIMAL(12,4))
                      * CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR)
               AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q84_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and order
    year — the 5-way join with a derived profit measure.

    Adaptation: no partsupp, so unit cost is p_retailprice (a real
    part-side column) instead of ps_supplycost; profit per lineitem =
    vol − p_retailprice·l_quantity, all exact DECIMAL until the final
    double cast.  Plan: p_name prefix filter prunes part before the
    join; nation (25 rows) broadcasts; part/orders stay equi-joins for
    AQE.  year() under the pinned-UTC session."""
    with _utc(spark):
        p = (
            _t(spark, sf_dir, "part")
            .filter(F.col("p_name").like("red%"))
            .select("p_partkey", "p_retailprice")
        )
        s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        nat = F.broadcast(
            _t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("nnk"), F.col("n_name").alias("nation")
            )
        )
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", F.year("o_orderdate").alias("o_year")
        )
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_quantity",
        )
        profit = _vol() - (
            F.col("p_retailprice").cast("decimal(12,4)")
            * F.col("l_quantity").cast("decimal(12,4)")
        )
        return (
            li.join(p, li["l_partkey"] == p["p_partkey"])
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(nat, s["s_nationkey"] == F.col("nnk"))
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("nation", "o_year")
            .agg(F.sum(profit).cast("double").alias("sum_profit"))
            .orderBy("nation", F.desc("o_year"))
        )


@query(
    "q85_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(sum({_SQL_VOL}) AS VARCHAR) AS DOUBLE) AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q85_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item reporting — top-20 customers by lost
    revenue in a quarter.  Both filters push to their scans; the
    customer/nation dimension attributes ride through the aggregate
    as grouping keys (not a post-agg join) exactly like the spec
    query; TakeOrderedAndProject with c_custkey tiebreak."""
    with _utc(spark):
        o = (
            _t(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01")
            )
            .select("o_orderkey", "o_custkey")
        )
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(F.col("l_returnflag") == "R")
            .select("l_orderkey", "l_extendedprice", "l_discount")
        )
        c = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"
        )
        nat = F.broadcast(
            _t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("nnk"), "n_name"
            )
        )
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(nat, c["c_nationkey"] == F.col("nnk"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
            .agg(F.sum(_vol()).cast("double").alias("revenue"))
            .select(
                "c_custkey", "c_name", "revenue",
                "c_acctbal", "n_name", "c_mktsegment",
            )
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20)
        )


@query(
    "q86_tpch_q11_important_parts",
    # threshold arithmetic: exact decimal sums on both sides, ONE
    # division + ONE multiply in double, identical op order — and the
    # 1.5×-average form is scale-free (Q11's literal fraction would
    # invert its meaning as the part count grows).
    oracle=f"""
    WITH v AS (
      SELECT l_partkey, sum({_SQL_VOL}) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    ),
    g AS (SELECT CAST(CAST(sum(val) AS VARCHAR) AS DOUBLE) AS tot,
                 CAST(count(*) AS DOUBLE) AS n FROM v)
    SELECT l_partkey, CAST(CAST(val AS VARCHAR) AS DOUBLE) AS part_value
    FROM v, g
    WHERE CAST(CAST(val AS VARCHAR) AS DOUBLE) > 1.5 * (tot / n)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q86_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value (here: traded volume
    from ASIA-region suppliers) exceeds a global-scalar threshold —
    the HAVING-over-global-aggregate pattern.

    Adaptation: value = lineitem volume instead of partsupp
    supplycost·availqty, and the threshold is 1.5× the per-part
    average (scale-free) rather than Q11's SF-dependent literal
    fraction.  Plan: the global (tot, n) is a 1-row broadcast cross
    join — the per-part aggregate shuffles once and is reused for
    both sides, no second pass over lineitem."""
    asia_keys = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("ank"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(asia_keys, F.col("s_nationkey") == F.col("ank"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    v = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_vol()).alias("val"))
    )
    g = F.broadcast(
        v.agg(
            F.sum("val").cast("double").alias("_tot"),
            F.count("*").cast("double").alias("_n"),
        )
    )
    return (
        v.crossJoin(g)
        .filter(
            F.col("val").cast("double") > F.lit(1.5) * (F.col("_tot") / F.col("_n"))
        )
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q87_tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q87_tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts over a late-shipment
    join.  Adaptation: group key is l_returnflag (no l_shipmode
    column) and "received later than committed" becomes "shipped >60
    days after order".  The year bound pushes to the lineitem scan;
    the +60d comparison is a post-join residual (it references both
    sides), exactly where Q12's receipt/commit predicate lands."""
    with _utc(spark):
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01")
            )
            .select("l_orderkey", "l_shipdate", "l_returnflag")
        )
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .filter(
                li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
            )
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
            )
            .orderBy("l_returnflag")
        )


@query(
    "q88_tpch_q13_customer_distribution",
    oracle="""
    WITH per_c AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_c
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q88_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — the double
    aggregate over a null-preserving outer join.  Adaptation: the
    o_comment NOT LIKE filter becomes an o_orderpriority exclusion
    (same position: INSIDE the join condition, so zero-order customers
    survive with c_count = 0).  count(o_orderkey) counts non-null
    only, preserving the outer-join zeros; the second aggregate is a
    tiny shuffle over distinct counts."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q89_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(CAST(COALESCE(sum({_SQL_VOL})
                             FILTER (WHERE p_type = 'PROMO'), 0) AS VARCHAR)
                   AS DOUBLE)
             / CAST(CAST(sum({_SQL_VOL}) AS VARCHAR) AS DOUBLE)
               AS promo_revenue_pct,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q89_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion-revenue percentage — conditional-sum /
    total-sum ratio over a month of shipments.  p_type='PROMO' is a
    real p_type value in this schema, so the query is the literal Q14
    pattern.  Both sums are exact decimals; the ratio is two double
    casts, one multiply, one divide — identical IEEE sequence both
    engines.  Month bound pushes to the lineitem scan; part stays an
    equi-join for AQE (it is the 100 TB-side table)."""
    with _utc(spark):
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= "1997-03-01")
                & (F.col("l_shipdate") < "1997-04-01")
            )
            .select("l_partkey", "l_extendedprice", "l_discount")
        )
        p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
        num = F.sum(F.when(F.col("p_type") == "PROMO", _vol()))
        den = F.sum(_vol())
        return (
            li.join(p, li["l_partkey"] == p["p_partkey"])
            .agg(
                (
                    F.lit(100.0)
                    * F.coalesce(num, F.lit(0).cast("decimal(6,4)")).cast("double")
                    / den.cast("double")
                ).alias("promo_revenue_pct"),
                F.count("*").alias("n_items"),
            )
        )


@query(
    "q90_tpch_q15_top_supplier",
    # revenue = max(revenue) compares exact decimals of identical
    # value — no float anywhere until the output cast.
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey, sum({_SQL_VOL}) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM r
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev = (SELECT max(rev) FROM r)
    ORDER BY s_suppkey
    """,
)
def q90_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — the
    revenue-view + max-scalar-subquery pattern, ties included (no
    LIMIT 1: equality against the max keeps every tied supplier,
    per the spec).  The per-supplier aggregate is computed ONCE and
    reused for both the max and the equality filter via a 1-row
    broadcast; revenue stays exact DECIMAL through the comparison."""
    with _utc(spark):
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1996-04-01")
            )
            .select("l_suppkey", "l_extendedprice", "l_discount")
        )
        r = li.groupBy("l_suppkey").agg(F.sum(_vol()).alias("rev"))
        mx = F.broadcast(r.agg(F.max("rev").alias("_mx")))
        s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
        return (
            r.crossJoin(mx)
            .filter(F.col("rev") == F.col("_mx"))
            .join(s, F.col("l_suppkey") == s["s_suppkey"])
            .select(
                "s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue")
            )
            .orderBy("s_suppkey")
        )


@query(
    "q91_tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(CAST(sum({_SQL_VOL}) AS VARCHAR) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q91_tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue under an OR-of-conjunctions
    predicate spanning both join sides — the disjunctive-join stress
    test.  Catalyst keeps the p_partkey equi-join and evaluates the
    disjunction as a post-join residual, while CNF conversion lets
    the per-side implied domains (brand/size on part, quantity on
    lineitem) push to the scans.  Revenue sums exact-decimal."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, z = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#3") & z.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#12") & z.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#21") & z.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(disj)
        .agg(
            F.sum(_vol()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q92_tpch_q20_dominant_supplier",
    # 2·q > tq is pure integer-scaled decimal arithmetic — exact on
    # both engines, no float threshold anywhere.
    oracle="""
    WITH sp AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(19,4))) AS q
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey, sum(q) AS tq FROM sp GROUP BY l_partkey),
    dom AS (SELECT DISTINCT l_suppkey
            FROM sp JOIN tot USING (l_partkey) WHERE q * 2 > tq)
    SELECT s_suppkey, s_name, n_name AS nation
    FROM dom
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    ORDER BY s_suppkey
    """,
)
def q92_tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share of a
    filtered part family — nested correlated aggregates decorrelated
    into two stacked groupBys + a threshold join.

    Adaptation: no partsupp availqty, so "availqty > half of shipped
    quantity" becomes "shipped > half of the part's total 1997
    shipments" (a dominant-supplier predicate with the identical
    correlated > 0.5·SUM structure).  The per-(part,supplier)
    aggregate feeds BOTH the per-part total and the comparison —
    one lineitem pass.  Quantity sums stay exact decimal; the
    half-share test is 2q > total in integer-scaled decimal."""
    with _utc(spark):
        red = (
            _t(spark, sf_dir, "part")
            .filter(F.col("p_name").like("red%"))
            .select("p_partkey")
        )
        li = (
            _t(spark, sf_dir, "lineitem")
            .filter(
                (F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01")
            )
            .select("l_partkey", "l_suppkey", "l_quantity")
        )
        sp = (
            li.join(red, li["l_partkey"] == red["p_partkey"])
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(19,4)")).alias("q"))
        )
        tot = sp.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
        dom = (
            sp.join(tot, "l_partkey")
            .filter(F.col("q") * F.lit(2).cast("decimal(2,0)") > F.col("tq"))
            .select("l_suppkey")
            .distinct()
        )
        s = _t(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", "s_nationkey"
        )
        nat = F.broadcast(
            _t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("nnk"), F.col("n_name").alias("nation")
            )
        )
        return (
            dom.join(s, dom["l_suppkey"] == s["s_suppkey"])
            .join(nat, s["s_nationkey"] == F.col("nnk"))
            .select("s_suppkey", "s_name", "nation")
            .orderBy("s_suppkey")
        )


@query(
    "q93_tpch_q22_inactive_balance",
    oracle="""
    WITH a AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(19,4))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(19,4))) AS DOUBLE) AS totacctbal
    FROM customer, a
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q93_tpch_q22_inactive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders — global-scalar subquery + NOT EXISTS anti-join.

    Adaptation: every customer has SOME order in this data, so the
    anti-join runs against a date-windowed orders subset ("no order
    since 1999"), and the country-code grouping becomes c_mktsegment
    (no c_phone column).  The average is a 1-row broadcast; the
    anti-join ships only o_custkey after its pushed date filter.
    The avg threshold is exact-decimal-sum / count — one double
    division, identical both engines (c_acctbal compares raw)."""
    with _utc(spark):
        c = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        avg1 = F.broadcast(
            c.filter(F.col("c_acctbal") > 0).agg(
                (
                    F.sum(F.col("c_acctbal").cast("decimal(19,4)")).cast("double")
                    / F.count("*").cast("double")
                ).alias("avg_bal")
            )
        )
        recent = (
            _t(spark, sf_dir, "orders")
            .filter(F.col("o_orderdate") >= "1999-01-01")
            .select("o_custkey")
        )
        return (
            c.crossJoin(avg1)
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("numcust"),
                F.sum(F.col("c_acctbal").cast("decimal(19,4)"))
                .cast("double")
                .alias("totacctbal"),
            )
            .orderBy("c_mktsegment")
        )


# ---------------------------------------------------------------------------
# Time-series / CDC / funnel block (q94–q97): the event-analytics operators
# a production pipeline needs that the registry didn't yet cover — rolling
# interval windows, grid resampling with gap-fill, changelog compaction,
# ordered funnel attribution.  All integer/exact-decimal arithmetic; event
# time is exact integer microseconds via sources/tables.py:load_events
# (convention #4).
# ---------------------------------------------------------------------------


@query(
    "q94_rolling_interval_window",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(19,4))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q94_rolling_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour interval window per user (RANGE frame over event
    time): for every event, the count and exact-decimal sum of that
    user's events in the trailing hour.

    This is the RANGE-BETWEEN-INTERVAL shape (q42 covers the ROWS
    cumulative frame): the frame is defined by a time distance, not a
    row count, so ties at the same microsecond include all peers —
    identical semantics both engines.  Time distance is exact integer
    microseconds (ts_us).  Scale: one shuffle on user_id, per-user
    ascending sort feeds the sliding frame in one pass; no global
    window anywhere."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(19,4)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q95_resample_gapfill_locf",
    # 6-hour buckets by integer floor-division of exact µs; LOCF picks
    # an existing exact value (decimal-summed, one double cast) — no
    # float arithmetic anywhere in the fill.
    oracle="""
    WITH hourly AS (
      SELECT user_id, epoch_us(ts) // 21600000000 AS bucket,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(19,4))) AS DOUBLE) AS v
      FROM events GROUP BY user_id, bucket
    ),
    b AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
          FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS bucket FROM b),
    j AS (SELECT g.user_id, g.bucket, h.n, h.v
          FROM grid g LEFT JOIN hourly h USING (user_id, bucket))
    SELECT user_id, bucket,
           COALESCE(n, 0) AS n_events,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM j
    """,
)
def q95_resample_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling with gap-fill: bucket each user's events
    into 6-hour intervals, materialize the FULL per-user grid between
    their first and last bucket (empty buckets included), and forward-
    fill the last observed value (LOCF — last observation carried
    forward).

    The missing-timestamp half of ETL that joins/windows alone don't
    give you.  Plan: one agg to buckets, a per-user (min, max) agg,
    sequence()+explode to generate the grid WITHOUT a cross join (grid
    size is data-dependent per user, never |users|×|global span|), a
    co-partitioned left join back, and a per-user ROWS window for the
    fill — shuffles only on user_id, reused across all four stages by
    AQE.  Empty buckets report n_events = 0 and the carried value."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.withColumn("bucket", F.expr("ts_us div 21600000000"))
        .groupBy("user_id", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(19,4)")).cast("double").alias("v"),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


@query(
    "q96_cdc_changelog_compaction",
    # the changelog is derived deterministically from orders (seq 0
    # insert for every key; seq 1 update for even keys, +10.00 exact
    # decimal; seq 2 delete for keys %7=0), so both engines compact
    # the identical op stream.
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS key, 0 AS seq, 'I' AS op,
             CAST(o_totalprice AS DECIMAL(12,4)) AS price FROM orders
      UNION ALL
      SELECT o_orderkey, 1, 'U',
             CAST(o_totalprice AS DECIMAL(12,4)) + CAST(10 AS DECIMAL(6,2))
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'D', NULL
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    latest AS (
      SELECT key, op, price,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT key, op AS last_op, CAST(price AS DOUBLE) AS price
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY key
    """,
)
def q96_cdc_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: given an (key, seq, op, value) change
    stream, keep each key's highest-seq operation and drop keys whose
    last op is a delete — the merge step of every incremental-ingest
    pipeline (Debezium→warehouse, Hudi/Iceberg merge-on-read).

    The compaction is ONE hash aggregate: max_by(struct(op, price),
    seq) — no window, no sort, map-side partial combine (the oracle
    keeps the textbook row_number form; seq is unique per key so both
    pick the same row).  At 100 TB the changelog shuffles once on key;
    a per-key sort-based window would shuffle the same data but spill
    sort runs — max_by folds in the combiner instead."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").cast("decimal(12,4)").alias("p0"),
    )
    log = (
        o.select("key", F.lit(0).alias("seq"), F.lit("I").alias("op"),
                 F.col("p0").alias("price"))
        .unionByName(
            o.filter(F.col("key") % 2 == 0).select(
                "key", F.lit(1).alias("seq"), F.lit("U").alias("op"),
                (F.col("p0") + F.lit(10).cast("decimal(6,2)")).alias("price"),
            )
        )
        .unionByName(
            o.filter(F.col("key") % 7 == 0).select(
                "key", F.lit(2).alias("seq"), F.lit("D").alias("op"),
                F.lit(None).cast("decimal(13,4)").alias("price"),
            )
        )
    )
    return (
        log.groupBy("key")
        .agg(F.max_by(F.struct("op", "price"), "seq").alias("last"))
        .filter(F.col("last.op") != "D")
        .select(
            "key",
            F.col("last.op").alias("last_op"),
            F.col("last.price").cast("double").alias("price"),
        )
        .orderBy("key")
    )


@query(
    "q97_event_funnel",
    # pure integer µs comparisons; each stage's min() is exact, so the
    # staged decorrelation and the correlated SQL pick identical rows.
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click'
             AND epoch_us(e.ts) > s1.t1
             AND epoch_us(e.ts) <= s1.t1 + 86400000000
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase'
             AND epoch_us(e.ts) > s2.t2
             AND epoch_us(e.ts) <= s2.t2 + 86400000000
           GROUP BY e.user_id)
    SELECT CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth,
           count(*) AS n_users
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    GROUP BY funnel_depth
    ORDER BY funnel_depth
    """,
)
def q97_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: view → click → purchase, each step within
    24 hours of the previous, earliest-qualifying-event semantics;
    output = user count per completed funnel depth (0–3).

    The staged decorrelation: step k's candidate set joins step k-1's
    min-timestamp per user, then takes its own min — three small
    per-user aggregates instead of a per-user sort or any session
    state.  Every intermediate is keyed on user_id, so AQE reuses one
    partitioning across all joins; timestamps compare as exact integer
    µs.  The final depth rollup is 4 rows."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    u = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1.withColumnRenamed("user_id", "_u1"), F.col("user_id") == F.col("_u1"))
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.withColumnRenamed("user_id", "_u2"), F.col("user_id") == F.col("_u2"))
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    depth = (
        u.join(s1.select(F.col("user_id").alias("u1")), F.col("user_id") == F.col("u1"), "left")
        .join(s2.select(F.col("user_id").alias("u2"), "t2"), F.col("user_id") == F.col("u2"), "left")
        .join(s3.select(F.col("user_id").alias("u3"), "t3"), F.col("user_id") == F.col("u3"), "left")
        .select(
            F.when(F.col("u3").isNotNull(), 3)
            .when(F.col("u2").isNotNull(), 2)
            .when(F.col("u1").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_depth")
        )
    )
    return (
        depth.groupBy("funnel_depth")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_depth")
    )


# ---------------------------------------------------------------------------
# Dedup blocking completion (q98–q99): the two classic set-similarity
# strategies the family still lacked — sorted-neighborhood (Hernández–
# Stolfo merge/purge) and prefix-filtered similarity join (PPJoin-style).
# With exact/minhash-LSH/simhash/banded-edit-distance/embedding-LSH this
# closes out the standard blocking taxonomy.
# ---------------------------------------------------------------------------

# _SQL_GRAMS / _SQL_DOCS_WS (the shared shingle fragments, staged-token
# form) are defined next to q21, their proving query.


@query(
    "q98_sorted_neighborhood_pairs",
    # the oracle replicates the SNM window CONTRACT exactly (same block
    # key, same total sort order, same rank-distance w) — SNM's output
    # is defined by its window, so the replica is the semantics, not a
    # recall approximation.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
             {_SQL_GRAMS} AS grams
      FROM {_SQL_DOCS_WS}
    ),
    r AS (
      SELECT doc_id, grams,
             lang || '|' || substr(norm, 1, 12) AS blk,
             row_number() OVER (
               PARTITION BY lang || '|' || substr(norm, 1, 12)
               ORDER BY norm, doc_id) AS rnk
      FROM d
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
             AS jaccard
    FROM r a JOIN r b
      ON a.blk = b.blk AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 5
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
            >= 0.35
    """,
)
def q98_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup pairs (merge/purge blocking): sort
    records inside a block on a normalized key, compare each record
    only to its w=5 successors, verify candidates with exact 3-gram
    Jaccard ≥ 0.35.

    The block key is (lang, first-12-normalized-chars) so the per-block
    window is BOUNDED — a classic single-key SNM sorts the whole
    dataset and needs a global row_number, which is exactly the
    global-window shape convention #2 forbids; blocked SNM keeps the
    same compare-adjacent contract with a partitionable sort.  Pairs
    whose sort keys diverge in the first 12 chars are out of contract
    by design (that sort-key sensitivity is SNM's documented
    limitation; the LSH family covers order-insensitive recall).
    Rank-distance pairing is a j=1..w explode + equi-join on
    (block, rank) — never a range self-join."""
    from .operators.dedup import normalize_text, word_shingles

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        normalize_text(F.col("text")).alias("norm"),
        word_shingles(F.col("text"), 3).alias("grams"),
    ).withColumn("blk", F.concat_ws("|", F.col("lang"), F.substring("norm", 1, 12)))
    w = Window.partitionBy("blk").orderBy("norm", "doc_id")
    r = d.select("doc_id", "grams", "blk", F.row_number().over(w).alias("rnk"))
    left = r.select(
        F.col("doc_id").alias("id_a"),
        F.col("grams").alias("grams_a"),
        "blk",
        F.explode(F.array(*[F.col("rnk") + j for j in range(1, 6)])).alias("_probe"),
    )
    right = r.select(
        F.col("doc_id").alias("id_b"),
        F.col("grams").alias("grams_b"),
        F.col("blk").alias("_rblk"),
        F.col("rnk").alias("_rrnk"),
    )
    jac = F.size(F.array_intersect("grams_a", "grams_b")).cast("double") / F.size(
        F.array_union("grams_a", "grams_b")
    ).cast("double")
    return (
        left.join(
            right,
            (F.col("blk") == F.col("_rblk")) & (F.col("_probe") == F.col("_rrnk")),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.35)
        .select("id_a", "id_b", "jaccard")
    )


@query(
    "q99_prefix_filter_similarity_join",
    # the oracle is the EXACT all-pairs answer (inverted-index form,
    # convention #7) with zero prefix mechanics: the prefix-filtering
    # theorem guarantees the Spark side's pruning is lossless at any
    # data (if J(A,B) ≥ t, the first |A|−⌈t|A|⌉+1 tokens of A and B
    # under one global frequency order must intersect), so the gate
    # checks recall = 100% by construction.
    oracle=f"""
    WITH sh AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS} AS grams FROM {_SQL_DOCS_WS}),
    n AS (SELECT doc_id, len(grams) AS n FROM sh),
    post AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM post a JOIN post b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = id_a
    JOIN n nb ON nb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.35
    """,
)
def q99_prefix_filter_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact similarity join (PPJoin-style): exact
    3-gram Jaccard ≥ 0.35 pairs over the WHOLE corpus, without LSH and
    without an all-pairs comparison.

    Mechanics: order every shingle by global (frequency, shingle)
    ascending; each doc keeps only its first n − ⌈t·n⌉ + 1 shingles
    (its "prefix" — the rarest ones); two docs are candidates iff
    their prefixes share a shingle; candidates verify with the exact
    Jaccard.  Rare-first prefixes make the candidate buckets
    inherently skew-resistant (the most frequent shingles never join),
    and the per-doc sort is a bounded array_sort — no global window,
    unlike a rank()-based implementation.  Verification joins the full
    shingle arrays back on the (few) candidates.  The union size uses
    |A|+|B|−|A∩B| so Spark and DuckDB compute the identical integer
    before the one double division."""
    return _ppjoin_pairs(spark, sf_dir)


def _ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q99's pair engine as a reusable EAGER frame (id_a, id_b,
    jaccard) — also the pair stage of the dedup-aware split /
    canonicalization composites (q200/q202)."""
    from .operators.dedup import word_shingles

    # The shingle base fans out into FOUR branches (posting list,
    # prefix build, both verify sides) — persist it so the zip_with
    # shingle construction runs once, not per branch; eager result +
    # unpersist on return (same lifecycle as q72/q104).
    sh = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", word_shingles(F.col("text"), 3).alias("grams"))
        .persist()
    )
    post = sh.select("doc_id", F.explode("grams").alias("gram"))
    freq = post.groupBy("gram").agg(F.count("*").alias("cnt"))
    prefix = (
        post.join(freq, "gram")
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("cnt", "gram")).alias("cg"))
        .select(
            "doc_id",
            F.size("cg").alias("n_grams"),
            F.expr(
                "slice(array_sort(cg), 1, "
                "size(cg) - ((7 * size(cg) + 19) div 20) + 1)"
            ).alias("pfx"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.posexplode("pfx.gram").alias("_p0", "gram"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_p0") + 1).alias("pos"),  # 1-based rank in the doc's
            "gram",                            # global (cnt, gram) order
        )
    )
    # PPJoin's LENGTH FILTER applied at CANDIDATE GENERATION (not just
    # verify): J ≥ t forces 20·min(|A|,|B|) ≥ 7·max(|A|,|B|), and each
    # prefix row already knows its doc's gram count — pruning here
    # shrinks the candidate set BEFORE the distinct shuffle and the
    # array-carrying verify joins (lossless: the same inequality is
    # re-checked nowhere-cheaper downstream).
    #
    # PPJoin's POSITIONAL FILTER (Xiao et al., WWW'08), set-semantics
    # form: a shared gram at 1-based ranks (p_a, p_b) bounds the overlap
    # by 1 + min(p_a−1, p_b−1) + min(n_a−p_a, n_b−p_b) (shared grams
    # strictly before g / strictly after g under the SAME global order
    # the prefixes use), and J ≥ t forces overlap ≥ t/(1+t)·(n_a+n_b) =
    # 7/27·(n_a+n_b).  A pair survives iff ANY shared prefix gram's
    # bound clears the floor — for a true pair EVERY shared gram's bound
    # ≥ the true overlap ≥ the floor, so pruning rows that fail it
    # before the distinct is lossless (the distinct IS the ∃-gram
    # semantics).  All-integer, both sides exact; measured ~2× fewer
    # candidates into the array-carrying verify at sf10.
    pos_bound = F.lit(1) + F.least(
        F.col("p_a") - 1, F.col("p_b") - 1
    ) + F.least(
        F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
    )
    cand = (
        prefix.select(
            F.col("doc_id").alias("id_a"),
            F.col("n_grams").alias("n_a"),
            F.col("pos").alias("p_a"),
            "gram",
        )
        .join(
            prefix.select(
                F.col("doc_id").alias("id_b"),
                F.col("n_grams").alias("n_b"),
                F.col("pos").alias("p_b"),
                "gram",
            ),
            "gram",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(20) * F.least("n_a", "n_b")
                >= F.lit(7) * F.greatest("n_a", "n_b")
            )
            & (
                F.lit(27) * pos_bound
                >= F.lit(7) * (F.col("n_a") + F.col("n_b"))
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ga = sh.select(F.col("doc_id").alias("_ia"), F.col("grams").alias("grams_a"))
    gb = sh.select(F.col("doc_id").alias("_ib"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    # Lossless length filter before the array_intersect verify:
    # J(A,B) ≥ t forces |A∩B| ≤ min ⇒ t ≤ min/(max) is necessary, i.e.
    # 20·min(|A|,|B|) ≥ 7·max(|A|,|B|) (t = 0.35 = 7/20, integer form)
    # — kills candidates with incompatible sizes for the cost of two
    # size() lookups instead of a full intersection.
    out = (
        cand.join(ga, F.col("id_a") == F.col("_ia"))
        .join(gb, F.col("id_b") == F.col("_ib"))
        .filter(
            F.lit(20) * F.least(F.size("grams_a"), F.size("grams_b"))
            >= F.lit(7) * F.greatest(F.size("grams_a"), F.size("grams_b"))
        )
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= 0.35)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint()
    )
    sh.unpersist()
    return out


def _sql_flog2_fx(x: str) -> str:
    """DuckDB twin of operators.corpus.with_flog2_fx: fixed-point (2^20)
    dyadic log2 of a positive integer expression, integer arithmetic
    only (bin() digit count, shift, truncating //) — bit-identical to
    the Spark side by construction, no libm anywhere."""
    b = f"(length(bin({x})) - 1)"
    p = f"(CAST(1 AS BIGINT) << {b})"
    return f"(CAST({b} AS BIGINT) * 1048576 + (({x} - {p}) * 1048576) // {p})"


@query(
    "q100_unigram_surprisal",
    # integer-exact fixed-point log2 (see _sql_flog2_fx) — the ONLY
    # float ops are one exact 2^-20 scaling and one correctly-rounded
    # division per doc, identical operands both engines
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    v AS (SELECT token, count(*) AS cnt FROM t2 GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS N FROM v),
    pt AS (
      SELECT doc_id,
             {_sql_flog2_fx('N')} - {_sql_flog2_fx('cnt')} AS s_fx
      FROM t2 JOIN v USING (token) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(s_fx) AS BIGINT) AS surprisal_fx,
           (CAST(sum(s_fx) AS DOUBLE) / 1048576.0) / CAST(count(*) AS DOUBLE)
             AS mean_surprisal_bits,
           CASE WHEN (CAST(sum(s_fx) AS DOUBLE) / 1048576.0)
                     / CAST(count(*) AS DOUBLE) < 4.90 THEN 'predictable'
                WHEN (CAST(sum(s_fx) AS DOUBLE) / 1048576.0)
                     / CAST(count(*) AS DOUBLE) < 5.00 THEN 'typical'
                ELSE 'surprising' END AS lm_bucket
    FROM pt GROUP BY doc_id
    """,
)
def q100_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality scoring: per-doc mean surprisal in
    bits under the corpus's own unigram distribution — the cheap LM
    filter between q78's mean-frequency and a real KenLM.  log2 is the
    fixed-point dyadic bit-hack (operators/corpus.py module note), so
    the score is integer-exact and cross-engine bit-stable where libm
    log provably is not.  Scale: vocab-collapse + broadcast-back join,
    same shape as q78 (reference analytics parity:
    dags/marketeye_etl_dag.py brand-frequency tasks, generalized)."""
    from .operators.corpus import unigram_surprisal

    return unigram_surprisal(_t(spark, sf_dir, "documents"), eager=True)


@query(
    "q101_shard_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    s AS (
      SELECT doc_id, k,
             CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 32 AS shard
      FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def q101_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: seeded md5 assigns every
    doc a (shard, position) — reproducible pseudo-random global order
    with NO global sort (the row_number window partitions by shard;
    shards sort in parallel).  The standard epoch-shuffle recipe for a
    100 TB corpus: n_shards ≈ output file count, one sorted file per
    shard."""
    from .operators.sampling import shard_assign

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_assign(d, "doc_id", n_shards=32).select("doc_id", "shard", "pos")


@query(
    "q102_incremental_ingest",
    # NOT EXISTS (not NOT IN) mirrors left_anti null semantics
    oracle="""
    WITH b AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS content_hash
      FROM documents WHERE doc_id % 5 = 0
    ),
    adm AS (
      SELECT content_hash, min(doc_id) AS doc_id FROM b GROUP BY content_hash
    ),
    seen AS (
      SELECT DISTINCT
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS content_hash
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT doc_id, content_hash FROM adm
    WHERE NOT EXISTS (
      SELECT 1 FROM seen WHERE seen.content_hash = adm.content_hash
    )
    """,
)
def q102_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus growth: admit a new batch (docs with
    doc_id % 5 = 0 stand in for today's crawl) against the existing
    deduplicated corpus (the other 80%) — intra-batch exact dedup, then
    digest anti-join against history.  The operator that lets exact
    dedup run per-increment instead of re-sweeping 100 TB of history
    (reference scope: the daily-tick ingest in
    dags/marketeye_etl_dag.py, which re-reads the world each run)."""
    from .operators.dedup import incremental_ingest

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return incremental_ingest(corpus, batch)


@query(
    "q103_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM t2 GROUP BY doc_id, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    dq AS (SELECT CAST(count(*) AS BIGINT) AS D FROM documents),
    s AS (
      SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
             CAST(tf AS BIGINT)
               * ({_sql_flog2_fx('D')} - {_sql_flog2_fx('df')}) AS score_fx
      FROM tf JOIN dfq USING (token) CROSS JOIN dq
    )
    SELECT doc_id, token, tf, score_fx, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_fx DESC, token ASC) AS rank
      FROM s
    )
    WHERE rank <= 3
    """,
)
def q103_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 TF-IDF terms per document, integer-exact end to end
    (fixed-point idf — ranking never touches a float, so the top-k set
    is bit-deterministic cross-engine).  Keyword extraction /
    boilerplate-signature mining over the documents table; the per-doc
    window is per-doc-vocab sized, never global."""
    from .operators.corpus import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3, eager=True)


@query(
    "q104_bloom_decontamination",
    # the bloom is a lossless prefilter (no false negatives), so the
    # oracle is the PLAIN exact decontamination SQL — the gate proves
    # the pruned pipeline returns the identical answer
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 4, 1) + 1),
               i -> array_to_string(list_slice(ws, i, i + 4), ' ')))) AS gram
      FROM w
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src2')
    SELECT g.doc_id, count(*) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.source <> 'src2'
    GROUP BY g.doc_id
    """,
)
def q104_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at the scale where the benchmark gram set cannot
    broadcast: a 2^20-bit Bloom bitmap (built distributed, OR-merged
    driver-side, re-shipped in the filter kernel's closure) drops clean
    grams MAP-SIDE; only survivors reach the exact verify join.  Bloom
    membership has no false negatives, so the output — and the oracle —
    is exactly q55's inverted-index answer (src2 as the eval set here).
    The measured prune rate is pinned in tests/test_corpus_scoring.py."""
    from .operators.dedup import bloom_decontaminate

    d = _t(spark, sf_dir, "documents")
    return bloom_decontaminate(
        d.filter(F.col("source") != "src2"),
        d.filter(F.col("source") == "src2"),
        shingle_k=5,
        eager=True,
    )


def _sql_zorder(x: str, y: str, bits: int) -> str:
    """DuckDB twin of operators.layout.zorder_key2: the same bit
    interleave as an unrolled integer expression (fully parenthesized —
    never trust | / << precedence across dialects)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


@query(
    "q105_zorder_layout",
    # pure integer bit algebra on both sides — zkey/file_id exact
    oracle=f"""
    WITH q AS (
      SELECT event_id,
             user_id % 1024 AS zx,
             (epoch_us(ts) // 3600000000) % 1024 AS zy
      FROM events
    ),
    k AS (SELECT event_id, zx, zy, {_sql_zorder('zx', 'zy', 10)} AS zkey FROM q)
    SELECT event_id, zx, zy, zkey, zkey >> 14 AS file_id FROM k
    """,
)
def q105_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user bucket, hour bucket):
    the layout plan for a both-dimensions-skippable events table —
    sort by zkey inside file_id ranges and a range predicate on EITHER
    user or time touches O(√files) row groups.  Pure map (one codegen'd
    bit expression, zero shuffle here); the write adds the single range
    shuffle.  Event time via load_events' exact integer ts_us
    (convention #4)."""
    from .operators.layout import zorder_layout

    e = load_events(spark, sf_dir)
    out = zorder_layout(
        e,
        F.col("user_id") % 1024,
        (F.expr("ts_us div 3600000000")) % 1024,
        bits=10,
        n_files=64,
    )
    return out.select("event_id", "zx", "zy", "zkey", "file_id")


_BM25_TERMS = ("vector", "stream", "slow")


def _sql_bm25(terms: tuple[str, ...]) -> str:
    """DuckDB twin of operators.corpus.bm25_topk — identical integer
    rationals (22/10/3/9 from k1=6/5, b=3/4 scaled by 10·S), identical
    fixed-point idf, and the SAME fixed-order COALESCE(+) chain for the
    per-doc sum, so the double bits match Spark's exactly."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    maxes = ",\n             ".join(
        f"max(CASE WHEN token = '{t}' THEN score_t END) AS _s{i}"
        for i, t in enumerate(terms)
    )
    chain = " + ".join(f"COALESCE(_s{i}, 0.0)" for i in range(len(terms)))
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t2 GROUP BY doc_id),
    c AS (SELECT CAST(sum(dl) AS BIGINT) AS S, CAST(count(*) AS BIGINT) AS D
          FROM dl),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM t2
      WHERE token IN ({in_list}) GROUP BY doc_id, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    idf AS (
      SELECT token,
             {_sql_flog2_fx('(2 * D + 2)')} - {_sql_flog2_fx('(2 * df + 1)')}
               AS idf_fx,
             S, D
      FROM dfq CROSS JOIN c
    ),
    s AS (
      SELECT doc_id, token,
             (CAST(idf_fx AS DOUBLE) * CAST(22 * S * tf AS DOUBLE))
               / (CAST(10 * S * tf + 3 * S + 9 * dl * D AS DOUBLE)
                  * 1048576.0) AS score_t
      FROM tf JOIN idf USING (token) JOIN dl USING (doc_id)
    ),
    p AS (
      SELECT doc_id,
             {maxes},
             CAST(count(*) AS BIGINT) AS n_hit
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, n_hit, ({chain}) AS score
    FROM p ORDER BY score DESC, doc_id ASC LIMIT 20
    """


@query("q106_bm25_topk", oracle=_sql_bm25(_BM25_TERMS))
def q106_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (k1=1.2, b=0.75, Lucene non-negative
    idf): top-20 documents for a fixed bag-of-words query — the sparse
    scorer for corpus search / RAG-style data selection.  Every
    sub-score is an exact integer rational with a fixed-point-log2 idf
    (CLAUDE.md convention 6d) and the per-doc sum is a fixed-order
    COALESCE chain, so the final doubles are bit-identical on both
    engines.  Scale: only query-term postings shuffle (map-side filter
    → inverted-index probe); top-k is TakeOrderedAndProject."""
    from .operators.corpus import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), k=20, eager=True
    )


@query(
    "q107_dsir_importance",
    # buckets via the engine-portable md5 hash; add-1 smoothed
    # log-ratio in fixed-point dyadic log2 — integer-exact until the
    # one mean-bits division (identical operands both engines)
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (
      SELECT doc_id, source = 'src1' AS tgt,
             CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 4096
               AS bkt
      FROM tok WHERE token <> ''
    ),
    b AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_r,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      FROM t2 GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(cnt_r) + 4096 AS BIGINT) AS nr,
             CAST(sum(cnt_t) + 4096 AS BIGINT) AS nt
      FROM b
    ),
    w AS (
      SELECT bkt,
             ({_sql_flog2_fx('(cnt_t + 1)')} - {_sql_flog2_fx('(cnt_r + 1)')})
             + ({_sql_flog2_fx('nr')} - {_sql_flog2_fx('nt')}) AS ratio_fx
      FROM b CROSS JOIN tot
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(ratio_fx) AS BIGINT) AS score_fx
      FROM t2 JOIN w USING (bkt) GROUP BY doc_id
    ),
    st AS (
      SELECT CAST(sum(score_fx) AS HUGEINT) AS ssum,
             CAST(count(*) AS HUGEINT) AS d
      FROM per_doc
    )
    SELECT doc_id, n_tokens, score_fx,
           (CAST(score_fx AS DOUBLE) / 1048576.0)
             / CAST(n_tokens AS DOUBLE) AS mean_bits,
           CAST(score_fx AS HUGEINT) * d > ssum AS selected
    FROM per_doc CROSS JOIN st
    """,
)
def q107_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling weights (hashed unigram
    features, add-1 smoothing): per-doc log2 target/raw likelihood
    ratio with src1 as the target domain — the cheap distribution
    steerer for crawl-scale data selection.  The resampling cut
    (`selected`) is score-above-corpus-mean, compared as exact
    integers (score·D > Σscore).  Integer-exact via the portable md5
    bucket hash + fixed-point log2 (convention 6d); scale shape is
    vocab-collapse (≤4096-bucket table) + broadcast-back, the same as
    q100."""
    from .operators.corpus import dsir_importance

    return dsir_importance(
        _t(spark, sf_dir, "documents"),
        F.col("source") == "src1",
        n_buckets=4096,
        eager=True,
    )


@query(
    "q108_semdedup",
    # q36's deterministic-sample quantizer replay (assignment argmin of
    # ‖c‖²−2·x·c, ties by cell — margins pinned in pytest: ≥2e-5 vs
    # ~1e-12 kernel noise) + exact fold cosine at τ=0.45 (min |cos−τ|
    # ≥ 4e-4 within cells at all 3 SFs, pinned)
    oracle=f"""
    WITH cents AS (
      -- NULL embeddings excluded (conv 22, mirrors ivf_assign's entry
      -- filter): a missing vector can neither seed nor join a cell
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS c
      FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, e.embedding, c.cell_idx,
             list_reduce(list_transform(c.c,
                                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (x, y) -> x + y)
             - 2.0 * list_reduce(list_transform(list_zip(e.embedding, c.c),
                                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                                 (x, y) -> x + y) AS d2
      FROM embeddings e CROSS JOIN cents c
      WHERE e.embedding IS NOT NULL
    ),
    assigned AS (
      SELECT vec_id, embedding, cell_idx FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell_idx) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    p AS (
      SELECT y.vec_id AS ib
      FROM assigned x JOIN assigned y
        ON x.cell_idx = y.cell_idx AND x.vec_id < y.vec_id
      WHERE {_SQL_COS.format(a="x.embedding", b="y.embedding")} >= 0.45
    ),
    drp AS (SELECT DISTINCT ib FROM p)
    SELECT a.vec_id, CAST(a.cell_idx AS BIGINT) AS cell_idx,
           (drp.ib IS NULL) AS kept
    FROM assigned a LEFT JOIN drp ON a.vec_id = drp.ib
    """,
)
def q108_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: cluster embeddings (q36's
    deterministic 16-cell quantizer), compare pairs only WITHIN a cell,
    drop any vector whose same-cell smaller-id neighbor has cosine ≥
    0.45 — the cluster-then-prune recipe that replaces all-pairs cosine
    at corpus scale (cells auto-size with n via n_centroids=None; the
    fixed-cell config here is the oracle-replayable pin)."""
    from .operators.similarity import semdedup

    return semdedup(
        _t(spark, sf_dir, "embeddings"), tau=0.45, n_centroids=16, eager=True
    )


@query(
    "q109_sequence_packing",
    # pure integer algebra end-to-end: seeded-md5 order (q101's
    # recipe), per-shard prefix sums, div/mod pack split
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             len(list_filter({_SQL_TOKENIZE}, t -> t <> '')) AS n,
             md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    s AS (
      SELECT doc_id, n, k,
             CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 8 AS shard
      FROM h
    ),
    p AS (
      SELECT doc_id, n, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS BIGINT) AS pos
      FROM s
    ),
    placed AS (
      SELECT doc_id, shard, pos, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS strt
      FROM p WHERE n > 0
    )
    SELECT shard, CAST(pack_id AS BIGINT) AS pack_id, doc_id, pos,
           GREATEST(CAST(0 AS BIGINT), pack_id * 256 - strt) AS slice_start,
           LEAST((pack_id + 1) * 256, strt + n)
             - GREATEST(pack_id * 256, strt) AS slice_len
    FROM (
      SELECT *, unnest(range(strt // 256, (strt + n - 1) // 256 + 1))
               AS pack_id
      FROM placed
    )
    """,
)
def q109_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing: docs laid end to end
    in the deterministic shard-shuffle order, cut every 256 tokens —
    emits the (doc × pack) manifest an LM trainer consumes (docs span
    packs, packs hold several docs).  Integer-deterministic throughout;
    one per-shard prefix-sum window, map-side explode, no global
    anything."""
    from .operators.sampling import sequence_packing

    return sequence_packing(
        _t(spark, sf_dir, "documents"), window=256, n_shards=8
    )


@query(
    "q110_selection_pipeline",
    # the three r4 stage oracles (q107 DSIR / q108 SemDeDup / q109
    # packing) chained verbatim — selection filters compose, the
    # packing CTEs run over the selected subset
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_SQL_TOKENIZE}) AS token FROM documents
    ),
    t2 AS (
      SELECT doc_id, source = 'src1' AS tgt,
             CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 4096
               AS bkt
      FROM tok WHERE token <> ''
    ),
    b AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_r,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      FROM t2 GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(cnt_r) + 4096 AS BIGINT) AS nr,
             CAST(sum(cnt_t) + 4096 AS BIGINT) AS nt
      FROM b
    ),
    w AS (
      SELECT bkt,
             ({_sql_flog2_fx('(cnt_t + 1)')} - {_sql_flog2_fx('(cnt_r + 1)')})
             + ({_sql_flog2_fx('nr')} - {_sql_flog2_fx('nt')}) AS ratio_fx
      FROM b CROSS JOIN tot
    ),
    dsc AS (
      SELECT doc_id, CAST(sum(ratio_fx) AS BIGINT) AS score_fx
      FROM t2 JOIN w USING (bkt) GROUP BY doc_id
    ),
    dst AS (
      SELECT CAST(sum(score_fx) AS HUGEINT) AS ssum,
             CAST(count(*) AS HUGEINT) AS d
      FROM dsc
    ),
    dsir AS (
      SELECT doc_id FROM dsc CROSS JOIN dst
      WHERE CAST(score_fx AS HUGEINT) * d > ssum
    ),
    cents AS (
      -- NULL embeddings excluded (conv 22, mirrors ivf_assign)
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_idx, embedding AS c
      FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16
    ),
    d AS (
      SELECT e.vec_id, e.embedding, c.cell_idx,
             list_reduce(list_transform(c.c,
                                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (x, y) -> x + y)
             - 2.0 * list_reduce(list_transform(list_zip(e.embedding, c.c),
                                                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                                 (x, y) -> x + y) AS d2
      FROM embeddings e CROSS JOIN cents c
      WHERE e.embedding IS NOT NULL
    ),
    assigned AS (
      SELECT vec_id, embedding, cell_idx FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell_idx) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    drp AS (
      SELECT DISTINCT y.vec_id AS ib
      FROM assigned x JOIN assigned y
        ON x.cell_idx = y.cell_idx AND x.vec_id < y.vec_id
      WHERE {_SQL_COS.format(a="x.embedding", b="y.embedding")} >= 0.45
    ),
    sel AS (
      SELECT doc_id, text FROM documents
      JOIN dsir USING (doc_id)
      JOIN assigned ON doc_id = assigned.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM drp WHERE drp.ib = doc_id)
    ),
    h AS (
      SELECT doc_id,
             len(list_filter({_SQL_TOKENIZE}, t -> t <> '')) AS n,
             md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM sel
    ),
    s AS (
      SELECT doc_id, n, k,
             CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 4 AS shard
      FROM h
    ),
    p AS (
      SELECT doc_id, n, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS BIGINT) AS pos
      FROM s
    ),
    placed AS (
      SELECT doc_id, shard, pos, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS strt
      FROM p WHERE n > 0
    )
    SELECT shard, CAST(pack_id AS BIGINT) AS pack_id, doc_id, pos,
           GREATEST(CAST(0 AS BIGINT), pack_id * 256 - strt) AS slice_start,
           LEAST((pack_id + 1) * 256, strt + n)
             - GREATEST(pack_id * 256, strt) AS slice_len
    FROM (
      SELECT *, unnest(range(strt // 256, (strt + n - 1) // 256 + 1))
               AS pack_id
      FROM placed
    )
    """,
)
def q110_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 training-data SELECTION pipeline end to end:
    DSIR-select target-like docs (importance score > 0, src1 target) →
    drop semantic near-dups among their embeddings (SemDeDup kept set,
    joined on doc_id = vec_id for the embedded subset) → lay the
    survivors into LM pack manifests (concat-and-split, 256-token
    windows, 4 shards).  Every stage is the oracle-proven q107/q108/
    q109 operator; the composition stays integer/bit-exact throughout.
    Scale: stages keep their individual shapes (bucket-table broadcast,
    within-cell pairs, per-shard windows) — nothing in the composition
    adds a corpus-global structure."""
    from .operators.corpus import dsir_importance
    from .operators.sampling import sequence_packing
    from .operators.similarity import semdedup

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    imp = dsir_importance(docs, F.col("source") == "src1", n_buckets=4096)
    kept = semdedup(emb, tau=0.45, n_centroids=16, eager=True).filter(
        F.col("kept")
    )
    sel = (
        docs.join(imp.filter(F.col("selected")).select("doc_id"), "doc_id")
        .join(
            kept.select(F.col("vec_id").alias("doc_id")),
            "doc_id",
        )
        .select("doc_id", "text")
    )
    return sequence_packing(sel, window=256, n_shards=4)


@query(
    "q111_contamination_spans",
    # positional 5-grams via list_slice over the shared tokenizer;
    # islands key = pos − row_number per doc — all integers
    oracle=f"""
    WITH cw AS (
      SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents
      WHERE source <> 'src1'
    ),
    bw AS (
      SELECT {_SQL_TOKENIZE} AS ws FROM documents WHERE source = 'src1'
    ),
    bg AS (
      SELECT DISTINCT array_to_string(list_slice(ws, i, i + 4), ' ') AS g
      FROM bw, unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS u(i)
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, i, i + 4), ' ') AS g
      FROM cw, unnest(range(1, greatest(len(ws) - 4, 1) + 1)) AS u(i)
      WHERE len(ws) - i + 1 >= 5
    ),
    hit AS (SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM bg)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hit
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
)
def q111_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: the maximal contiguous runs of
    contaminated 5-gram positions per corpus doc (benchmark = src1) —
    what a redaction pass consumes (cut the leaked span, keep the doc),
    where q55 only counts leaked grams per doc.  Positional grams via
    per-doc lead() windows (no HOF-over-positions trap, convention 6b),
    hashed inverted-index semi-join, then one more per-doc window for
    the gaps-and-islands merge — the islands window reuses the gram
    window's (doc) partitioning."""
    from .operators.dedup import contamination_spans

    d = _t(spark, sf_dir, "documents")
    return contamination_spans(
        d.filter(F.col("source") != "src1"),
        d.filter(F.col("source") == "src1"),
        shingle_k=5,
    )


@query(
    "q112_multimodal_resize",
    # q30's sha-derived fake-decode dims + the SAME integer aspect-fit
    # cross-multiply + a sha-of-(sha:dims) audit key — all replayable
    oracle="""
    WITH dec AS (
      SELECT doc_id AS media_id,
             sha256(coalesce(text, '')) AS sha,
             CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 1, 2)
                  AS BIGINT) % 192 AS BIGINT) AS w,
             CAST(64 + CAST('0x' || substr(sha256(coalesce(text, '')), 3, 2)
                  AS BIGINT) % 192 AS BIGINT) AS h
      FROM documents
    ),
    r AS (
      SELECT media_id, sha, w, h,
             CASE WHEN w <= 128 AND h <= 128 THEN w
                  WHEN w * 128 >= h * 128 THEN 128
                  ELSE GREATEST(1, (w * 128) // h) END AS out_w,
             CASE WHEN w <= 128 AND h <= 128 THEN h
                  WHEN w * 128 >= h * 128 THEN GREATEST(1, (h * 128) // w)
                  ELSE 128 END AS out_h
      FROM dec
    )
    SELECT media_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
           sha256(sha || ':' || CAST(out_w AS VARCHAR) || 'x'
                  || CAST(out_h AS VARCHAR)) AS resized_sha
    FROM r
    """,
)
def q112_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plan: decode (marked-fake, sha-derived dims) →
    aspect-preserving fit-within-128² via pure integer Column algebra
    (zero Python in the dimension path; resize_content is the
    Arrow-batched pixel path, pytest-exercised).  Completes the
    decode / feature-extract / frame-sample / RESIZE multimodal
    surface."""
    from .operators.multimodal import (
        attach_binary_content,
        decode_media,
        resize_dims,
    )

    media = attach_binary_content(_t(spark, sf_dir, "documents"), kind="image")
    out = resize_dims(decode_media(media), max_w=128, max_h=128)
    return out.select(
        "media_id", "width", "height", "out_w", "out_h", "resized_sha"
    )


@query(
    "q113_boilerplate_strip",
    # positional bigrams via list_slice; exact integer threshold
    # df·1000 > D·80; NOT EXISTS mirrors left_anti; string_agg ORDER BY pos
    # mirrors the array_sort rebuild
    oracle=f"""
    WITH ws AS (SELECT doc_id, {_SQL_TOKENIZE} AS w FROM documents),
    tok AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS t
      FROM ws, unnest(range(1, len(w) + 1)) AS u(i)
      WHERE w[i] <> ''
    ),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(w, i, i + 1), ' ') AS gr
      FROM ws, unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS u(i)
      WHERE len(w) - i + 1 >= 2
    ),
    dfq AS (
      SELECT gr, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM g GROUP BY gr
    ),
    dq AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS D FROM tok),
    bl AS (SELECT gr FROM dfq CROSS JOIN dq WHERE df * 1000 > D * 80),
    rm AS (
      SELECT DISTINCT doc_id, pos + d AS pos
      FROM g JOIN bl USING (gr), unnest([0, 1]) AS o(d)
    ),
    kept AS (
      SELECT tok.doc_id, tok.pos, tok.t FROM tok
      WHERE NOT EXISTS (
        SELECT 1 FROM rm
        WHERE rm.doc_id = tok.doc_id AND rm.pos = tok.pos
      )
    ),
    reb AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
             string_agg(t, ' ' ORDER BY pos) AS cleaned_text
      FROM kept GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY doc_id
    )
    SELECT tot.doc_id, n_tokens,
           n_tokens - COALESCE(nk, 0) AS n_removed,
           COALESCE(cleaned_text, '') AS cleaned_text
    FROM tot LEFT JOIN reb USING (doc_id)
    """,
)
def q113_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus boilerplate stripping: bigrams present in >8% of
    documents are corpus chrome; every token they cover is removed from
    every doc and the text reassembled (fully-stripped docs come back
    empty, n_removed accounts exactly).  Integer-exact threshold, no
    float anywhere; per-doc lead() windows for positional grams, a
    broadcast blacklist (small by definition), anti-join removal,
    bounded per-doc reassembly sort."""
    from .operators.corpus import strip_frequent_grams

    return strip_frequent_grams(
        _t(spark, sf_dir, "documents"), k=2, max_doc_permille=80
    )


def _sql_pagerank(iters: int) -> str:
    """DuckDB twin of operators.graph.pagerank_fixed_point: the fixed
    iteration count unrolled as chained CTEs (aggregation inside a
    recursive CTE term is not portable), identical integer algebra —
    truncating // on all-positive values matches Spark's div."""
    blocks = [
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"
    ]
    for i in range(1, iters + 1):
        blocks.append(f"""c{i} AS (
      SELECT e.dst, CAST(sum(r{i - 1}.r // d.deg) AS BIGINT) AS s
      FROM e JOIN r{i - 1} ON e.src = r{i - 1}.node
             JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )""")
        blocks.append(f"""r{i} AS (
      SELECT node,
             CAST(150000 + (17 * COALESCE(s, 0)) // 20 AS BIGINT) AS r
      FROM nodes LEFT JOIN c{i} ON node = c{i}.dst
    )""")
    chain = ",\n    ".join(blocks)
    return f"""
    WITH e AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
    {chain}
    SELECT node, r AS rank_fx, CAST(r AS DOUBLE) / 1000000.0 AS rank
    FROM r{iters}
    """


@query("q114_pagerank", oracle=_sql_pagerank(3))
def q114_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, damping 17/20) over the
    customer→supplier purchase multigraph (orders⋈lineitem; node ids
    disambiguated as 2·custkey / 2·suppkey+1) — ranks suppliers by
    purchase in-links.  EXACT integer arithmetic end to end (float
    PageRank is partial-agg-order sensitive; truncating integer
    division is not), so ranks are bit-identical on any engine/core
    count; the one float is the final display division.  Each
    iteration: one key-partitioned join + map-side-combined groupBy,
    localCheckpoint'd so the plan stays one-iteration deep."""
    from .operators.graph import pagerank_fixed_point

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return pagerank_fixed_point(edges, iters=3, eager=True)


@query(
    "q115_weighted_sample",
    # same seeded 60-bit hash, same fixed-point log2, same all-positive
    # truncating division — the selected set is bit-identical
    oracle=f"""
    WITH h AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(('0x' || substring(
               md5('wsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 10))
               AS BIGINT) + 1 AS u
      FROM documents WHERE n_chars > 0
    ),
    s AS (
      SELECT doc_id, weight,
             ((40 * 1048576 - {_sql_flog2_fx('u')}) * 1048576) // weight
               AS skey
      FROM h
    )
    SELECT doc_id, weight, skey FROM s
    ORDER BY skey ASC, doc_id ASC LIMIT 100
    """,
)
def q115_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    top-100 docs by the u^(1/w) priority key with w = n_chars — longer
    docs proportionally likelier, no RNG state, one distributed top-k
    (TakeOrderedAndProject).  The key is integer-exact fixed-point
    (minimize positive (40·2^20 − flog2(u))·2^20 div w — negative
    division would hit the truncate-vs-floor engine divergence, so the
    algebra keeps every operand positive)."""
    from .operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"), "n_chars", k=100
    )


@query(
    "q116_incremental_stats_merge",
    # algebraic-agg maintenance is EXACT for decimal sums — the oracle
    # is simply the direct one-pass GROUP BY over the whole table
    oracle=f"""
    SELECT l_returnflag,
           count(*)                               AS n_rows,
           {_SQL_SUM.format(c='l_quantity')}      AS sum_qty,
           min(l_quantity)                        AS min_qty,
           max(l_quantity)                        AS max_qty,
           {_sql_mean('l_quantity')}              AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q116_incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental stats maintenance: per-flag quantity stats computed
    as MERGE of two independently-aggregated partitions ("stored" stats
    for orders with l_orderkey % 5 != 0 plus today's batch) — the
    algebraic-aggregate pattern that lets a 100 TB daily pipeline
    update its rollups from batch-sized partials instead of rescanning
    history.  EXACT because the sums stay DECIMAL until after the merge
    (convention #1: order-free), counts/min/max are trivially
    mergeable, and the mean derives from the merged sum — the oracle is
    the direct one-pass aggregate and the gate proves merge ≡ direct
    bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.col("l_quantity").cast(_DEC)).alias("_s"),
            F.min("l_quantity").alias("_mn"),
            F.max("l_quantity").alias("_mx"),
        )

    hist = partial(li.filter(F.col("l_orderkey") % 5 != 0))
    batch = partial(li.filter(F.col("l_orderkey") % 5 == 0))
    merged = (
        hist.unionByName(batch)
        .groupBy("l_returnflag")
        .agg(
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum("_s").alias("_s2"),
            F.min("_mn").alias("min_qty"),
            F.max("_mx").alias("max_qty"),
        )
    )
    return merged.select(
        "l_returnflag",
        "n_rows",
        F.col("_s2").cast("double").alias("sum_qty"),
        "min_qty",
        "max_qty",
        (F.col("_s2").cast("double") / F.col("n_rows").cast("double")).alias(
            "avg_qty"
        ),
    )


@query(
    "q117_streaming_cdc_apply",
    # q96's changelog recipe re-keyed per CUSTOMER (seq = 4·orderkey+
    # stage keeps per-key sequence unique and totally ordered): the
    # drained upsert state must equal the batch compaction — each
    # customer's latest order change, deletes dropped.  Customer-keyed
    # so streaming state (one python call per key per batch) is bounded
    # by entity cardinality, not event volume — the realistic serving-
    # table shape.
    oracle="""
    WITH log AS (
      SELECT o_custkey AS key, o_orderkey * 4 AS seq, 'I' AS op,
             CAST(o_totalprice AS DECIMAL(12,4)) AS price FROM orders
      UNION ALL
      SELECT o_custkey, o_orderkey * 4 + 1, 'U',
             CAST(o_totalprice AS DECIMAL(12,4)) + CAST(10 AS DECIMAL(6,2))
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_custkey, o_orderkey * 4 + 2, 'D', NULL
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    latest AS (
      SELECT key, op, price,
             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT key, op AS last_op, CAST(price AS DOUBLE) AS price
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q117_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: q96's changelog recipe, customer-keyed,
    fed as a STREAM through a keyed applyInPandasWithState upsert
    (state = highest-seq change per key — entity-cardinality bounded,
    so per-key python-call overhead never scales with event volume),
    drained AvailableNow —
    the Debezium→serving-table pattern run on the streaming engine.
    The drained state hash-matches the batch compaction oracle; exact
    decimal arithmetic happens JVM-side in the stream projection with
    one correctly-rounded double cast before the Arrow boundary."""
    import uuid

    from .streaming.stateful import cdc_upsert, compact_cdc_sink

    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string"
        )
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
    p0 = F.col("o_totalprice").cast("decimal(12,4)")
    log = (
        stream.select(
            F.col("o_custkey").alias("key"),
            (F.col("o_orderkey") * 4).alias("seq"),
            F.lit("I").alias("op"),
            p0.cast("double").alias("price"),
        )
        .unionByName(
            stream.filter(F.col("o_orderkey") % 2 == 0).select(
                F.col("o_custkey").alias("key"),
                (F.col("o_orderkey") * 4 + 1).alias("seq"),
                F.lit("U").alias("op"),
                (p0 + F.lit(10).cast("decimal(6,2)")).cast("double").alias("price"),
            )
        )
        .unionByName(
            stream.filter(F.col("o_orderkey") % 7 == 0).select(
                F.col("o_custkey").alias("key"),
                (F.col("o_orderkey") * 4 + 2).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
            )
        )
    )
    name = f"q117_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # State-partition count trades per-trigger state-store setup (8 is
    # right for small inputs) against per-key Python-call parallelism —
    # at sf10 the drain makes ~1.5 M per-key calls, and 8 tasks was the
    # sf10 probe's bottleneck (351.9 s, worst in the r9 subset).  Scale
    # with the input: small file → 8, big file → every core.  Partition
    # count never affects results (state is key-partitioned either way).
    import os as _os

    try:
        _sz = _os.path.getsize(_os.path.join(sf_dir, "orders.parquet"))
    except OSError:
        _sz = 0
    _parts = (
        "8"
        if _sz < (64 << 20)
        else str(spark.sparkContext.defaultParallelism)
    )
    spark.conf.set("spark.sql.shuffle.partitions", _parts)
    try:
        q = (
            cdc_upsert(log)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # Update-mode memory sink appends one row per CHANGED key PER
    # MICRO-BATCH — the raw read equals the final state only for a
    # single-batch drain.  Compact per key on the emitted seq BEFORE the
    # delete filter so the read is correct for any batch split.
    return compact_cdc_sink(spark.table(name))


@query(
    "q118_substring_dup_spans",
    # positional 10-grams via list_slice over the shared tokenizer;
    # duplicated ⇔ the gram string occurs at ≥2 (doc,pos) anywhere
    # (Spark groups the xxhash64 of the same string — same partition);
    # islands key = pos − row_number per doc — all integers
    oracle=f"""
    WITH cw AS (SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, i, i + 9), ' ') AS g
      FROM cw, unnest(range(1, greatest(len(ws) - 9, 1) + 1)) AS u(i)
      WHERE len(ws) - i + 1 >= 10
    ),
    dup AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
    hit AS (SELECT doc_id, pos FROM pos WHERE g IN (SELECT g FROM dup)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hit
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 9 AS BIGINT) AS span_end,
           CAST(max(pos) + 9 - min(pos) + 1 AS BIGINT) AS span_len,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
)
def q118_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate DETECTION — the k-gram formulation of
    suffix-array dedup (Lee et al. 2021, arXiv 2107.06499): maximal
    token spans every 10-window of which occurs ≥2 times anywhere in
    the corpus (cross-doc or within-doc).  The k-gram form finds the
    identical removal set a suffix array would for threshold k while
    staying one vocabulary-sized hash agg + two per-doc windows — no
    global sorted structure.  Closes the last dedup-family gap
    (VERDICT r5 'What's missing' #2, upgraded from the suggested
    pytest-only to fully oracle-backed)."""
    from .operators.dedup import substring_dup_spans

    return substring_dup_spans(_t(spark, sf_dir, "documents"), min_len=10)


@query(
    "q119_substring_dedup",
    # removal twin: occurrence rank per gram (doc,pos order) — rank ≥ 2
    # ⇒ that 10-token window is stripped; coverage via a per-doc RANGE
    # window (9 PRECEDING); reassembly = ordered string_agg of kept
    # tokens.  COALESCE('') matches Spark's concat_ws on empty arrays.
    oracle=f"""
    WITH cw AS (SELECT doc_id, {_SQL_TOKENIZE} AS ws FROM documents),
    tok AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS tok
      FROM cw, unnest(range(1, len(ws) + 1)) AS u(i)
      WHERE ws[i] <> ''
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, i, i + 9), ' ') AS g
      FROM cw, unnest(range(1, greatest(len(ws) - 9, 1) + 1)) AS u(i)
      WHERE len(ws) - i + 1 >= 10
    ),
    ranked AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      FROM pos
    ),
    rem AS (SELECT doc_id, pos FROM ranked WHERE rn >= 2),
    cov AS (
      SELECT t.doc_id, t.pos, t.tok,
             MAX(CASE WHEN r.pos IS NOT NULL THEN 1 ELSE 0 END) OVER (
               PARTITION BY t.doc_id ORDER BY t.pos
               RANGE BETWEEN 9 PRECEDING AND CURRENT ROW
             ) AS c
      FROM tok t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.pos = r.pos
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(c) AS BIGINT) AS n_removed,
           COALESCE(
             string_agg(CASE WHEN c = 0 THEN tok END, ' ' ORDER BY pos),
             '') AS cleaned_text
    FROM cov GROUP BY doc_id
    """,
)
def q119_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup REMOVAL (Lee et al. 2021 ExactSubstr):
    every duplicated 10-token window is stripped from all occurrences
    except the globally-first (min (doc, pos) per gram — an integer
    argmin, so the kept set is fully deterministic and the oracle's
    per-gram row_number reproduces it exactly).  Survivors reassemble
    in position order; every tokenizable doc appears — empty or
    whitespace-only docs emit no row, mirrored by the oracle's
    ``tok <> ''`` filter (fully-duplicated docs
    come back empty).  Scale: one gram-hash agg + per-doc rangeBetween
    coverage window — doc-length bounded, no global structure."""
    from .operators.dedup import substring_dedup

    return substring_dedup(
        _t(spark, sf_dir, "documents"), min_len=10, eager=True
    )


_CMS_SQL_CELLS = """
    WITH w AS (SELECT {tokenize} AS ws FROM documents),
    tok AS (SELECT unnest(ws) AS token FROM w),
    t2 AS (SELECT token FROM tok WHERE token <> ''),
    cells AS (
      SELECT CAST(i AS INT) AS row,
             CAST(concat('0x', substr(md5(
               'cms-v1:' || CAST(i AS VARCHAR) || ':' || token), 1, 15))
               AS BIGINT) % 1024 AS col
      FROM t2, unnest(range(0, 4)) AS u(i)
    ),
    sketch AS (
      SELECT row, col, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row, col
    )
"""


@query(
    "q120_countmin_sketch",
    # The CMS counter table is a DETERMINISTIC exact object (the
    # approximation lives in how estimates READ it): portable md5 cell
    # hash → DuckDB rebuilds the identical depth×width table
    oracle=_CMS_SQL_CELLS.format(tokenize=_SQL_TOKENIZE)
    + "SELECT row, col, cnt FROM sketch",
)
def q120_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch counter table (depth=4, width=1024) over the
    corpus token stream — the bounded-memory, cell-wise-MERGEABLE
    frequency summary for vocabularies that don't fit (union across
    streams/days = add tables).  The sketch TABLE is exact and
    deterministic — engine-portable md5 cell hashing makes it fully
    oracle-replicable even though point ESTIMATES read from it are
    approximate (upgraded from pytest-only, r6).  Scale: one hash agg
    into ≤ depth·width ≈ 4k groups regardless of corpus size —
    map-side combine does nearly all the work."""
    from .operators.corpus import countmin_token_counts

    return countmin_token_counts(
        _t(spark, sf_dir, "documents"), width=1024, depth=4
    )


_CMS_PROBE_TOKENS = (
    "the", "vector", "stream", "quantum", "zzznotoken", "data",
)


@query(
    "q121_countmin_estimate",
    # min over each probe token's depth cells, left-joined so a cell
    # the sketch never emitted reads 0 (absent token ⇒ estimate 0,
    # not min of nonzero collisions) — replayed cell-for-cell
    oracle=_CMS_SQL_CELLS.format(tokenize=_SQL_TOKENIZE)
    + f""",
    probes AS (
      SELECT token, CAST(i AS INT) AS row,
             CAST(concat('0x', substr(md5(
               'cms-v1:' || CAST(i AS VARCHAR) || ':' || token), 1, 15))
               AS BIGINT) % 1024 AS col
      FROM (SELECT unnest(ARRAY{list(_CMS_PROBE_TOKENS)}) AS token),
           unnest(range(0, 4)) AS u(i)
    )
    SELECT p.token AS token,
           CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
    FROM probes p LEFT JOIN sketch s USING (row, col)
    GROUP BY p.token
    """,
)
def q121_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for a fixed probe set (common words,
    rare words, one absent token): min over the depth cells each token
    hashes to, with never-emitted cells reading 0 so an absent token
    estimates 0.  Overestimates by ≤ ε·N (ε ≈ e/width) with prob
    ≥ 1 − 2^-depth, never underestimates (pytest pins the bound); the
    estimate VALUES are nonetheless deterministic given the corpus, so
    the oracle replays them cell-for-cell.  Scale: probe table is
    |tokens|·depth rows — broadcast side of one join against the ≤4k
    sketch."""
    from .operators.corpus import countmin_estimate, countmin_token_counts

    sketch = countmin_token_counts(
        _t(spark, sf_dir, "documents"), width=1024, depth=4
    )
    return countmin_estimate(
        sketch, list(_CMS_PROBE_TOKENS), width=1024, depth=4
    )


# HyperLogLog: same deterministic-sketch contract as count-min above.
# 60-bit md5 hash → bucket = low 10 bits, rho = leading zeros of the
# remaining 50-bit window + 1 (bin-length arithmetic, no libm).
_HLL_SQL_REGS = """
    WITH w AS (SELECT {tokenize} AS ws FROM documents),
    tok AS (SELECT unnest(ws) AS token FROM w),
    t2 AS (SELECT token FROM tok WHERE token <> ''),
    h AS (
      SELECT CAST(concat('0x', substr(md5('hll-v1:' || token), 1, 15))
             AS BIGINT) AS h
      FROM t2
    ),
    cells AS (SELECT CAST(h % 1024 AS INT) AS bucket, h // 1024 AS wv FROM h),
    regs AS (
      SELECT bucket,
             CAST(max(CASE WHEN wv = 0 THEN 51
                           ELSE 51 - length(bin(wv)) END) AS INT) AS reg
      FROM cells GROUP BY bucket
    )
"""


@query(
    "q122_hll_registers",
    # the register table depends only on the distinct-token SET (max is
    # idempotent over duplicates) and the portable md5 cell hash —
    # DuckDB rebuilds it cell-for-cell
    oracle=_HLL_SQL_REGS.format(tokenize=_SQL_TOKENIZE)
    + "SELECT bucket, reg FROM regs",
)
def q122_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table (p=10, 1024 buckets) over the corpus
    token stream — the bounded-memory, MERGEABLE distinct-count summary
    (union of corpora = cell-wise max of register tables; pytest pins
    merge ≡ whole-corpus).  The table is exact and deterministic: the
    approximation lives only in what the ESTIMATE (q123) claims about
    true cardinality.  Scale: one hash agg into ≤1024 groups regardless
    of corpus size — map-side partial max does nearly all the work."""
    from .operators.corpus import hll_registers

    return hll_registers(_t(spark, sf_dir, "documents"), p=10)


# alpha_m·m²·2^scale_bits for p=10, computed ONCE here and embedded in
# both engines (F.lit on the Spark side receives the same double).
_HLL_ALPHA_NUM_P10 = (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024 * float(1 << 51)


def _hll_lc_sql_p10() -> str:
    """The p=10 linear-counting table [1024·ln(1024/V) for V in 1..1024]
    as a DuckDB DOUBLE[] literal.  Each element goes through
    CAST('<repr>' AS DOUBLE) — strtod, correctly rounded (conv 16).  A
    bare decimal literal is NOT safe: DuckDB lexes a 17-digit literal
    as DECIMAL, the list becomes DECIMAL[], and the CASE-merge with the
    DOUBLE raw_est double-rounds each element — a 1-ulp divergence from
    the exact doubles hll_estimate embeds via F.lit (caught by the r8
    fuzz sweep at V=986; which V is data luck).  (The dyadic flog2_fx
    is NOT usable here — its chord error is ~6% of m on a single
    scalar; see operators/corpus.py.)"""
    from .operators.corpus import hll_lc_table

    return (
        "["
        + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in hll_lc_table(10))
        + "]"
    )


@query(
    "q123_hll_estimate",
    # raw HLL: integer register sum at scale 2^51 (≤ 2^61, BIGINT-safe),
    # ONE long→double cast + ONE division of identical literals; linear-
    # counting branch: exact driver-computed m·ln(m/V) table indexed by
    # the integer V — identical doubles both engines, no libm either side
    oracle=_HLL_SQL_REGS.format(tokenize=_SQL_TOKENIZE)
    + f""",
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_filled,
             CAST(coalesce(sum(CAST(1 AS BIGINT) << (51 - reg)), 0)
                  AS BIGINT) AS s_filled
      FROM regs
    ),
    st AS (
      SELECT 1024 - n_filled AS empty_buckets,
             s_filled + (1024 - n_filled) * (CAST(1 AS BIGINT) << 51) AS s_fx
      FROM agg
    ),
    st2 AS (
      SELECT empty_buckets,
             CAST('{_HLL_ALPHA_NUM_P10!r}' AS DOUBLE)
               / CAST(s_fx AS DOUBLE) AS raw_est,
             greatest(empty_buckets, CAST(1 AS BIGINT)) AS v1
      FROM st
    )
    SELECT 1024 AS n_buckets,
           CAST(empty_buckets AS BIGINT) AS empty_buckets,
           CASE WHEN empty_buckets > 0 AND raw_est <= 2560.0
                THEN 'linear_counting' ELSE 'hll_raw' END AS method,
           CASE WHEN empty_buckets > 0 AND raw_est <= 2560.0
                THEN ({_hll_lc_sql_p10()})[CAST(v1 AS INT)]
                ELSE raw_est END AS estimate
    FROM st2
    """,
)
def q123_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality estimate from the q122 registers: one row
    (n_buckets, empty_buckets, method, estimate).  Standard error ≈
    1.04/√1024 ≈ 3.3% (pytest pins the bound vs the exact distinct
    count); the VALUE is nonetheless a deterministic bit-stable
    function of the registers, so the oracle replays it exactly —
    including which correction branch fires.  Scale: the estimate reads
    a ≤1024-row table; the expensive part is q122's one agg."""
    from .operators.corpus import hll_estimate, hll_registers

    regs = hll_registers(_t(spark, sf_dir, "documents"), p=10)
    return hll_estimate(regs, p=10)


# KMV / theta sketch: third sketch family member (count-min = frequencies,
# HLL = cardinality, KMV = SET OPERATIONS between corpora).  k=16 so the
# estimation branch genuinely fires on the test corpus (31 distinct
# tokens); the sketch is the k smallest distinct 60-bit md5 hashes —
# exact, deterministic, rebuilt row-for-row by DuckDB.
_KMV_SQL_SKETCH = """
      SELECT row_number() OVER (ORDER BY h) AS rank, h
      FROM (
        SELECT DISTINCT
               CAST(concat('0x', substr(md5('kmv-v1:' || token), 1, 15))
               AS BIGINT) AS h
        FROM (
          SELECT unnest({tokenize}) AS token FROM documents {where}
        ) WHERE token <> ''
        ORDER BY h LIMIT {k}
      )
"""


@query(
    "q124_kmv_sketch",
    # depends only on the distinct-token set (duplicates collapse before
    # the top-k) and the portable md5 hash — fully replayable
    oracle="SELECT CAST(rank AS INT) AS rank, h FROM ("
    + _KMV_SQL_SKETCH.format(tokenize=_SQL_TOKENIZE, where="", k=16)
    + ")",
)
def q124_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch (k=16): the 16 smallest distinct token hashes of the
    corpus — the bounded-memory summary that supports distinct-count
    AND set-operation estimates (q125).  Scale: one vocab-sized distinct
    agg + distributed top-k (per-partition TakeOrdered, k-row merge);
    no global sort; result is k rows regardless of corpus size."""
    from .operators.corpus import kmv_sketch

    return kmv_sketch(_t(spark, sf_dir, "documents"), k=16)


@query(
    "q125_kmv_set_ops",
    # θ = min of the two inclusion bounds (2^60 when a sketch holds its
    # whole set, else max h); both sketches cut to h ≤ θ where each is a
    # complete sample; counts are exact integers over the cut, estimates
    # = count·2^60/θ (long→double casts + divisions of identical
    # operands); jaccard = inter/union of the cut sets (θ cancels)
    oracle=f"""
    WITH a AS ({_KMV_SQL_SKETCH.format(tokenize=_SQL_TOKENIZE,
                                       where="WHERE doc_id % 2 = 0", k=16)}),
    b AS ({_KMV_SQL_SKETCH.format(tokenize=_SQL_TOKENIZE,
                                  where="WHERE doc_id % 2 <> 0", k=16)}),
    ta AS (SELECT CASE WHEN count(*) < 16
                       THEN CAST(1152921504606846976 AS BIGINT)
                       ELSE max(h) END AS th FROM a),
    tb AS (SELECT CASE WHEN count(*) < 16
                       THEN CAST(1152921504606846976 AS BIGINT)
                       ELSE max(h) END AS th FROM b),
    th AS (SELECT least(ta.th, tb.th) AS theta FROM ta, tb),
    ac AS (SELECT h FROM a, th WHERE h <= theta),
    bc AS (SELECT h FROM b, th WHERE h <= theta),
    i AS (SELECT CAST(count(*) AS BIGINT) AS inter_seen
          FROM ac WHERE h IN (SELECT h FROM bc)),
    u AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS union_seen
          FROM (SELECT h FROM ac UNION ALL SELECT h FROM bc))
    SELECT theta AS theta_cut, inter_seen, union_seen,
           CAST(union_seen AS DOUBLE) * (1152921504606846976.0
             / CAST(theta AS DOUBLE)) AS union_est,
           CAST(inter_seen AS DOUBLE) * (1152921504606846976.0
             / CAST(theta AS DOUBLE)) AS intersect_est,
           CASE WHEN union_seen = 0 THEN 0.0
                ELSE CAST(inter_seen AS DOUBLE) / CAST(union_seen AS DOUBLE)
           END AS jaccard_est
    FROM th, i, u
    """,
)
def q125_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations between the even- and odd-doc_id
    halves of the corpus: union / intersection / Jaccard estimates from
    two k=16 KMV sketches — the cheap cross-corpus overlap measure
    (contamination triage before the exact span-level pass, q104/q111).
    Scale: each sketch is one vocab-sized agg on its half; everything
    downstream operates on ≤16-row frames."""
    from .operators.corpus import kmv_set_ops, kmv_sketch

    docs = _t(spark, sf_dir, "documents")
    a = kmv_sketch(docs.filter(F.col("doc_id") % 2 == 0), k=16)
    b = kmv_sketch(docs.filter(F.col("doc_id") % 2 != 0), k=16)
    return kmv_set_ops(a, b, k=16)


# Dyadic quantile sketch: fourth sketch-family member (count-min =
# frequencies, HLL = cardinality, KMV = set ops, this = QUANTILES).
# Power-of-two buckets (HDR-histogram form of DDSketch, Masson et al.
# VLDB 2019) make every operation integer: bucket index is pure bit
# arithmetic, lo/hi are observed per-bucket min/max, the quantile walk
# is integer ranks over integer cumulative counts — both halves fully
# oracle-replicable.
def _sql_dyadic_sketch(grp: list[str] | None = None) -> str:
    """DuckDB twin of operators.corpus.dyadic_histogram over
    documents.n_chars — identical bit arithmetic (bin-length bitlen,
    shift, truncating div on positives), optionally grouped.  ONE
    generator for q126/q127/q135 so the bucket algebra can never
    drift between the grouped and ungrouped oracles."""
    g = ", ".join(grp or [])
    gsel = (g + ", ") if g else ""
    gby = f" GROUP BY {gsel}bucket_idx" if g else " GROUP BY bucket_idx"
    return f"""
    WITH v AS (SELECT {gsel}CAST(n_chars AS BIGINT) AS v FROM documents
               WHERE n_chars IS NOT NULL),
    bl AS (SELECT {gsel}v, length(bin(v)) - 1 AS b FROM v),
    ix AS (
      SELECT {gsel}v,
             CASE WHEN v < 64 THEN v
                  ELSE CAST(b - 5 AS BIGINT) * 32
                       + v // (CAST(1 AS BIGINT) << CAST(b - 5 AS INT))
             END AS bucket_idx
      FROM bl
    ),
    sk AS (
      SELECT {gsel}bucket_idx, CAST(min(v) AS BIGINT) AS lo,
             CAST(max(v) AS BIGINT) AS hi,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ix{gby}
    )
"""


_DYADIC_SQL_SKETCH = _sql_dyadic_sketch()


@query(
    "q126_quantile_sketch",
    # bucket index = identical bit arithmetic (bin-length bitlen, shift,
    # truncating div on positives); lo/hi/cnt are exact aggregates —
    # DuckDB rebuilds the table row-for-row
    oracle=_DYADIC_SQL_SKETCH
    + "SELECT bucket_idx, lo, hi, cnt FROM sk",
)
def q126_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic quantile-sketch table (sub_bits=5 → ≤3.2% relative bucket
    width) over document lengths — the bounded-memory, cell-wise-
    MERGEABLE quantile summary (union across shards/days = sum cnt,
    min lo, max hi; pytest pins merge ≡ whole-corpus).  The table is
    exact and deterministic; the approximation lives only in what the
    ESTIMATES (q127) claim about true order statistics.  Scale: one
    hash agg into ≤ (64−s)·2^s ≈ 2k groups regardless of row count —
    map-side partial sum/min/max does nearly all the work."""
    from .operators.corpus import dyadic_histogram

    docs = _t(spark, sf_dir, "documents").select("n_chars")
    return dyadic_histogram(docs, "n_chars", sub_bits=5)


@query(
    "q127_quantile_estimate",
    # rank r = ceil(q·N) as (N·num + den − 1) div den; first bucket with
    # cumulative count ≥ r provably CONTAINS the true rank-r value; the
    # midpoint estimate is all-integer — replayed exactly
    oracle=_DYADIC_SQL_SKETCH
    + """,
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM sk),
    cum AS (
      SELECT bucket_idx, lo, hi,
             CAST(sum(cnt) OVER (ORDER BY bucket_idx) AS BIGINT) AS cum
      FROM sk
    ),
    q AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
                                ('p90', 9, 10), ('p99', 99, 100))
          t(q_label, num, den)),
    t AS (
      SELECT q_label,
             CAST((n.n * num + den - 1) // den AS BIGINT) AS target_rank
      FROM q, n
    ),
    hit AS (
      SELECT t.q_label, t.target_rank,
             min(c.bucket_idx) AS bucket_idx
      FROM t JOIN cum c ON c.cum >= t.target_rank
      GROUP BY t.q_label, t.target_rank
    )
    SELECT h.q_label AS q_label, h.target_rank AS target_rank,
           h.bucket_idx AS bucket_idx, c.lo AS lo, c.hi AS hi,
           CAST((c.lo + c.hi) // 2 AS BIGINT) AS est
    FROM hit h JOIN cum c USING (bucket_idx)
    """,
)
def q127_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates (p25/p50/p90/p99 of document length) from the
    q126 sketch: rank r = ceil(q·N), first bucket whose cumulative count
    reaches r.  That bucket provably contains the true rank-r value, so
    lo ≤ q_true ≤ hi and est = (lo+hi) div 2 is off by ≤ 2^−5 relative
    (pytest pins the bracket + bound vs exact order statistics); the
    VALUES are deterministic integer functions of the sketch, so the
    oracle replays them exactly.  Scale: the walk reads the ≤2k-row
    sketch; its window orders that tiny table's single bucket axis —
    never a data-sized global window; the expensive part is q126's one
    agg."""
    from .operators.corpus import dyadic_histogram, dyadic_quantile_estimate

    docs = _t(spark, sf_dir, "documents").select("n_chars")
    sk = dyadic_histogram(docs, "n_chars", sub_bits=5)
    return dyadic_quantile_estimate(sk)


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical distinct edges of the part co-purchase graph (parts
    co-ordered with l_quantity > 40 on both lineitems, u < v) — ONE
    builder for q128/q137 so graph and oracle can never drift.  The
    per-order self-join is bounded by order size, so it stays linear in
    lineitem."""
    l = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_partkey")
    )
    a = l.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("u")
    )
    b = l.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("v")
    )
    return (
        a.join(b, "_ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )



@query(
    "q128_triangle_counts",
    # per-node triangle counts are orientation-independent, so the oracle
    # enumerates canonically by partkey (a<b<c) while Spark enumerates by
    # degree rank — same triangle set, same counts.  Edges: parts
    # co-ordered with l_quantity > 40 on both sides, distinct u<v.
    oracle="""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      )
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT n.node AS node, CAST(coalesce(c.t, 0) AS BIGINT) AS tri_cnt
    FROM nodes n LEFT JOIN corners c USING (node)
    """,
)
def q128_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node triangle counts over the part co-purchase graph
    (parts co-ordered with l_quantity > 40 on both lineitems; distinct
    canonical edges) — degree-ordered orientation so every triangle
    materializes once at its lowest-(deg,id) corner and the wedge
    self-join is bounded by Σ outdeg² = O(m^1.5) on ANY graph (the
    hub-skew killer; a naive adjacency join is Σ deg² and explodes on
    hot parts).  Edge build is a per-order self-join — order size is
    bounded, so it stays linear in lineitem.  Scale: two node-keyed
    hash joins + one explode-3 groupBy; no window, no global sort."""
    from .operators.graph import triangle_counts

    return triangle_counts(_copurchase_edges(spark, sf_dir), "u", "v")


@query(
    "q129_cohort_retention",
    # integer day index = epoch_us div 86400e6 (exact integer both
    # engines — the ts_us contract); cohort = each user's first active
    # day; retention per-mille = truncating integer division
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    c AS (
      SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
    ),
    a AS (
      SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
             CAST(count(*) AS BIGINT) AS active_users
      FROM ud JOIN c USING (user_id)
      GROUP BY 1, 2
    ),
    s AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM c GROUP BY 1
    )
    SELECT CAST(a.cohort_day AS BIGINT) AS cohort_day,
           CAST(a.day_offset AS BIGINT) AS day_offset,
           s.cohort_size AS cohort_size,
           a.active_users AS active_users,
           CAST((1000 * a.active_users) // s.cohort_size AS BIGINT)
             AS retention_pm
    FROM a JOIN s USING (cohort_day)
    """,
)
def q129_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the event stream: users grouped by
    first-active day, then for every (cohort_day, day_offset) the
    distinct active users and the retention per-mille (exact truncating
    integer — float ratios are engine-rounding bait).  The product-
    analytics staple the reference's daily batch never had.  Scale:
    distinct (user, day) reduction first (collapses the raw stream),
    then a user-keyed min + rejoin that REUSES the user partitioning,
    then a groupBy on the small (cohort × offset) grid; cohort sizes are
    a ≤#days-row broadcast.  No windows, no global sorts."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    ud = (
        ev.select(
            "user_id", F.expr("ts_us div 86400000000").alias("day")
        )
        .distinct()
    )
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        ud.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return act.join(F.broadcast(sizes), "cohort_day").select(
        F.col("cohort_day").cast("long"),
        F.col("day_offset").cast("long"),
        "cohort_size",
        "active_users",
        F.expr("(1000 * active_users) div cohort_size")
        .cast("long")
        .alias("retention_pm"),
    )


@query(
    "q130_pmi_bigrams",
    # pmi_fx = fx(c_ab) + 2·fx(N) − fx(B) − fx(c_a) − fx(c_b): the
    # fixed-point dyadic log2 decomposition IS the score definition
    # (identical integer arithmetic both engines); top-50 under the
    # total order (pmi_fx DESC, bigram ASC) is a deterministic cut
    oracle=f"""
    WITH ws0 AS (SELECT {_SQL_TOKENIZE} AS w0 FROM documents),
    ws AS (SELECT list_filter(w0, t -> t <> '') AS w FROM ws0),
    uni AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(w) AS t FROM ws) GROUP BY t
    ),
    bg AS (
      SELECT w[i] AS t1, w[i + 1] AS t2
      FROM ws, unnest(range(1, len(w))) AS u(i)
    ),
    bc AS (
      SELECT t1, t2, CAST(count(*) AS BIGINT) AS c_ab
      FROM bg GROUP BY t1, t2
    ),
    nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
    bt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bigrams FROM bc),
    j AS (
      SELECT bc.t1, bc.t2, bc.c_ab, ua.c AS c_a, ub.c AS c_b,
             nt.n_tokens, bt.n_bigrams
      FROM bc JOIN uni ua ON bc.t1 = ua.t
              JOIN uni ub ON bc.t2 = ub.t, nt, bt
      WHERE bc.c_ab >= 5
    ),
    s AS (
      SELECT t1 || ' ' || t2 AS bigram, c_ab, c_a, c_b,
             CAST({_sql_flog2_fx('c_ab')}
                  + 2 * {_sql_flog2_fx('n_tokens')}
                  - {_sql_flog2_fx('n_bigrams')}
                  - {_sql_flog2_fx('c_a')}
                  - {_sql_flog2_fx('c_b')} AS BIGINT) AS pmi_fx
      FROM j
    )
    SELECT bigram, c_ab, c_a, c_b, pmi_fx,
           CAST(pmi_fx AS DOUBLE) / 1048576.0 AS pmi
    FROM s ORDER BY pmi_fx DESC, bigram ASC LIMIT 50
    """,
)
def q130_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked bigram collocations (word2phrase-style phrase mining)
    over the corpus: top-50 bigrams with count ≥ 5 by fixed-point
    dyadic-log2 PMI — the multiword-unit discovery pass before
    tokenizer training.  Scale: one unigram agg + one bigram agg (both
    map-side combined), token-keyed joins of the count-filtered bigram
    table, 1-row N/B broadcasts, distributed top-k.  See
    operators/corpus.py:pmi_bigrams for the bit-stability contract."""
    from .operators.corpus import pmi_bigrams

    return pmi_bigrams(
        _t(spark, sf_dir, "documents"), min_count=5, topk=50
    )


@query(
    "q131_skyline_pareto",
    # dominance is pure comparison on raw column values (no arithmetic)
    # — the NOT EXISTS scan verifies the distributed prefix-min answer
    # row-for-row, ties on both criteria included
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_retailprice, p_size FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT a.p_partkey AS p_partkey,
           a.p_retailprice AS p_retailprice,
           a.p_size AS p_size
    FROM p a WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def q131_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto front of parts: cheapest-for-their-size (minimize
    p_retailprice, maximize p_size) — the classic tradeoff operator
    (Börzsönyi et al. ICDE 2001).  The textbook plan is a global sort +
    running min (single-partition window — the scale-killer); this runs
    the two-pass distributed prefix-min instead: per-x reduction, range
    partition on x, per-partition minima to the driver (numPartitions
    rows, config-bounded), broadcast offsets + bounded local windows.
    See operators/skyline.py."""
    from .operators.skyline import skyline_2d

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(
        p, F.col("p_retailprice"), -F.col("p_size")
    )


@query(
    "q132_rrf_hybrid_fusion",
    # both input rankings are bit-stable (bm25: integer rationals +
    # fixed-order COALESCE chain; cosine: identical left-fold dot) and
    # totally ordered (score desc, id asc), so ranks replay exactly;
    # RRF contribution = 2^20 div (60 + rank) — truncating integer div
    oracle=f"""
    WITH bm AS (
      SELECT doc_id, score FROM ({_sql_bm25(_BM25_TERMS)})
    ),
    ra AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                  AS BIGINT) AS rank_bm25
      FROM bm
    ),
    qv AS (SELECT embedding AS qv FROM embeddings
           WHERE vec_id = 0 AND {_sql_nonzero('embedding')}),
    cs AS (
      SELECT e.vec_id,
             {_SQL_COS.format(a="e.embedding", b="q.qv")} AS c
      FROM embeddings e, qv q
      WHERE {_sql_nonzero('e.embedding')}
      ORDER BY c DESC, vec_id LIMIT 20
    ),
    rb AS (
      SELECT vec_id AS doc_id,
             CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC)
                  AS BIGINT) AS rank_cos
      FROM cs
    ),
    j AS (
      SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             ra.rank_bm25, rb.rank_cos
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, rank_bm25, rank_cos,
           CAST(COALESCE(1048576 // (60 + rank_bm25), 0)
                + COALESCE(1048576 // (60 + rank_cos), 0)
                AS BIGINT) AS rrf_fx,
           CAST(COALESCE(1048576 // (60 + rank_bm25), 0)
                + COALESCE(1048576 // (60 + rank_cos), 0)
                AS DOUBLE) / 1048576.0 AS rrf
    FROM j
    """,
)
def q132_rrf_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of sparse and dense retrieval (Cormack et
    al. SIGIR 2009; the standard hybrid-search combiner): BM25 top-20
    (q106's scorer) ⊕ exact-cosine top-20 vs the vec_id=0 query
    (q24's scorer), fused by Σ 2^20 div (60 + rank) — integer
    fixed-point, so the fused scores are bit-stable where float
    1/(60+r) sums would be association-order bait.  Missing-from-one-
    list docs contribute 0 from that list.  Scale: both inputs are
    distributed top-k's; everything downstream (rank windows, full
    outer join, fusion) runs on ≤20-row frames — the windows order a
    bounded frame, never data.  Output: the fused union list."""
    from pyspark.sql import Window as W

    from .operators.corpus import bm25_topk
    from .operators.similarity import cosine, nonzero_vec

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    a = bm25_topk(docs, list(_BM25_TERMS), k=20, eager=True)
    ra = a.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("rank_bm25"),
    )
    qv = _query_vec(emb)  # NULL/missing-safe shared fetch (guard doc there)
    if any(float(x) != 0.0 for x in qv):
        q = F.array(*[F.lit(float(x)) for x in qv])
        cs = (
            emb.filter(nonzero_vec(F.col("embedding")))
            .select("vec_id", cosine(F.col("embedding"), q).alias("_c"))
            .orderBy(F.desc("_c"), "vec_id")
            .limit(20)
            .localCheckpoint(eager=True)  # freeze the top-k before ranking
        )
    else:  # zero/missing query → fusion degrades to bm25-only
        cs = emb.filter(F.lit(False)).select(
            "vec_id", F.lit(None).cast("double").alias("_c")
        )
    rb = cs.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.desc("_c"), F.asc("vec_id")))
        .cast("long")
        .alias("rank_cos"),
    )
    j = ra.join(rb, "doc_id", "full_outer")
    fx = F.coalesce(
        F.expr("1048576 div (60 + rank_bm25)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr("1048576 div (60 + rank_cos)"), F.lit(0).cast("long")
    )
    return j.select(
        "doc_id",
        "rank_bm25",
        "rank_cos",
        fx.cast("long").alias("rrf_fx"),
        (fx.cast("double") / F.lit(1048576.0)).alias("rrf"),
    )


@query(
    "q133_stream_static_join",
    # stateless append-mode stream-static inner join: every stream row
    # is enriched and emitted EXACTLY ONCE regardless of micro-batch
    # layout (convention-9 exempt class — no per-batch snapshots, no
    # state), so the drained sink equals the batch join
    oracle="""
    SELECT e.event_id AS event_id, e.user_id AS user_id,
           epoch_us(e.ts) AS ts_us, e.value AS value,
           c.c_mktsegment AS c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def q133_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the remaining Structured
    Streaming join shape next to stream-stream (q63): the purchase
    stream inner-joined per micro-batch to the static customer
    dimension (broadcast — the dim rescans per batch, so keeping it
    broadcast-shaped is the 100 TB posture), appended to a memory sink
    under Trigger.AvailableNow.  Stateless: no watermark, no state
    store; each stream row emits exactly once, so a raw sink read is
    correct for ANY batch count (unlike update-mode aggregations —
    convention 9).  The oracle is the batch join."""
    import uuid

    from .sources.tables import load_events_stream
    from .streaming.ingest import drain_available_now

    stream = load_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(cust), stream["user_id"] == cust["c_custkey"]
    ).select("event_id", "user_id", "ts_us", "value", "c_mktsegment")
    name = f"q133_out_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    return spark.table(name)


@query(
    "q134_market_basket_pairs",
    # support counts are exact integers; lift is ONE double expression
    # over exact integer operands with identical op order both engines;
    # top-25 under (c_ab DESC, pa, pb) is a deterministic cut
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ic AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
      FROM items GROUP BY 1
    ),
    freq AS (SELECT l_partkey, c FROM ic WHERE c >= 3),
    fitems AS (
      SELECT i.l_orderkey, i.l_partkey
      FROM items i JOIN freq f USING (l_partkey)
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM fitems a JOIN fitems b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.pa, p.pb, p.c_ab, fa.c AS c_a, fb.c AS c_b, n.n_orders
      FROM pairs p JOIN freq fa ON p.pa = fa.l_partkey
                   JOIN freq fb ON p.pb = fb.l_partkey, n
      WHERE p.c_ab >= 3
    )
    SELECT pa, pb, c_ab, c_a, c_b, n_orders,
           (CAST(n_orders AS DOUBLE) * CAST(c_ab AS DOUBLE))
           / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) AS lift
    FROM scored
    ORDER BY c_ab DESC, pa ASC, pb ASC LIMIT 25
    """,
)
def q134_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-pair mining with apriori pruning (Agrawal
    & Srikant VLDB'94): top-25 co-ordered part pairs with support ≥ 3,
    scored by lift = N·c_ab/(c_a·c_b).  The apriori step is the scale
    argument: items are filtered to frequent ones BEFORE the per-order
    pair join (every frequent pair has frequent members — lossless),
    so the quadratic-per-order pair build runs only over survivors and
    per-order item count bounds it linearly in lineitem.  Lift is one
    double expression over exact integer operands (identical op order
    both engines).  Scale: distinct reduction → item-count agg →
    semi-join prune → bounded per-order self-join → pair agg →
    distributed top-k.  No windows, no global sorts."""
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    ic = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    freq = ic.filter(F.col("c") >= 3)
    fitems = items.join(freq.select("l_partkey"), "l_partkey")
    n = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    a = fitems.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pa")
    )
    b = fitems.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "_ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    fa = freq.select(F.col("l_partkey").alias("pa"), F.col("c").alias("c_a"))
    fb = freq.select(F.col("l_partkey").alias("pb"), F.col("c").alias("c_b"))
    scored = (
        pairs.join(fa, "pa")
        .join(fb, "pb")
        .crossJoin(F.broadcast(n))
    )
    return (
        scored.select(
            "pa", "pb", "c_ab", "c_a", "c_b", "n_orders",
            (
                (F.col("n_orders").cast("double") * F.col("c_ab").cast("double"))
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("c_ab"), F.asc("pa"), F.asc("pb"))
        .limit(25)
    )


@query(
    "q135_grouped_quantiles",
    # same bucket algebra as q126/q127 (one SQL generator), partitioned
    # by lang: per-group ranks, cumulative walk, and midpoints are all
    # integers — replayed exactly
    oracle=_sql_dyadic_sketch(["lang"])
    + """,
    n AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM sk GROUP BY lang),
    cum AS (
      SELECT lang, bucket_idx, lo, hi,
             CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bucket_idx)
                  AS BIGINT) AS cum
      FROM sk
    ),
    q AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
                                ('p90', 9, 10), ('p99', 99, 100))
          t(q_label, num, den)),
    t AS (
      SELECT n.lang, q_label,
             CAST((n.n * num + den - 1) // den AS BIGINT) AS target_rank
      FROM q, n
    ),
    hit AS (
      SELECT t.lang, t.q_label, t.target_rank,
             min(c.bucket_idx) AS bucket_idx
      FROM t JOIN cum c
        ON c.lang = t.lang AND c.cum >= t.target_rank
      GROUP BY 1, 2, 3
    )
    SELECT h.lang AS lang, h.q_label AS q_label,
           h.target_rank AS target_rank, h.bucket_idx AS bucket_idx,
           c.lo AS lo, c.hi AS hi,
           CAST((c.lo + c.hi) // 2 AS BIGINT) AS est
    FROM hit h JOIN cum c
      ON c.lang = h.lang AND c.bucket_idx = h.bucket_idx
    """,
)
def q135_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantiles from ONE grouped dyadic
    sketch (p25/p50/p90/p99 per lang) — the grouped form of q126/q127:
    the single hash agg gains a group key (≤2k buckets × #groups), the
    quantile walk partitions by group, and grouped targets join the
    cumulative table on the group key (keyed hash join — never a
    broadcast of data-sized state).  Same bracket guarantee per group.
    The per-group percentile dashboard every corpus-curation pipeline
    wants, at sketch cost."""
    from .operators.corpus import dyadic_histogram, dyadic_quantile_estimate

    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    sk = dyadic_histogram(
        docs, "n_chars", sub_bits=5, group_cols=["lang"]
    )
    return dyadic_quantile_estimate(sk, group_cols=["lang"])


@query(
    "q136_streaming_quantile_sketch",
    # drained streaming sketch ≡ the batch sketch: the update-mode sink
    # is compacted per bucket with cell-wise monotone aggregates
    # (min lo / max hi / max cnt — convention 9) before comparison
    oracle=_DYADIC_SQL_SKETCH + "SELECT bucket_idx, lo, hi, cnt FROM sk",
)
def q136_streaming_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dyadic quantile sketch AS A STREAM: documents arrive as a
    file stream, bucket indices are the same bit arithmetic (one shared
    operator with q126), and the sketch accumulates as an update-mode
    stateful aggregation — state is the ≤2k-bucket table itself, so
    state size is bounded by the sketch, not the stream.  The sink read
    is compacted per bucket with cell-wise MONOTONE aggregates (min lo,
    max hi, max cnt — convention 9: update mode emits one row per
    changed bucket per micro-batch; pinned by a 2-batch pytest), after
    which the drained result equals the batch sketch exactly — that
    equality is the oracle.  This is the mergeable-sketch contract in
    streaming form: per-day batch sketches and a live stream sketch
    compose interchangeably."""
    import uuid

    from .operators.corpus import dyadic_histogram
    from .sources.tables import load_documents_stream
    from .streaming.ingest import drain_available_now
    from .streaming.stateful import compact_sketch_sink

    stream = load_documents_stream(spark, sf_dir)
    # the operator body is pure groupBy/agg — it compiles unchanged on a
    # streaming DataFrame, so the stream sketch IS q126's operator
    sketch = dyadic_histogram(
        stream.select("n_chars"), "n_chars", sub_bits=5
    )
    name = f"q136_out_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sketch.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return compact_sketch_sink(spark.table(name))


@query(
    "q137_clustering_coefficient",
    # same canonical triangle enumeration as q128 plus the exact degree;
    # lcc_ppm is truncating-integer parts-per-million, lcc one double
    # division of identical operands
    oracle="""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    j AS (
      SELECT d.node, d.deg, CAST(coalesce(c.t, 0) AS BIGINT) AS tri_cnt
      FROM deg d LEFT JOIN corners c USING (node)
    )
    SELECT node, deg, tri_cnt,
           CAST(CASE WHEN deg >= 2
                THEN (2 * 1000000 * tri_cnt) // (deg * (deg - 1))
                ELSE 0 END AS BIGINT) AS lcc_ppm,
           CASE WHEN deg >= 2
                THEN (2.0 * CAST(tri_cnt AS DOUBLE))
                     / CAST(deg * (deg - 1) AS DOUBLE)
                ELSE 0.0 END AS lcc
    FROM j
    """,
)
def q137_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact local clustering coefficient over the q128 co-purchase
    graph: 2·tri/(deg·(deg−1)) per part — how clique-like each part's
    co-purchase neighborhood is.  Exact truncating-integer ppm plus one
    display double of identical operands; triangle_counts' scale shape
    plus one projection."""
    from .operators.graph import clustering_coefficient

    return clustering_coefficient(
        _copurchase_edges(spark, sf_dir), "u", "v"
    )


@query(
    "q138_stratified_weighted_sample",
    # identical seeded 60→40-bit draw, identical fixed-point skey
    # (q115's algebra), cut by a per-source rank window — replayed with
    # the same PARTITION BY row_number
    oracle=f"""
    WITH h AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
             CAST(('0x' || substring(
               md5('wsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 10))
               AS BIGINT) + 1 AS u
      FROM documents WHERE n_chars > 0
    ),
    s AS (
      SELECT source, doc_id, weight,
             ((40 * 1048576 - {_sql_flog2_fx('u')}) * 1048576) // weight
               AS skey
      FROM h
    ),
    r AS (
      SELECT source, doc_id, weight, skey,
             row_number() OVER (PARTITION BY source
                                ORDER BY skey ASC, doc_id ASC) AS rn
      FROM s
    )
    SELECT source, doc_id, weight, skey FROM r WHERE rn <= 20
    """,
)
def q138_stratified_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Balanced per-stratum weighted sampling: 20 docs PER SOURCE by
    the A-ES priority key (q115's bit-identical integer algebra) —
    the corpus-mixing draw that keeps every stratum represented
    regardless of stratum size skew.  Scale: the draw is a pure map;
    the cut is a rank window partitioned by source — each stratum
    sorts once, never a global sort (the q15 top-k-per-group shape)."""
    from .operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        "n_chars",
        k=20,
        group_col="source",
    )


@query(
    "q139_ema_fold",
    # identical ordered left fold both engines: list_sort of (ts_us,
    # event_id, cents) structs, first element as init, then
    # v' = (7v + c·2^20) >> 3 — all-positive integer ops (the >> form
    # avoids the Spark-truncates vs DuckDB-floors negative-div trap);
    # cents = floor(value·100) (floor is IEEE-exact; a bare double→int
    # cast ROUNDS on DuckDB but truncates on Spark)
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    l AS (
      SELECT user_id,
             list_sort(list({'ts_us': ts_us, 'event_id': event_id,
                             'cents': cents})) AS lst
      FROM c GROUP BY user_id
    ),
    f AS (
      SELECT user_id, CAST(len(lst) AS BIGINT) AS n_events,
             CAST(list_reduce(
               list_transform(lst, x -> x.cents * 1048576),
               (acc, x) -> (7 * acc + x) >> 3
             ) AS BIGINT) AS ema_fx
      FROM l
    )
    SELECT user_id, n_events, ema_fx,
           CAST(ema_fx AS DOUBLE) / 104857600.0 AS ema
    FROM f
    """,
)
def q139_ema_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average of purchase value per user — the
    ordered per-key RECURRENCE no window function expresses (each state
    depends on the previous state, not on a frame aggregate), run as an
    event-time-ordered fold: v' = (7·v + cents·2^20) div 8
    (α = 1/8, fixed point 2^20).  The all-positive shift form sidesteps
    the negative-division engine divergence, and both engines execute
    the IDENTICAL fold order ((ts_us, event_id) is a total order), so
    ema_fx is bit-identical.

    Scale shape (r11, replacing the collect_list fold): shuffle on
    user, partition-local sort (spills gracefully), and an
    Arrow-batched STREAMING fold with O(1) state per key
    (operators/temporal.py:ema_fixed_point) — no per-key array ever
    materializes, so per-user event count no longer bounds executor
    memory (the r10 verdict's last known-limit on this query)."""
    from .operators.temporal import ema_fixed_point
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    c = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    folded = ema_fixed_point(
        c, "user_id", ["ts_us", "event_id"], "cents",
        mult=7, shift=3, fx_bits=20,
    )
    return folded.select(
        "user_id",
        "n_events",
        "ema_fx",
        (F.col("ema_fx").cast("double") / F.lit(104857600.0)).alias("ema"),
    )


@query(
    "q140_grouped_ols_trend",
    # identical exact integer inputs (epoch-day x via epoch_us div,
    # cent y via floor — never a bare double→int cast) and identical
    # decimal(38,0) normal-equation algebra; the two display doubles
    # are one division each of identical operands.  The >2^53 decimal
    # operands convert via VARCHAR (conv 16): DuckDB's direct
    # decimal→double DOUBLE-ROUNDS (hugeint halves) and differs from
    # Spark's correctly-rounded BigDecimal.doubleValue in the last bit
    # (2 of 1494 rows, r6 driver red); strtod on the exact digit
    # string is correctly rounded, matching Spark bit-for-bit.
    # The exact num/den PAYLOAD columns ship as digit strings (conv 19).
    oracle=_sql_str_out("""
    WITH o AS (
      SELECT o_custkey,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    a AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxy
      FROM o GROUP BY o_custkey HAVING count(*) >= 3
    ),
    d AS (
      SELECT o_custkey, n,
             CAST(CAST(n AS DECIMAL(19,0)) * sxy
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS slope_num,
             CAST(CAST(n AS DECIMAL(19,0)) * sxx
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS slope_den,
             CAST(CAST(sy AS DECIMAL(19,0)) * sxx
                  - CAST(sx AS DECIMAL(19,0)) * sxy
                  AS DECIMAL(38,0)) AS icept_num
      FROM a
    )
    SELECT o_custkey, n, slope_num, slope_den,
           CASE WHEN slope_den <> 0
                THEN CAST(CAST(slope_num AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(slope_den AS VARCHAR) AS DOUBLE)
           END AS slope,
           CASE WHEN slope_den <> 0
                THEN CAST(CAST(icept_num AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(slope_den AS VARCHAR) AS DOUBLE)
           END AS intercept
    FROM d
    """, ("slope_num", "slope_den")),
)
def q140_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend-trend OLS fit: cents of o_totalprice regressed
    on the epoch-day of the order — the per-key drift feature (is this
    customer spending more or less over time?) a churn/LTV pipeline
    computes for every key.  Exact decimal(38,0) normal equations from
    integer (epoch-day, cent) inputs; the closed-form-per-group shape
    the reference's group stats use, one order up (operators/regress.py
    — vs reference dags/marketeye_etl_dag.py per-group mean/std).

    Scale: ONE map-side-combined groupBy over orders, per-row algebra on
    the group frame after — no windows, no second pass; decimal sums
    merge exactly across partials."""
    from .operators.regress import grouped_ols

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        # o_orderdate is parquet TIMESTAMP_NTZ: NTZ→DATE drops the time
        # part with NO session-TZ involvement (a plain driver session in
        # any TZ reads the same integer day — conv 5)
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("x"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    return _str_decimals(grouped_ols(o, ["o_custkey"], "x", "y", min_n=3))


@query(
    "q141_grouped_pearson",
    # same suff-stat algebra; corr = num / (sqrt(vx)·sqrt(vy)) with the
    # identical operand order — sqrt is correctly rounded on both
    # engines.  >2^53 decimal→double via VARCHAR roundtrip (conv 16 —
    # DuckDB's direct cast double-rounds; see q140); exact payload
    # columns ship as digit strings (conv 19)
    oracle=_sql_str_out("""
    WITH o AS (
      SELECT l_suppkey,
             CAST(floor(l_quantity) AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    a AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS sxy,
             CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS syy
      FROM o GROUP BY l_suppkey HAVING count(*) >= 2
    ),
    d AS (
      SELECT l_suppkey, n,
             CAST(CAST(n AS DECIMAL(19,0)) * sxy
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS corr_num,
             CAST(CAST(n AS DECIMAL(19,0)) * sxx
                  - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS var_x_n,
             CAST(CAST(n AS DECIMAL(19,0)) * syy
                  - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                  AS DECIMAL(38,0)) AS var_y_n
      FROM a
    )
    SELECT l_suppkey, n, corr_num, var_x_n, var_y_n,
           CASE WHEN var_x_n > 0 AND var_y_n > 0
                THEN CAST(CAST(corr_num AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(var_x_n AS VARCHAR) AS DOUBLE))
                        * sqrt(CAST(CAST(var_y_n AS VARCHAR) AS DOUBLE)))
           END AS corr
    FROM d
    """, ("corr_num", "var_x_n", "var_y_n")),
)
def q141_grouped_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier Pearson correlation between line quantity and
    extended price (integer units × cents) — the per-segment coupling /
    drift-monitor statistic, from the same exact sufficient statistics
    as q140.  NULL where either column is constant within the group.

    Scale: identical shape to q140 — one grouped pass, exact mergeable
    decimal sums, per-row closed form."""
    from .operators.regress import grouped_pearson

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_quantity")).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    return _str_decimals(
        grouped_pearson(li, ["l_suppkey"], "x", "y", min_n=2)
    )


@query(
    "q183_grouped_mode",
    # identical argmax rule: max count, ties to the LEXICOGRAPHICALLY
    # smallest value — replayed with row_number on both sides (the
    # engine mode() functions have unspecified tie behavior)
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rn,
             CAST(sum(n) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_events
      FROM c
    )
    SELECT user_id, event_type AS modal_type, n AS modal_n, n_events,
           CAST((1000000 * n) // n_events AS BIGINT) AS share_ppm
    FROM r WHERE rn = 1
    """,
)
def q183_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type with a DETERMINISTIC tie rule (max
    count, then lexicographically smallest — engine mode() functions
    leave ties unspecified, so neither side uses them) plus its share
    — the categorical-imputation / dominant-behavior primitive.

    Scale shape: (key, value) count agg map-side, one per-key window
    over DISTINCT values, ppm from exact integers."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    wall = Window.partitionBy("user_id")
    r = c.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_events", F.sum("n").over(wall).cast("long")
    )
    return r.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("modal_type"),
        F.col("n").alias("modal_n"),
        "n_events",
        F.expr("(1000000 * n) div n_events").cast("long").alias(
            "share_ppm"
        ),
    )


@query(
    "q184_median_imputation",
    # identical lower-median rule (value at rank (m+1) div 2 of the
    # OBSERVED rows — no interpolation) and identical simulated mask
    # (quantity -> NULL when orderkey % 13 = 0); all-NULL groups stay
    # NULL
    oracle="""
    WITH b AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             CASE WHEN l_orderkey % 13 = 0 THEN NULL
                  ELSE CAST(floor(l_quantity) AS BIGINT) END AS qty
      FROM lineitem
    ),
    o AS (
      SELECT l_partkey, qty,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY qty ASC) AS rn,
             count(*) OVER (PARTITION BY l_partkey) AS m
      FROM b WHERE qty IS NOT NULL
    ),
    med AS (
      SELECT l_partkey,
             CAST(min(CASE WHEN rn = (m + 1) // 2 THEN qty END)
               AS BIGINT) AS fill
      FROM o GROUP BY l_partkey
    )
    SELECT b.l_orderkey, b.l_linenumber, b.l_partkey, b.qty,
           CAST(coalesce(b.qty, med.fill) AS BIGINT) AS qty_imputed,
           b.qty IS NULL AND med.fill IS NOT NULL AS was_imputed
    FROM b LEFT JOIN med USING (l_partkey)
    """,
)
def q184_median_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null repair by group median: line quantities masked NULL (a
    simulated broken feed: every 13th order) are filled with their
    part's exact LOWER median of observed values — the numeric
    imputation step of a cleaning pipeline (q183 is its categorical
    sibling; q143/q166/q180 flag/clamp/trim, this FILLS).  All-NULL
    groups stay NULL (was_imputed false) — never silently invent.

    Scale shape: one per-group sort window over observed rows + a
    tiny per-group fill frame joined back on the key."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.when(
            F.col("l_orderkey") % 13 == 0, F.lit(None)
        )
        .otherwise(F.floor(F.col("l_quantity")))
        .cast("long")
        .alias("qty"),
    )
    obs = li.filter(F.col("qty").isNotNull())
    w = Window.partitionBy("l_partkey").orderBy(F.col("qty").asc())
    wn = Window.partitionBy("l_partkey")
    med = (
        obs.withColumn("rn", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(wn))
        .groupBy("l_partkey")
        .agg(
            F.min(
                F.when(F.col("rn") == F.expr("(m + 1) div 2"), F.col("qty"))
            )
            .cast("long")
            .alias("fill")
        )
    )
    return li.join(med, "l_partkey", "left").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "qty",
        F.coalesce(F.col("qty"), F.col("fill"))
        .cast("long")
        .alias("qty_imputed"),
        (F.col("qty").isNull() & F.col("fill").isNotNull()).alias(
            "was_imputed"
        ),
    )


@query(
    "q185_reconciliation_report",
    # identical exact algebra: stored cents via IEEE-exact floor,
    # recomputed cents via DECIMAL sum (order-free) then exact floor;
    # band = decimal digit count of the cent difference (0 = balanced,
    # -1 = no lines) — pure integers, no tolerance floats
    oracle="""
    WITH r AS (
      SELECT l_orderkey,
             -- the first product widens to DECIMAL(24,8) explicitly:
             -- DuckDB keeps (12,4)x(6,4) in int64 internals and the
             -- second multiply overflows on domain-legal magnitudes
             -- (r8 fuzz x100 probe); Spark auto-widens the same chain
             CAST(floor(100 * sum(
               CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1 + CAST(l_tax AS DECIMAL(6,4))) AS DECIMAL(24,8))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))
             )) AS BIGINT) AS rc
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS sc, r.rc
      FROM orders LEFT JOIN r ON o_orderkey = r.l_orderkey
    ),
    b AS (
      SELECT CASE WHEN rc IS NULL THEN -1
                  WHEN abs(sc - rc) = 0 THEN 0
                  ELSE length(CAST(abs(sc - rc) AS VARCHAR)) END AS band
      FROM j
    )
    SELECT CAST(band AS INT) AS diff_digits,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM b GROUP BY band
    """,
)
def q185_reconciliation_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Books-balance reconciliation: every order's stored total vs the
    total recomputed from its lines (Σ extprice·(1+tax)·(1−discount)),
    reported as a digit-banded histogram of the cent difference
    (band 0 = balanced, −1 = order with no lines) — the cross-table
    consistency check a finance/ETL pipeline runs between fact tables;
    this corpus deliberately does NOT reconcile, which is exactly what
    the report exists to reveal.  All exact: decimal recompute
    (order-free), IEEE-exact floors, integer bands.

    Scale shape: one map-side-combined per-order decimal agg, one key
    join, a ≤12-row band groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_orderkey").agg(
        F.floor(
            F.lit(100)
            * F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (F.lit(1) + F.col("l_tax").cast("decimal(6,4)"))
                * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
            )
        )
        .cast("long")
        .alias("rc")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("sc"),
    )
    j = o.join(r, o["o_orderkey"] == r["l_orderkey"], "left")
    band = (
        F.when(F.col("rc").isNull(), F.lit(-1))
        .when(F.abs(F.col("sc") - F.col("rc")) == 0, F.lit(0))
        .otherwise(
            F.length(F.abs(F.col("sc") - F.col("rc")).cast("string"))
        )
    )
    return (
        j.withColumn("diff_digits", band.cast("int"))
        .groupBy("diff_digits")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


@query(
    "q186_seasonality_profile",
    # pure integer time algebra — hour = (ts_us div 3600e6) mod 24,
    # dow = (epoch_day + 4) mod 7 (1970-01-01 was a Thursday) — NO
    # timezone/date functions on either side (conv 5's surface avoided
    # entirely); exact counts + truncating purchase-rate ppm
    oracle="""
    WITH c AS (
      SELECT ((epoch_us(ts) // 3600000000) % 24) AS hour_utc,
             (((epoch_us(ts) // 86400000000) + 4) % 7) AS dow,
             event_type
      FROM events
    )
    SELECT CAST(dow AS INT) AS dow, CAST(hour_utc AS INT) AS hour_utc,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchases,
           CAST((1000000 * sum(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END)) // count(*)
             AS BIGINT) AS purchase_ppm
    FROM c GROUP BY dow, hour_utc
    """,
)
def q186_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity grid with purchase rates —
    the seasonality/load profile behind capacity planning and send-
    time optimization, computed with PURE integer time arithmetic
    (hour from µs division, weekday from the epoch-day Thursday
    anchor) so no engine date/timezone function is on the value path.

    Scale shape: one map-side-combined ≤168-group aggregate."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        F.expr("(ts_us div 3600000000) % 24").cast("int").alias("hour_utc"),
        F.expr("((ts_us div 86400000000) + 4) % 7").cast("int").alias("dow"),
        "event_type",
    )
    return ev.groupBy("dow", "hour_utc").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_purchases"),
        F.expr(
            "(1000000 * sum(CASE WHEN event_type = 'purchase'"
            " THEN 1 ELSE 0 END)) div count(*)"
        )
        .cast("long")
        .alias("purchase_ppm"),
    )


@query(
    "q187_fanout_profile",
    # distribution of per-key group sizes — the join-multiplicity
    # histogram; all exact integers
    oracle="""
    WITH g AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS sz
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(sz AS BIGINT) AS group_size,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(sz) AS BIGINT) AS n_rows
    FROM g GROUP BY sz
    """,
)
def q187_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out profile of lineitem's order key: the distribution
    of group sizes (how many orders have 1, 2, … lines) — the
    multiplicity histogram that predicts join output size and window
    cost before you run them (the planning companion to q176's skew
    Gini).

    Scale shape: groupBy-of-groupBy, both map-side combined; output
    is |distinct sizes| rows."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return g.groupBy(F.col("sz").alias("group_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("sz").cast("long").alias("n_rows"),
    )


@query(
    "q188_rfm_segments",
    # identical exact algebra: per-customer R/F/M integers (epoch-day
    # recency, order count, decimal-summed cents), ntile replaced by
    # the EXACT rank rule q = ((rn-1)*4) div n + 1 (engine ntile
    # boundary behavior differs) with a (value, key) total order
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(max(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE))) AS BIGINT)
               AS last_day,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(floor(100 * sum(CAST(o_totalprice AS DECIMAL(18,4))))
               AS BIGINT) AS monet
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT o_custkey,
             ((row_number() OVER (ORDER BY last_day ASC, o_custkey ASC)
               - 1) * 4) // (SELECT count(*) FROM c) + 1 AS r_q,
             ((row_number() OVER (ORDER BY freq ASC, o_custkey ASC)
               - 1) * 4) // (SELECT count(*) FROM c) + 1 AS f_q,
             ((row_number() OVER (ORDER BY monet ASC, o_custkey ASC)
               - 1) * 4) // (SELECT count(*) FROM c) + 1 AS m_q
      FROM c
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM r GROUP BY r_q, f_q, m_q
    """,
)
def q188_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the customer base: per customer, recency
    (last order epoch-day), frequency (order count), monetary (exact
    decimal cent total) — each cut into exact rank quartiles
    (q = ((rn−1)·4) div n + 1 over a (value, key) total order; engine
    ntile() boundary rules differ, so neither side uses it) — then the
    4×4×4 segment census marketing actually consumes.

    Scale shape: one per-customer agg, then THREE two-pass
    range-partitioned global ranks over the customer frame
    (operators/ranking.py — never an unpartitioned Window.orderBy,
    which moves every customer to one partition; the global count
    comes free from the rank pass's bounded per-partition collect,
    so no Window.partitionBy() global count either), one ≤64-group
    census."""
    from .operators.ranking import global_rank_cumsum

    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.max(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
        )
        .cast("long")
        .alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.floor(
            F.lit(100)
            * F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        )
        .cast("long")
        .alias("monet"),
    )
    staged, n, _ = global_rank_cumsum(
        c,
        [F.col("last_day").asc(), F.col("o_custkey").asc()],
        rank_col="_r_q_rn",
    )
    staged, _, _ = global_rank_cumsum(
        staged,
        [F.col("freq").asc(), F.col("o_custkey").asc()],
        rank_col="_f_q_rn",
    )
    staged, _, _ = global_rank_cumsum(
        staged,
        [F.col("monet").asc(), F.col("o_custkey").asc()],
        rank_col="_m_q_rn",
    )
    for q in ("r_q", "f_q", "m_q"):
        staged = staged.withColumn(
            q, (F.expr(f"((_{q}_rn - 1) * 4) div {n}") + 1).cast("int")
        )
    r = staged.select("o_custkey", "r_q", "f_q", "m_q")
    return r.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@query(
    "q189_pareto_concentration",
    # identical exact rule: per-customer cents (floor of a decimal
    # sum), desc (cents, key) total order, first rank where 5·cum ≥
    # 4·total (cross-multiplied 80% — no division on the gate path).
    # coalesce on n_customers/total_cents: on EMPTY input Spark emits
    # the F.lit totals (0) while min() over an empty frame is NULL —
    # pin the degenerate case to 0 on both sides (ADVICE r7)
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(floor(100 * sum(CAST(o_totalprice AS DECIMAL(18,4))))
               AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
               AS rn,
             CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cw,
             CAST(sum(cents) OVER () AS BIGINT) AS w,
             CAST(count(*) OVER () AS BIGINT) AS n_customers
      FROM c
    )
    SELECT CAST(min(rn) AS BIGINT) AS n_top,
           CAST(coalesce(min(n_customers), 0) AS BIGINT) AS n_customers,
           CAST(min_by(cw, rn) AS BIGINT) AS covered_cents,
           CAST(coalesce(min(w), 0) AS BIGINT) AS total_cents,
           CAST((1000000 * min(rn)) // min(n_customers) AS BIGINT)
             AS top_frac_ppm
    FROM r WHERE 5 * cw >= 4 * w
    """,
)
def q189_pareto_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue concentration: the smallest set of top customers
    covering ≥80% of total revenue (the 80/20 check behind account
    prioritization and risk concentration) — exact cents, the 80%
    gate cross-multiplied (5·cum ≥ 4·total), the fraction of the
    customer base as truncating ppm.

    Scale shape: per-customer agg, then ONE two-pass range-partitioned
    rank + prefix-sum over the customer frame (operators/ranking.py —
    never an unpartitioned ordered window, which single-partitions the
    customer base; the grand total and customer count come free from
    the rank pass's bounded per-partition collect), 1-row answer."""
    from .operators.ranking import global_rank_cumsum

    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.floor(
            F.lit(100) * F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        )
        .cast("long")
        .alias("cents")
    )
    r, n_customers, total_cents = global_rank_cumsum(
        c,
        [F.col("cents").desc(), F.col("o_custkey").asc()],
        rank_col="rn",
        sum_col="cents",
        cum_col="cw",
    )
    hit = r.filter(5 * F.col("cw") >= 4 * F.lit(total_cents))
    return hit.agg(
        F.min("rn").cast("long").alias("n_top"),
        F.lit(n_customers).cast("long").alias("n_customers"),
        F.min_by(F.col("cw"), F.col("rn")).cast("long").alias(
            "covered_cents"
        ),
        F.lit(total_cents).cast("long").alias("total_cents"),
        F.expr(f"(1000000 * min(rn)) div {n_customers}")
        .cast("long")
        .alias("top_frac_ppm"),
    )


@query(
    "q190_reorder_gap_histogram",
    # identical lag window over the (epoch-day, orderkey) total order;
    # week buckets by truncating div of non-negative gaps
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             o_orderkey
      FROM orders
    ),
    g AS (
      SELECT d - lag(d) OVER (PARTITION BY o_custkey
                              ORDER BY d, o_orderkey) AS gap
      FROM c
    )
    SELECT CAST(gap // 7 AS BIGINT) AS gap_weeks,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_days,
           CAST(max(gap) AS BIGINT) AS max_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY gap // 7
    """,
)
def q190_reorder_gap_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repurchase-cycle histogram: the distribution of day gaps
    between a customer's consecutive orders, bucketed by week — the
    inter-arrival profile behind churn thresholds and reorder
    reminders.  Exact epoch-day integers (NTZ→DATE, conv 5), lag over
    a total order, truncating week buckets.

    Scale shape: one key shuffle for the lag window, a
    |weeks|-cardinality groupBy."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("long")
        .alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("d").asc(), F.col("o_orderkey").asc()
    )
    g = o.withColumn("gap", F.col("d") - F.lag("d").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return g.groupBy(F.expr("gap div 7").cast("long").alias("gap_weeks")).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_days"),
        F.max("gap").cast("long").alias("max_days"),
    )


def _sql_kcore(k: int, rounds: int) -> str:
    """DuckDB twin of operators.graph.kcore: peeling unrolled as
    chained CTEs (aggregation inside a recursive CTE term is not
    portable).  ``rounds`` must be >= the graph's peeling depth — the
    Spark side iterates to the TRUE fixed point, and extra unrolled
    rounds are no-ops once converged, so a generous constant is safe
    (depth measured 3/5/7 at sf0.001/0.01/0.1 for k=3; 16 is the
    documented margin, re-probe if the edge rule changes).  Pure
    integer/set algebra — no floats to diverge.  Every chained CTE is
    MATERIALIZED: each round references the previous one 3x, and
    DuckDB's default inlining would multiply the base parquet scan
    3^rounds times (observed as an fd-exhaustion blowup)."""
    blocks = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""
    ]
    for i in range(1, rounds + 1):
        blocks.append(f"""d{i} AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e{i - 1} UNION ALL SELECT v FROM e{i - 1}
      ) GROUP BY node
    )""")
        blocks.append(f"""e{i} AS MATERIALIZED (
      SELECT u, v FROM e{i - 1}
      WHERE u IN (SELECT node FROM d{i} WHERE d >= {k})
        AND v IN (SELECT node FROM d{i} WHERE d >= {k})
    )""")
    chain = ",\n    ".join(blocks)
    return f"""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    {chain}
    SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      SELECT u AS node FROM e{rounds} UNION ALL SELECT v FROM e{rounds}
    ) GROUP BY node
    """


@query(
    "q142_kcore",
    # Spark peels to the TRUE fixed point (driver-scalar termination);
    # the oracle unrolls 16 rounds — a no-op past convergence, and 16
    # is >2x the deepest measured depth (7 at sf0.1).  Set/integer
    # semantics only, so the fixed point is engine-independent.
    oracle=_sql_kcore(3, 16),
)
def q142_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase part graph (q137's edge rule: parts
    sharing a high-quantity order): iteratively peel every part with
    fewer than 3 surviving co-purchase partners, keeping the densely
    cross-sold region — the dense-subgraph extractor (community seeds,
    bot-ring mining, importance filtering) completing the graph family
    (PageRank q114, CC q43, triangles q128, LCC q137).

    Scale shape: per round ONE map-side-combined degree groupBy + two
    left-semi joins on node keys; frames localCheckpoint'd so the plan
    never deepens; termination compares two driver scalars.  Rounds =
    peeling depth (each round removes ALL currently-sub-k nodes), not
    node count."""
    from .operators.graph import kcore

    return kcore(_copurchase_edges(spark, sf_dir), k=3, src_col="u",
                 dst_col="v")


@query(
    "q143_mad_outliers",
    # identical rank-based order statistics both sides: doubled-integer
    # medians (med2/mad4) from row_number picks — engine median() is
    # never called (even-n interpolation + return types differ) — and
    # the score is an all-positive truncating-integer ppm ratio
    oracle="""
    WITH b AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT l_partkey, price_cents,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY price_cents ASC) AS rn,
             count(*) OVER (PARTITION BY l_partkey) AS n
      FROM b
    ),
    rr AS (SELECT * FROM r WHERE n >= 5),
    med AS (
      SELECT l_partkey,
             CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN price_cents ELSE 0 END)
                + sum(CASE WHEN rn = (n + 2) // 2 THEN price_cents ELSE 0 END)
               AS BIGINT) AS med2,
             CAST(max(n) AS BIGINT) AS n
      FROM rr GROUP BY l_partkey
    ),
    d AS (
      SELECT rr.l_partkey, rr.price_cents, med.n, med.med2,
             CAST(abs(2 * rr.price_cents - med.med2) AS BIGINT) AS dev2
      FROM rr JOIN med USING (l_partkey)
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY l_partkey
                                   ORDER BY dev2 ASC) AS rn2
      FROM d
    ),
    mad AS (
      SELECT l_partkey,
             CAST(sum(CASE WHEN rn2 = (n + 1) // 2 THEN dev2 ELSE 0 END)
                + sum(CASE WHEN rn2 = (n + 2) // 2 THEN dev2 ELSE 0 END)
               AS BIGINT) AS mad4
      FROM r2 GROUP BY l_partkey
    ),
    s AS (
      SELECT d.l_partkey, d.price_cents, d.n, d.med2, mad.mad4, d.dev2,
             CAST((1000000 * 2 * d.dev2) // mad.mad4 AS BIGINT) AS r_ppm
      FROM d JOIN mad USING (l_partkey)
      WHERE mad.mad4 > 0
    )
    SELECT * FROM s WHERE r_ppm > 3000000
    """,
)
def q143_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-part price outliers: lineitems whose extended price
    sits more than 3 MADs from their part's median — the
    breakdown-resistant counterpart of q04's z-score rule (extremes
    shift mean/std and mask themselves; the median of absolute
    deviations tolerates 50% contamination).  Exact doubled-integer
    order statistics on cents; score is a truncating-integer ppm.

    Scale shape: two per-GROUP sort windows + two tiny group-frame
    joins, one shuffle key throughout — never a global sort."""
    from .operators.anomaly import mad_outliers

    li = (
        _t(spark, sf_dir, "lineitem")
        # conv 22: order statistics exclude missing measurements — a
        # NULL price would rank NULLS FIRST (Spark) vs LAST (DuckDB)
        # and shift the median row picks
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("price_cents"),
        )
    )
    return mad_outliers(
        li, ["l_partkey"], "price_cents", threshold_ppm=3_000_000, min_n=5
    )


@query(
    "q144_cusum_drift",
    # identical window algebra both sides: the clamped CUSUM fold
    # S_t = max(0, S_{t-1}+d_t) is computed via its prefix-sum identity
    # S_t = P_t − min(0, running-min P) — one per-key sort window, all
    # BIGINT (cents; truncating integer baseline on all-positive sums)
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT user_id, ts_us, event_id, cents,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
             CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS sx
      FROM c
    ),
    f AS (SELECT * FROM w WHERE n >= 2),
    b AS (
      SELECT *, CAST(sx // n AS BIGINT) AS baseline,
             CAST(cents - sx // n AS BIGINT) AS d
      FROM f
    ),
    p0 AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS rn,
             CAST(sum(d) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS pp
      FROM b
    ),
    p AS (
      SELECT *, CAST(min(pp) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS BIGINT) AS mm
      FROM p0
    ),
    s AS (
      SELECT *, CAST(pp - CASE WHEN mm < 0 THEN mm ELSE 0 END AS BIGINT) AS sv
      FROM p
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(max(baseline) AS BIGINT) AS baseline,
           CAST(max(sv) AS BIGINT) AS s_max,
           CAST(min(CASE WHEN sv > 10000 THEN rn END) AS BIGINT) AS alarm_rn,
           min(CASE WHEN sv > 10000 THEN ts_us END) AS alarm_ts_us
    FROM s GROUP BY user_id
    """,
)
def q144_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM upward spend-drift alarm (Page 1954) over the
    purchase event stream: with d_t = cents − per-user integer mean,
    the sequential statistic S_t = max(0, S_{t−1} + d_t) trips at
    100 units (10000 cents) — the drift monitor (feature drift, spend
    shift, quality regression) every production pipeline runs per key.
    The clamped recurrence is NOT folded: S_t = P_t − min(0, min_{j≤t}
    P_j), so one ordered window (prefix sum + running min) computes the
    entire statistic in exact BIGINT cents on both engines.

    Scale shape: ONE shuffle on user_id; row_number, prefix sum,
    running min, and the full-partition baseline all share that
    exchange; the final groupBy reuses the key partitioning.  No fold,
    no collect, no global sort."""
    from .operators.temporal import cusum_drift
    from .sources.tables import load_events

    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts_us",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return cusum_drift(
        ev,
        key_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        value_col="cents",
        slack=0,
        threshold=10_000,
        min_n=2,
    )


@query(
    "q145_salted_replicate_join",
    # salting never reaches the result: the oracle is the PLAIN join —
    # same multiset by construction (one salt per big row, full small
    # copy per salt) — with the q33 proof pattern; decimal revenue sum
    # is order-free exact, count is integer
    oracle=f"""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           {_SQL_REV} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q145_salted_replicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation item count + revenue where the lineitem⋈supplier
    equi-join runs SALTED: big side salted per row, small side
    replicated 8×, joined on (suppkey, salt) — the manual skew-join
    for the regimes AQE's runtime skew split cannot reach (stream-
    static joins, non-sort-merge plans, AQE off).  q33 proved salting
    exact for aggregation; this entry proves it for joins — the oracle
    is the plain join.

    Scale shape: the hot key's rows fan across 8 reducers; the cost is
    8× the SMALL side's shuffle volume (the explicit trade).  The
    follow-up nation join is a broadcast; the final groupBy is
    map-side combined decimal sums."""
    from .operators.skew import replicated_salt_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = replicated_salt_join(li, sup, "l_suppkey", n_salts=8)
    return (
        j.join(
            F.broadcast(nat),
            j["s_nationkey"] == nat["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            _rev_spark().alias("revenue"),
        )
    )


@query(
    "q146_fd_profile",
    # one block per candidate FD, identical algebra: per-lhs distinct
    # rhs counts -> 1-row summary; conformance is a truncating-integer
    # ppm of all-positive values (Spark div == DuckDB //)
    oracle="""
    SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(max(v) AS BIGINT) AS max_rhs_variants,
           CAST((1000000 * (count(*) - sum(CASE WHEN v > 1 THEN 1 ELSE 0 END)))
                // count(*) AS BIGINT) AS conformance_ppm
    FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS v
          FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'l_partkey', 'l_suppkey',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(v) AS BIGINT),
           CAST((1000000 * (count(*) - sum(CASE WHEN v > 1 THEN 1 ELSE 0 END)))
                // count(*) AS BIGINT)
    FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS v
          FROM lineitem GROUP BY l_partkey)
    UNION ALL
    SELECT 'l_orderkey,l_linenumber', 'l_quantity',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(v) AS BIGINT),
           CAST((1000000 * (count(*) - sum(CASE WHEN v > 1 THEN 1 ELSE 0 END)))
                // count(*) AS BIGINT)
    FROM (SELECT l_orderkey, l_linenumber, count(DISTINCT l_quantity) AS v
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'c_nationkey', 'c_mktsegment',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(v) AS BIGINT),
           CAST((1000000 * (count(*) - sum(CASE WHEN v > 1 THEN 1 ELSE 0 END)))
                // count(*) AS BIGINT)
    FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS v
          FROM customer GROUP BY c_nationkey)
    """,
)
def q146_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency conformance over four candidate rules —
    two that must hold (o_orderkey→o_custkey; (l_orderkey,
    l_linenumber)→l_quantity: key-based FDs) and two that measure
    real denormalization (l_partkey→l_suppkey, c_nationkey→
    c_mktsegment) — the schema-rule miner a pipeline runs on every
    fresh drop to catch ingestion bugs as conformance drift, without
    hand-written constraints.

    Scale shape: one map-side-combined groupBy per candidate, each
    collapsing to ONE summary row before the union; every scan prunes
    to lhs+rhs columns only."""
    from .operators.profile import fd_profile

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    a = fd_profile(orders, [(["o_orderkey"], "o_custkey")])
    b = fd_profile(
        li,
        [
            (["l_partkey"], "l_suppkey"),
            (["l_orderkey", "l_linenumber"], "l_quantity"),
        ],
    )
    c = fd_profile(cust, [(["c_nationkey"], "c_mktsegment")])
    return a.unionByName(b).unionByName(c)


@query(
    "q147_psi_drift",
    # identical integer algebra both sides: add-one-smoothed bucket
    # counts, 1-row totals, x=n'·M' / y=m'·N', fixed-point dyadic log2
    # (conv 6d — never libm), decimal(38,0) term product, one display
    # division of identical operands; term_fx ships as digit string
    # (conv 19)
    oracle=_sql_str_out(f"""
    WITH a AS (
      SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_a
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ),
    b AS (
      SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_b
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
    ),
    j AS (
      SELECT coalesce(a.bucket, b.bucket) AS bucket,
             CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
             CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ),
    t AS (
      SELECT CAST(sum(n_a + 1) AS BIGINT) AS N1,
             CAST(sum(n_b + 1) AS BIGINT) AS M1
      FROM j
    ),
    s AS (
      SELECT bucket, n_a, n_b, N1, M1,
             CAST((n_a + 1) * M1 AS BIGINT) AS x,
             CAST((n_b + 1) * N1 AS BIGINT) AS y
      FROM j CROSS JOIN t
    ),
    l AS (
      SELECT *,
             CAST({_sql_flog2_fx('x')} - {_sql_flog2_fx('y')} AS BIGINT)
               AS L_fx
      FROM s
    ),
    f AS (
      SELECT bucket, n_a, n_b, N1, M1,
             CAST((CAST(x AS DECIMAL(19,0)) - CAST(y AS DECIMAL(19,0)))
                  * CAST(L_fx AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS term_fx
      FROM l
    )
    SELECT bucket, n_a, n_b, term_fx,
           -- term_fx can exceed 2^53: VARCHAR roundtrip for the
           -- correctly-rounded conversion (conv 16; see q140)
           CAST(CAST(term_fx AS VARCHAR) AS DOUBLE)
             / (CAST(N1 AS DOUBLE) * CAST(M1 AS DOUBLE) * 1048576.0) AS term
    FROM f
    """, ("term_fx",)),
)
def q147_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability drift of the order-value distribution
    between two snapshots (orders before vs since 1997): per price
    band, the PSI term (p−q)·log2(p/q) — the standard production
    drift alarm on a fresh data drop, in the exact fixed-point-log2
    form (conv 6d) so the score is bit-identical on any engine.

    Scale shape: each snapshot collapses to bucket counts map-side;
    everything after is bucket-cardinality-sized (full-outer join +
    1-row totals broadcast)."""
    from .operators.profile import psi_drift

    o = _t(spark, sf_dir, "orders").withColumn(
        "bucket",
        F.floor(F.col("o_totalprice") / F.lit(25000)).cast("long"),
    )
    df_a = o.filter(F.col("o_orderdate") < "1997-01-01")
    df_b = o.filter(F.col("o_orderdate") >= "1997-01-01")
    return _str_decimals(psi_drift(df_a, df_b, "bucket"))


@query(
    "q148_ivm_delta_join",
    # the IVM claim: stored-view partials merged with partials over
    # Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB must equal the FULL recompute —
    # so the oracle IS the full join+aggregate; decimal sums keep the
    # merge order-free exact (q116's discipline, now across a join)
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           {_SQL_REV} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q148_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: per-priority item count
    + revenue over orders⋈lineitem, computed as stored-view partials
    (old orders ⋈ old lineitems) MERGED with partials over the
    delta-join Δ(A⋈B) — new orders (since 2001) and late lineitems
    (linenumber ≥ 5) never trigger an old⋈old rescan.  The gate proves
    maintained ≡ recomputed bit-for-bit (operators/ivm.py; q116 proved
    the aggregate half, this proves the join half).

    Scale shape: the two mixed delta joins broadcast the SMALL delta
    against the base (map-side hash join, base scanned once, shuffled
    never); partials merge on the group key only."""
    from .operators.ivm import delta_join

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    a_old = orders.filter(F.col("o_orderdate") < "2001-01-01").drop(
        "o_orderdate"
    )
    a_new = orders.filter(F.col("o_orderdate") >= "2001-01-01").drop(
        "o_orderdate"
    )
    b_old = li.filter(F.col("l_linenumber") < 5).drop("l_linenumber")
    b_new = li.filter(F.col("l_linenumber") >= 5).drop("l_linenumber")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (
                    F.lit(1).cast("decimal(6,4)")
                    - F.col("l_discount").cast("decimal(6,4)")
                )
            ).alias("_s"),
        )

    stored = partials(a_old.join(b_old, "k"))
    delta = partials(delta_join(a_old, a_new, b_old, b_new, on="k"))
    return (
        stored.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("_n").cast("long").alias("n_items"),
            F.sum("_s").cast("double").alias("revenue"),
        )
    )


def _sql_label_propagation(iters: int) -> str:
    """DuckDB twin of operators.graph.label_propagation over the
    co-purchase graph: fixed synchronous rounds unrolled as chained
    MATERIALIZED CTEs (each round references the previous 1x and the
    neighbor frame 1x; MATERIALIZED per the q142 fd-blowup lesson).
    The per-node pick is replayed with a row_number window (count
    DESC, label ASC) — a different mechanism than Spark's
    min-over-struct argmin, but the same unique deterministic result."""
    blocks = [
        """e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )""",
        """nb AS MATERIALIZED (
      SELECT u AS node, v AS nbr FROM e
      UNION ALL SELECT v, u FROM e
    )""",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM nb)",
    ]
    for i in range(1, iters + 1):
        blocks.append(f"""c{i} AS MATERIALIZED (
      SELECT nb.node, l{i - 1}.label, count(*) AS cnt
      FROM nb JOIN l{i - 1} ON nb.nbr = l{i - 1}.node
      GROUP BY nb.node, l{i - 1}.label
    )""")
        blocks.append(f"""l{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )""")
    chain = ",\n    ".join(blocks)
    return f"""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    {chain}
    SELECT node, CAST(label AS BIGINT) AS label FROM l{iters}
    """


@query(
    "q149_label_propagation",
    # fixed-round synchronous LPA is a deterministic function of the
    # graph (min-label tie-break), so the oracle replays the identical
    # rounds; pick mechanisms differ (row_number vs struct-argmin) but
    # the result is the same unique argmin
    oracle=_sql_label_propagation(4),
)
def q149_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels on the co-purchase part graph by 4 rounds of
    deterministic synchronous label propagation (most-frequent
    neighbor label, ties to the smallest) — near-linear community
    detection complementing the global/structural graph family
    (PageRank q114, components q43, k-core q142): LPA finds the
    cross-sold product clusters a merchandiser actually acts on.

    Scale shape: per round one node-keyed join + one map-side-combined
    (node,label) count + a struct-argmin per node — no windows, no
    global sort; Σ deg bounds each round, frames localCheckpoint'd
    (conv 2)."""
    from .operators.graph import label_propagation

    return label_propagation(
        _copurchase_edges(spark, sf_dir), iters=4, src_col="u", dst_col="v"
    )


@query(
    "q150_transition_matrix",
    # identical lead() window over the (ts_us, event_id) total order;
    # counts exact integers, probability = truncating ppm + one display
    # division of identical operands
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
      FROM events
    ),
    p AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS to_state
      FROM c
    ),
    g AS (
      SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
      FROM p WHERE to_state IS NOT NULL GROUP BY from_state, to_state
    ),
    t AS (
      SELECT from_state, CAST(sum(n) AS BIGINT) AS n_from
      FROM g GROUP BY from_state
    )
    SELECT g.from_state, g.to_state, g.n, t.n_from,
           CAST((1000000 * g.n) // t.n_from AS BIGINT) AS p_ppm,
           CAST(g.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
    FROM g JOIN t USING (from_state)
    """,
)
def q150_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for every
    consecutive event pair within a user's (ts, id)-ordered stream, the
    exact count, outgoing total, and transition probability — the
    where-do-sessions-go-next statistic generalizing q97's fixed
    funnel to ALL paths.

    Scale shape: one key shuffle for the lead() window, then a
    |states|²-cardinality map-side-combined groupBy; outgoing totals
    derive from the pair frame itself (no second scan)."""
    from .operators.temporal import transition_matrix
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    return transition_matrix(
        ev,
        key_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        state_col="event_type",
    )


def _sql_bfs(hops: int) -> str:
    """DuckDB twin of operators.graph.bfs_distances over the
    co-purchase graph with sources = graph nodes ≡ 0 (mod 50):
    frontier expansion unrolled as MATERIALIZED CTEs (q142's lesson).
    Pure set semantics — the per-hop frontier is a unique set."""
    blocks = [
        """e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )""",
        """nb AS MATERIALIZED (
      SELECT u AS node, v AS nbr FROM e
      UNION ALL SELECT v, u FROM e
    )""",
        """v0 AS MATERIALIZED (
      SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist
      FROM nb WHERE node % 50 = 0
    )""",
        "f0 AS MATERIALIZED (SELECT node FROM v0)",
    ]
    for i in range(1, hops + 1):
        blocks.append(f"""f{i} AS MATERIALIZED (
      SELECT DISTINCT nb.nbr AS node
      FROM nb JOIN f{i - 1} ON nb.node = f{i - 1}.node
      WHERE nb.nbr NOT IN (SELECT node FROM v{i - 1})
    )""")
        blocks.append(f"""v{i} AS MATERIALIZED (
      SELECT node, dist FROM v{i - 1}
      UNION ALL
      SELECT node, CAST({i} AS BIGINT) FROM f{i}
    )""")
    chain = ",\n    ".join(blocks)
    return f"""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    {chain}
    SELECT node, dist FROM v{hops}
    """


@query(
    "q151_bfs_distances",
    # identical frontier-expansion set algebra; the Spark side may
    # early-exit on an empty frontier — extra unrolled oracle rounds
    # are then no-ops (empty frontier stays empty)
    oracle=_sql_bfs(3),
)
def q151_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from the nearest seed part (ids ≡ 0 mod 50 — the
    'recalled SKU' stand-in) for every co-purchase-graph part within 3
    hops — the blast-radius / influence-neighborhood primitive
    completing the traversal corner of the graph family.

    Scale shape: per hop one frontier⋈adjacency join + distinct +
    anti-join vs visited, localCheckpoint'd; cost tracks the
    frontier's edge incidence, never the whole graph; max_hops bounds
    rounds, empty-frontier early-exit is a driver scalar."""
    from .operators.graph import bfs_distances

    e = _copurchase_edges(spark, sf_dir)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    sources = nodes.filter(F.col("node") % 50 == 0)
    return bfs_distances(e, sources, max_hops=3, src_col="u", dst_col="v")


@query(
    "q152_ind_profile",
    # one block per candidate IND, identical distinct/anti-join
    # algebra; containment is a truncating-integer ppm of all-positive
    # values
    oracle="""
    SELECT 'lineitem.l_orderkey<orders.o_orderkey' AS ind,
           CAST(sum(rows_) AS BIGINT) AS n_child_rows,
           CAST(count(*) AS BIGINT) AS n_child_distinct,
           CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphan_distinct,
           CAST(sum(CASE WHEN orphan THEN rows_ ELSE 0 END) AS BIGINT)
             AS n_orphan_rows,
           CAST((1000000 * (count(*)
                 - sum(CASE WHEN orphan THEN 1 ELSE 0 END))) // count(*)
             AS BIGINT) AS containment_ppm
    FROM (
      SELECT l_orderkey AS v, count(*) AS rows_,
             l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                WHERE o_orderkey IS NOT NULL) AS orphan
      FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey
    )
    UNION ALL
    SELECT 'orders.o_custkey<customer.c_custkey',
           CAST(sum(rows_) AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN orphan THEN rows_ ELSE 0 END) AS BIGINT),
           CAST((1000000 * (count(*)
                 - sum(CASE WHEN orphan THEN 1 ELSE 0 END))) // count(*)
             AS BIGINT)
    FROM (
      SELECT o_custkey AS v, count(*) AS rows_,
             o_custkey NOT IN (SELECT c_custkey FROM customer
                               WHERE c_custkey IS NOT NULL) AS orphan
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
    )
    UNION ALL
    SELECT 'customer.c_custkey<orders.o_custkey',
           CAST(sum(rows_) AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN orphan THEN rows_ ELSE 0 END) AS BIGINT),
           CAST((1000000 * (count(*)
                 - sum(CASE WHEN orphan THEN 1 ELSE 0 END))) // count(*)
             AS BIGINT)
    FROM (
      SELECT c_custkey AS v, count(*) AS rows_,
             c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE o_custkey IS NOT NULL) AS orphan
      FROM customer WHERE c_custkey IS NOT NULL GROUP BY c_custkey
    )
    UNION ALL
    SELECT 'lineitem.l_suppkey<supplier.s_suppkey',
           CAST(sum(rows_) AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN orphan THEN rows_ ELSE 0 END) AS BIGINT),
           CAST((1000000 * (count(*)
                 - sum(CASE WHEN orphan THEN 1 ELSE 0 END))) // count(*)
             AS BIGINT)
    FROM (
      SELECT l_suppkey AS v, count(*) AS rows_,
             l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_suppkey IS NOT NULL) AS orphan
      FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY l_suppkey
    )
    """,
)
def q152_ind_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (FK) conformance over four candidate rules
    — three true foreign keys that must resolve fully, and the
    REVERSED customer→orders rule whose orphans are exactly the
    never-ordered customers (q10's anti-join, recast as a ratio) —
    fd_profile's cross-table sibling: together they mine the schema's
    rule surface from data alone, and conformance drift on a fresh
    drop is an ingestion alarm.

    Scale shape: each candidate collapses the child to distinct values
    + counts (shuffle = distinct cardinality), anti-joins a distinct
    parent projection, and reduces to ONE row — never a row-level
    child⋈parent join."""
    from .operators.profile import ind_profile

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    return ind_profile(
        [
            (li, "l_orderkey", orders, "o_orderkey",
             "lineitem.l_orderkey<orders.o_orderkey"),
            (orders, "o_custkey", cust, "c_custkey",
             "orders.o_custkey<customer.c_custkey"),
            (cust, "c_custkey", orders, "o_custkey",
             "customer.c_custkey<orders.o_custkey"),
            (li, "l_suppkey", sup, "s_suppkey",
             "lineitem.l_suppkey<supplier.s_suppkey"),
        ]
    )


def _sql_hits(iters: int) -> str:
    """DuckDB twin of operators.graph.hits_fixed_point on q114's
    customer→supplier graph: synchronous rounds unrolled as
    MATERIALIZED CTEs, max-normalized truncating-integer scores —
    bit-identical to the Spark side by construction."""
    blocks = [
        "h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes)"
    ]
    for i in range(1, iters + 1):
        blocks.append(f"""a{i}f AS MATERIALIZED (
      SELECT n.node, CAST(coalesce(t.s, 0) AS BIGINT) AS a
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(h{i - 1}.h) AS s
        FROM e JOIN h{i - 1} ON e.src = h{i - 1}.node GROUP BY e.dst
      ) t ON n.node = t.node
    )""")
        blocks.append(f"""a{i} AS MATERIALIZED (
      SELECT node,
             CAST((a * 1000000) // (SELECT max(a) FROM a{i}f) AS BIGINT) AS a
      FROM a{i}f
    )""")
        blocks.append(f"""h{i}f AS MATERIALIZED (
      SELECT n.node, CAST(coalesce(t.s, 0) AS BIGINT) AS h
      FROM nodes n LEFT JOIN (
        SELECT e.src AS node, sum(a{i}.a) AS s
        FROM e JOIN a{i} ON e.dst = a{i}.node GROUP BY e.src
      ) t ON n.node = t.node
    )""")
        blocks.append(f"""h{i} AS MATERIALIZED (
      SELECT node,
             CAST((h * 1000000) // (SELECT max(h) FROM h{i}f) AS BIGINT) AS h
      FROM h{i}f
    )""")
    chain = ",\n    ".join(blocks)
    return f"""
    WITH e AS MATERIALIZED (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    {chain}
    SELECT node, h{iters}.h AS hub_fx, a{iters}.a AS auth_fx
    FROM h{iters} JOIN a{iters} USING (node)
    """


@query(
    "q153_hits",
    # synchronous max-normalized integer HITS — all non-negative
    # truncating ops, so Spark div ≡ DuckDB //; rounds unrolled
    oracle=_sql_hits(3),
)
def q153_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the customer→supplier purchase graph
    (q114's edge rule): 3 synchronous rounds of the mutually-recursive
    pair in exact max-normalized integer fixed point — hubby customers
    spread purchases across authoritative suppliers; the second classic
    link-analysis ranking next to PageRank.

    Scale shape: two PageRank-cost join+groupBy passes per round + two
    1-row max broadcasts; localCheckpoint'd per round (conv 2)."""
    from .operators.graph import hits_fixed_point

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return hits_fixed_point(e, iters=3)


@query(
    "q154_streaming_session_windows",
    # the drained COMPLETE-mode table is the full current session set
    # (sink replaced per batch — conv-9 exempt), so the oracle is
    # q65's batch gaps-and-islands, the SAME shared string
    oracle=_SQL_SESSION_WINDOWS,
)
def q154_streaming_session_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q65's per-user session windows computed ON THE STREAM: Spark
    merges/extends session state in the aggregation as micro-batches
    arrive; drained in complete mode, the final table equals the batch
    session_window result exactly (one shared oracle string).  The
    streaming corner q31/q34/q50/q63/q117/q133/q136 didn't cover:
    gap-based (data-dependent) windows, where state merging — not just
    accumulation — happens across batches.

    State = open sessions (complete mode holds all; append mode's
    watermark eviction is the infinite-stream variant, documented in
    the operator)."""
    import uuid

    from .sources.tables import load_events_stream
    from .streaming.ingest import session_event_totals

    stream = load_events_stream(spark, sf_dir)
    out = session_event_totals(stream, "30 minutes", "10 minutes", "_t")
    name = f"q154_out_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    return spark.table(name)


@query(
    "q155_k_anonymity_audit",
    # identical groupBy algebra; the band is floor of an IEEE-exact
    # double division (same bits both engines); NULL sensitive values
    # ignored by COUNT(DISTINCT) on both sides
    oracle="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT)
             AS n_sensitive_distinct,
           CASE WHEN count(*) < 5 THEN 'k_anonymity'
                WHEN count(DISTINCT c_mktsegment) = 1 THEN 'l_diversity'
           END AS violation
    FROM customer
    GROUP BY c_nationkey, CAST(floor(c_acctbal / 2000) AS BIGINT)
    HAVING count(*) < 5 OR count(DISTINCT c_mktsegment) = 1
    """,
)
def q155_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit of the customer table before release: equivalence
    classes over the quasi-identifiers (nation, account-balance band)
    that are re-identifiable (< 5 members) or leak the market segment
    (≥ 5 members, single segment) — the k-anonymity / l-diversity
    check a training-data pipeline runs on every user-derived table
    it ships.

    Scale shape: ONE map-side-combined groupBy; output is violations
    only."""
    from .operators.profile import k_anonymity_audit

    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "bal_band"], "c_mktsegment", k=5
    )


@query(
    "q156_bootstrap_replicates",
    # identical md5-coin + INTEGER-threshold Poisson weights both
    # sides (the q115/q138 discipline); exact BIGINT weighted sums;
    # one display division of identical operands
    oracle="""
    WITH reps AS (SELECT range AS rep FROM range(16)),
    b AS (
      SELECT o_orderpriority, CAST(o_orderkey AS VARCHAR) AS id,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    e AS (
      SELECT b.o_orderpriority, b.id, b.v, reps.rep,
             CAST(('0x' || substring(
               md5('boot-v1:' || b.id || ':' || CAST(reps.rep AS VARCHAR)),
               1, 10)) AS BIGINT) AS coin
      FROM b CROSS JOIN reps
    ),
    w AS (
      SELECT o_orderpriority, rep, v,
             CAST((CASE WHEN coin >= 404487723187 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 808975446375 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 1011219307969 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 1078633928500 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 1095487583633 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 1098858314660 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 1099420103164 THEN 1 ELSE 0 END)
                + (CASE WHEN coin >= 1099500358665 THEN 1 ELSE 0 END)
               AS BIGINT) AS w
      FROM e
    ),
    a AS (
      SELECT o_orderpriority, CAST(rep AS BIGINT) AS rep,
             CAST(sum(w) AS BIGINT) AS n_eff,
             CAST(sum(w * v) AS BIGINT) AS sum_w_value
      FROM w GROUP BY o_orderpriority, rep
    )
    SELECT o_orderpriority, rep, n_eff, sum_w_value,
           CASE WHEN n_eff > 0
                THEN CAST(sum_w_value AS DOUBLE) / CAST(n_eff AS DOUBLE)
           END AS mean_value
    FROM a
    """,
)
def q156_bootstrap_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16 deterministic Poisson-bootstrap replicates of per-priority
    mean order value (Owen & Eckles 2012): each order contributes a
    md5-derived Poisson(1) weight per replicate, and the spread of the
    replicate means is the error bar — uncertainty quantification in
    ONE pass, no resampling scans, reproducible to the bit anywhere.

    Scale shape: explode×16 feeds straight into a map-side-combined
    groupBy — shuffle is |priorities|·16 rows, not the exploded
    stream."""
    from .operators.sampling import bootstrap_replicates

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return bootstrap_replicates(
        o,
        id_col="o_orderkey",
        value_col="cents",
        n_replicates=16,
        group_cols=["o_orderpriority"],
    )


@query(
    "q157_entity_resolution",
    # q44's banded edit-distance pairs + q43's WITH RECURSIVE closure +
    # a canonical rollup; singletons resolve to themselves; min over
    # doubles is an exact pick, counts are integers
    oracle="""
    WITH RECURSIVE
    names AS (SELECT DISTINCT p_name FROM part WHERE p_partkey < 400),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b
      FROM names a JOIN names b ON a.p_name < b.p_name
      WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
        AND levenshtein(a.p_name, b.p_name) <= 3
    ),
    edges AS MATERIALIZED (
      SELECT name_a AS src, name_b AS dst FROM pairs
      UNION
      SELECT name_b, name_a FROM pairs
    ),
    reach(id, x) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src
    ),
    matched AS (
      SELECT id, least(id, min(x)) AS cluster FROM reach GROUP BY id
    ),
    allm AS (
      SELECT n.p_name AS id, coalesce(m.cluster, n.p_name) AS cluster
      FROM names n LEFT JOIN matched m ON n.p_name = m.id
    ),
    pc AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS c,
             min(p_retailprice) AS mr
      FROM part WHERE p_partkey < 400 GROUP BY p_name
    )
    SELECT a.cluster AS canonical_name,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(pc.c) AS BIGINT) AS n_parts,
           min(pc.mr) AS min_retail
    FROM allm a JOIN pc ON a.id = pc.p_name
    GROUP BY a.cluster
    """,
)
def q157_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution on part names: q44's length-banded
    edit-distance matching → connected-component clustering (matches
    are transitive in intent) → one canonical record per entity
    (lexicographic-min name, member/row counts, best price) —
    the classic record-linkage pipeline (blocking → scoring →
    clustering → survivorship) as ONE lazy composition of
    already-oracled stages; singleton names resolve to themselves.

    Scale shape: q44's banded join (never a cross join) + O(log
    diameter) pointer-jumping CC + key-partitioned rollups."""
    from .operators.dedup import near_dup_clusters

    pairs = q44_fuzzy_name_pairs(spark, sf_dir).select("name_a", "name_b")
    matched = near_dup_clusters(pairs, "name_a", "name_b")
    names = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select("p_name")
        .distinct()
    )
    allm = names.join(
        matched, names["p_name"] == matched["id"], "left"
    ).select(
        F.col("p_name").alias("id"),
        F.coalesce(F.col("cluster"), F.col("p_name")).alias("cluster"),
    )
    pc = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .groupBy("p_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.min("p_retailprice").alias("mr"),
        )
    )
    return (
        allm.join(pc, allm["id"] == pc["p_name"])
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.sum("c").cast("long").alias("n_parts"),
            F.min("mr").alias("min_retail"),
        )
        .select(
            F.col("cluster").alias("canonical_name"),
            "n_names",
            "n_parts",
            "min_retail",
        )
    )


@query(
    "q158_quantize_int8",
    # one fixed IEEE operand order ((v−mn)·255)/(mx−mn) then floor —
    # bit-identical codes both engines; generate_subscripts+unnest zip
    # row-wise in DuckDB; codes list ordered by dim on both sides,
    # emitted as a CSV STRING: nested output columns crash the
    # driver's pandas canonicalizer (r6 — unhashable type 'list'),
    # so the registry surface is scalar-only (gate-linted)
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    d AS (
      SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY dim
    ),
    c AS (
      SELECT ex.vec_id, ex.dim,
             CASE WHEN d.mx > d.mn
                  THEN least(CAST(floor((ex.v - d.mn) * 255.0
                                        / (d.mx - d.mn)) AS BIGINT), 255)
                  ELSE 0 END AS code
      FROM ex JOIN d USING (dim)
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           array_to_string(list(code ORDER BY dim), ',') AS codes_csv
    FROM c GROUP BY vec_id
    """,
)
def q158_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization of the embedding corpus: per-dimension
    min/max trained on the data, every vector re-coded to 8-bit —
    the 4× memory/IO cut that lets a 100 TB ANN index fit its serving
    tier, with reconstruction error ≤ step/2 per dimension
    (pytest-pinned).  Codes are bit-identical on any engine (one fixed
    IEEE operand order, then floor — no accumulation).

    Scale shape: explode → n_dims-row stats → broadcast join → per-id
    reassembly; two map-side-combined shuffles total.

    Registry surface: codes emit as a CSV string (``codes_csv``) —
    nested columns crash the driver's canonicalizer; downstream users
    (q159) consume the operator's array form directly."""
    from .operators.similarity import quantize_int8

    codes = quantize_int8(_t(spark, sf_dir, "embeddings"))
    return codes.select(
        "vec_id",
        "n_dims",
        F.array_join(
            F.transform(F.col("codes"), lambda x: x.cast("string")), ","
        ).alias("codes_csv"),
    )


@query(
    "q159_quantized_topk",
    # integer SQUARED-L2 over SQ8 codes — the corpus is unit-normed, so
    # L2 ranking ≈ cosine ranking (a raw dot on min-max-SHIFTED codes
    # favors large-code rows and has ~zero recall — measured before
    # this form was chosen); order-free exact BIGINT sums, same
    # total-order cut (d2 ASC, vec_id ASC) both sides
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    d AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY dim),
    c AS (
      SELECT ex.vec_id, ex.dim,
             CASE WHEN d.mx > d.mn
                  THEN least(CAST(floor((ex.v - d.mn) * 255.0
                                        / (d.mx - d.mn)) AS BIGINT), 255)
                  ELSE 0 END AS code
      FROM ex JOIN d USING (dim)
    ),
    q AS (SELECT dim, code AS qcode FROM c WHERE vec_id = 0),
    s AS (
      SELECT c.vec_id,
             CAST(sum((c.code - q.qcode) * (c.code - q.qcode)) AS BIGINT)
               AS d2
      FROM c JOIN q USING (dim)
      WHERE c.vec_id <> 0
      GROUP BY c.vec_id
    )
    SELECT vec_id, d2 FROM s
    ORDER BY d2 ASC, vec_id ASC LIMIT 10
    """,
)
def q159_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest vectors to vec 0 by QUANTIZED squared-L2 over
    q158's SQ8 codes — search on the compressed index (the point of
    quantizing: the serving tier scans int8 codes, not floats) with
    EXACT integer distances (order-free BIGINT sums, no float
    accumulation).  The corpus is unit-normalized, so L2 ranking
    tracks the float cosine ranking — recall@10 pytest-pinned.

    Scale shape: q158's quantize plan + one dim-keyed join against the
    broadcast query codes + a distributed top-k."""
    from .operators.similarity import quantize_int8

    codes = quantize_int8(_t(spark, sf_dir, "embeddings"))
    ex = codes.select(
        "vec_id", F.posexplode("codes").alias("dim0", "code")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "code")
    q = ex.filter(F.col("vec_id") == 0).select(
        "dim", F.col("code").alias("qcode")
    )
    diff = F.col("code") - F.col("qcode")
    s = (
        ex.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "dim")
        .groupBy("vec_id")
        .agg(F.sum(diff * diff).cast("long").alias("d2"))
    )
    return s.orderBy(F.col("d2").asc(), F.col("vec_id").asc()).limit(10)


@query(
    "q160_last_touch_attribution",
    # identical carry-forward window both sides (last_value IGNORE
    # NULLS over rows-unbounded-preceding..1-preceding of a (ts,type)
    # struct — the struct keeps the touch's own ts so the 24h cut is
    # exact integer µs)
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
      FROM events
    ),
    s AS (
      SELECT *,
             last_value(
               CASE WHEN event_type IN ('click', 'view', 'signup')
                    THEN {'tt': ts_us, 'te': event_type} END
               IGNORE NULLS
             ) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS lt
      FROM c
    )
    SELECT CASE WHEN lt IS NOT NULL
                 AND ts_us - lt.tt <= 86400000000
                THEN lt.te ELSE 'none' END AS attributed_touch,
           CAST(count(*) AS BIGINT) AS n_conversions
    FROM s WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q160_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution of purchases: each purchase credits the
    user's most recent click/view/signup within 24 h (else 'none') —
    the standard conversion-attribution rule, computed with ONE
    carry-forward window (the asof trick within a single table;
    exact integer-µs cut, deterministic under the (ts, event_id)
    total order).

    Scale shape: one key shuffle; carry + cut are per-row expressions
    in the window stage; final groupBy is |touch types|+1 rows."""
    from .operators.temporal import last_touch_attribution
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    return last_touch_attribution(
        ev,
        key_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        event_col="event_type",
        conversion_value="purchase",
        touch_values=["click", "view", "signup"],
        window_us=86_400_000_000,
    )


@query(
    "q161_snapshot_diff",
    # identical full-outer + null-safe compare algebra; the simulated
    # new snapshot mutates price by +10.0 (exact double add) on %5
    # keys, drops %7 keys, and the old snapshot lacks %11 keys;
    # changed_cols emits as a CSV string (nested outputs crash the
    # driver's canonicalizer — r6), '' for I/D rows
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 11 <> 0
    ),
    n AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    j AS (
      SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS in_old,
             n.o_orderkey IS NOT NULL AS in_new,
             list_filter(
               [CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                     THEN 'o_totalprice' END,
                CASE WHEN o.o_orderpriority
                          IS DISTINCT FROM n.o_orderpriority
                     THEN 'o_orderpriority' END],
               x -> x IS NOT NULL) AS cc
      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'I'
                WHEN NOT in_new THEN 'D'
                WHEN len(cc) > 0 THEN 'U' END AS status,
           CASE WHEN in_old AND in_new THEN array_to_string(cc, ',')
                ELSE '' END AS changed_cols
    FROM j
    WHERE NOT in_old OR NOT in_new OR len(cc) > 0
    """,
)
def q161_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two orders snapshots (simulated daily
    drops: inserts = keys the old snapshot lacked, deletes = keys the
    new one dropped, updates = +10 price mutations): per changed key,
    I/D/U plus WHICH columns changed — the between-drops change review,
    and the batch complement of the CDC family (q96/q117 APPLY
    changelogs; this recovers one from two states).

    Scale shape: ONE full-outer hash join on the key; change-sized
    output.

    Registry surface: changed_cols emits as a CSV string ('' for I/D)
    — nested columns crash the driver's canonicalizer; library users
    get the operator's array form."""
    from .operators.profile import snapshot_diff

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old = orders.filter(F.col("o_orderkey") % 11 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10
        ).otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderpriority"]
    )
    return diff.withColumn(
        "changed_cols", F.array_join(F.col("changed_cols"), ",")
    )


@query(
    "q162_interval_coverage",
    # identical gaps-and-islands algebra: new-island flag vs the
    # running max of PRIOR ends (strict >, touching merges), prefix-sum
    # island ids, two key-partitioned collapses — all exact BIGINT µs
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + 600000000 AS e
      FROM events
    ),
    f AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS nw
      FROM c
    ),
    i AS (
      SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM f
    ),
    g AS (
      SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
      FROM i GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_merged_intervals,
           CAST(sum(i_e - i_s) AS BIGINT) AS covered
    FROM g GROUP BY user_id
    """,
)
def q162_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ACTIVE TIME: each event opens a 10-minute activity
    interval; overlapping intervals must count once — the union-length
    / uptime primitive (SLA coverage, session time, sensor liveness)
    computed by gaps-and-islands merging, exact integer microseconds.

    Scale shape: one key shuffle; flag + island id in one window
    stage; both collapses reuse the key partitioning."""
    from .operators.temporal import interval_coverage
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.col("ts_us").alias("s"),
        (F.col("ts_us") + F.lit(600_000_000)).alias("e"),
    )
    return interval_coverage(ev, ["user_id"], "s", "e").select(
        "user_id", "n_merged_intervals", "covered"
    )


@query(
    "q163_centroid_classifier",
    # q158's codes + truncating-integer centroids (sum div n per dim)
    # + exact integer squared-L2 argmin (ties to the smaller label) +
    # confusion counts — zero floats anywhere
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    d AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY dim),
    c AS (
      SELECT ex.vec_id, ex.dim,
             CASE WHEN d.mx > d.mn
                  THEN least(CAST(floor((ex.v - d.mn) * 255.0
                                        / (d.mx - d.mn)) AS BIGINT), 255)
                  ELSE 0 END AS code
      FROM ex JOIN d USING (dim)
    ),
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
    cent AS (
      SELECT lab.label, c.dim,
             CAST(sum(c.code) // count(*) AS BIGINT) AS cent
      FROM c JOIN lab USING (vec_id)
      WHERE vec_id % 2 = 0
      GROUP BY lab.label, c.dim
    ),
    dist AS (
      SELECT c.vec_id, cent.label,
             CAST(sum((c.code - cent.cent) * (c.code - cent.cent))
               AS BIGINT) AS d2
      FROM c JOIN cent USING (dim)
      WHERE c.vec_id % 2 = 1
      GROUP BY c.vec_id, cent.label
    ),
    pred AS (
      SELECT vec_id, label AS predicted FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, label ASC) AS rn
        FROM dist
      ) WHERE rn = 1
    )
    SELECT lab.label AS true_label, pred.predicted,
           CAST(count(*) AS BIGINT) AS n
    FROM pred JOIN lab USING (vec_id)
    GROUP BY lab.label, pred.predicted
    """,
)
def q163_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification on the quantized embedding
    corpus: centroids trained on even vec_ids (truncating-integer mean
    of SQ8 codes per label/dim), odd vec_ids assigned by exact integer
    squared-L2, confusion matrix out — supervised ML over compressed
    vectors with NO floats anywhere, so the whole train→predict→score
    pipeline is bit-identical on any engine or cluster size.

    Scale shape: q158's quantize plan, a |labels|·|dims| centroid agg,
    one broadcast-sized join for assignment, argmin via min-over-struct
    (no window over data rows... the per-(vec,label) frame is |test|·
    |labels| — labels are few), tiny confusion groupBy."""
    from .operators.similarity import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    codes = quantize_int8(emb)
    ex = codes.select(
        "vec_id", F.posexplode("codes").alias("dim0", "code")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "code")
    lab = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    cent = (
        ex.filter(F.col("vec_id") % 2 == 0)
        .join(lab, "vec_id")
        .groupBy("label", "dim")
        .agg(
            F.expr("sum(code) div count(*)").cast("long").alias("cent")
        )
    )
    diff = F.col("code") - F.col("cent")
    dist = (
        ex.filter(F.col("vec_id") % 2 == 1)
        .join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label")
        .agg(F.sum(diff * diff).cast("long").alias("d2"))
    )
    pred = dist.groupBy("vec_id").agg(
        F.min(F.struct(F.col("d2"), F.col("label")))["label"].alias(
            "predicted"
        )
    )
    return (
        pred.join(lab, "vec_id")
        .groupBy(
            F.col("label").alias("true_label"), F.col("predicted")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "q164_tfidf_cosine_pairs",
    # identical integer algebra: reduced-scale fixed-point idf weights,
    # exact BIGINT dots/norms, and the cos >= 1/2 gate as
    # 4·dot² >= norm_a·norm_b — HUGEINT on the DuckDB side (compare
    # only, never an output column), decimal(38,0) on Spark's; one
    # display double of identical operands
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({{tok}}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM t2 GROUP BY doc_id, token
    ),
    dfq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df
      FROM tf GROUP BY token HAVING count(*) <= 50
    ),
    dq AS (SELECT CAST(count(*) AS BIGINT) AS D FROM documents),
    w AS (
      SELECT tf.doc_id, tf.token,
             CAST(tf.tf * (({{fD}} - {{fdf}}) // 16384) AS BIGINT) AS w
      FROM tf JOIN dfq USING (token) CROSS JOIN dq
    ),
    norms AS (
      SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS norm
      FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(sum(a.w * b.w) AS BIGINT) AS dot
      FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, dot, na.norm AS norm_a, nb.norm AS norm_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.norm AS DOUBLE))
                * sqrt(CAST(nb.norm AS DOUBLE))) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = dots.id_a
    JOIN norms nb ON nb.doc_id = dots.id_b
    WHERE dot > 0
      AND CAST(4 AS HUGEINT) * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
          >= CAST(na.norm AS HUGEINT) * CAST(nb.norm AS HUGEINT)
    """.replace("{tok}", _SQL_TOKENIZE)
    .replace("{fD}", _sql_flog2_fx("D"))
    .replace("{fdf}", _sql_flog2_fx("df")),
)
def q164_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weighted cosine similarity join over the document corpus
    (cos ≥ 1/2, max_df = 50): the classic what's-about-the-same-thing
    IR pairing, complementing the set-overlap joins (q21/q98/q99) with
    term WEIGHTING — rare terms dominate, the max-df cut removes
    stopword mass AND bounds the inverted-index fan-out (≤ max_df²
    candidates per token).  Exact integer weights/dots/norms; the
    threshold is the division-free comparison 4·dot² ≥ nₐ·n_b.

    Scale shape: map-side-combined tf/df aggs, token-keyed
    inverted-index join (never all-pairs), doc-keyed norm joins; the
    weight table persists once across its three consumers."""
    from .operators.corpus import tfidf_cosine_pairs

    return tfidf_cosine_pairs(
        _t(spark, sf_dir, "documents"),
        max_df=50,
        min_cos_num=1,
        min_cos_den=2,
        eager=True,
    )


@query(
    "q165_resample_interpolate",
    # identical two-window neighbor carry + exact rational interp on
    # integer cents: num = v0·(t1−t0)+(v1−v0)·(t−t0), den = t1−t0;
    # one display division of identical operands; single-point /
    # observed rows fall back to (v0, 1)
    oracle="""
    WITH hourly AS (
      SELECT user_id, epoch_us(ts) // 21600000000 AS bucket,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY user_id, bucket
    ),
    b AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
          FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS bucket
             FROM b),
    j AS (SELECT g.user_id, g.bucket, h.v
          FROM grid g LEFT JOIN hourly h USING (user_id, bucket)),
    s AS (
      SELECT *,
        last_value(CASE WHEN v IS NOT NULL
                        THEN {'t': bucket, 'x': v} END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        first_value(CASE WHEN v IS NOT NULL
                         THEN {'t': bucket, 'x': v} END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
      FROM j
    )
    SELECT user_id, bucket, v IS NOT NULL AS observed,
           CASE WHEN nx.t - p.t > 0
                THEN CAST(p.x * (nx.t - p.t)
                          + (nx.x - p.x) * (bucket - p.t) AS BIGINT)
                ELSE p.x END AS interp_num,
           CASE WHEN nx.t - p.t > 0 THEN CAST(nx.t - p.t AS BIGINT)
                ELSE 1 END AS interp_den,
           CASE WHEN nx.t - p.t > 0
                THEN CAST(p.x * (nx.t - p.t)
                          + (nx.x - p.x) * (bucket - p.t) AS DOUBLE)
                     / CAST(nx.t - p.t AS DOUBLE)
                ELSE CAST(p.x AS DOUBLE) END AS value_interp
    FROM s
    """,
)
def q165_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q95's resample grid with LINEAR interpolation instead of LOCF:
    every missing 6-hour bucket of a user's spend series gets the
    exact rational point on the line between its nearest observed
    neighbors (integer cents; num/den exact, one display double) —
    the gap-fill for quantities that trend rather than hold.

    Scale shape: identical to q95 — shuffles only on user_id, reused
    by the bucket agg, grid explode, join back, and BOTH neighbor
    windows."""
    from .operators.temporal import resample_interpolate
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    hourly = (
        ev.withColumn("bucket", F.expr("ts_us div 21600000000"))
        .groupBy("user_id", "bucket")
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    return resample_interpolate(hourly, ["user_id"], "bucket", "cents")


@query(
    "q166_winsorize",
    # identical rank order statistics (q143's discipline): bound rank
    # = clamp(ceil(p·n/100), 1, n) via integer (p·n+99)//100; integer
    # least/greatest clamp — no engine percentile(), no floats
    oracle="""
    WITH b AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT l_partkey, price_cents,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY price_cents ASC) AS rn,
             count(*) OVER (PARTITION BY l_partkey) AS n
      FROM b
    ),
    rr AS (SELECT * FROM r WHERE n >= 5),
    bounds AS (
      SELECT l_partkey,
             CAST(sum(CASE WHEN rn = greatest((5 * n + 99) // 100, 1)
                           THEN price_cents ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN rn = least((95 * n + 99) // 100, n)
                           THEN price_cents ELSE 0 END) AS BIGINT) AS hi
      FROM rr GROUP BY l_partkey
    )
    SELECT rr.l_partkey, rr.price_cents, bounds.lo, bounds.hi,
           CAST(least(greatest(rr.price_cents, bounds.lo), bounds.hi)
             AS BIGINT) AS winsorized,
           CAST(CASE WHEN rr.price_cents < bounds.lo THEN -1
                     WHEN rr.price_cents > bounds.hi THEN 1
                     ELSE 0 END AS INT) AS clipped
    FROM rr JOIN bounds USING (l_partkey)
    """,
)
def q166_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part price winsorization at exact [p5, p95] rank order
    statistics: q143 FLAGS the robust outliers, this REPAIRS them —
    the standard pre-aggregation heavy-tail tamer, integer cents end
    to end.

    Scale shape: one per-group sort window + a tiny bounds frame
    joined back on the key (the q143 cost model)."""
    from .operators.anomaly import winsorize

    li = (
        _t(spark, sf_dir, "lineitem")
        # conv 22: order statistics exclude missing measurements
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("price_cents"),
        )
    )
    return winsorize(
        li, ["l_partkey"], "price_cents", lower_pct=5, upper_pct=95,
        min_n=5,
    )


@query(
    "q167_distinctive_tokens_chi2",
    # identical 2x2 presence counts; χ² num/den exact (HUGEINT on the
    # DuckDB side, decimal on Spark's — both ship as digit strings,
    # conv 19); the ranking double is one division of identical
    # operands — and at tested scales every operand < 2^53, so the
    # casts are exact, not merely identically-rounded
    oracle=_sql_str_out("""
    WITH tok AS (
      SELECT doc_id, source, unnest(list_distinct({tok})) AS token
      FROM documents
    ),
    t2 AS (SELECT doc_id, source, token FROM tok WHERE token <> ''),
    ts AS (
      SELECT token, source AS src, CAST(count(*) AS BIGINT) AS a
      FROM t2 GROUP BY token, source
    ),
    tt AS (
      SELECT token, CAST(sum(a) AS BIGINT) AS df_tot
      FROM ts GROUP BY token HAVING sum(a) >= 5
    ),
    st AS (
      SELECT source AS src, CAST(count(*) AS BIGINT) AS n_src
      FROM documents GROUP BY source
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    s AS (
      SELECT ts.src, ts.token, ts.a,
             tt.df_tot - ts.a AS b,
             st.n_src - ts.a AS c,
             nt.N - st.n_src - tt.df_tot + ts.a AS d,
             nt.N AS N
      FROM ts JOIN tt USING (token) JOIN st USING (src) CROSS JOIN nt
    ),
    x AS (
      SELECT src, token, a, b,
             CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS det,
             (CAST(a AS HUGEINT) + b) * (CAST(c AS HUGEINT) + d)
               * (CAST(a AS HUGEINT) + c) * (CAST(b AS HUGEINT) + d)
               AS den,
             CAST(N AS HUGEINT) AS nh
      FROM s
    ),
    f AS (
      SELECT src, token, a, b,
             CAST(nh * det * det AS DECIMAL(38,0)) AS chi2_num,
             CAST(den AS DECIMAL(38,0)) AS chi2_den
      FROM x WHERE den > 0 AND det > 0
    ),
    r AS (
      SELECT src, token, a, b, chi2_num, chi2_den,
             CAST(chi2_num AS DOUBLE) / CAST(chi2_den AS DOUBLE) AS chi2,
             row_number() OVER (
               PARTITION BY src
               ORDER BY CAST(chi2_num AS DOUBLE)
                        / CAST(chi2_den AS DOUBLE) DESC, token ASC
             ) AS rank
      FROM f
    )
    SELECT src AS source, token, a, b, chi2_num, chi2_den, chi2,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5
    """.replace("{tok}", _SQL_TOKENIZE), ("chi2_num", "chi2_den")),
)
def q167_distinctive_tokens_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-5 tokens most characteristic of each source by χ² keyness
    (2×2 document-presence test, positively-associated cells only) —
    the what-vocabulary-defines-this-slice diagnostic behind corpus
    mixing, contamination triage, and slice classifiers.  Exact
    integer counts, exact decimal χ² numerator/denominator, one
    ranking double of identical operands.

    Scale shape: per-doc distinct-token reduction map-side, one
    (token, source) agg, vocab-sized total joins (broadcast), per-
    source top-k window over the vocab frame."""
    from .operators.corpus import distinctive_tokens_chi2

    return _str_decimals(
        distinctive_tokens_chi2(_t(spark, sf_dir, "documents"), k=5, min_df=5)
    )


@query(
    "q168_benford_audit",
    # identical integer algebra; the expected-ppm table is the SAME
    # literal list both sides (the Poisson-threshold pattern); digit =
    # first char of the BIGINT decimal rendering
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT)
               AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders)
      WHERE cents > 0 GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM d),
    e AS (
      SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
        (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
        (9, 45757)) AS v(digit, exp_ppm)
    )
    SELECT d.digit, d.n,
           CAST((1000000 * d.n) // t.N AS BIGINT) AS obs_ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           CAST(abs((1000000 * d.n) // t.N - e.exp_ppm) AS BIGINT)
             AS dev_ppm
    FROM d CROSS JOIN t JOIN e ON d.digit = e.digit
    """,
)
def q168_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance of order values (cents) — the
    fabricated-numbers / broken-feed tripwire a data-quality layer
    runs on every monetary or count column: per digit, observed vs
    expected ppm and the deviation, all exact integers.

    Scale shape: one 9-group map-side aggregate + a 1-row total
    broadcast."""
    from .operators.profile import benford_audit

    o = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return benford_audit(o, "cents")


@query(
    "q169_mann_whitney",
    # identical doubled-midrank algebra (ties averaged, x2 keeps
    # BIGINT): tie-block [lo,hi] from a cumulative count over DISTINCT
    # values, U2 = Σ cntA·(lo+hi) − nA·(nA+1); truncating-ppm effect
    # size; one display double
    oracle="""
    WITH base AS (
      SELECT c_nationkey AS g,
             c_mktsegment = 'BUILDING' AS side_a,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND o_totalprice IS NOT NULL
    ),
    blocks AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_a
      FROM base GROUP BY g, v
    ),
    ranked AS (
      SELECT *, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS hi
      FROM blocks
    ),
    agg AS (
      SELECT g, CAST(sum(cnt_a) AS BIGINT) AS n_a,
             CAST(sum(cnt) - sum(cnt_a) AS BIGINT) AS n_b,
             CAST(sum(cnt_a * ((hi - cnt + 1) + hi)) AS BIGINT) AS r2a
      FROM ranked GROUP BY g
    ),
    f AS (
      SELECT g AS c_nationkey, n_a, n_b,
             CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a
      FROM agg WHERE n_a >= 3 AND n_b >= 3
    )
    SELECT c_nationkey, n_a, n_b, u2_a,
           CAST((500000 * u2_a) // (n_a * n_b) AS BIGINT) AS cles_ppm,
           CAST(u2_a AS DOUBLE)
             / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS cles
    FROM f
    """,
)
def q169_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Mann-Whitney U: does order value from BUILDING
    customers stochastically dominate MACHINERY customers' — the
    nonparametric A/B test (outlier-immune, distribution-free) with
    exact doubled-midrank integers and the common-language effect
    size U/(n_A·n_B).

    Scale shape: (group, value) map-side count agg, per-group window
    over DISTINCT values (tie blocks), per-group finals — never a
    window over raw rows."""
    from .operators.regress import mann_whitney_u

    orders = (
        _t(spark, sf_dir, "orders")
        # conv 22: order statistics exclude missing measurements
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").alias("side_a"),
        "v",
    )
    return mann_whitney_u(
        base, ["c_nationkey"], "side_a", "v", min_each=3
    )


@query(
    "q170_kolmogorov_smirnov",
    # identical exact-rational ECDF algebra: D's numerator
    # max|cumA·nB − cumB·nA| over tie blocks is BIGINT; one display
    # division per group; same base frame as q169
    oracle="""
    WITH base AS (
      SELECT c_nationkey AS g,
             c_mktsegment = 'BUILDING' AS side_a,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND o_totalprice IS NOT NULL
    ),
    blocks AS (
      SELECT g, v,
             CAST(sum(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(sum(CASE WHEN side_a THEN 0 ELSE 1 END) AS BIGINT)
               AS cb
      FROM base GROUP BY g, v
    ),
    staged AS (
      SELECT g,
             CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER w AS BIGINT) AS cum_b,
             CAST(sum(ca) OVER (PARTITION BY g) AS BIGINT) AS n_a,
             CAST(sum(cb) OVER (PARTITION BY g) AS BIGINT) AS n_b
      FROM blocks
      WINDOW w AS (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    agg AS (
      SELECT g AS c_nationkey, max(n_a) AS n_a, max(n_b) AS n_b,
             CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT)
               AS ks_num
      FROM staged GROUP BY g
    )
    SELECT c_nationkey, n_a, n_b, ks_num,
           CAST((1000000 * ks_num) // (n_a * n_b) AS BIGINT) AS ks_ppm,
           CAST(ks_num AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
    FROM agg WHERE n_a >= 3 AND n_b >= 3
    """,
)
def q170_kolmogorov_smirnov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation two-sample Kolmogorov–Smirnov D between BUILDING and
    MACHINERY order values — q169's complement: U detects location
    shift, D detects ANY distributional difference (shape, spread,
    bimodality).  The ECDF-gap numerator is exact BIGINT over tie
    blocks; one display division per group.

    Scale shape: the q169 cost model — (group, value) count agg,
    per-group window over DISTINCT values, per-group max."""
    from .operators.regress import kolmogorov_smirnov

    orders = (
        _t(spark, sf_dir, "orders")
        # conv 22: order statistics exclude missing measurements
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").alias("side_a"),
        "v",
    )
    return kolmogorov_smirnov(
        base, ["c_nationkey"], "side_a", "v", min_each=3
    )


@query(
    "q171_longest_streak",
    # identical day − row_number() islands idiom over DISTINCT active
    # days (consecutive days share the difference), exact integer days
    # from integer-µs division
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    r AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS grp
      FROM d
    ),
    s AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
             CAST(min(day) AS BIGINT) AS start_day
      FROM r GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(arg_max(start_day, len * 100000 - start_day) AS BIGINT)
             AS longest_start_day
    FROM s GROUP BY user_id
    """,
)
def q171_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (plus streak
    count and the start day of the longest, earliest on ties) — the
    classic engagement metric, via the day − row_number() islands
    trick: consecutive days share the difference, so one groupBy
    collapses each run.  Exact integer epoch days.

    Scale shape: distinct (user, day) reduction map-side, one per-user
    sort window over DAYS (not events), two tiny aggs."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir)
    d = ev.select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    r = d.withColumn("grp", F.col("day") - F.row_number().over(w))
    s = r.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").cast("long").alias("start_day"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        # packed argmax key: max len, ties to the EARLIEST start —
        # len*100000 − start_day (epoch days < 100000 through year 2243)
        F.max_by(
            F.col("start_day"),
            F.col("len") * F.lit(100000) - F.col("start_day"),
        )
        .cast("long")
        .alias("longest_start_day"),
    )


@query(
    "q172_top_trigram_journeys",
    # identical double-lead window over the (ts_us, event_id) total
    # order; exact counts; total-order top-k cut (n DESC, path ASC)
    oracle="""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
      FROM events
    ),
    p AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    g AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path,
             CAST(count(*) AS BIGINT) AS n
      FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM g ORDER BY n DESC, path ASC LIMIT 20
    """,
)
def q172_top_trigram_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys (event-type trigrams over each
    user's time-ordered stream) — sequence-mining-lite: q150 gives the
    one-step transition matrix, this surfaces the dominant multi-step
    paths product analytics actually reads.

    Scale shape: one key shuffle for the double-lead window, a
    |types|³-bounded groupBy, distributed top-k with a total-order
    cut."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    p = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    g = p.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return g.orderBy(F.col("n").desc(), F.col("path").asc()).limit(20)


@query(
    "q173_table_digest",
    # identical md5-row-hash + exact decimal sum; chr(31) separator and
    # the NULL sentinel rendered identically; integer/string columns
    # only (contract); the digest ships as its digit string (conv 19)
    oracle=_sql_str_out("""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CAST(('0x' || substring(md5(
             CAST(o_orderkey AS VARCHAR) || chr(31)
             || CAST(o_custkey AS VARCHAR) || chr(31)
             || coalesce(o_orderstatus, chr(0) || 'NULL') || chr(31)
             || coalesce(o_orderpriority, chr(0) || 'NULL')
           ), 1, 15)) AS BIGINT)), 0) AS DECIMAL(38,0)) AS digest
    FROM orders
    """, ("digest",)),
)
def q173_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive fingerprint of the orders table's key columns
    — the cheap cross-engine table-equality check (the gate itself
    proves the property: DuckDB recomputes the same digest from the
    same rows in a different execution order).  Exact decimal sum of
    60-bit md5 row hashes + row count.

    Scale shape: pure map + one 1-row combine; scan prunes to the
    digested columns."""
    from .operators.profile import table_digest

    return _str_decimals(
        table_digest(
            _t(spark, sf_dir, "orders"),
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        )
    )


@query(
    "q174_sliding_window_agg",
    # Spark's window(ts, 1h, 15m) assigns each event to the 4 sliding
    # windows covering it; the oracle replays that assignment with a
    # lateral range(4) — window_start = (t div 900e6 − k)·900e6, kept
    # while t < start + 1h; exact integer-µs bounds, decimal value sums
    oracle="""
    WITH c AS (
      SELECT event_type, epoch_us(ts) AS t,
             CAST(value AS DECIMAL(19,4)) AS v
      FROM events
    ),
    w AS (
      SELECT event_type, v,
             ((t // 900000000) - k.range) * 900000000 AS ws
      FROM c CROSS JOIN range(4) k
      WHERE t >= ((t // 900000000) - k.range) * 900000000
        AND t <  ((t // 900000000) - k.range) * 900000000 + 3600000000
    )
    SELECT ws AS window_start_us, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v) AS DOUBLE) AS total_value
    FROM w GROUP BY ws, event_type
    """,
)
def q174_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window event aggregation (1-hour windows every 15
    minutes — each event lands in 4 overlapping windows): the rate /
    rolling-throughput view q31's tumbling windows can't express.
    Integer-µs window starts, exact decimal value sums.

    Scale shape: Spark's window() explodes each row to its 4 windows
    map-side, straight into a map-side-combined groupBy — shuffle is
    |windows|·|types|, not 4× the events."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).withColumn(
        "_t", F.timestamp_micros(F.col("ts_us"))
    )
    return (
        ev.groupBy(
            F.window("_t", "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(19,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q175_exact_median_selection",
    # the oracle computes the SAME median by direct global order
    # statistics — proving two-pass bucket selection ≡ full sort;
    # doubled-integer median (q143 convention)
    oracle="""
    WITH b AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS n
      FROM b
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
              + sum(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)
             AS BIGINT) AS med2,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
              + sum(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)
             AS DOUBLE) / 2.0 AS median
    FROM r
    """,
)
def q175_exact_median_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global median of line-item price cents WITHOUT a global
    sort: two-pass bucket selection — a tiny bucket-count aggregate
    locates the median ranks, then only the target bucket's sliver
    (~N/n_buckets rows) is sorted.  The oracle computes the same
    median by a direct full-order row_number, so the gate proves the
    selection algorithm ≡ the sort it replaces — the technique that
    makes exact order statistics feasible at 100 TB.

    Scale shape: one map-side agg + one pruned-sliver sort + a ≤2-row
    broadcast; no global sort, no driver collect."""
    from .operators.stats import exact_median_selection

    li = (
        _t(spark, sf_dir, "lineitem")
        # conv 22: order statistics exclude missing measurements
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    return exact_median_selection(li, "cents", bucket_width=8192)


@query(
    "q176_key_skew_report",
    # identical exact algebra; rank ties in count are Σ-invariant so
    # both engines agree regardless of tie order (pinned by the
    # composite (cnt, k) order anyway); gini num/den ship as digit
    # strings (conv 19)
    oracle=_sql_str_out("""
    WITH c AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ),
    r AS (
      SELECT k, cnt,
             CAST(row_number() OVER (ORDER BY cnt ASC, k ASC) AS BIGINT)
               AS i
      FROM c
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             CAST(sum(CAST(i AS HUGEINT) * cnt) AS HUGEINT) AS six
      FROM r
    )
    SELECT n_keys, n_rows, max_cnt,
           CAST((1000000 * max_cnt) // n_rows AS BIGINT)
             AS top1_share_ppm,
           CAST(2 * six - (n_keys + 1) * CAST(n_rows AS HUGEINT)
             AS DECIMAL(38,0)) AS gini_num,
           CAST(CAST(n_keys AS HUGEINT) * n_rows AS DECIMAL(38,0))
             AS gini_den,
           -- gini_num/gini_den reach K·S, far past 2^53 at scale:
           -- VARCHAR roundtrip for the correctly-rounded conversion
           -- (conv 16; see q140)
           CAST(CAST(CAST(2 * six - (n_keys + 1) * CAST(n_rows AS HUGEINT)
                  AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(CAST(n_keys AS HUGEINT) * n_rows
                  AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS gini
    FROM a
    """, ("gini_num", "gini_den")),
)
def q176_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis of lineitem's part key: cardinality, hottest-key
    share, and the exact Gini coefficient of the key-count
    distribution — the report that decides between plain shuffle,
    salting (q33), replication (q145), or trusting AQE.

    Scale shape: one map-side key-count agg; two-pass range-
    partitioned global rank over the key frame (operators/ranking.py
    — a key frame is billions of rows at 100 TB, never a global
    window); one-row output."""
    from .operators.skew import key_skew_report

    return _str_decimals(
        key_skew_report(_t(spark, sf_dir, "lineitem"), "l_partkey")
    )


@query(
    "q177_quota_sample",
    # identical Hamilton apportionment (base = (K·n) div N, leftover
    # seats to largest remainders, ties to the smaller stratum) +
    # q52's deterministic md5-order draw within each stratum
    oracle="""
    WITH c AS (
      SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM c),
    s AS (
      SELECT stratum, n,
             CAST((100 * n) // n_tot AS BIGINT) AS base,
             CAST(100 * n - ((100 * n) // n_tot) * n_tot AS BIGINT)
               AS rem
      FROM c CROSS JOIN t
    ),
    l AS (SELECT CAST(100 - sum(base) AS BIGINT) AS lv FROM s),
    a AS (
      SELECT stratum, n,
             CAST(base + CASE WHEN row_number() OVER (
                    ORDER BY rem DESC, stratum ASC) <= (SELECT lv FROM l)
                  THEN 1 ELSE 0 END AS BIGINT) AS k
      FROM s
    ),
    r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT r.source, r.doc_id, CAST(r.rn AS BIGINT) AS pos,
           a.k AS stratum_quota
    FROM r JOIN a ON r.source = a.stratum
    WHERE r.rn <= a.k
    """,
)
def q177_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling under ONE global budget: 100 documents
    apportioned across sources by largest-remainder (exact integers,
    Σk = 100 always — q52 caps strata independently, this divides a
    budget), then drawn deterministically per stratum in md5 order.
    The allocation is the classic Hamilton method; remainder ties go
    to the smaller stratum key.

    Scale shape: one stratum-count agg + two 1-row broadcasts + one
    window over the STRATA frame for seats, one per-stratum rank
    window for the draw."""
    from .operators.sampling import proportional_allocation

    docs = _t(spark, sf_dir, "documents")
    alloc = proportional_allocation(docs, "source", total_k=100)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    ranked = docs.select("source", "doc_id").withColumn(
        "pos", F.row_number().over(w).cast("long")
    )
    return (
        ranked.join(
            F.broadcast(alloc),
            ranked["source"] == alloc["stratum"],
        )
        .filter(F.col("pos") <= F.col("k"))
        .select(
            "source", "doc_id", "pos", F.col("k").alias("stratum_quota")
        )
    )


@query(
    "q178_rendezvous_sharding",
    # identical md5-coin argmax per (key, shard); summarized as shard
    # -> key count so the payload is shard balance, not 50k raw rows
    oracle="""
    WITH e AS (
      SELECT CAST(doc_id AS VARCHAR) AS k, r.range AS s
      FROM documents CROSS JOIN range(8) r
    ),
    c AS (
      SELECT k, s,
             CAST(('0x' || substring(
               md5('hrw-v1:' || k || ':' || CAST(s AS VARCHAR)),
               1, 15)) AS BIGINT) AS coin
      FROM e
    ),
    a AS (SELECT k, arg_max(s, coin) AS shard FROM c GROUP BY k)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM a GROUP BY shard
    """,
)
def q178_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash (HRW) shard balance over the document corpus,
    8 shards: the consistent-hashing assignment whose defining
    property — only ~1/(N+1) of keys move when a shard is added
    (mod-N moves nearly all) — is pytest-pinned; the registry entry
    proves cross-engine coin/argmax parity via the per-shard counts.

    Scale shape: pure map (keys × 8), per-key max_by with map-side
    combine, 8-row output."""
    from .operators.sampling import rendezvous_assign

    docs = _t(spark, sf_dir, "documents")
    a = rendezvous_assign(docs, "doc_id", n_shards=8)
    return a.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys")
    )


@query(
    "q179_entropy_report",
    # identical fixed-point log2 algebra (conv 6d), exact decimal sum,
    # one display division of identical operands; h_fx ships as digit
    # string (conv 19)
    oracle=_sql_str_out(f"""
    WITH c AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows FROM c),
    s AS (
      SELECT cnt,
             CAST(cnt AS DECIMAL(19,0))
               * CAST({_sql_flog2_fx('t.n_rows')}
                      - {_sql_flog2_fx('cnt')} AS DECIMAL(19,0)) AS term,
             t.n_rows
      FROM c CROSS JOIN t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n_rows) AS BIGINT) AS n_rows,
           CAST(sum(term) AS DECIMAL(38,0)) AS h_fx,
           -- h_fx ~ N·66M can pass 2^53 past sf1: VARCHAR roundtrip
           -- for the correctly-rounded conversion (conv 16)
           CAST(CAST(CAST(sum(term) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
             / (CAST(max(n_rows) AS DOUBLE) * 1048576.0) AS entropy_bits
    FROM s
    """, ("h_fx",)),
)
def q179_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event stream's user-id distribution —
    the information-theoretic balance number next to q176's Gini
    (uniform K keys → log2 K bits; one hot key → 0), in the exact
    fixed-point-log2 form so the score is engine-identical.

    Scale shape: one key-count agg + 1-row broadcast + per-key
    expressions; no window."""
    from .operators.profile import entropy_report

    return _str_decimals(
        entropy_report(load_events(spark, sf_dir), "user_id")
    )


@query(
    "q180_trimmed_mean",
    # identical rank band (t = (p·n) div 100 dropped from EACH end),
    # exact BIGINT kept sums, one display division
    oracle="""
    WITH b AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT l_partkey, cents,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY cents ASC) AS rn,
             count(*) OVER (PARTITION BY l_partkey) AS n
      FROM b
    ),
    f AS (
      SELECT * FROM r
      WHERE n >= 5 AND rn > (10 * n) // 100
        AND rn <= n - (10 * n) // 100
    )
    SELECT l_partkey,
           CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(cents) AS BIGINT) AS kept_sum,
           CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS trimmed_mean
    FROM f GROUP BY l_partkey
    """,
)
def q180_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part 10%-trimmed mean price — winsorize's EXCLUDE sibling
    (q166 clamps outlier votes to the bound; this removes them), the
    third member of the robust-location family with q143's MAD.
    Exact integer rank band and kept sums.

    Scale shape: one per-group sort window + one grouped agg (q143's
    cost model)."""
    from .operators.anomaly import trimmed_mean

    li = (
        _t(spark, sf_dir, "lineitem")
        # conv 22: order statistics exclude missing measurements
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    return trimmed_mean(li, ["l_partkey"], "cents", trim_pct=10, min_n=5)


@query(
    "q181_embedding_dim_health",
    # floats go to integers via floor(v·2^20): float→double exact,
    # ·2^20 exact (power of two), floor exact — NEVER a float→decimal
    # cast (HALF_UP vs HALF_EVEN tie divergence, conv 6d's trap);
    # sums/extrema exact BIGINT, one display division
    oracle="""
    WITH ex AS (
      SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0)
               AS BIGINT) AS fx
      FROM embeddings
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(fx) AS BIGINT) AS sum_fx,
           CAST(min(fx) AS BIGINT) AS min_fx,
           CAST(max(fx) AS BIGINT) AS max_fx,
           CAST(sum(fx) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1048576.0) AS mean
    FROM ex GROUP BY dim
    """,
)
def q181_embedding_dim_health(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension embedding health (count, exact fixed-point sum,
    min/max, mean) — the feature-drift monitor an embedding pipeline
    runs on every model rev or data drop: a collapsed dimension
    (min≈max), a shifted mean, or a blown-up range shows here first.
    Floats enter integer land via floor(v·2^20) — every step exact —
    so the stats are order-free and engine-identical.

    Scale shape: ONE posexplode into a map-side-combined groupBy(dim)
    — shuffle is n_dims rows."""
    ex = (
        _t(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("dim0", "vf"))
        .select(
            (F.col("dim0") + 1).cast("long").alias("dim"),
            F.floor(F.col("vf").cast("double") * F.lit(1048576.0))
            .cast("long")
            .alias("fx"),
        )
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("fx").cast("long").alias("sum_fx"),
        F.min("fx").cast("long").alias("min_fx"),
        F.max("fx").cast("long").alias("max_fx"),
        (
            F.sum("fx").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1048576.0))
        ).alias("mean"),
    )


@query(
    "q182_weighted_median",
    # identical integer rule: LOWER weighted median = smallest value
    # whose cumulative weight doubles to >= total weight (no
    # interpolation — engine medians differ there); all BIGINT
    oracle="""
    WITH b AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(floor(l_quantity) AS BIGINT) AS w
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    g AS (
      SELECT l_partkey, cents, CAST(sum(w) AS BIGINT) AS w
      FROM b GROUP BY l_partkey, cents
    ),
    c AS (
      SELECT l_partkey, cents, w,
             CAST(sum(w) OVER (PARTITION BY l_partkey ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY l_partkey) AS BIGINT) AS tw
      FROM g
    )
    SELECT l_partkey,
           CAST(min(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
             AS weighted_median_cents
    FROM c GROUP BY l_partkey
    """,
)
def q182_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per part (the price at
    which half the UNITS trade at-or-below — the volume-weighted
    robust price, vs q143's row-median): LOWER weighted median =
    smallest value whose doubled cumulative weight reaches the total —
    a pure integer rule, no interpolation, engine-identical.

    Scale shape: (group, value) weight agg collapses ties first, one
    per-group cumulative window over DISTINCT values, one grouped
    min — the q169/q170 cost model."""
    li = (
        _t(spark, sf_dir, "lineitem")
        # conv 22: order statistics exclude missing measurements
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
            F.floor(F.col("l_quantity")).cast("long").alias("w"),
        )
    )
    g = li.groupBy("l_partkey", "cents").agg(
        F.sum("w").cast("long").alias("w")
    )
    wcum = (
        Window.partitionBy("l_partkey")
        .orderBy(F.col("cents").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_partkey")
    c = g.withColumn("cw", F.sum("w").over(wcum).cast("long")).withColumn(
        "tw", F.sum("w").over(wall).cast("long")
    )
    return c.groupBy("l_partkey").agg(
        F.min("tw").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("cents"))
        )
        .cast("long")
        .alias("weighted_median_cents"),
    )


def _q191_oracle() -> str:
    """Suffstat + pair-unpivot SQL for q191, generated so the 6 pair
    selects can't drift from each other; identical algebra to
    operators/regress.py:grouped_covariance (conv 16 VARCHAR casts on
    the >2^53 decimals)."""
    cols = ["cents", "disc_bp", "qty"]  # lexicographic, like the operator
    prods = ",\n         ".join(
        f"CAST(sum(CAST({a} AS DECIMAL(19,0)) * CAST({b} AS DECIMAL(19,0)))"
        f" AS DECIMAL(38,0)) AS p_{a}_{b}"
        for i, a in enumerate(cols)
        for b in cols[i:]
    )
    sums = ",\n         ".join(
        f"CAST(sum({c}) AS BIGINT) AS s_{c}" for c in cols
    )

    def covnum(a: str, b: str) -> str:
        return (
            f"CAST(CAST(n AS DECIMAL(19,0)) * p_{a}_{b}"
            f" - CAST(s_{a} AS DECIMAL(19,0)) * CAST(s_{b} AS DECIMAL(19,0))"
            f" AS DECIMAL(38,0))"
        )

    pair_sel = "\n      UNION ALL\n      ".join(
        f"SELECT l_returnflag, '{a}' AS var_a, '{b}' AS var_b, n,\n"
        f"             {covnum(a, b)} AS cov_num,\n"
        f"             {covnum(a, a)} AS var_a_n,\n"
        f"             {covnum(b, b)} AS var_b_n\n"
        f"      FROM a"
        for i, a in enumerate(cols)
        for b in cols[i:]
    )
    return f"""
    WITH o AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity) AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(floor(l_discount * 10000) AS BIGINT) AS disc_bp
      FROM lineitem
    ),
    a AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         {sums},
         {prods}
      FROM o GROUP BY l_returnflag HAVING count(*) >= 2
    ),
    p AS (
      {pair_sel}
    )
    SELECT l_returnflag, var_a, var_b, n, cov_num, var_a_n, var_b_n,
           CASE WHEN var_a_n > 0 AND var_b_n > 0
                THEN CAST(CAST(cov_num AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(var_a_n AS VARCHAR) AS DOUBLE))
                        * sqrt(CAST(CAST(var_b_n AS VARCHAR) AS DOUBLE)))
           END AS corr
    FROM p
    """


@query(
    "q191_grouped_covariance_matrix",
    # identical exact algebra to q140/q141 generalized to all pairs;
    # one display double per pair with the q141 operand order and
    # conv-16 VARCHAR casts (cov_num ~ n·S_ab reaches ~1e21 here);
    # exact payload columns ship as digit strings (conv 19)
    oracle=_sql_str_out(_q191_oracle(), ("cov_num", "var_a_n", "var_b_n")),
)
def q191_grouped_covariance_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-returnflag covariance/correlation MATRIX of (quantity,
    price-cents, discount-basis-points) — the multi-feature drift
    monitor (which feature pairs decoupled after the new data drop?)
    extending q140/q141's exact-suffstat discipline from one pair to
    all k·(k+1)/2 in ONE aggregation pass (operators/regress.py:
    grouped_covariance).

    Scale shape: one map-side-combined groupBy computing all first
    moments and product sums; pair rows come from a per-row inline
    array explode of the (tiny) group frame — no joins, no windows,
    no second pass."""
    from .operators.regress import grouped_covariance

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
    )
    return _str_decimals(
        grouped_covariance(
            li, ["l_returnflag"], ["qty", "cents", "disc_bp"], min_n=2
        )
    )


@query(
    "q192_twap",
    # identical lead window over the per-user (ts_us, event_id) total
    # order; segment products exact as decimal(19,0)·(19,0) → (38,0)
    # sums (cents·µs ~ 1e18 wraps int64 — conv 11); display double via
    # conv-16 VARCHAR on the >2^53 numerator; twap_num ships as digit
    # string (conv 19)
    oracle=_sql_str_out("""
    WITH c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT user_id, cents, ts_us,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS nxt
      FROM c
    ),
    a AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
             CAST(sum(CASE WHEN nxt IS NOT NULL
                           THEN CAST(cents AS DECIMAL(19,0))
                                * CAST(nxt - ts_us AS DECIMAL(19,0))
                      END) AS DECIMAL(38,0)) AS twap_num
      FROM s GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT user_id, n_points, span_us, twap_num,
           CASE WHEN span_us > 0
                THEN CAST(CAST(twap_num AS VARCHAR) AS DOUBLE)
                     / CAST(span_us AS DOUBLE) / 100.0
           END AS twap
    FROM a
    """, ("twap_num",)),
)
def q192_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average purchase value (TWAP): the
    last-observation step function integrated over the observation
    span — the standard financial/sensor average that row-means get
    wrong when observations cluster (q139's EMA weighs by COUNT
    recency; this weighs by HOLDING TIME).  Σ cents·Δt is exact
    decimal (cents·µs wraps int64 — conv 11); one display division
    chain per user, identical operand order both engines.

    Scale shape: one per-key lead window (key-partitioned, never
    global), one map-side-combined groupBy; span and n come from the
    same agg."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    c = ev.select(
        "user_id",
        "ts_us",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    s = c.withColumn("nxt", F.lead("ts_us").over(w))
    seg = F.when(
        F.col("nxt").isNotNull(),
        F.col("cents").cast("decimal(19,0)")
        * (F.col("nxt") - F.col("ts_us")).cast("decimal(19,0)"),
    )
    a = (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("span_us"),
            F.sum(seg).cast("decimal(38,0)").alias("twap_num"),
        )
        .filter(F.col("n_points") >= 2)
    )
    return _str_decimals(
        a.select(
            "user_id",
            "n_points",
            "span_us",
            "twap_num",
            F.when(
                F.col("span_us") > 0,
                F.col("twap_num").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100.0),
            ).alias("twap"),
        )
    )


@query(
    "q193_funnel_conversion",
    # identical first-reach rule per step: first 'view', first 'click'
    # STRICTLY after it, first 'purchase' strictly after that — exact
    # integer µs mins, truncating-ppm conversion rates
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
                         AND epoch_us(e.ts) > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
                         AND epoch_us(e.ts) > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           CAST((1000000 * (SELECT count(*) FROM c))
                // (SELECT count(*) FROM v) AS BIGINT) AS click_ppm,
           CAST((1000000 * (SELECT count(*) FROM p))
                // (SELECT count(*) FROM c) AS BIGINT) AS purchase_ppm
    """,
)
def q193_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    reaches step k at the FIRST event of that type strictly after
    their step-(k−1) reach time — the product-analytics primitive
    q172's free trigrams and q160's attribution don't express (the
    funnel requires the specific ordered subsequence, not adjacency).
    Exact integer µs everywhere; rates as truncating ppm.

    Scale shape: one filtered map-side min-agg per step + one key
    equi-join per transition (each frame is user-cardinality-sized);
    no windows, 1-row output."""
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts_us", "event_type")

    def first_after(step: str, prev: DataFrame, tcol: str, out: str):
        j = ev.filter(F.col("event_type") == step).join(
            prev, "user_id"
        ).filter(F.col("ts_us") > F.col(tcol))
        return j.groupBy("user_id").agg(
            F.min("ts_us").cast("long").alias(out)
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").cast("long").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    counts = (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("long").alias("n_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("long").alias("n_purchase"))
        )
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.expr("(1000000 * n_click) div n_view")
        .cast("long")
        .alias("click_ppm"),
        F.expr("(1000000 * n_purchase) div n_click")
        .cast("long")
        .alias("purchase_ppm"),
    )


@query(
    "q194_edit_distance_join",
    # the oracle is the EXACT banded all-pairs answer with zero prefix
    # mechanics (q99's convention): EDJoin's count-filter theorem
    # (Xiao et al., VLDB 2008) makes the Spark side's rare-gram prefix
    # candidate generation LOSSLESS — ed(a,b) ≤ k destroys ≤ k·q
    # distinct q-grams, so |G(a)∩G(b)| ≥ max|G| − k·q and the (k·q+1)
    # rarest grams of each side must intersect; levenshtein() is the
    # same integer DP on both engines
    oracle="""
    WITH n AS (
      SELECT c_custkey AS k, c_name AS s FROM customer
      WHERE c_custkey % 37 = 0 AND length(c_name) >= 12
    )
    SELECT a.k AS id_a, b.k AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM n a JOIN n b
      ON a.k < b.k AND abs(length(a.s) - length(b.s)) <= 2
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def q194_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance self-join (ed ≤ 2 over customer names,
    universe c_custkey % 37 = 0) — the entity-resolution primitive for
    typo'd keys, via EDJoin's lossless prefix filter rather than
    all-pairs.  The modulus bounds the universe: zero-padded
    SEQUENTIAL ids are pathologically self-similar (≈ every id has
    dozens of ≤2-digit-substitution neighbors), so the TRUE ANSWER
    grows ~quadratically in the universe — no candidate scheme can
    beat its own output (the r7 sf1 probe timed the % 7 variant out
    at 78× for 10× data).  On natural keyspaces the output is sparse
    and the prefix filter is the whole story; on dense keyspaces,
    partition the universe (as here) or dedupe exact first:

    1. char 3-gram SETS per name (an edit destroys ≤ q distinct
       grams, so k edits destroy ≤ k·q — the count-filter theorem);
    2. each name indexes min(k·q+1, |G|) = up to 7 of its RAREST
       grams under the global (frequency, gram) order.  Losslessness
       case split (ADVICE r7 — array_distinct can shrink |G| below
       k·q for repetitive names, so the invariant is NOT "|G| > k·q"):
       when max(|G_a|,|G_b|) > k·q the prefix principle applies with
       t = max − k·q ≥ 1 (the smaller side's slice is its FULL set,
       ≥ its required |G| − t + 1 ≥ 1 prefix); when BOTH |G| ≤ k·q
       both slices are full sets, and the join still finds the pair
       because ed ≤ k with length ≥ 12 forces a shared distinct gram:
       ≥ len−q+1 = 10 > k·q = 6 gram OCCURRENCES per name, each edit
       kills ≤ q of them, so an untouched occurrence survives into
       both strings.  Degenerate repetitive-name recall is pytest-
       pinned (test_properties: edjoin_degenerate).
    3. candidates get the lossless length band |len_a−len_b| ≤ k,
       then ONE exact levenshtein verify per candidate.

    Rare-first prefixes make the bucket join skew-resistant exactly
    like q99 (the ubiquitous 'Customer#0' grams never join).

    Scale shape: gram posting agg + frequency join (gram-keyed,
    map-side combined), per-name bounded array_sort (no global
    window), prefix self-equi-join on gram, distinct, verify join —
    the q99 cost model with character grams."""
    K, Q = 2, 3
    base = (
        _t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_custkey") % 37 == 0) & (F.length("c_name") >= 12)
        )
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("s"),
            F.length("c_name").alias("slen"),
        )
        .persist()
    )
    grams = base.select(
        "k",
        "slen",
        F.explode(
            F.array_distinct(
                F.expr(f"transform(sequence(1, length(s) - {Q - 1}),"
                       f" i -> substring(s, i, {Q}))")
            )
        ).alias("gram"),
    )
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = (
        grams.join(freq, "gram")
        .groupBy("k", "slen")
        .agg(F.collect_list(F.struct("cnt", "gram")).alias("cg"))
        .select(
            "k",
            "slen",
            F.explode(
                F.expr(f"slice(array_sort(cg), 1, {K * Q + 1})")
            ).alias("_p"),
        )
        .select("k", "slen", F.col("_p.gram").alias("gram"))
    )
    cand = (
        prefix.select(
            F.col("k").alias("id_a"), F.col("slen").alias("len_a"), "gram"
        )
        .join(
            prefix.select(
                F.col("k").alias("id_b"),
                F.col("slen").alias("len_b"),
                "gram",
            ),
            "gram",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= K)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    na = base.select(F.col("k").alias("_ia"), F.col("s").alias("s_a"))
    nb = base.select(F.col("k").alias("_ib"), F.col("s").alias("s_b"))
    out = (
        cand.join(na, F.col("id_a") == F.col("_ia"))
        .join(nb, F.col("id_b") == F.col("_ib"))
        .withColumn(
            "dist", F.levenshtein(F.col("s_a"), F.col("s_b")).cast("long")
        )
        .filter(F.col("dist") <= K)
        .select("id_a", "id_b", "dist")
        .localCheckpoint()
    )
    base.unpersist()
    return out


@query(
    "q195_incremental_near_dup",
    # the oracle is the EXACT new×old answer (inverted-index form,
    # conv 7) with zero prefix mechanics — the prefix-filter theorem
    # (q99) is side-agnostic, so the incremental candidate join is
    # lossless by construction at any data
    oracle=f"""
    WITH sh AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS} AS grams FROM {_SQL_DOCS_WS}),
    n AS (SELECT doc_id, len(grams) AS n FROM sh),
    post AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    inter AS (
      SELECT a.doc_id AS id_new, b.doc_id AS id_old, count(*) AS i
      FROM post a JOIN post b ON a.gram = b.gram
      WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_new, id_old,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = id_new
    JOIN n nb ON nb.doc_id = id_old
    WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.35
    """,
)
def q195_incremental_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL near-dup screening — the daily-drop shape q22/q99
    batch over the whole corpus: a NEW batch (simulated: doc_id % 5
    = 0) is checked against the INDEXED old corpus only (new×old
    pairs, exact 3-gram Jaccard ≥ 0.35), never old×old (already
    deduped) and not new×new (q99's job on the batch).

    Same lossless prefix filter as q99, with the incremental twist:
    gram frequencies come from the OLD corpus index (the stable
    artifact a production index ships with; grams unseen in it rank
    rarest at cnt 0).  Losslessness needs only A consistent total
    order on grams — which (cnt, gram) over any fixed corpus is — so
    recall stays 100% by construction, not by tuning.

    Scale shape: the new batch's posting/prefix frames scale with the
    BATCH, not the corpus; the candidate join hits the corpus prefix
    index on gram (rare-first prefixes keep buckets skew-free); one
    exact verify per candidate."""
    from .operators.dedup import word_shingles

    sh = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", word_shingles(F.col("text"), 3).alias("grams"))
        .persist()
    )
    is_new = F.col("doc_id") % 5 == 0
    post = sh.select("doc_id", F.explode("grams").alias("gram"))
    # index-side frequencies: OLD corpus only (the shipped artifact).
    # Persisted: BOTH prefixes() branches join it, and the plan showed
    # no ReusedExchange — without the cache the vocab groupBy (and its
    # upstream explode) executes once per branch (VERDICT r7 item 7;
    # vocab-sized, tiny).
    freq = (
        post.filter(~is_new)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )

    def prefixes(p: DataFrame) -> DataFrame:
        return (
            p.join(freq, "gram", "left")
            .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
            .groupBy("doc_id")
            .agg(F.collect_list(F.struct("cnt", "gram")).alias("cg"))
            .select(
                "doc_id",
                F.expr(
                    "slice(array_sort(cg), 1, "
                    "size(cg) - ((7 * size(cg) + 19) div 20) + 1)"
                ).alias("pfx"),
            )
            .select("doc_id", F.explode("pfx.gram").alias("gram"))
        )

    pfx_new = prefixes(post.filter(is_new)).select(
        F.col("doc_id").alias("id_new"), "gram"
    )
    pfx_old = prefixes(post.filter(~is_new)).select(
        F.col("doc_id").alias("id_old"), "gram"
    )
    cand = (
        pfx_new.join(pfx_old, "gram").select("id_new", "id_old").distinct()
    )
    ga = sh.select(F.col("doc_id").alias("_in"), F.col("grams").alias("g_n"))
    gb = sh.select(F.col("doc_id").alias("_io"), F.col("grams").alias("g_o"))
    inter = F.size(F.array_intersect("g_n", "g_o"))
    union = F.size("g_n") + F.size("g_o") - inter
    out = (
        cand.join(ga, F.col("id_new") == F.col("_in"))
        .join(gb, F.col("id_old") == F.col("_io"))
        .filter(
            F.lit(20) * F.least(F.size("g_n"), F.size("g_o"))
            >= F.lit(7) * F.greatest(F.size("g_n"), F.size("g_o"))
        )
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= 0.35)
        .select("id_new", "id_old", "jaccard")
        .localCheckpoint()
    )
    sh.unpersist()
    freq.unpersist()
    return out


@query(
    "q196_join_size_from_histograms",
    # the oracle COUNTS THE ACTUAL JOIN — an independent computation of
    # the same number (the identity |A ⋈_k A| = Σ_k cnt(k)² is what the
    # query claims; the oracle materializes nothing either, count(*)
    # streams)
    oracle="""
    WITH j AS (
      SELECT 1 FROM events a JOIN events b ON a.user_id = b.user_id
    ),
    c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           (SELECT CAST(count(*) AS BIGINT) FROM j) AS join_rows
    FROM c
    """,
)
def q196_join_size_from_histograms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT self-join cardinality from the key histogram — |A ⋈_k A|
    = Σ_k cnt(k)², computed from one count-agg WITHOUT executing the
    join (the q187/q176 planning family's missing number: what a
    shuffle on this key will actually produce; decides broadcast vs
    salting vs rethinking the key before burning the cluster on it).
    The oracle independently COUNTS the real join, so the gate proves
    the identity, not a replay.

    Σ cnt² as decimal(38,0) (a hot key wraps int64 at cnt ≥ ~3e9 —
    conv 11) but emitted as BIGINT here (pinned in-range: join_rows
    is itself a count the engine must represent).

    Scale shape: ONE map-side-combined count agg + a 1-row reduce —
    the join itself never runs on the Spark side."""
    from .sources.tables import load_events

    c = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return c.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum(
            (
                F.col("cnt").cast("decimal(19,0)")
                * F.col("cnt").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("join_rows"),
    )


@query(
    "q197_rolling_active_users",
    # identical contribution-explode rule: each (user, active-day)
    # pair contributes to days d..d+6; exact DISTINCT per day; the
    # grid is restricted to observed days on both sides
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    contrib AS (
      SELECT d.day AS day, u.user_id
      FROM ud u JOIN days d
        ON d.day BETWEEN u.day AND u.day + 6
    )
    SELECT day AS epoch_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib GROUP BY day
    """,
)
def q197_rolling_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 7-day active users (WAU) per observed day — the
    engagement denominator every product dashboard needs, computed
    EXACTLY: sliding-window COUNT DISTINCT, which no window function
    expresses (distinct doesn't decompose over frames).  Shape: the
    (user, day) frame dedupes first (events collapse to ≤ 1 row per
    user-day), each pair then contributes to the ≤ 7 window days it
    falls in (bounded fan-out — the q174 sliding-window rule applied
    to users), and a per-day distinct agg finishes.

    Integer epoch days from µs division — no date/TZ functions on
    the value path (conv: q186).

    Scale shape: map-side (user, day) dedupe (shuffle ≤ users×days),
    a broadcast of the observed-day grid, ≤ 7× bounded explode, one
    (day, user) distinct agg — never a join of raw events against
    raw events."""
    from .sources.tables import load_events

    ud = (
        load_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr("ts_us div 86400000000").cast("long").alias("day"),
        )
        .distinct()
    )
    days = ud.select("day").distinct()
    contrib = ud.join(
        F.broadcast(days.select(F.col("day").alias("grid_day"))),
        (F.col("grid_day") >= F.col("day"))
        & (F.col("grid_day") <= F.col("day") + 6),
    )
    return contrib.groupBy(F.col("grid_day").alias("epoch_day")).agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )


def _sql_sssp(rounds: int) -> str:
    """DuckDB twin of operators.graph.sssp_rounds over the weighted
    co-purchase graph (w = 1 + (u+v) % 7, sources ≡ 0 mod 50):
    Bellman-Ford sweeps unrolled as MATERIALIZED CTEs (conv 12).
    Exact BIGINT mins — round-exact semantics, convergence-free."""
    blocks = [
        """e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM q a JOIN q b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )""",
        """nb AS MATERIALIZED (
      SELECT u AS node, v AS nbr, CAST(1 + (u + v) % 7 AS BIGINT) AS w
      FROM e
      UNION ALL
      SELECT v, u, CAST(1 + (u + v) % 7 AS BIGINT) FROM e
    )""",
        """d0 AS MATERIALIZED (
      SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist
      FROM nb WHERE node % 50 = 0
    )""",
    ]
    for i in range(1, rounds + 1):
        blocks.append(f"""d{i} AS MATERIALIZED (
      SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT nb.nbr AS node, d.dist + nb.w AS dist
        FROM nb JOIN d{i - 1} d ON nb.node = d.node
      ) GROUP BY node
    )""")
    chain = ",\n    ".join(blocks)
    return f"""
    WITH q AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    {chain}
    SELECT node, dist FROM d{rounds}
    """


@query(
    "q198_weighted_sssp",
    # identical Bellman-Ford sweep algebra, exact BIGINT mins; round-
    # exact semantics (min path weight over ≤ R edges) so extra or
    # missing convergence never matters
    oracle=_sql_sssp(3),
)
def q198_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source WEIGHTED shortest paths over the co-purchase graph
    (edge cost 1 + (u+v) % 7 — a deterministic stand-in for a real
    friction weight; seeds ≡ 0 mod 50), 3 Bellman-Ford sweeps — the
    weighted complement of q151's hop-count BFS, completing the graph
    family's traversal corner with COSTS (cheapest substitution route,
    least-friction influence).

    Scale shape: per round one edge⋈distance join + a map-side-
    combined min groupBy, localCheckpoint'd — the q151 cost model
    with a weight column."""
    from .operators.graph import sssp_rounds

    e = _copurchase_edges(spark, sf_dir).withColumn(
        "w", (1 + (F.col("u") + F.col("v")) % 7).cast("long")
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    sources = nodes.filter(F.col("node") % 50 == 0)
    return sssp_rounds(
        e, sources, rounds=3, src_col="u", dst_col="v", weight_col="w"
    )


@query(
    "q199_conversion_latency_quartiles",
    # identical first-reach chain as q193, then exact LOWER order
    # statistics on the latency multiset: smallest value whose scaled
    # cumulative count reaches the rank target (4·cum ≥ n / 2·cum ≥ n
    # / 4·cum ≥ 3n) — pure integer rules, no interpolation.
    # coalesce(min(n),0): Spark's global agg over an EMPTY frame emits
    # F.lit(n)=0 while min(n) over an empty CTE is NULL — pin the
    # degenerate zero-conversions case to 0 on both sides (ADVICE r7)
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
                         AND epoch_us(e.ts) > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
                         AND epoch_us(e.ts) > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    lat AS (
      SELECT CAST(p.t3 - v.t1 AS BIGINT) AS lat_us
      FROM p JOIN v ON p.user_id = v.user_id
    ),
    d AS (
      SELECT lat_us, CAST(count(*) AS BIGINT) AS cnt FROM lat GROUP BY 1
    ),
    r AS (
      SELECT lat_us,
             CAST(sum(cnt) OVER (ORDER BY lat_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM d
    )
    SELECT CAST(coalesce(min(n), 0) AS BIGINT) AS n_converted,
           CAST(min(lat_us) AS BIGINT) AS min_us,
           CAST(min(CASE WHEN 4 * cum >= n THEN lat_us END) AS BIGINT)
             AS p25_us,
           CAST(min(CASE WHEN 2 * cum >= n THEN lat_us END) AS BIGINT)
             AS med_us,
           CAST(min(CASE WHEN 4 * cum >= 3 * n THEN lat_us END) AS BIGINT)
             AS p75_us,
           CAST(max(lat_us) AS BIGINT) AS max_us
    FROM r
    """,
)
def q199_conversion_latency_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HOW FAST the q193 funnel converts: exact lower quartiles of
    view→purchase latency over converting users (min/p25/median/p75/
    max, integer µs, no interpolation) — counts say whether the
    funnel works, latency says whether it is usable.

    Scale shape: the q193 first-reach chain, then the latency
    multiset collapses to (value, count) rows and the global
    cumulative ranks come from the TWO-PASS range-partitioned prefix
    sum (operators/ranking.py — distinct latencies scale with users,
    so never a global ordered window); one 1-row reduce ends it."""
    from .operators.ranking import global_rank_cumsum
    from .sources.tables import load_events

    ev = load_events(spark, sf_dir).select("user_id", "ts_us", "event_type")

    def first_after(step: str, prev: DataFrame, tcol: str, out: str):
        j = ev.filter(F.col("event_type") == step).join(
            prev, "user_id"
        ).filter(F.col("ts_us") > F.col(tcol))
        return j.groupBy("user_id").agg(
            F.min("ts_us").cast("long").alias(out)
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").cast("long").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    lat = p.join(v, "user_id").select(
        (F.col("t3") - F.col("t1")).cast("long").alias("lat_us")
    )
    d = lat.groupBy("lat_us").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    r, _, n = global_rank_cumsum(
        d, [F.col("lat_us").asc()], rank_col="_rn", sum_col="cnt",
        cum_col="cum",
    )
    return r.agg(
        F.lit(n).cast("long").alias("n_converted"),
        F.min("lat_us").cast("long").alias("min_us"),
        F.min(
            F.when(4 * F.col("cum") >= F.lit(n), F.col("lat_us"))
        ).cast("long").alias("p25_us"),
        F.min(
            F.when(2 * F.col("cum") >= F.lit(n), F.col("lat_us"))
        ).cast("long").alias("med_us"),
        F.min(
            F.when(4 * F.col("cum") >= F.lit(3 * n), F.col("lat_us"))
        ).cast("long").alias("p75_us"),
        F.max("lat_us").cast("long").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# Dedup-aware corpus curation composites (r8): the ops a training-data
# pipeline runs BETWEEN near-dup detection and training — leakage-safe
# splitting, budgeted sampling, cluster canonicalization.  All reuse the
# q99 exact-PPJoin pair engine / q43 component machinery; oracle = the
# inverted-index pair set (conv 7) + WITH RECURSIVE closure.
# ---------------------------------------------------------------------------

# exact ≥0.35 3-gram-Jaccard pair set + undirected edges + min-label
# closure — the oracle-side twin of (_ppjoin_pairs → near_dup_clusters),
# shared by q200/q202
_SQL_CLOSURE_035 = f"""
    sh AS MATERIALIZED (SELECT doc_id, {{grams}} AS grams FROM {_SQL_DOCS_WS}),
    nsz AS (SELECT doc_id, len(grams) AS n FROM sh),
    post AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM post a JOIN post b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN nsz na ON na.doc_id = id_a
      JOIN nsz nb ON nb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.35
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, x) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.x = e.src
    ),
    comp AS (SELECT id, least(id, min(x)) AS root FROM reach GROUP BY id),
    lab AS (
      SELECT d.doc_id, CAST(coalesce(c.root, d.doc_id) AS BIGINT) AS root
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
"""


def _labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, root) for EVERY document: near-dup component root via
    q99 pairs → min-label/pointer-jumping components; singletons label
    themselves.  Scale shape: PPJoin pair generation (bucketed, never
    all-pairs) + O(log diameter) component rounds + one left join."""
    from .operators.dedup import near_dup_clusters

    pairs = _ppjoin_pairs(spark, sf_dir)
    comp = near_dup_clusters(pairs.select("id_a", "id_b"))
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return docs.join(
        comp, docs["doc_id"] == comp["id"], "left"
    ).select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("cluster"), F.col("doc_id")).cast("long").alias("root"),
    )


@query(
    "q200_leakage_safe_split",
    # identical pair set (exact inverted-index Jaccard), identical
    # min-reachable-id closure, identical md5-coin bucketing of the
    # ROOT — members of one near-dup cluster co-assign by construction
    oracle="WITH RECURSIVE"
    + _SQL_CLOSURE_035.format(grams=_SQL_GRAMS)
    + """
    SELECT doc_id, root,
           CASE CAST(('0x' || substring(md5('split-v1:'
                       || CAST(root AS VARCHAR)), 1, 15)) AS BIGINT) % 10
                WHEN 0 THEN 'test'
                WHEN 1 THEN 'valid'
                ELSE 'train' END AS split
    FROM lab
    """,
)
def q200_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/valid/test split: documents are assigned by
    hashing their near-dup CLUSTER root (exact ≥0.35 Jaccard components
    from the q99 PPJoin engine), never their own id — so near-duplicate
    texts can never straddle the train/test boundary (the held-out
    contamination mode dedup papers warn about: a test doc whose
    near-twin was trained on).  10% test / 10% valid by a deterministic
    60-bit md5 coin on the root.

    Scale shape: PPJoin candidate generation (rare-first prefixes,
    bucketed), O(log d) component rounds, then a pure per-row hash —
    no windows, no collects beyond the component loop's bounded
    convergence checks."""
    lab = _labeled_docs(spark, sf_dir)
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split-v1:"), F.col("root").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return lab.select(
        "doc_id",
        "root",
        F.when(coin % 10 == 0, F.lit("test"))
        .when(coin % 10 == 1, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


@query(
    "q201_token_budget_fill",
    # identical priority order (60-bit md5 coin, doc_id tiebreak),
    # identical non-empty-token counts, identical INCLUSIVE prefix-sum
    # gate cum <= B — the oracle replays with a plain window, the
    # engine uses the two-pass range-partitioned prefix sum.
    # NULL-text docs excluded on both sides (conv 22): a missing doc
    # contributes no tokens, and a NULL n_tokens would poison the
    # running sum differently per engine.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter({_SQL_TOKENIZE}, x -> x <> ''))
               AS BIGINT) AS n_tokens,
             CAST(('0x' || substring(md5('fill-v1:'
                     || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               AS coin
      FROM documents WHERE text IS NOT NULL
    ),
    r AS (
      SELECT doc_id, n_tokens,
             CAST(row_number() OVER (ORDER BY coin, doc_id) AS BIGINT)
               AS pos,
             CAST(sum(n_tokens) OVER (ORDER BY coin, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, n_tokens, pos, cum_tokens
    FROM r WHERE cum_tokens <= 20000
    """,
)
def q201_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TOKEN-budget sampling: fill a fixed 20k-token
    budget by drawing documents in seeded md5 priority order and
    keeping every doc whose INCLUSIVE running token count still fits —
    the reproducible "give me exactly ~N tokens of this corpus" draw a
    mixture pipeline runs per source (q177 apportions a DOC budget;
    training budgets are token-denominated).

    Scale shape: per-doc token counts map-side, then ONE two-pass
    range-partitioned global prefix sum over (coin, doc_id)
    (operators/ranking.py — never an unpartitioned ordered window),
    then a per-row gate."""
    from .operators.dedup import words
    from .operators.ranking import global_rank_cumsum

    # conv 22: NULL-text docs excluded (no tokens to contribute; a NULL
    # count would poison the prefix sum engine-asymmetrically)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "doc_id",
        F.size(F.filter(words(F.col("text")), lambda x: x != F.lit("")))
        .cast("long")
        .alias("n_tokens"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("fill-v1:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_coin"),
    )
    ranked, _, _ = global_rank_cumsum(
        t,
        [F.col("_coin").asc(), F.col("doc_id").asc()],
        rank_col="pos",
        sum_col="n_tokens",
        cum_col="cum_tokens",
    )
    return ranked.filter(F.col("cum_tokens") <= 20000).select(
        "doc_id", "n_tokens", "pos", "cum_tokens"
    )


@query(
    "q202_cluster_representatives",
    # identical components; keep-best = arg_max over ONE packed integer
    # key n_chars·10^10 − doc_id (conv 12: max n_chars, ties to the
    # SMALLEST doc id — doc ids bounded far below 10^10 here).  The pack
    # is WIDE on both sides (decimal(38,0) / HUGEINT, conv 11/12): in
    # int64 it wraps silently on Spark once n_chars ≳ 9.2e8 while DuckDB
    # raises — the conv-11 silent-wrap class (r8 ADVICE).  HUGEINT stays
    # INSIDE the arg_max comparison; outputs are BIGINT (conv 19).
    oracle="WITH RECURSIVE"
    + _SQL_CLOSURE_035.format(grams=_SQL_GRAMS)
    + """
    SELECT root,
           CAST(arg_max(doc_id, CAST(n_chars AS HUGEINT) * 10000000000
                                - doc_id) AS BIGINT) AS kept_doc,
           CAST(arg_max(n_chars, CAST(n_chars AS HUGEINT) * 10000000000
                                 - doc_id) AS BIGINT) AS n_chars_kept,
           CAST(count(*) AS BIGINT) AS n_members
    FROM (SELECT l.doc_id, l.root, d.n_chars
          FROM lab l JOIN documents d ON d.doc_id = l.doc_id)
    GROUP BY root
    """,
)
def q202_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup cluster CANONICALIZATION: one representative per
    cluster — the longest member (max n_chars), ties to the smallest
    doc id — the keep-best policy that replaces naive keep-first when
    near-dup groups mix truncated and full versions of a text.
    Singletons represent themselves (n_members = 1).

    Scale shape: the q200 component labeling plus ONE map-side-combined
    groupBy(root) with a packed-integer max_by — no windows."""
    lab = _labeled_docs(spark, sf_dir)
    # decimal(38,0) pack (conv 11): an int64 pack wraps SILENTLY under
    # non-ANSI Spark once n_chars ≳ 9.2e8 (wrong representative) while
    # DuckDB raises; decimal keeps the key exact to ~1e28 n_chars and
    # stays an INTERMEDIATE type only (conv 19 — outputs below are long).
    pack = (
        F.col("n_chars").cast("decimal(38,0)") * F.lit(10_000_000_000)
        - F.col("doc_id")
    )
    return lab.groupBy("root").agg(
        F.max_by(F.col("doc_id"), pack).cast("long").alias("kept_doc"),
        F.max_by(F.col("n_chars"), pack).cast("long").alias("n_chars_kept"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )


@query(
    "q203_source_overlap_matrix",
    # identical per-source KMV sketches (same 60-bit md5 hash, same
    # seed), identical theta = min rule (n < k -> full hash space
    # 2^60), exact integer cut/intersection counts over h <= theta,
    # one ratio division of identical operands
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(('0x' || substring(md5('kmv-v1:' || token), 1, 15))
               AS BIGINT) AS h
      FROM (SELECT source, unnest({_SQL_TOKENIZE}) AS token
            FROM documents)
      WHERE token <> ''
    ),
    dist AS (SELECT DISTINCT source, h FROM tok),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM dist
      ) WHERE rn <= 256
    ),
    th AS (
      SELECT source,
             CASE WHEN count(*) < 256
                  THEN CAST(1152921504606846976 AS BIGINT)
                  ELSE CAST(max(h) AS BIGINT) END AS theta
      FROM sk GROUP BY source
    ),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(least(a.theta, b.theta) AS BIGINT) AS theta_cut
      FROM th a JOIN th b ON a.source < b.source
    ),
    ca AS (
      SELECT p.source_a, p.source_b, CAST(count(*) AS BIGINT) AS n_cut_a
      FROM p JOIN sk s ON s.source = p.source_a AND s.h <= p.theta_cut
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT p.source_a, p.source_b, CAST(count(*) AS BIGINT) AS n_cut_b
      FROM p JOIN sk s ON s.source = p.source_b AND s.h <= p.theta_cut
      GROUP BY 1, 2
    ),
    iv AS (
      SELECT p.source_a, p.source_b,
             CAST(count(*) AS BIGINT) AS inter_seen
      FROM p
      JOIN sk x ON x.source = p.source_a AND x.h <= p.theta_cut
      JOIN sk y ON y.source = p.source_b AND y.h = x.h
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.theta_cut,
           CAST(coalesce(ca.n_cut_a, 0) AS BIGINT) AS n_cut_a,
           CAST(coalesce(cb.n_cut_b, 0) AS BIGINT) AS n_cut_b,
           CAST(coalesce(iv.inter_seen, 0) AS BIGINT) AS inter_seen,
           CAST(coalesce(ca.n_cut_a, 0) + coalesce(cb.n_cut_b, 0)
                - coalesce(iv.inter_seen, 0) AS BIGINT) AS union_seen,
           CASE WHEN coalesce(ca.n_cut_a, 0) + coalesce(cb.n_cut_b, 0)
                     - coalesce(iv.inter_seen, 0) = 0 THEN 0.0
                ELSE CAST(coalesce(iv.inter_seen, 0) AS DOUBLE)
                     / CAST(coalesce(ca.n_cut_a, 0)
                            + coalesce(cb.n_cut_b, 0)
                            - coalesce(iv.inter_seen, 0) AS DOUBLE)
           END AS jaccard_est
    FROM p
    LEFT JOIN ca USING (source_a, source_b)
    LEFT JOIN cb USING (source_a, source_b)
    LEFT JOIN iv USING (source_a, source_b)
    """,
)
def q203_source_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALL-PAIRS cross-source vocabulary overlap from per-source KMV
    sketches (k=256) — the contamination / redundancy matrix between
    corpus slices (which sources feed each other?), at sketch cost:
    q125 compares TWO fixed corpora; this sketches every source in one
    pass and compares all pairs.  Theta-cut counts are exact integers;
    jaccard is the ratio estimator (theta cancels).

    Estimator variance (r8 verdict item 5): the ratio estimator's
    relative std-err is ~1/sqrt(k) of the union cut — k=16 gave ±25%
    bands, k=256 gives ~±6%; correctness is unaffected either way
    (every output is an exact integer over the pinned h <= theta
    region plus one division of identical operands), and cost is nil
    because no frame after the sketch build exceeds k·|sources| rows.

    Scale shape: one (source, hash)-distinct agg + a WindowGroupLimit
    per-group top-k; everything downstream is k·|sources|-row frames
    and a |sources|²-bounded pair join — corpus size never appears
    after the sketch build."""
    from .operators.corpus import kmv_overlap_matrix, kmv_sketch_grouped

    sk = kmv_sketch_grouped(
        _t(spark, sf_dir, "documents"), group_col="source", k=256
    )
    return kmv_overlap_matrix(sk, group_col="source", k=256)


@query(
    "q204_source_duplication_report",
    # identical content digest (md5 of the shared normalize rule) and
    # truncating-ppm rate — pure integers after the digest
    oracle="""
    WITH d AS (
      SELECT source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS content_hash
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT content_hash) AS BIGINT) AS n_distinct,
           CAST((1000000 * (count(*) - count(DISTINCT content_hash)))
                // count(*) AS BIGINT) AS dup_ppm
    FROM d GROUP BY source
    """,
)
def q204_source_duplication_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source EXACT duplication rate (docs vs distinct normalized
    contents, truncating ppm) — the per-slice data-sheet number that
    decides which source needs the full near-dup pass first; the
    grouped rollup of q20's exact-dedup digests.

    Scale shape: one groupBy(source) with a distinct-count over
    32-byte digests — the text never shuffles."""
    from .operators.dedup import normalize_text

    d = _t(spark, sf_dir, "documents").select(
        "source", F.md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("content_hash").cast("long").alias("n_distinct"),
    ).select(
        "source",
        "n_docs",
        "n_distinct",
        F.expr("(1000000 * (n_docs - n_distinct)) div n_docs")
        .cast("long")
        .alias("dup_ppm"),
    )


@query(
    "q205_cross_source_contamination",
    # Exact inverted-index Jaccard closure (conv 7, the q22 oracle) +
    # source joins; valid because LSH recall is complete at this
    # operating point (pinned by test_minhash_lsh_recall_vs_exact), so
    # Spark's verified pair set IS the exact >= 0.3 pair set.  Pure
    # integer outputs: counts + truncating-ppm rates (conv 15: the ppm
    # div is exact integer arithmetic, no float ranking).
    oracle="""
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(__ws) - 2, 1) + 1),
                 i -> array_to_string(list_slice(__ws, i, i + 2), ' ')
               )
             ) AS grams
      FROM (SELECT *, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
            AS __ws FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.3
    ),
    sp AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             CASE WHEN da.source < db.source THEN p.id_a ELSE p.id_b END AS d_a,
             CASE WHEN da.source < db.source THEN p.id_b ELSE p.id_a END AS d_b
      FROM pr p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
      WHERE da.source <> db.source
    ),
    ag AS (
      SELECT source_a, source_b, count(*) AS np,
             count(DISTINCT d_a) AS na, count(DISTINCT d_b) AS nb
      FROM sp GROUP BY 1, 2
    ),
    tot AS (SELECT source, count(*) AS t FROM documents GROUP BY source)
    SELECT ag.source_a, ag.source_b,
           CAST(np AS BIGINT) AS n_pairs,
           CAST(na AS BIGINT) AS n_docs_a,
           CAST(nb AS BIGINT) AS n_docs_b,
           CAST((1000000 * na) // ta.t AS BIGINT) AS contam_a_ppm,
           CAST((1000000 * nb) // tb.t AS BIGINT) AS contam_b_ppm
    FROM ag
    JOIN tot ta ON ta.source = ag.source_a
    JOIN tot tb ON tb.source = ag.source_b
    """,
)
def q205_cross_source_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOC-LEVEL cross-source contamination matrix (r8 verdict item 7):
    q203 measures vocabulary overlap via KMV sketches; the training-data
    question is "how many of source A's DOCUMENTS near-dup into source
    B" — this composes the proven MinHash+LSH band join (q22's verified
    pair set, J >= 0.3) grouped by unordered source pair, with per-side
    distinct-doc counts and truncating-ppm contamination rates against
    each source's total document count.

    Scale shape: candidate generation is the bucketed band join (never
    all-pairs); the pair set joins documents twice on doc_id for the
    source labels; everything after is a |sources|²-bounded aggregate.
    Totals come from one grouped count, broadcast into the final join."""
    from .operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
            ),
            "id_b",
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            F.when(F.col("_sa") < F.col("_sb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("_da"),
            F.when(F.col("_sa") < F.col("_sb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("_db"),
        )
    )
    agg = labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("_da").cast("long").alias("n_docs_a"),
        F.countDistinct("_db").cast("long").alias("n_docs_b"),
    )
    tot = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("_t")
    )
    return (
        agg.join(
            F.broadcast(
                tot.select(
                    F.col("source").alias("source_a"), F.col("_t").alias("_ta")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                tot.select(
                    F.col("source").alias("source_b"), F.col("_t").alias("_tb")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            "n_docs_a",
            "n_docs_b",
            F.expr("(1000000 * n_docs_a) div _ta")
            .cast("long")
            .alias("contam_a_ppm"),
            F.expr("(1000000 * n_docs_b) div _tb")
            .cast("long")
            .alias("contam_b_ppm"),
        )
    )


# Driver-sweep ordering — EXPLICIT ROTATION CONTRACT (documented, not a
# hidden re-sort): the external driver records at most ~50 correctness rows
# per round against a 200+-entry registry, so a fixed numeric order would
# leave the tail permanently unverified.  The registry therefore emits
# queries in RISK order (r9 change-aware upgrade; the r8 verdict's top
# item — a staleness-only order is blind to "edited since last check"):
#
#   tier 0  red at its last driver check (a claimed fix must be confirmed
#           before anything else gets budget — the q87 case)
#   tier 1  never driver-checked (brand-new queries)
#   tier 2  NARROW-changed: the query function's source or its oracle SQL
#           text changed since the code state the driver last checked
#   tier 3  DEP-changed: only a package module the function references
#           (operators/… etc.) changed since that check
#   tier 4  unchanged since its last check
#
# within each tier: oldest last-checked round first, then numeric.
# "Since the driver last checked" is exact, not heuristic: the digest of
# each query AT its last check is rebuilt from git history by
# `tools/stamp_digests.py` (the driver's round-N commit contains exactly
# the code the round-N sweep ran against) into `tools/sweep_stamps.json`,
# and compared here against the digest of the CURRENT tree
# (`sweep_digest.query_digest`).  A missing/stale/unparseable stamp file
# degrades that query (or all of them) to tier 2 — the fail direction is
# over-re-checking, never letting an edited query ride a green verdict.
# If no correctness file is readable the order is plain numeric —
# deterministic either way given the repo state.  Local tooling
# (bench.py, check_correctness) iterates in numeric order regardless, so
# this affects ONLY the capped external sweep's budget allocation.
def _sweep_key_sets() -> tuple[frozenset, frozenset, dict]:
    """(keys in ANY CORRECTNESS_r*.json, keys whose MOST RECENT
    appearance was a failure, {key: newest round containing it})."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    ever: set = set()
    last_row: dict = {}  # key -> its row in the newest file containing it
    last_round: dict = {}
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        ever |= set(data)
        last_row.update(data)
        if m:
            n = int(m.group(1))
            for k in data:
                last_round[k] = max(last_round.get(k, 0), n)

    def _failed(row) -> bool:
        if not isinstance(row, dict):
            return False
        return bool(row.get("err")) or not (
            row.get("rows_match", True)
            and row.get("schema_match", True)
            and row.get("hash_match", True)
        )

    red = frozenset(k for k, r in last_row.items() if _failed(r))
    return frozenset(ever), red, last_round


_EVER_SWEPT, _LAST_RED, _LAST_ROUND = _sweep_key_sets()


def _load_stamps() -> dict:
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(root, "tools", "sweep_stamps.json")) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _current_digests() -> tuple[dict, dict]:
    """{name: full digest}, {name: narrow digest} for the CURRENT tree.
    Any failure yields empty maps → every checked query sorts tier 2
    (over-re-check, the safe direction)."""
    import inspect
    import os

    try:
        from . import sweep_digest
    except ImportError:
        return {}, {}
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    cache: dict = {}
    full: dict = {}
    narrow: dict = {}
    for name, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        orc = ORACLES.get(name, "")
        try:
            full[name] = sweep_digest.query_digest(src, orc, pkg_dir, cache)
            narrow[name] = sweep_digest.query_digest(
                src, orc, pkg_dir, cache, include_deps=False
            )
        except Exception:
            continue
    return full, narrow


_STAMPS = _load_stamps()
_CUR_FULL, _CUR_NARROW = _current_digests()


def _qnum(name: str) -> int:
    import re

    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 999


def _sweep_order(name: str) -> tuple[int, int, int]:
    import os

    if os.environ.get("SPARK_GRAFT_SWEEP_ORDER") == "numeric":
        return (0, 0, _qnum(name))
    last_round = _LAST_ROUND.get(name, -1)
    if name in _LAST_RED:
        tier = 0
    elif name not in _EVER_SWEPT:
        tier = 1
    else:
        stamp = _STAMPS.get(name)
        cur_n = _CUR_NARROW.get(name)
        cur_f = _CUR_FULL.get(name)
        # A stamp OLDER than the newest green correctness round is fine:
        # the artifact itself proves the check happened, and the digest
        # comparison below detects any code drift since the stamp round
        # (r10 verdict task 1 — the driver drops CORRECTNESS_r{N}.json
        # AFTER the final commit, so requiring equality forced a manual
        # re-stamp every round that could structurally never keep up).
        # A stamp NEWER than every correctness round means an artifact
        # disappeared — over-re-check (tier 2), the safe direction.
        if (
            not isinstance(stamp, dict)
            or not isinstance(stamp.get("round"), int)
            or stamp.get("round") > last_round
            or cur_n is None
            or stamp.get("narrow") in (None, "UNKNOWN")
            or stamp.get("narrow") != cur_n
        ):
            tier = 2
        elif stamp.get("digest") != cur_f:
            tier = 3
        else:
            tier = 4
    return (tier, last_round, _qnum(name))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: QUERIES[k] for k in sorted(QUERIES, key=_sweep_order)}


def oracle_sql() -> dict[str, str]:
    return {k: ORACLES[k] for k in sorted(ORACLES, key=_sweep_order)}
