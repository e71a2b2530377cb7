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

from .sources.tables import load_table

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
_SQL_SUM = "CAST(sum(CAST({c} AS DECIMAL(19,4))) AS DOUBLE)"
_SQL_SUMSQ = (
    "CAST(sum(CAST({c} AS DECIMAL(19,4)) * CAST({c} AS DECIMAL(19,4))) AS DOUBLE)"
)


def _sql_mean(c: str, n: str = "count(*)") -> str:
    return f"{_SQL_SUM.format(c=c)} / CAST({n} AS DOUBLE)"


def _sql_stddev(c: str, n: str = "count(*)") -> str:
    s, ss, nd = _SQL_SUM.format(c=c), _SQL_SUMSQ.format(c=c), f"CAST({n} AS DOUBLE)"
    return f"sqrt(greatest(({ss} - ({s} * {s}) / {nd}) / ({nd} - 1.0), 0.0))"


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
             CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)))
                  OVER (PARTITION BY l_partkey) AS DOUBLE)              AS g_sum,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4)))
                  OVER (PARTITION BY l_partkey) AS DOUBLE)              AS g_sumsq,
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

    Window over l_partkey — one shuffle, stats and comparison in the same
    stage; no join back needed.  Group mean/std come from exact decimal
    window sums so flags match the oracle exactly even at the z-threshold.
    trop_bas/trop_haut classification matches the reference's anomaly_type.
    """
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    price = F.col("l_extendedprice")
    dec = price.cast(_DEC)
    g_sum = F.sum(dec).over(w).cast("double")
    g_sumsq = F.sum(dec * dec).over(w).cast("double")
    g_n = F.count(F.lit(1)).over(w).cast("double")
    g_mean = g_sum / g_n
    g_std = F.sqrt(F.greatest((g_sumsq - (g_sum * g_sum) / g_n) / (g_n - F.lit(1.0)), F.lit(0.0)))
    z = F.abs(price - g_mean) / g_std
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_partkey").alias("product_key"),
            price.alias("anomaly_price"),
            g_mean.alias("market_mean"),
            z.alias("z_score"),
            (F.abs(price - g_mean) / g_mean * F.lit(100.0)).alias("deviation_percent"),
            F.when(price < g_mean, "trop_bas").otherwise("trop_haut").alias("anomaly_type"),
            g_std.alias("_g_std"),
            g_n.alias("_g_n"),
            z.alias("_z"),
        )
        .filter((F.col("_g_n") >= 3) & (F.col("_g_std") > 0) & (F.col("_z") > 1.5))
        .drop("_g_std", "_g_n", "_z")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
