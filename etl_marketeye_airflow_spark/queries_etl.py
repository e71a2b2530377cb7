"""q01-q19: reference-parity marketeye ETL shapes

Registry band module (r11 split of the 12.6k-line queries.py).  Shared
helpers, the @query decorator, and the oracle-parity conventions live in
``_registry_base`` (same package level, so function sources — and hence
sweep digests — are byte-identical to the pre-split file).  Importing
this module registers its queries into the shared QUERIES/ORACLES dicts.
"""

from __future__ import annotations

from . import _registry_base as _B

# bind every base helper (incl. underscore names) into this module's
# globals so the verbatim-moved query sources resolve unchanged
globals().update({k: v for k, v in vars(_B).items() if not k.startswith("__")})

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
