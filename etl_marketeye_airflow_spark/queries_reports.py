"""q183-q190: profiling/report family

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

    Scale shape (r13, VERDICT item 4): one per-customer agg (persisted
    across its four consumers), then per metric THREE exact quartile
    BOUNDARY rows — found by range-partitioning just (value, key),
    counting per partition, and sorting only the ≤3 partitions that
    hold a boundary (operators/rankstats.py) — and one comparison pass
    that assigns quartiles against the collected boundary literals
    with ZERO shuffle of the customer frame.  Replaces three chained
    two-pass global ranks that each range-shuffled, checkpointed and
    locally sorted the FULL frame; the bucket rule is bit-identical by
    construction (q(rn) = 1 + #{k: rn ≥ ceil(k·n/4)+1} under the same
    unique (value, key) asc order — tests/test_rankstats.py pins it
    against a plain-window reference incl. n<4 and tie cases).  One
    ≤64-group census ends it."""
    from .operators.rankstats import (
        rank_quantile_boundaries,
        rank_quantile_col,
    )

    o = _t(spark, sf_dir, "orders")
    c = (
        o.groupBy("o_custkey")
        .agg(
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
        .persist()
    )
    try:
        quartiles = []
        for value_col, out in (
            ("last_day", "r_q"),
            ("freq", "f_q"),
            ("monet", "m_q"),
        ):
            _, bnds = rank_quantile_boundaries(c, value_col, "o_custkey")
            quartiles.append(
                rank_quantile_col(value_col, "o_custkey", bnds).alias(out)
            )
        r = c.select("o_custkey", *quartiles)
        return (
            r.groupBy("r_q", "f_q", "m_q")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
            # materialize before releasing the customer base this plan
            # reads from (same eager-result lifecycle as the pair engine)
            .localCheckpoint()
        )
    finally:
        c.unpersist()


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
