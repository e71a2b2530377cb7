"""Temporal join operators Spark lacks natively: as-of join and range
join (pyspark guide 'common OLAP patterns'; the reference has neither —
engine-completeness operators for event-time analytics).

Both are expressed as compositions of built-in ops (preference order (a)
from the brief), NOT applyInPandas:

- **as-of join** via the tagged-union + running-last window trick: union
  left and right rows on the key, sort by (time, side) with right rows
  first at equal times, carry the latest right payload forward with
  ``last(ignorenulls)`` over an unbounded-preceding window, keep left
  rows.  One shuffle on the key — same cost as a window, no per-group
  Python, no skew beyond the key's own.
- **range join** via time-bucketing: candidates are equi-joined on
  (key, bucket) with each left row probing its ±1 neighbor buckets, then
  filtered on the exact interval.  Bucket width = range width keeps the
  candidate blowup ≤ 3×; this is the standard pre-AQE strategy for
  interval joins at scale (a naive theta-join is a cartesian per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the matched right row per direction (ties match
    in both): 'backward' = greatest right time ≤ left time, 'forward' =
    smallest right time ≥ left time.  Columns: left.* + matched right
    value cols (null when no matching right row exists).

    Forward is the same tagged-union + running-last composition with the
    time sort flipped DESCENDING: traversing right rows from latest to
    earliest, the last right row seen at-or-after a left row is exactly
    the nearest follower.  Right rows still sort before left rows at
    equal times (ties match), and payload-field tiebreak order is shared
    so both directions pick deterministically among equal-time rights.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # null right times can never satisfy "greatest right time ≤ left
    # time" (ASOF semantics), but the window's nulls-first sort would
    # carry them into every otherwise-unmatched left row — drop them.
    right = right.filter(F.col(time_col).isNotNull())
    lcols = left.columns
    # The right payload is carried as ONE struct: last(ignorenulls) per
    # individual column would backfill a matched row's null field from an
    # OLDER row — fabricating a tuple no right row contains.  The struct
    # is non-null for every right row (even with null fields inside), so
    # the carried value is exactly the matched row.
    r_payload = F.struct(*[F.col(c).alias(c) for c in right_value_cols])
    # side 0 = right (sorts first at equal time → ties match), 1 = left
    l_tagged = left.select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(r_payload.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        r_payload.alias("_r"),
    )
    # Tiebreak among right rows sharing (_k, _t): order by the payload's
    # ORDERABLE fields only — ordering the whole struct fails analysis
    # when a value column is a map/array.  (Left rows have null fields →
    # consistent.)  With no orderable field the tie stays arbitrary.
    orderable = [
        c
        for c in right_value_cols
        if right.schema[c].dataType.typeName() not in ("map", "array")
    ]
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc(), *[F.col("_r").getField(c) for c in orderable])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col("_l").getField(c).alias(c) for c in lcols],
        *[F.col("_m").getField(c).alias(f"asof_{c}") for c in right_value_cols],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    range_width: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Count right rows within ±range_width of each left row's time
    (same key).  Bucketed equi-join: left probes buckets {b-1, b, b+1}
    of width=range_width, exact filter after — candidates ≤ 3× matches.
    """
    # integer `div`, not double division: epoch values near/above 2^53
    # (nanosecond timestamps) lose precision in double and can land a
    # row 2 buckets away from its probe set.
    w = int(range_width)
    bucket = F.expr(f"CAST(`{time_col}` AS BIGINT) div {w}")
    r_b = right.select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_rt"),
        bucket.alias("_bucket"),
    )
    # a per-row uid (assigned BEFORE the probe explode so all 3 probe
    # rows share it) keeps DUPLICATE left rows distinct through the
    # group-back — grouping by left columns alone would merge them and
    # sum their counts.  The uid never reaches the output.
    l_b = left.withColumn("_uid", F.monotonically_increasing_id()).withColumn(
        "_probe", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    )
    joined = l_b.join(
        r_b,
        (l_b["_probe"] == r_b["_bucket"]) & (l_b[key_col] == r_b["_k"]),
        "left",
    ).filter(
        F.col("_rt").isNull()
        | (F.abs(F.col("_rt") - F.col(time_col)) <= F.lit(w))
    )
    return (
        joined.groupBy("_uid", *[l_b[c] for c in left.columns])
        .agg(F.count("_rt").alias(count_alias))
        .drop("_uid")
    )


def cusum_drift(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    slack: int = 0,
    threshold: int = 0,
    min_n: int = 2,
) -> DataFrame:
    """Per-key CUSUM upward-drift detection over an ordered event
    stream — the classic sequential changepoint statistic
    (Page 1954): with d_t = x_t − baseline − slack,

        S_t = max(0, S_{t−1} + d_t)

    alarms when S_t > threshold.  The recurrence looks like a fold
    (q139's shape), but the clamp admits a WINDOW form: with prefix
    sums P_t = Σ_{i≤t} d_i,

        S_t = P_t − min(0, min_{j≤t} P_j)

    (the clamp resets exactly at the running-minimum prefix), so both
    engines compute it with one per-key sort window — prefix sum +
    running min — never an actual sequential fold.

    Determinism contract (CLAUDE.md conv 1): ``value_col`` is an
    INTEGER long (cents); ``order_cols`` must be a TOTAL order per key
    (e.g. ts_us, event_id).  The per-key baseline is the truncating
    integer mean sum(x) div n (all-window, no second pass); every
    statistic is then exact BIGINT algebra — bit-identical on any
    engine/partitioning.

    Returns one row per key with ≥ ``min_n`` events: (key…, n_events,
    baseline, s_max, alarm_rn, alarm_<order_cols[0]>) where s_max is
    the peak CUSUM value, alarm_rn the 1-based position of the FIRST
    alarm (NULL if never), and alarm_<first order col> that event's
    order value (NULL if never).

    Scale shape: ONE shuffle on the key; the sort window computes
    row_number, prefix sum, running min, and the full-partition
    baseline in the same exchange; the final groupBy reuses the key
    partitioning.  Mega-key limit is the per-key sort, as documented
    for sessionization/EMA.
    """
    k = [F.col(c) for c in key_cols]
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*k).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*k)
    x = F.col(value_col)
    base = (
        df.withColumn("_n", F.count(F.lit(1)).over(wall))
        .filter(F.col("_n") >= F.lit(min_n))
        .withColumn("_sx", F.sum(x).over(wall).cast("long"))
        # truncating integer mean — all values non-negative cents, so
        # Spark div == DuckDB // (the negative-div trap never applies)
        .withColumn("baseline", F.expr("_sx div _n").cast("long"))
        .withColumn("_d", (x - F.col("baseline") - F.lit(slack)).cast("long"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_p", F.sum("_d").over(wrun).cast("long"))
        .withColumn("_m", F.min("_p").over(wrun).cast("long"))
        .withColumn(
            "_s", (F.col("_p") - F.least(F.col("_m"), F.lit(0))).cast("long")
        )
    )
    alarm = F.when(F.col("_s") > F.lit(threshold), F.col("_rn"))
    # rows are ordered ts-major, so min over alarmed rows of the first
    # order column IS the first alarm's value (ties share the value)
    alarm_order = F.when(
        F.col("_s") > F.lit(threshold), F.col(order_cols[0])
    )
    return base.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n_events"),
        F.max("baseline").cast("long").alias("baseline"),
        F.max("_s").cast("long").alias("s_max"),
        F.min(alarm).cast("long").alias("alarm_rn"),
        F.min(alarm_order).alias(f"alarm_{order_cols[0]}"),
    )


def transition_matrix(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition counts over per-key ordered event
    sequences: for each observed (from_state, to_state) pair of
    CONSECUTIVE events within a key, the global count, the from-state
    outgoing total, and the transition probability — the user-journey
    / funnel-generalization statistic (where do sessions go next?).

    Determinism (CLAUDE.md conv 1): ``order_cols`` must be a total
    order per key; counts are exact integers and the probability is
    the truncating parts-per-million 10^6·n div n_from (one display
    double derives from the same integers).  Sequences never cross
    keys (lead() is per-partition), so the pair multiset is engine-
    and partitioning-independent.

    Scale shape: one shuffle on the key for the lead() window, then a
    map-side-combined groupBy on (from,to) whose cardinality is
    |states|² — tiny; the outgoing totals derive from the SAME pair
    frame (sum over to-states), not a second scan.
    """
    k = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*k).orderBy(*[F.col(c).asc() for c in order_cols])
    pairs = (
        df.withColumn("_next", F.lead(F.col(state_col)).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("_next").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    out = (
        pairs.join(totals, "from_state")
        .filter(F.col("n") >= F.lit(min_count))
        .withColumn("p_ppm", F.expr("(1000000 * n) div n_from").cast("long"))
    )
    return out.select(
        "from_state",
        "to_state",
        "n",
        "n_from",
        "p_ppm",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias(
            "p"
        ),
    )


def last_touch_attribution(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    event_col: str,
    conversion_value: str,
    touch_values: list[str],
    window_us: int,
    ts_col: str | None = None,
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the most recent PRIOR touch event of the same key
    within ``window_us`` microseconds — the standard marketing/funnel
    attribution rule, and a general "carry the latest qualifying state
    forward" primitive (the asof-join trick applied within one table).

    Mechanism: one per-key sort window; ``last(struct(ts, touch),
    ignorenulls)`` over rows-unbounded-preceding carries the latest
    touch forward (the struct keeps the touch's OWN timestamp so the
    window cut is exact); conversions outside the window or with no
    prior touch attribute to NULL (reported as 'none').

    Returns attribution counts: (attributed_touch, n_conversions) —
    exact integers, deterministic given a total (order_cols) order.

    Scale shape: ONE shuffle on the key; the carry-forward and the
    cut are per-row expressions in the same window stage; the final
    groupBy is tiny (|touch types|+1 rows).
    """
    t = ts_col or order_cols[0]
    k = [F.col(c) for c in key_cols]
    w = (
        Window.partitionBy(*k)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(event_col).isin(touch_values)
    touch_struct = F.when(
        is_touch, F.struct(F.col(t).alias("_tt"), F.col(event_col).alias("_te"))
    )
    staged = df.withColumn(
        "_last_touch", F.last(touch_struct, ignorenulls=True).over(w)
    )
    conv = staged.filter(F.col(event_col) == F.lit(conversion_value))
    attributed = F.when(
        F.col("_last_touch").isNotNull()
        & (
            (F.col(t) - F.col("_last_touch")["_tt"])
            <= F.lit(window_us)
        ),
        F.col("_last_touch")["_te"],
    ).otherwise(F.lit("none"))
    return (
        conv.withColumn("attributed_touch", attributed)
        .groupBy("attributed_touch")
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
    )


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-length of (possibly overlapping) intervals per key: merge
    every overlapping/touching interval chain and return per key the
    merged-interval count and total covered span — the uptime / active
    time / SLA-coverage primitive (overlaps must not double-count).

    Gaps-and-islands on integer bounds: order intervals by (start,
    end); an interval starts a NEW island iff its start exceeds the
    running max of all previous ends (strictly — touching intervals
    [a,b],[b,c] merge); island id = prefix sum of the flags; one
    groupBy collapses islands, a second sums per key.  All exact
    BIGINT algebra on any engine/partitioning.

    Scale shape: ONE shuffle on the key; the sort window computes the
    flag + island id in one stage; both groupBys reuse the key
    partitioning.  Interval count per key bounds the sort (the
    sessionization known-limit class).
    """
    k = [F.col(c) for c in key_cols]
    s, e = F.col(start_col), F.col(end_col)
    w = Window.partitionBy(*k).orderBy(s.asc(), e.asc())
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (s > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy(*key_cols, "_island").agg(
        F.min(s).alias("_is"), F.max(e).alias("_ie")
    )
    return islands.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_merged_intervals"),
        F.sum(F.col("_ie") - F.col("_is")).cast("long").alias("covered"),
    )


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Grid resampling with LINEAR interpolation — q95's LOCF sibling
    for quantities that trend between observations (prices, levels):
    every missing bucket gets v0 + (v1−v0)·(t−t0)/(t1−t0) between its
    nearest observed neighbors.

    Input: ONE row per (key…, bucket) with an INTEGER ``value_col``
    (cents — conv 1) for observed buckets only; bucket is an integer
    grid index.  The full per-key grid [min..max] is generated with
    sequence()+explode (grid size is per-key data-dependent, never a
    cross join), neighbors come from two frame windows (carry-forward
    last + carry-backward first over (bucket, value) structs), and the
    interpolated value is held EXACT as a rational:

        num = v0·(t1−t0) + (v1−v0)·(t−t0),   den = (t1−t0)

    (observed buckets: t = t0 ⇒ num = v0·den exactly).  Both ends of
    the grid are observed by construction, so interior buckets always
    have both neighbors.  One display double num/den per row.

    Scale shape: q95's exactly — shuffles only on the key, reused by
    the grid agg, the join back, and both windows.
    """
    k = [F.col(c) for c in key_cols]
    b, v = F.col(bucket_col), F.col(value_col)
    obs = df.select(*key_cols, b.alias("bucket"), v.alias("_v"))
    grid = (
        obs.groupBy(*key_cols)
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias(
                "bucket"
            ),
        )
    )
    j = grid.join(obs, [*key_cols, "bucket"], "left")
    wp = (
        Window.partitionBy(*k)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*k)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ob = F.when(
        F.col("_v").isNotNull(),
        F.struct(F.col("bucket").alias("_t"), F.col("_v").alias("_x")),
    )
    staged = (
        j.withColumn("_p", F.last(ob, ignorenulls=True).over(wp))
        .withColumn("_n", F.first(ob, ignorenulls=True).over(wn))
    )
    t0, v0 = F.col("_p")["_t"], F.col("_p")["_x"]
    t1, v1 = F.col("_n")["_t"], F.col("_n")["_x"]
    den = (t1 - t0).cast("long")
    num = (
        v0 * (t1 - t0) + (v1 - v0) * (F.col("bucket") - t0)
    ).cast("long")
    return staged.select(
        *key_cols,
        "bucket",
        F.col("_v").isNotNull().alias("observed"),
        F.when(den > 0, num).otherwise(v0 * F.lit(1)).alias("interp_num"),
        F.when(den > 0, den).otherwise(F.lit(1)).cast("long").alias(
            "interp_den"
        ),
        F.when(
            den > 0,
            num.cast("double") / den.cast("double"),
        )
        .otherwise(v0.cast("double"))
        .alias("value_interp"),
    )
