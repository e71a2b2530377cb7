"""Skew-resilient aggregation: two-phase (salted) group statistics.

The reference dataset is skewed — one product group held 995 of 25,558
offers (SURVEY §4, offre_3.ipynb).  At 100 TB a hot key turns a groupBy
into one straggler task.  AQE handles skewed JOINS automatically, but a
skewed AGGREGATION key still funnels every row of the hot group through
one reducer; the classic fix is salting:

  phase 1: groupBy(key, salt) — the hot group splits across n_salts
           reducers, each computing exact partial aggregates;
  phase 2: groupBy(key) — combines n_salts partial rows per key.

All partials are exact (counts, DECIMAL sums, min/max), so the final
stats are IDENTICAL to the single-phase aggregate — verified by the
oracle-backed registry entry q33 whose SQL is the plain aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(19,4)"


def salted_group_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    salt_expr: Column | None = None,
    min_group_size: int = 1,
) -> DataFrame:
    """Per-key count/mean/std/min/max via salted two-phase aggregation.

    ``salt_expr`` must spread rows of the same key across reducers; the
    default uses a per-row physical id — unlike content hashing it also
    spreads IDENTICAL duplicate rows (the common hot-key shape: many
    equal re-scraped offers) and never chokes on unhashable column types
    (xxhash64 rejects maps).  The salt never affects the result, only
    the shuffle distribution, so its run-to-run instability is benign.
    """
    if salt_expr is None:
        salt_expr = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    v = F.col(value_col)
    dec = v.cast(_DEC)

    partial = (
        df.withColumn("_salt", salt_expr)
        .groupBy(key_col, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec).alias("_s"),
            F.sum(dec * dec).alias("_ss"),
            F.min(v).alias("_min"),
            F.max(v).alias("_max"),
        )
    )
    combined = partial.groupBy(key_col).agg(
        F.sum("_n").alias("total_count"),
        F.sum("_s").alias("_s"),
        F.sum("_ss").alias("_ss"),
        F.min("_min").alias("value_min"),
        F.max("_max").alias("value_max"),
    )
    n = F.col("total_count").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mean = s / n
    var = (ss - (s * s) / n) / (n - F.lit(1.0))
    # std is NULL (not 0.0) when undefined: n=1 (0/0 divide → null, and
    # greatest() would silently skip the null) or when the decimal
    # sum-of-squares overflowed to null (values beyond ~1e15 at ~1e6
    # rows/group exceed decimal(38,8) — sample stddev semantics must not
    # report certainty it doesn't have).
    std = F.when(
        (F.col("total_count") > 1) & ss.isNotNull() & s.isNotNull(),
        F.sqrt(F.greatest(var, F.lit(0.0))),
    )
    return (
        combined.filter(F.col("total_count") >= min_group_size)
        .select(
            key_col,
            "total_count",
            mean.alias("value_mean"),
            std.alias("value_std"),
            "value_min",
            "value_max",
        )
    )


def replicated_salt_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join by small-side replication: the big
    (skewed) side gets a per-ROW salt, the small side is replicated
    once per salt value (explode over 0..n_salts−1), and the join runs
    on (key, salt) — a hot key's rows now land on ``n_salts`` reducers
    instead of one straggler.

    Each big row carries exactly ONE salt and every (key, salt) slice
    of the small side is a full copy, so the result multiset is
    IDENTICAL to the plain join (the oracle for the registry entry is
    the plain SQL join) for ``how`` in {inner, left} — the only cost
    is n_salts× the small side's shuffle volume, which is the explicit
    trade this operator exists to make.

    When to use over AQE's automatic skew-join split
    (spark.sql.adaptive.skewJoin): AQE only rebalances SORT-MERGE join
    partitions at runtime; it cannot help a streaming-static join, a
    broadcast that does not fit, or an engine with AQE disabled.  The
    per-row salt is monotonically_increasing_id-based for the same
    reason as ``salted_group_stats``: it spreads identical duplicate
    rows and the salt never reaches the output.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    b = big.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    # explode() cannot nest inside another expression (generator rule);
    # sequence of int literals already yields int elements
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, on=[key_col, "_salt"], how=how)
    return out.drop("_salt")


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """ONE-row skew diagnosis of a join/aggregation key — the report
    you read BEFORE choosing a strategy from this module (salting,
    replication) or trusting AQE: key cardinality, row count, the
    hottest key's share, and the Gini coefficient of the key-count
    distribution (0 = uniform, →1 = one key owns everything).

    Exact integer algebra: with per-key counts x sorted ascending and
    1-based rank i over K keys, S = Σx,

        gini = (2·Σ i·x_i − (K+1)·S) / (K·S)

    numerator/denominator are exact decimals (Σ i·x as decimal(38,0)
    sums of decimal(19,0) products — conv 11; safe to K·S ≲ 10³⁸);
    top1_share_ppm = 10^6·max div S is a truncating long.  The one
    display double divides identical operands.

    Scale shape: one map-side-combined key-count agg; the global rank
    over the KEY frame runs as the TWO-PASS range-partitioned rank
    (operators/ranking.py) — a key frame is cardinality-sized, which
    at 100 TB is billions of keys, so an unpartitioned ordered window
    here would single-partition it; ties in count are Σ-invariant
    under any order, so the result is partition-independent.
    """
    from .ranking import global_rank_cumsum

    cnts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ranked, _, _ = global_rank_cumsum(
        cnts, [F.col("cnt").asc(), F.col("k").asc()], rank_col="i"
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum((d19("i") * d19("cnt")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_six"),
    )
    gnum = (
        F.lit(2).cast("decimal(19,0)") * F.col("_six")
        - (F.col("n_keys") + 1).cast("decimal(19,0)")
        * F.col("n_rows").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    gden = (
        F.col("n_keys").cast("decimal(19,0)")
        * F.col("n_rows").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    return (
        agg.withColumn("gini_num", gnum)
        .withColumn("gini_den", gden)
        .select(
            "n_keys",
            "n_rows",
            "max_cnt",
            F.expr("(1000000 * max_cnt) div n_rows")
            .cast("long")
            .alias("top1_share_ppm"),
            "gini_num",
            "gini_den",
            (
                F.col("gini_num").cast("double")
                / F.col("gini_den").cast("double")
            ).alias("gini"),
        )
    )
