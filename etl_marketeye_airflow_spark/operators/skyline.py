"""2-D skyline (Pareto front) without a global sort or window.

The classic "best tradeoff" OLAP operator (Börzsönyi et al. ICDE 2001):
keep every row not DOMINATED by another — q dominates p iff q is ≤ p in
both criteria and strictly < in at least one (both criteria MINIMIZED
here; callers negate a column to maximize it).

Reference scope: the MarketEye reference has no skyline; this is engine
extension for the "cheapest-largest part" style tradeoff queries its
price analytics gesture at.

Scale shape — the textbook 2-D skyline is a sort + running min, i.e. a
single-partition global window (the scale-killer convention 2 bans).
This operator reuses vocab_coverage's two-pass distributed prefix
machinery instead:

1. per-x reduction: only min(y) per x can be on the skyline (same-x
   higher y is strictly dominated) — one map-side-combined groupBy
   that also makes x unique, so the prefix below never mixes ties.
2. ``repartitionByRange`` on x asc — persisted and materialized once
   (range exchanges re-sample boundaries per execution; partition ids
   must be frozen before fan-out).
3. per-partition min(y) collects to the driver — numPartitions rows,
   bounded by config not data — where partition-prefix minima are a
   trivial loop; broadcast back.
4. within each partition a local EXCLUSIVE prefix min over x asc
   (bounded per-partition window); global prefix = least(partition
   offset, local prefix).  Skyline ⇔ no prefix yet (global min-x) or
   y strictly below the prefix.
5. join the skyline (x, y) pairs back to the input to carry full rows
   and keep exact-duplicate criteria ties (mutually non-dominating —
   both belong on the front).

Every comparison is on the raw column values (no arithmetic) — exact
for ints, decimals, and doubles alike, so any engine's NOT EXISTS
dominance scan verifies the result row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x: Column,
    y: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (minimize x, minimize y) Pareto front.

    ``x`` / ``y`` are Column expressions (negate to maximize).  Rows
    where either criterion is NULL — or NaN for floating criteria —
    are excluded: dominance is undefined on missing values, and NaN
    would poison the driver-side Python ``min`` (NaN propagates
    positionally there) while Spark sorts it greatest — two different
    wrong answers.  Returns the full input rows (plus nothing else);
    exact ties on BOTH criteria all survive.
    """
    from pyspark.sql.types import DoubleType, FloatType

    spark = df.sparkSession
    staged = df.withColumn("_sx", x).withColumn("_sy", y).filter(
        F.col("_sx").isNotNull() & F.col("_sy").isNotNull()
    )
    for c in ("_sx", "_sy"):
        if isinstance(staged.schema[c].dataType, (DoubleType, FloatType)):
            staged = staged.filter(~F.isnan(F.col(c)))
    pts = staged.select("_sx", "_sy").groupBy("_sx").agg(
        F.min("_sy").alias("_sy")
    )
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    with_pid = (
        pts.repartitionByRange(n_parts, F.col("_sx").asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    per_pid = sorted(
        (r["_pid"], r["_pmin"])
        for r in with_pid.groupBy("_pid")
        .agg(F.min("_sy").alias("_pmin"))
        .collect()  # ≤ n_parts rows — bounded by config, not data
    )
    y_type = dict(zip(pts.schema.names, pts.schema.fields))["_sy"].dataType
    offsets, run = [], None
    for pid, pmin in per_pid:
        offsets.append((pid, run))  # EXCLUSIVE: min over partitions before
        run = pmin if run is None else min(run, pmin)
    from pyspark.sql.types import IntegerType, StructField, StructType

    offsets_df = spark.createDataFrame(
        offsets,
        StructType(
            [
                StructField("_pid", IntegerType(), False),
                StructField("_off", y_type, True),
            ]
        ),
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_sx").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = (
        with_pid.withColumn("_lmin", F.min("_sy").over(wl))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn(
            "_pref",
            F.when(
                F.col("_lmin").isNull() | F.col("_off").isNull(),
                F.coalesce("_lmin", "_off"),
            ).otherwise(F.least("_lmin", "_off")),
        )
        .filter(F.col("_pref").isNull() | (F.col("_sy") < F.col("_pref")))
        .select("_sx", "_sy")
    )
    out = staged.join(front, ["_sx", "_sy"], "left_semi").drop("_sx", "_sy")
    out = out.localCheckpoint(eager=True)  # two-pass algo: free the persist
    with_pid.unpersist()
    return out
