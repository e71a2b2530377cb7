"""Stream-stream interval join: the attribution primitive (purchase ←
clicks within a lookback window) as a watermarked Structured Streaming
join.

Scale shape: both sides are keyed streams; Spark co-partitions them by
the join key and keeps per-key state ONLY for the watermark horizon —
the time-range condition (right event inside [left - lookback, left])
lets the engine compute how long each side's rows can still match, so
state is bounded by (event rate × (watermark + lookback)), never by
stream history.  Without the range condition the state grows forever;
this operator refuses to build that join.

Reference scope: the MarketEye reference is batch-only (@daily Airflow
DAG); this extends the engine's streaming family (SURVEY §2.9 ext) the
same way q31/q34/q50 do, with the drained availableNow result equal to
the batch interval self-join (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event falls in
    [left_ts - lookback, left_ts].

    Both inputs must already have DISTINCT column names apart from
    ``key`` (rename before calling); both get a watermark on their time
    column — required for state cleanup in stream-stream joins.
    """
    overlap = set(left.columns) & set(right.columns) - {key}
    if overlap:
        raise ValueError(f"rename overlapping columns before joining: {overlap}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"interval {lookback}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return l.join(r, cond).drop(r[key])
