"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9 extension; pyspark guide 'Stateful' pattern).

Running per-user totals across micro-batches: each batch emits the
user's cumulative (events, value) so far.  State is a single row per
user — bounded, no timeout needed for the running-total shape (add
``ProcessingTimeTimeout`` + ``state.setTimeoutDuration`` for TTL'd
session state).

Closure hygiene applies (operators/multimodal.py): the update function
references only stdlib/pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total_events long, total_value double"
STATE_SCHEMA = "total_events long, total_value double"


def running_user_totals(
    events_stream: DataFrame, exact_decimals: int | None = None
) -> DataFrame:
    """events(user_id, value, ...) stream → cumulative totals per user,
    one output row per user per micro-batch that touched them.

    ``exact_decimals=d`` accumulates value in fixed-point ticks of 10^-d
    (stored in the double state slot — ticks are integers, exact in a
    double up to 2^53).  This makes the running total independent of
    row/batch arrival order — required for deterministic restarts and
    for cross-engine verification (a float left-fold differs at the ulp
    level per order).  ``None`` keeps plain float accumulation.
    """

    def update(key, pdfs, state):
        import pandas as pd

        scale = None if exact_decimals is None else 10.0 ** exact_decimals
        (user_id,) = key
        n, acc = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].fillna(0.0)
            if scale is None:
                acc += float(v.sum())
            else:
                acc += float((v * scale).round().sum())
        state.update((n, acc))
        total = acc if scale is None else acc / scale
        yield pd.DataFrame(
            [{"user_id": user_id, "total_events": n, "total_value": total}]
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
