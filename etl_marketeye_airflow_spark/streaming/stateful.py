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


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → cumulative totals per user,
    one output row per user per micro-batch that touched them."""

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
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
