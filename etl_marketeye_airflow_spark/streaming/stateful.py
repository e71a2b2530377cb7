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
    events_stream: DataFrame, exact_bits: int | None = None
) -> DataFrame:
    """events(user_id, value, ...) stream → cumulative totals per user,
    one output row per user per micro-batch that touched them.

    ``exact_bits=k`` accumulates value in DYADIC fixed-point ticks of
    2^-k via floor(v·2^k) — conv 14: float→double exact, ×2^k exact,
    floor exact, so the tick is a pure function of the input bits on
    ANY engine (ticks are integers, exact in the double state slot up
    to 2^53).  This makes the running total independent of row/batch
    arrival order AND of the engine — required for deterministic
    restarts and cross-engine verification.  The earlier decimal-ticks
    form ((v·10^d).round()) was order-free but NOT engine-free: numpy
    rounds half-to-even on an already-rounded product while a decimal
    cast rounds the true value half-up — the fuzz_gate tie probe
    (x.xx5 values, r8) diverged exactly there.  ``None`` keeps plain
    float accumulation (order-dependent; never oracle it).
    """

    def update(key, pdfs, state):
        import pandas as pd

        scale = None if exact_bits is None else float(1 << exact_bits)
        (user_id,) = key
        n, acc = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].fillna(0.0)
            if scale is None:
                acc += float(v.sum())
            else:
                import numpy as np

                acc += float(np.floor(v.to_numpy() * scale).sum())
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


def compact_running_totals_sink(sink_df: DataFrame) -> DataFrame:
    """Compact a ``running_user_totals`` append-mode sink read to final
    per-user state.

    The operator emits the user's CUMULATIVE totals in every micro-batch
    that touched them, so the raw sink equals the final state only for a
    single-batch drain; a multi-file / maxFilesPerTrigger split leaves
    one snapshot row per (user, batch).  ``total_events`` strictly
    increases across a user's emissions, so the highest-count row IS the
    final state — same per-key max_by compaction (and the same hazard
    class) as ``compact_cdc_sink``.
    """
    from pyspark.sql import functions as F

    return (
        sink_df.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("total_events", "total_value"), "total_events"
            ).alias("_st")
        )
        .select(
            "user_id",
            F.col("_st.total_events").alias("total_events"),
            F.col("_st.total_value").alias("total_value"),
        )
    )


def cdc_upsert(changes_stream, key_col: str = "key"):
    """Streaming CDC apply: keyed upsert state over an (key, seq, op,
    price) change stream — each key's state is its highest-seq change
    so far, surviving across micro-batches (the streaming twin of the
    batch changelog compaction, q96).  Emits the key's current state
    every batch it changes in; with a drained single-batch catch-up the
    emission IS the final compacted table.

    State is 3 scalars per key (seq, op, price) — bounded by key
    cardinality, not stream length; price arrives as DOUBLE (the exact
    decimal arithmetic happens JVM-side in the stream projection; one
    correctly-rounded cast before the Arrow boundary keeps cross-engine
    parity).  Closure is self-contained per the module note.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            s0, op0, p0 = state.get
            best = (int(s0), str(op0), None if p0 is None else float(p0))
        else:
            best = None
        # per-chunk numpy argmax, not a per-row Python loop (r9 verdict
        # task 3: at sf10 the drain crosses 45 M rows / 1.5 M keys
        # through this function — per-row interpretation was ~40% of
        # the wall).  seqs are unique per key by construction, so the
        # chunk's argmax IS the chunk's winner; the running best then
        # needs one comparison per chunk.
        for pdf in pdfs:
            if not len(pdf):
                continue
            seqs = pdf["seq"].values
            i = int(seqs.argmax())
            s_ = int(seqs[i])
            if best is None or s_ > best[0]:
                p_ = pdf["price"].values[i]
                best = (
                    s_,
                    str(pdf["op"].values[i]),
                    None if pd.isna(p_) else float(p_),
                )
        state.update(best)
        yield pd.DataFrame(
            {
                "key": [int(key[0])],
                "seq": [best[0]],
                "op": [best[1]],
                "price": [best[2]],
            }
        )

    return changes_stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key long, seq long, op string, price double",
        stateStructType="seq long, op string, price double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def compact_cdc_sink(sink_df: DataFrame) -> DataFrame:
    """Compact an update-mode ``cdc_upsert`` sink read to live rows.

    The update-mode sink appends one (key, seq, op, price) row per
    CHANGED key PER MICRO-BATCH — the raw table equals the final state
    only for a single-batch drain.  Any multi-file / maxFilesPerTrigger
    split leaves duplicate keys, and a key whose delete lands in a later
    batch would be resurrected by its earlier emission if the delete
    filter ran on the raw rows.  Taking the highest-seq emission per key
    FIRST makes the read correct for every batch split (one shuffle on
    the key — the same partitioning the stateful operator already used).
    """
    from pyspark.sql import functions as F

    return (
        sink_df.groupBy("key")
        .agg(F.max_by(F.struct("op", "price"), "seq").alias("_st"))
        .filter(F.col("_st.op") != "D")
        .select(
            "key",
            F.col("_st.op").alias("last_op"),
            F.col("_st.price").alias("price"),
        )
    )


def compact_sketch_sink(sink_df: DataFrame) -> DataFrame:
    """Compact an update-mode dyadic-sketch sink read to final per-bucket
    state.

    Update mode emits one row per CHANGED bucket per micro-batch, so the
    raw sink equals the final sketch only for a single-batch drain (the
    same hazard class as ``compact_cdc_sink`` / convention 9).  Every
    per-bucket aggregate here is MONOTONE across a bucket's emissions —
    cnt strictly increases, lo only falls, hi only rises — so cell-wise
    (min lo, max hi, max cnt) per bucket reconstructs the final state
    exactly, with no batch-id column needed.
    """
    from pyspark.sql import functions as F

    return sink_df.groupBy("bucket_idx").agg(
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.max("cnt").alias("cnt"),
    )
