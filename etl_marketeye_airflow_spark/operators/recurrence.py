"""Sequential per-key recurrence operators: computations where each
state depends on the PREVIOUS state (not a frame aggregate), which no
window function expresses.  Engine-completeness extension (the
reference has nothing sequential); the scale discipline here is O(1)
state per key — never a per-key collected array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def ema_fixed_point(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    cents_col: str,
    mult: int = 7,
    shift: int = 3,
    fx_bits: int = 20,
) -> DataFrame:
    """Per-key exponential moving average as an exact fixed-point fold:
    ``v' = (mult·v + c·2^fx_bits) >> shift`` over rows in ``order_cols``
    order, init = first element's ``c·2^fx_bits``; a NULL ``c`` anywhere
    poisons the accumulator to NULL (the same NULL-propagation a Column
    fold has).  Output: (key_col, n_events long, ema_fx long).

    Scale shape (r10 verdict task 4): the per-step integer FLOOR makes
    the recurrence non-affine, so no segmented/associative composition
    can reproduce it bit-for-bit — instead the bound itself is removed:
    one shuffle on the key, a partition-local SORT (which spills to
    disk gracefully), and an Arrow-batched streaming fold with O(1)
    state per key and O(batch) memory — NO per-key array ever
    materializes, so a pathological million-event key costs time, not
    executor heap (vs the previous collect_list fold, whose per-key
    array was the documented known-limit).  Keys are contiguous within
    a sorted partition, so the kernel carries only the open key's
    accumulator across Arrow batches.

    The kernel closure is self-contained (stdlib + pandas only —
    operators/multimodal.py note) and the fold order (key, *order_cols
    ascending) matches the oracle's ``list_sort`` struct order whenever
    order_cols' prefix is a total order, so ``ema_fx`` stays
    bit-identical to a DuckDB ``list_reduce`` over the sorted list.

    NON-NULL PRECONDITION (r12, ADVICE): ``key_col`` and every
    ``order_cols`` entry must be non-null — a NULL key would cross
    Arrow as NaN and open a fresh group per row (NaN != NaN), silently
    diverging from an oracle's NULL-pooling GROUP BY, and a NULL order
    value sorts NULLS FIRST here vs NULLS LAST in DuckDB ``list_sort``
    (conv-22).  Rather than silently filtering (which WOULD change
    semantics vs an oracle that pools NULLs), a NULL in any of these
    columns fails LOUD via a ``raise_error`` projection — the
    triangle_counts id-range contract discipline.  ``cents_col`` NULLs
    remain legal (they poison the accumulator, documented above).
    """
    def _guarded(c: str):
        return (
            F.when(F.col(c).isNotNull(), F.col(c))
            .otherwise(
                F.raise_error(
                    F.lit(
                        f"ema_fixed_point: NULL in {c} — key/order columns "
                        "must be non-null (NaN-through-Arrow would split "
                        "groups / engine sort order diverges)"
                    )
                ).cast(df.schema[c].dataType)
            )
            .alias(c)
        )

    base = df.select(
        *[_guarded(c) for c in [key_col, *order_cols]], cents_col
    ).repartition(F.col(key_col)).sortWithinPartitions(
        *[F.col(c).asc() for c in [key_col, *order_cols]]
    )
    out_schema = f"{key_col} long, n_events long, ema_fx long"
    b_fx = 1 << fx_bits

    def fold(batches):
        import math

        import pandas as pd

        cur = None          # open key (python scalar) or None
        acc = 0             # fixed-point accumulator (exact int)
        n = 0               # events in the open key
        poisoned = False    # a NULL cents was seen for the open key

        def start(c):
            if c is None:
                return 0, True
            return int(c) * b_fx, False

        def emit(sink):
            sink[0].append(cur)
            sink[1].append(n)
            sink[2].append(None if poisoned else acc)

        for pdf in batches:
            keys = pdf[key_col].tolist()
            cents = [
                None if v is None or (isinstance(v, float) and math.isnan(v))
                else int(v)
                for v in pdf[cents_col].tolist()
            ]
            sink: tuple[list, list, list] = ([], [], [])
            for k, c in zip(keys, cents):
                if cur is None or k != cur:
                    if cur is not None:
                        emit(sink)
                    cur, n = k, 1
                    acc, poisoned = start(c)
                elif poisoned:
                    n += 1
                elif c is None:
                    n += 1
                    poisoned = True
                else:
                    n += 1
                    acc = (mult * acc + c * b_fx) >> shift
            if sink[0]:
                yield pd.DataFrame(
                    {key_col: sink[0], "n_events": sink[1], "ema_fx": sink[2]}
                )
        if cur is not None:
            sink = ([], [], [])
            emit(sink)
            yield pd.DataFrame(
                {key_col: sink[0], "n_events": sink[1], "ema_fx": sink[2]}
            )

    return base.mapInPandas(fold, out_schema)
