"""Plan-inspection helpers: assert the physical properties the operator
docstrings promise (filter pushdown, broadcast joins, no Python in the
hot path).  Used by tests/test_plans.py so regressions in plan shape
fail CI, not just slow down the bench."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan.

    The plan's toString truncates long filter lists mid-token (no
    closing bracket), so capture up to the next scan attribute instead
    of requiring ``]``.
    """
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\], | ReadSchema:|$)", plan):
        out.extend(p.strip() for p in m.group(1).rstrip("]").split(",") if p.strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def unpartitioned_windows(plan: str) -> list[str]:
    """Window operator lines with NO partition spec — the "Moving all
    data to a single partition" scale-killer (an unpartitioned
    ``Window.orderBy``).  A physical ``Window`` line prints 3 top-level
    bracket groups ``[funcs], [partitionCols], [sortOrder]`` when
    partitioned and only 2 (``[funcs], [sortOrder]``) when not; an
    unpartitioned UNORDERED window (``Window.partitionBy()`` global
    aggregate) prints an empty second group and is flagged too.
    A partitioned-unordered window also prints 2 groups
    (``[funcs], [partitionCols]``) — those are fine: the second group
    is a sort spec (ASC/DESC) only in the unpartitioned-ordered case.
    """
    out: list[str] = []
    for line in plan.splitlines():
        m = re.match(r"^[\s:+*(\d)\-]*Window(?:Exec)? (\[.*)$", line)
        if not m:
            continue
        rest, depth, cur, groups = m.group(1), 0, "", []
        for ch in rest:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = ""
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    continue
            if depth >= 1:
                cur += ch
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and groups[1].strip() and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # partitioned, unordered — bounded per key
        out.append(line.strip())
    return out


def has_python_eval(df: DataFrame) -> bool:
    """True when the plan drops to row-at-a-time Python (the slow path).
    Arrow-batched nodes (ArrowEvalPython / MapInPandas) are the
    sanctioned Python path and don't count."""
    return "BatchEvalPython" in executed_plan(df)
