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


def has_python_eval(df: DataFrame) -> bool:
    """True when the plan drops to row-at-a-time Python (the slow path).
    Arrow-batched nodes (ArrowEvalPython / MapInPandas) are the
    sanctioned Python path and don't count."""
    return "BatchEvalPython" in executed_plan(df)
