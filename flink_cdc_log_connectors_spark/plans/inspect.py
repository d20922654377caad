"""Physical-plan inspection helpers — the engine's "is this the plan I'd
want at 100 TB" checks, used by tests and by hand during tuning.

The reference has no optimizer (SURVEY §4); Catalyst does this work for us,
and these assertions pin the properties we rely on: parquet predicate
pushdown, column pruning, broadcast dimension joins, bounded shuffle
counts, and TakeOrderedAndProject for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower bound of data
    movement; broadcast exchanges excluded).  Counts the numbered operator
    detail entries — the formatted plan prints each operator twice (tree +
    detail)."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan carries at least one pushed-down parquet filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_top_k(df: DataFrame) -> bool:
    """ORDER BY + LIMIT compiled to TakeOrderedAndProject (per-partition
    heaps), not a global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)
