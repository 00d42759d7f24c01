"""Explain-plan checks — the 'is this the plan you'd want at 100 TB'
gate: filters reach the parquet scan (PushedFilters), projections prune
columns (ReadSchema), small dimensions broadcast instead of shuffling.

Used by tests/test_plans.py so plan regressions fail CI, not the
cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the executed plan."""
    plan = executed_plan(df)
    out: list[str] = []
    # FileScan metadata truncates long lists at 100 chars with "...",
    # so accept either a closing bracket or the ellipsis as terminator.
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_columns(df: DataFrame) -> list[set[str]]:
    """ReadSchema column sets per parquet scan (column-pruning check)."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.add(cols) if isinstance(out, set) else out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def count_shuffles(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(df).count(
        "Exchange rangepartitioning"
    )
