"""Inspect executed Spark plans: pushdown, pruning, join strategies.

Used by the test suite to pin the plan shapes that matter at 100 TB
(a scan that reads all columns for a 2-column projection is a bug even
when the answer is right) and by developers via ``explain_str``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (final AQE plan when already executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` rendered to a returned string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, *fragments: str) -> bool:
    """True iff every fragment appears in the executed plan text."""
    plan = executed_plan(df)
    return all(f in plan for f in fragments)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into file scans (``PushedFilters: [...]`` entries).

    Parses the *formatted* explain output — the compact plan string
    truncates long attribute lists.
    """
    out: list[str] = []
    for m in re.finditer(
        r"PushedFilters: \[([^\]]*)\]", explain_str(df, "formatted")
    ):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each file scan (``ReadSchema`` entries) —
    assert pruning by checking no scan reads more than it should."""
    out: list[list[str]] = []
    for m in re.finditer(
        r"ReadSchema: struct<([^>]*)>", explain_str(df, "formatted")
    ):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        out.append(cols)
    return out
