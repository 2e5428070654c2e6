"""Inspect executed Spark plans: pushdown, pruning, join strategies.

Used by the test suite to pin the plan shapes that matter at 100 TB
(a scan that reads all columns for a 2-column projection is a bug even
when the answer is right) and by developers via ``explain_str``.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def _explain_via_stdout(df: DataFrame, mode: str) -> str:
    """Spark Connect fallback: ``df.explain`` only PRINTS there (no
    ``_jdf``), so capture stdout — the text format is identical."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (final AQE plan when already executed).

    Classic mode reads the JVM queryExecution directly; under Spark
    Connect (no ``_jdf``) falls back to the printed simple explain —
    same physical operators, minus the post-execution AQE final-plan
    detail.
    """
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    except AttributeError:
        return _explain_via_stdout(df, "simple")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` rendered to a returned string (classic JVM
    path when available, stdout capture under Spark Connect)."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
    except AttributeError:
        return _explain_via_stdout(df, mode)


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
