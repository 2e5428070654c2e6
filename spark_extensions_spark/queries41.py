"""t2 query registry, batch 41: generalized row-pattern matching.

Registered into the shared registry (imported from queries40 at module
end). Same determinism rules as the queries.py docstring.

- ``analytic_match_pattern``: the MATCH_RECOGNIZE-style variable-
  length pattern operator (``operators/patterns.py:match_pattern``) on
  the event stream — ``view click* purchase`` per user within 1 day.
  The fixed lead()-chain ``analytic_pattern_match`` is its degenerate
  exactly-one-middle case (equivalence pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.patterns import (
    match_pattern,
    match_pattern_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

_MP_WITHIN = 86_400  # seconds — purchases within a day of the view


@_register(
    "analytic_match_pattern",
    match_pattern_oracle_sql(
        "SELECT user_id, event_id, ts, event_type FROM events",
        ["user_id"],
        ["ts", "event_id"],
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
        "event_id",
        ts_col="ts",
        min_mid=0,
        within_seconds=_MP_WITHIN,
    ),
    doc="Generalized MATCH_RECOGNIZE-style pattern "
    "(operators/patterns.py:match_pattern): view → click* → purchase "
    "per user within 1 day, with a VARIABLE-length middle — the "
    "shape the fixed lead()-chain (analytic_pattern_match) cannot "
    "express. Pure window algebra: one shuffle on user_id, running "
    "non-B counts + last-A state via last(ignorenulls); exact "
    "integer span arithmetic and microsecond time bounds; oracle is "
    "the identical window recursion in DuckDB.",
)
def q_analytic_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return match_pattern(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
        "event_id",
        ts_col="ts",
        min_mid=0,
        within_seconds=_MP_WITHIN,
    )
