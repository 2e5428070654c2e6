"""Physical-plan introspection utilities.

The engine's performance contract is that declared queries compile to
the plans a Spark expert would hand-pick: pruned parquet scans with
pushed filters, broadcast joins for dims, partial+final aggregation,
TakeOrderedAndProject for top-k, whole-stage codegen everywhere the
row path is built-in. These helpers make those properties assertable in
tests and inspectable in notebooks.
"""

from spark_extensions_spark.plans.inspect import (
    executed_plan,
    explain_str,
    plan_has,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "executed_plan",
    "explain_str",
    "plan_has",
    "pushed_filters",
    "read_schema_columns",
]
