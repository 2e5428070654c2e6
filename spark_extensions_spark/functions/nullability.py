"""Nullability control — PySpark-native rebuild of the reference's
``NullableHelper`` (``/root/reference/src/main/scala/org/apache/spark/sql/
custom/NullableHelper.scala:26-53``).

The reference wraps a column in a ``SetNullable`` Catalyst expression
that overrides the nullability flag and throws ``IllegalStateException``
when a null crosses a not-nullable override (``NullableHelper.scala:31-34``).
PySpark cannot author Catalyst expressions, so:

- ``make_not_nullable``: guard with ``assert_true(col IS NOT NULL)`` (the
  runtime error) and rewrite the schema flag on materialization.
- ``make_nullable`` / ``set_nullable_schema``: schema rewrite via
  DataFrame-to-DataFrame reconstruction (``spark.createDataFrame`` over
  the same RDD/rows keeps the plan lazy at the scan level but changes the
  declared schema).
"""

from __future__ import annotations

import copy

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def make_not_nullable(col: Column | str, error: str = "null in not-nullable column") -> Column:
    """Runtime-guarded not-null column: evaluates to the value, raises if a
    null flows through (mirrors ``SetNullable``'s IllegalStateException,
    ``NullableHelper.scala:31-34``)."""
    c = F.col(col) if isinstance(col, str) else col
    # raise_error sits in the null branch, so the optimizer can't prune it
    # (an assert_true guard in an always-true `when` gets folded away)
    return F.when(c.isNull(), F.raise_error(F.lit(error))).otherwise(c)


def make_nullable(col: Column | str) -> Column:
    """Nullability-relaxing pass-through. Spark's analyzer derives
    nullable=true for conditional expressions, so a no-op ``when`` is the
    declarative way to loosen the flag without touching data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.lit(True), c)


def set_nullable_schema(
    df: DataFrame, nullable: dict[str, bool]
) -> DataFrame:
    """Rewrite top-level field nullability flags on a DataFrame.

    Reconstructs the DataFrame against an edited schema. Fields being
    tightened to ``nullable=False`` are caller-asserted (add
    :func:`make_not_nullable` upstream for a runtime guard).
    """
    spark = df.sparkSession
    schema: StructType = copy.deepcopy(df.schema)
    for field in schema.fields:
        if field.name in nullable:
            field.nullable = nullable[field.name]
    return spark.createDataFrame(df.rdd, schema)
