"""Schema diff / conform (schema/evolution.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_extensions_spark.schema.evolution import (
    conform_to_schema,
    schema_diff,
)


def _st(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


def test_diff_classifies_changes():
    src = _st(("a", IntegerType()), ("b", StringType()), ("gone", LongType()))
    tgt = _st(("a", LongType()), ("b", IntegerType()), ("new", DoubleType()))
    d = schema_diff(src, tgt)
    assert d.added == ["new"]
    assert d.removed == ["gone"]
    assert d.widened == [("a", "int", "bigint")]
    assert d.breaking == [("b", "string", "int")]
    assert not d.is_compatible


def test_decimal_widening_rules():
    ok = schema_diff(
        _st(("x", DecimalType(10, 2))), _st(("x", DecimalType(12, 2)))
    )
    assert ok.widened and not ok.breaking
    bad = schema_diff(
        _st(("x", DecimalType(10, 4))), _st(("x", DecimalType(10, 2)))
    )
    assert bad.breaking


def test_conform_pads_reorders_casts(spark):
    df = spark.createDataFrame(
        [(1, "x", 9)], "a int, b string, gone bigint"
    )
    tgt = _st(("b", StringType()), ("a", LongType()), ("new", DoubleType()))
    out = conform_to_schema(df, tgt)
    assert out.schema == tgt
    row = out.first()
    assert (row.b, row.a, row.new) == ("x", 1, None)


def test_conform_refuses_lossy_unless_allowed(spark):
    df = spark.createDataFrame([("12",)], "a string")
    tgt = _st(("a", IntegerType()))
    with pytest.raises(ValueError):
        conform_to_schema(df, tgt)
    out = conform_to_schema(df, tgt, allow_lossy=True)
    assert out.first().a == 12


def test_conform_is_row_local_no_shuffle(spark):
    df = spark.range(100).select(F.col("id").cast("int").alias("a"))
    tgt = _st(("a", LongType()), ("pad", StringType()))
    plan = conform_to_schema(df, tgt)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
