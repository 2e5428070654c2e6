"""Tests for the custom-expression surface: ExpressionEvaluator, RowDecoder,
unary_udf, show_string, nullability helpers.

Mirrors ExpressionEvaluatorTest.scala:36-91 and RowDecoderTest.scala:25-44.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.utils import AnalysisException

from spark_extensions_spark.functions.eval import (
    ExpressionEvaluator,
    schema_of_dataclass,
)
from spark_extensions_spark.functions.nullability import (
    make_not_nullable,
    make_nullable,
    set_nullable_schema,
)
from spark_extensions_spark.functions.sql import show_string
from spark_extensions_spark.functions.udf import RowDecoder, unary_udf


@dataclasses.dataclass
class EvalObj:
    a: int
    b: str
    nums: list[int]
    m: dict[str, int]
    opt: Optional[str]


OBJ = EvalObj(a=2, b="x", nums=[1, 2, 3], m={"k": 7}, opt=None)


def test_schema_of_dataclass():
    st = schema_of_dataclass(EvalObj)
    assert st["a"].dataType.typeName() == "long" and not st["a"].nullable
    assert st["opt"].dataType == StringType() and st["opt"].nullable
    assert st["nums"].dataType.typeName() == "array"
    assert st["m"].dataType.typeName() == "map"


def test_eval_functions(spark):
    """ExpressionEvaluatorTest.scala:36-41: scalar function compose."""
    ev = ExpressionEvaluator("concat(b, '-', cast(a*2 as int))", EvalObj, spark)
    assert ev(OBJ) == "x-4"
    # plan reuse across calls
    assert ev(EvalObj(5, "y", [], {}, None)) == "y-10"


def test_eval_higher_order(spark):
    """transform over arrays (ExpressionEvaluatorTest higher-order case)."""
    ev = ExpressionEvaluator(
        "aggregate(transform(nums, x -> x * a), cast(0 as bigint), "
        "(acc, x) -> acc + x)",
        EvalObj,
        spark,
    )
    assert ev(OBJ) == 12  # (1+2+3)*2


def test_eval_map_access(spark):
    ev = ExpressionEvaluator("m['k'] + a", EvalObj, spark)
    assert ev(OBJ) == 9


def test_eval_struct_result(spark):
    ev = ExpressionEvaluator("named_struct('x', a, 'y', b)", EvalObj, spark)
    out = ev(OBJ)
    assert out == Row(x=2, y="x")
    assert ev.result_type.typeName() == "struct"


def test_eval_runtime_replaceable(spark):
    """to_date is RuntimeReplaceable (ExpressionEvaluatorTest.scala:83-91)."""

    @dataclasses.dataclass
    class D:
        s: str

    ev = ExpressionEvaluator("to_date(s, 'yyyy-MM-dd')", D, spark)
    import datetime

    assert ev(D("2024-02-29")) == datetime.date(2024, 2, 29)


def test_eval_unresolved_attribute_fails(spark):
    with pytest.raises(AnalysisException):
        ExpressionEvaluator("nope + 1", EvalObj, spark)


def _job_counter(spark):
    jid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return jid.get() if hasattr(jid, "get") else jid


def test_eval_is_jobless_for_sql_expressions(spark):
    """The reference evaluates expressions without running a Spark job
    (ExpressionEvaluator.scala:48-83, session-free expr.eval). The
    VALUES-parameterized path must match that: zero jobs for the whole
    ported expression battery — scalars, higher-order transform over
    arrays, map access, struct results, nested nulls."""
    evs = [
        (ExpressionEvaluator("concat(b, '-', cast(a*2 as int))", EvalObj,
                             spark), "x-4"),
        (ExpressionEvaluator(
            "aggregate(transform(nums, x -> x * a), cast(0 as bigint), "
            "(acc, x) -> acc + x)", EvalObj, spark), 12),
        (ExpressionEvaluator("m['k'] + a", EvalObj, spark), 9),
        (ExpressionEvaluator("named_struct('x', a, 'y', b)", EvalObj,
                             spark), Row(x=2, y="x")),
        (ExpressionEvaluator("coalesce(opt, 'none')", EvalObj, spark),
         "none"),
    ]
    before = _job_counter(spark)
    for ev, expected in evs:
        assert ev(OBJ) == expected
    # batched apply is also jobless
    ev0 = evs[0][0]
    assert ev0.apply_many(
        [OBJ, EvalObj(5, "y", [], {}, None)]
    ) == ["x-4", "y-10"]
    assert _job_counter(spark) == before  # not a single Spark job ran


def test_eval_runtime_error_propagates_without_job_fallback(spark):
    """An expression RUNTIME error on the jobless path must propagate
    as-is — NOT be swallowed and re-executed on the Spark-job fallback
    (which would double the work and mask which path failed). Pinned by
    the job counter: the failure must not launch a single job."""
    ev = ExpressionEvaluator(
        "case when a > 0 then raise_error('boom') else b end",
        EvalObj, spark,
    )
    before = _job_counter(spark)
    with pytest.raises(Exception, match="boom"):
        ev(OBJ)  # OBJ.a == 2 → raise_error fires at evaluation time
    assert _job_counter(spark) == before


def test_eval_udf_registration(spark):
    ev_expr = "triple(a) + 1"
    ev = None
    try:
        ev = ExpressionEvaluator("a", EvalObj, spark)  # bootstrap for session
        ev.register_udf("triple", lambda x: x * 3, IntegerType())
        ev2 = ExpressionEvaluator(ev_expr, EvalObj, spark)
        assert ev2(OBJ) == 7
    finally:
        del ev


# ------------------------------------------------------------------ RowDecoder

@dataclasses.dataclass
class Inner:
    x: int
    y: Optional[str]


@dataclasses.dataclass
class Outer:
    name: str
    inner: Inner
    items: list[Inner]
    lookup: dict[str, Inner]
    maybe: Optional[Inner]


def test_row_decoder_nested():
    """RowDecoderTest.scala:25-44: nested structs, null→None, maps of structs."""
    dec = RowDecoder(Outer)
    row = Row(
        name="n",
        inner=Row(x=1, y=None),
        items=[Row(x=2, y="a"), Row(x=3, y=None)],
        lookup={"k": Row(x=4, y="b")},
        maybe=None,
    )
    out = dec.convert(row)
    assert out == Outer(
        name="n",
        inner=Inner(1, None),
        items=[Inner(2, "a"), Inner(3, None)],
        lookup={"k": Inner(4, "b")},
        maybe=None,
    )


def test_row_decoder_from_spark(spark):
    df = spark.createDataFrame(
        [Row(name="q", inner=Row(x=9, y="z"), items=[], lookup={}, maybe=None)],
        schema_of_dataclass(Outer),
    )
    out = RowDecoder(Outer)(df.head())
    assert out.inner == Inner(9, "z") and out.maybe is None


def test_row_decoder_requires_dataclass():
    with pytest.raises(TypeError):
        RowDecoder(int)


# ------------------------------------------------------------------- unary_udf

def test_unary_udf_struct_return(spark):
    """The UnsafeUdf use case: UDF with declared struct return type."""
    st = StructType(
        [
            StructField("lo", StringType(), True),
            StructField("n", IntegerType(), True),
        ]
    )
    split = unary_udf(lambda s: (s.lower(), len(s)), st)
    df = spark.createDataFrame([("AbC",), ("X",)], ["s"])
    out = df.select(split("s").alias("r")).select("r.lo", "r.n").collect()
    assert [(r["lo"], r["n"]) for r in out] == [("abc", 3), ("x", 1)]


def test_unary_udf_vectorized(spark):
    double_it = unary_udf(lambda x: x * 2, "long", vectorized=True)
    df = spark.range(5)
    out = df.select(double_it("id").alias("d")).agg(F.sum("d")).head()[0]
    assert out == 20


# ------------------------------------------------------------------ show/nulls

def test_show_string(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    s = show_string(df, num_rows=1)
    assert "id" in s and "only showing top 1 row" in s


def test_nullability_helpers(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "s"])
    relaxed = df.select(make_nullable(df.id.cast("long")).alias("id"))
    assert relaxed.schema["id"].nullable

    guarded = df.filter(F.col("s").isNotNull()).select(
        make_not_nullable("s").alias("s")
    )
    assert guarded.collect() == [Row(s="a")]

    with pytest.raises(Exception, match="not-nullable"):
        df.select(make_not_nullable("s").alias("s")).collect()

    rewritten = set_nullable_schema(df, {"s": False})
    assert not rewritten.schema["s"].nullable


def test_eval_apply_many(spark):
    ev = ExpressionEvaluator("concat(b, '-', cast(a*2 as int))", EvalObj, spark)
    objs = [EvalObj(i, f"v{i}", [], {}, None) for i in range(5)]
    assert ev.apply_many(objs) == [f"v{i}-{2*i}" for i in range(5)]
