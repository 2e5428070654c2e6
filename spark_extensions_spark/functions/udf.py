"""UDF/Row plumbing: struct-returning unary UDFs and Row→dataclass decoding.

PySpark-native rebuild of the reference's ``custom`` UDF helpers:

- ``unary_udf`` ↔ ``UnsafeUnaryUdf`` (`/root/reference/src/main/scala/org/
  apache/spark/sql/custom/UnsafeUdf.scala:32-58`). The JVM restriction the
  reference bypasses — typed UDFs can't declare a StructType return —
  does not exist in PySpark: ``F.udf(f, returnType=StructType(...))`` is
  native. The helper keeps the reference's (udf, targetType) → Column→
  Column factory shape and adds an Arrow/pandas variant for batch speed.
- ``RowDecoder`` (`custom/RowDecoder.scala:33-45`): deserialize Rows
  (incl. nested structs, maps of structs, Optionals) into dataclass
  instances; reflection happens once at construction, ``convert`` is
  cheap per row.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, get_args, get_origin, get_type_hints

import pandas as pd

from pyspark.sql import Column, Row
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


def unary_udf(
    fn: Callable[[Any], Any],
    return_type: DataType | str,
    vectorized: bool = False,
) -> Callable[[Column | str], Column]:
    """``Any => Any`` UDF with caller-declared return type (struct types
    welcome). ``vectorized=True`` wraps ``fn`` element-wise in an
    Arrow-batched pandas UDF (10-100× less serialization overhead)."""
    if vectorized:

        def _series_fn(s: pd.Series) -> pd.Series:
            return s.map(fn)

        _series_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _udf = F.pandas_udf(_series_fn, returnType=return_type)

    else:
        _udf = F.udf(fn, returnType=return_type)

    def apply(col: Column | str) -> Column:
        return _udf(F.col(col) if isinstance(col, str) else col)

    return apply


class RowDecoder:
    """Build once, convert many: ``RowDecoder(MyDataclass).convert(row)``.

    Handles nested dataclasses, ``list``/``dict`` containers (including
    maps of structs), and ``Optional`` fields (null → None), mirroring the
    reference's encoder-deserializer reuse (`RowDecoder.scala:35-38`,
    tests `RowDecoderTest.scala:25-44`).
    """

    def __init__(self, cls: type):
        if not dataclasses.is_dataclass(cls):
            raise TypeError(f"{cls!r} is not a dataclass")
        self.cls = cls
        self._fields = [
            (f.name, _make_converter(t))
            for f, t in (
                (f, get_type_hints(cls)[f.name]) for f in dataclasses.fields(cls)
            )
        ]

    def convert(self, row: Row) -> Any:
        return self.cls(
            **{name: conv(row[name]) for name, conv in self._fields}
        )

    __call__ = convert


def _identity(v: Any) -> Any:
    return v


def _make_converter(tp: Any) -> Callable[[Any], Any]:
    origin = get_origin(tp)
    if origin is None:
        if dataclasses.is_dataclass(tp):
            sub = RowDecoder(tp)
            return lambda v: None if v is None else sub.convert(v)
        return _identity
    import types as _types
    import typing as _typing

    args = get_args(tp)
    if origin in (_typing.Union, _types.UnionType):
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) == 1:
            inner = _make_converter(non_none[0])
            return lambda v: None if v is None else inner(v)
        return _identity
    if origin in (list, tuple):
        inner = _make_converter(args[0])
        return lambda v: None if v is None else [inner(x) for x in v]
    if origin is dict:
        vconv = _make_converter(args[1])
        return lambda v: (
            None if v is None else {k: vconv(x) for k, x in v.items()}
        )
    return _identity
