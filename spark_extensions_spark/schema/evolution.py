"""Schema evolution: diff two schemas, conform a DataFrame to a target.

The ingest-time counterpart of the §2.B converters: when a new
snapshot arrives with a drifted schema, the pipeline needs (a) a
machine-readable diff for the admission decision and (b) a safe
conform step that casts/reorders/pads the batch onto the warehouse
schema — the Spark-side equivalent of Avro writer→reader resolution
(schema/avro_codec.py does it for Avro payloads; this does it for
DataFrames).

Safe widenings mirror Avro's promotion lattice plus Spark decimals:
int→long→decimal→double, float→double, date→timestamp; anything else
is a BREAKING change and ``conform_to_schema`` refuses unless
``allow_lossy=True``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

_INT_ORDER = [ByteType, ShortType, IntegerType, LongType]


def _is_safe_widening(src: DataType, dst: DataType) -> bool:
    if src == dst:
        return True
    if type(src) in _INT_ORDER and type(dst) in _INT_ORDER:
        return _INT_ORDER.index(type(src)) <= _INT_ORDER.index(type(dst))
    if type(src) in _INT_ORDER and isinstance(
        dst, (FloatType, DoubleType, DecimalType)
    ):
        return True
    if isinstance(src, FloatType) and isinstance(dst, DoubleType):
        return True
    if isinstance(src, DecimalType) and isinstance(dst, DecimalType):
        return (
            dst.precision - dst.scale >= src.precision - src.scale
            and dst.scale >= src.scale
        )
    if isinstance(src, DateType) and isinstance(dst, TimestampType):
        return True
    if isinstance(dst, StringType):
        return True  # everything prints losslessly
    return False


@dataclass
class SchemaDiff:
    added: list[str]  # in target, missing in source (padded with NULL)
    removed: list[str]  # in source, not in target (dropped)
    widened: list[tuple[str, str, str]]  # (col, from, to) safe casts
    breaking: list[tuple[str, str, str]]  # (col, from, to) lossy

    @property
    def is_compatible(self) -> bool:
        return not self.breaking


def schema_diff(source: StructType, target: StructType) -> SchemaDiff:
    """Field-by-field diff (top level; nested types compare atomically)."""
    s = {f.name: f.dataType for f in source.fields}
    t = {f.name: f.dataType for f in target.fields}
    added = [n for n in t if n not in s]
    removed = [n for n in s if n not in t]
    widened, breaking = [], []
    for n in t:
        if n not in s or s[n] == t[n]:
            continue
        entry = (n, s[n].simpleString(), t[n].simpleString())
        if _is_safe_widening(s[n], t[n]):
            widened.append(entry)
        else:
            breaking.append(entry)
    return SchemaDiff(added, removed, widened, breaking)


def conform_to_schema(
    df: DataFrame,
    target: StructType,
    allow_lossy: bool = False,
) -> DataFrame:
    """Project/cast/pad ``df`` onto ``target`` (column order included).

    Missing target columns become typed NULLs; extra source columns are
    dropped; type changes apply as casts — refused (ValueError listing
    the offenders) when any change is lossy and ``allow_lossy`` is
    False.  Entirely row-local projections — zero shuffle at any scale.
    """
    diff = schema_diff(df.schema, target)
    if diff.breaking and not allow_lossy:
        raise ValueError(
            f"lossy schema changes (pass allow_lossy=True): {diff.breaking}"
        )
    have = {f.name for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
