"""Avro schema ↔ Spark StructType conversion over plain JSON dicts
(no Avro library dependency), pure Python.

Behavioral parity with the reference converter
(`/root/reference/src/main/scala/org/apache/spark/sql/confluent/avro/
AvroSchemaConverter.scala:51-200`), including its two deliberate
changes vs upstream Spark (``:187``, ``:195-197``):

- nullable struct fields get ``"default": null``;
- nullable types become ``["null", T]`` unions with null FIRST.

to Spark (``avro_to_spark``):
- int→Integer (logicalType date→Date); long→Long (timestamp-millis/
  micros→Timestamp); bytes/fixed→Binary (logicalType decimal→Decimal);
  string→String; boolean→Boolean; float→Float; double→Double;
  enum→String; null→NullType(nullable).
- record→Struct (recursive references rejected); array→Array with
  containsNull from element nullability; map→Map(String, V).
- unions: null-union → nullable inner; [int,long]→Long,
  [float,double]→Double; other multi-unions → struct of member0..N
  (all nullable).

from Spark (``spark_to_avro``): inverse mapping, Timestamp →
timestamp-micros, Decimal(p,s) → fixed(minBytesForPrecision(p)) named
``<namespace>.<recordName>.fixed``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    NullType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

AvroSchema = str | list | dict


class IncompatibleSchemaException(ValueError):
    pass


def _type_name(schema: AvroSchema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _full_name(schema: dict) -> str:
    ns = schema.get("namespace", "")
    name = schema["name"]
    return f"{ns}.{name}" if ns and "." not in name else name


def avro_to_spark(schema: AvroSchema) -> tuple[DataType, bool]:
    """Avro schema (parsed JSON: str | list | dict) → (DataType, nullable)."""
    return _to_sql(schema, frozenset())


def _to_sql(schema: AvroSchema, seen: frozenset[str]) -> tuple[DataType, bool]:
    t = _type_name(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None

    if t == "int":
        return (DateType() if logical == "date" else IntegerType()), False
    if t == "long":
        if logical in ("timestamp-millis", "timestamp-micros"):
            return TimestampType(), False
        return LongType(), False
    if t in ("bytes", "fixed"):
        if logical == "decimal":
            return DecimalType(schema["precision"], schema["scale"]), False
        return BinaryType(), False
    if t == "string":
        return StringType(), False
    if t == "boolean":
        return BooleanType(), False
    if t == "float":
        return FloatType(), False
    if t == "double":
        return DoubleType(), False
    if t == "enum":
        return StringType(), False
    if t == "null":
        return NullType(), True

    if t == "record":
        fname = _full_name(schema)
        if fname in seen:
            raise IncompatibleSchemaException(
                f"Found recursive reference in Avro schema, which can not be "
                f"processed by Spark: {fname}"
            )
        inner_seen = seen | {fname}
        fields = []
        for f in schema["fields"]:
            dt, nullable = _to_sql(f["type"], inner_seen)
            fields.append(StructField(f["name"], dt, nullable))
        return StructType(fields), False

    if t == "array":
        dt, nullable = _to_sql(schema["items"], seen)
        return ArrayType(dt, containsNull=nullable), False

    if t == "map":
        dt, nullable = _to_sql(schema["values"], seen)
        return MapType(StringType(), dt, valueContainsNull=nullable), False

    if t == "union":
        members: list = list(schema)
        if any(_type_name(m) == "null" for m in members):
            rest = [m for m in members if _type_name(m) != "null"]
            if len(rest) == 1:
                dt, _ = _to_sql(rest[0], seen)
            else:
                dt, _ = _to_sql(rest, seen)
            return dt, True
        names = [_type_name(m) for m in members]
        if len(members) == 1:
            return _to_sql(members[0], seen)
        if len(members) == 2 and set(names) == {"int", "long"}:
            return LongType(), False
        if len(members) == 2 and set(names) == {"float", "double"}:
            return DoubleType(), False
        fields = []
        for i, m in enumerate(members):
            dt, _ = _to_sql(m, seen)
            fields.append(StructField(f"member{i}", dt, nullable=True))
        return StructType(fields), False

    raise IncompatibleSchemaException(f"Unsupported type {t}")


def min_bytes_for_precision(precision: int) -> int:
    """Minimum bytes needed to store ``precision`` decimal digits two's
    complement (same contract as Spark's Decimal.minBytesForPrecision)."""
    n = 1
    while 10**precision - 1 > (1 << (8 * n - 1)) - 1:
        n += 1
    return n


def spark_to_avro(
    catalyst_type: DataType,
    nullable: bool = False,
    record_name: str = "topLevelRecord",
    name_space: str = "",
) -> AvroSchema:
    """Spark DataType → Avro schema (JSON-dict form).

    Carries the reference's nullability fixes: null-first unions and
    ``default: null`` on nullable record fields
    (`AvroSchemaConverter.scala:187,195-197`).
    """
    dt = catalyst_type
    schema: AvroSchema
    if isinstance(dt, BooleanType):
        schema = "boolean"
    elif isinstance(dt, (ByteType, ShortType, IntegerType)):
        schema = "int"
    elif isinstance(dt, LongType):
        schema = "long"
    elif isinstance(dt, DateType):
        schema = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, TimestampType):
        schema = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, FloatType):
        schema = "float"
    elif isinstance(dt, DoubleType):
        schema = "double"
    elif isinstance(dt, StringType):
        schema = "string"
    elif isinstance(dt, NullType):
        schema = "null"
    elif isinstance(dt, DecimalType):
        name = (
            f"{name_space}.{record_name}.fixed"
            if name_space
            else f"{record_name}.fixed"
        )
        schema = {
            "type": "fixed",
            "name": name,
            "size": min_bytes_for_precision(dt.precision),
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    elif isinstance(dt, BinaryType):
        schema = "bytes"
    elif isinstance(dt, ArrayType):
        schema = {
            "type": "array",
            "items": spark_to_avro(dt.elementType, dt.containsNull, record_name, name_space),
        }
    elif isinstance(dt, MapType):
        if not isinstance(dt.keyType, StringType):
            raise IncompatibleSchemaException(
                f"Avro maps need string keys, got {dt.keyType}"
            )
        schema = {
            "type": "map",
            "values": spark_to_avro(dt.valueType, dt.valueContainsNull, record_name, name_space),
        }
    elif isinstance(dt, StructType):
        child_ns = f"{name_space}.{record_name}" if name_space else record_name
        fields = []
        for f in dt.fields:
            favro = spark_to_avro(f.dataType, f.nullable, f.name, child_ns)
            field: dict[str, Any] = {"name": f.name, "type": favro}
            if f.nullable:
                field["default"] = None  # reference fix: optional fields
            fields.append(field)
        schema = {
            "type": "record",
            "name": record_name,
            "namespace": name_space,
            "fields": fields,
        }
    else:
        raise IncompatibleSchemaException(f"Unexpected type {dt}.")

    if nullable and not isinstance(dt, NullType):
        return ["null", schema]  # reference fix: null FIRST
    return schema
