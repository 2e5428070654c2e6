"""JSON-Schema (draft-04) ↔ Spark StructType conversion, pure Python.

Behavioral parity with the reference converters
(`/root/reference/src/main/scala/org/apache/spark/sql/confluent/json/
JsonToSparkSchemaConverter.scala:29-150` and
`SparkToJsonSchemaConverter.scala:9-51`), re-implemented from their
documented semantics:

to Spark:
- type map: string→String, number→Double, integer→Long, boolean→Boolean,
  date-time→Timestamp, object→Struct, array→Array.
- ``"type": [T, "null"]`` → nullable T; ``["T"]`` → T non-null; more than
  two entries → error when strict, else StringType ("safest").
- ``$ref: "...definitions/<path>"`` resolved against the schema's
  ``definitions`` (nested path supported).
- object with ``additionalProperties`` (true | schema) and NO
  ``properties`` → ``MapType(String, value_type)``; bool true → String.
- struct field nullability: ``nullable(type) or not required``.
- an inner ``"name"`` overrides the property key.

from Spark:
- emits draft-04 with ``$schema`` header, ``additionalProperties: false``
  on objects, ``required`` listing non-nullable fields (omitted when
  empty); map<string,V> → object with ``additionalProperties`` schema;
  Decimal scale 0 → integer else number.

Roundtrip invariant: json→spark→json == identity for draft-04 object
schemas (reference test `JsonSchemaConverterTest.scala:472-482`).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
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
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_JSON_TO_SPARK: dict[str, DataType] = {
    "string": StringType(),
    "number": DoubleType(),
    "integer": LongType(),
    "boolean": BooleanType(),
    "date-time": TimestampType(),
}

_SPARK_TO_JSON: list[tuple[type, str]] = [
    (ByteType, "integer"),
    (ShortType, "integer"),
    (IntegerType, "integer"),
    (LongType, "integer"),
    (FloatType, "number"),
    (DoubleType, "number"),
    (StringType, "string"),
    (BooleanType, "boolean"),
    (DateType, "date-time"),
    (TimestampType, "date-time"),
]

_DEFINITIONS = "definitions"


class JsonSchemaError(ValueError):
    pass


def json_schema_to_spark(schema: str | dict, strict: bool = True) -> StructType:
    """Convert a draft-04 JSON-Schema (string or parsed dict) to StructType."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict):
        raise JsonSchemaError(f"schema must be an object, got {type(schema)}")
    conv = _ToSpark(schema, strict)
    return conv.convert()


class _ToSpark:
    def __init__(self, root: dict, strict: bool):
        self.root = root
        self.strict = strict
        self.definitions = root.get(_DEFINITIONS, {})

    def convert(self) -> StructType:
        name = self.root.get("name", "/")
        type_name, _ = self._json_type(self.root, name)
        if type_name != "object":
            raise JsonSchemaError(
                f"Schema root must be type object, got <{type_name}>"
            )
        if "properties" not in self.root:
            raise JsonSchemaError("Root level of schema needs a [properties] field")
        required = self.root.get("required", [])
        return self._to_struct(self.root["properties"], required)

    def _json_type(self, node: dict, name: str) -> tuple[str, bool]:
        """Extract (type_name, nullable) honoring union-with-null arrays."""
        t = node.get("type")
        if isinstance(t, str):
            return t.strip(), False
        if isinstance(t, list):
            nullable = "null" in t
            if len(t) == 1 and nullable:
                raise JsonSchemaError(f"Null type only is not supported at <{name}>")
            if len(t) == 1:
                return t[0], False
            if len(t) == 2 and nullable:
                other = next(x for x in t if x != "null")
                return other, True
            if self.strict:
                raise JsonSchemaError(
                    f"Unsupported type definition <{t}> in schema at <{name}>"
                )
            return "string", nullable  # lenient: safest type
        raise JsonSchemaError(f"No <type>-field in schema at <{name}>")

    def _resolve_refs(self, node: dict) -> dict:
        ref = node.get("$ref")
        if ref is None:
            return node
        marker = _DEFINITIONS + "/"
        idx = ref.find(marker)
        if idx < 0:
            raise JsonSchemaError(
                f"$ref requires a path containing [{marker}]: {ref}"
            )
        cur: Any = self.definitions
        for part in ref[idx + len(marker):].split("/"):
            if not isinstance(cur, dict) or part not in cur:
                raise JsonSchemaError(f"Path [{ref}] not found in {_DEFINITIONS}")
            cur = cur[part]
        if not isinstance(cur, dict):
            raise JsonSchemaError(
                f"Path [{ref}] in {_DEFINITIONS} is not of type object"
            )
        return cur

    def _to_struct(self, properties: dict, required: list[str]) -> StructType:
        fields = []
        for key, node in properties.items():
            node = self._resolve_refs(node)
            name = node.get("name", key)
            dt, nullable = self._field_type(node, name)
            fields.append(StructField(name, dt, nullable or key not in required))
        return StructType(fields)

    def _field_type(self, node: dict, name: str) -> tuple[DataType, bool]:
        type_name, nullable = self._json_type(node, name)
        if type_name in _JSON_TO_SPARK:
            return _JSON_TO_SPARK[type_name], nullable
        if type_name == "array":
            if "items" not in node:
                raise JsonSchemaError(f"array at <{name}> needs [items]")
            inner = self._resolve_refs(node["items"])
            idt, inullable = self._field_type(inner, "items")
            return ArrayType(idt, containsNull=inullable), nullable
        if type_name == "object":
            # object with only additionalProperties → Map
            if "additionalProperties" in node and "properties" not in node:
                ap = node["additionalProperties"]
                if ap is True:
                    vdt = StringType()
                elif isinstance(ap, dict):
                    vdt, _ = self._field_type(
                        self._resolve_refs(ap), "additionalProperties"
                    )
                else:
                    raise JsonSchemaError(
                        f"additionalProperties cannot have value {ap!r} at <{name}>"
                    )
                return MapType(StringType(), vdt), nullable
            properties = node.get("properties", {})
            required = node.get("required", [])
            return self._to_struct(properties, required), nullable
        # unknown simple type (e.g. "null"): mirror the reference's
        # Map.apply NoSuchElementException with KeyError semantics
        raise KeyError(f"key not found: {type_name}")


def spark_to_json_schema(schema: StructType, as_string: bool = False):
    """Convert a StructType to a draft-04 JSON-Schema dict (or string)."""
    body = _from_spark(schema)
    out = {"$schema": "http://json-schema.org/draft-04/schema#", **body}
    return json.dumps(out, indent=2) if as_string else out


def _from_spark(dt: DataType) -> dict:
    if isinstance(dt, ArrayType):
        return {"type": "array", "items": _from_spark(dt.elementType)}
    if isinstance(dt, MapType):
        if not isinstance(dt.keyType, StringType):
            raise JsonSchemaError(f"map keys must be string, got {dt.keyType}")
        return {"type": "object", "additionalProperties": _from_spark(dt.valueType)}
    if isinstance(dt, StructType):
        out: dict = {
            "type": "object",
            "properties": {f.name: _from_spark(f.dataType) for f in dt.fields},
        }
        required = [f.name for f in dt.fields if not f.nullable]
        if required:
            out["required"] = required
        out["additionalProperties"] = False
        return out
    if isinstance(dt, DecimalType):
        return {"type": "integer" if dt.scale == 0 else "number"}
    for cls, name in _SPARK_TO_JSON:
        if isinstance(dt, cls):
            return {"type": name}
    raise JsonSchemaError(f"Unexpected type {dt}.")
