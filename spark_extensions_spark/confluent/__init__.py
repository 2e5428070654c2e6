"""Confluent Schema Registry integration: client + column-level codecs.

PySpark-native rebuild of the reference's `confluent` package
(`/root/reference/src/main/scala/org/apache/spark/sql/confluent/`):
registry client with compat-gated schema updates, Confluent-framed
Avro encode/decode, and JSON-Schema-backed JSON encode/decode.
"""

from spark_extensions_spark.confluent.client import (
    HttpSchemaRegistry,
    InMemorySchemaRegistry,
    IncompatibleSchemaError,
    SchemaRegistryClient,
    SubjectType,
)
from spark_extensions_spark.confluent.avro import (
    from_confluent_avro,
    to_confluent_avro,
)
from spark_extensions_spark.confluent.json import (
    from_confluent_json,
    to_confluent_json,
)

__all__ = [
    "SchemaRegistryClient",
    "HttpSchemaRegistry",
    "InMemorySchemaRegistry",
    "IncompatibleSchemaError",
    "SubjectType",
    "from_confluent_avro",
    "to_confluent_avro",
    "from_confluent_json",
    "to_confluent_json",
]
