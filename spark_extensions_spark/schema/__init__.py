"""External schema-language ↔ Spark StructType converters (pure Python).

PySpark-native rebuilds of the reference's converter surface:
JSON-Schema (draft-04), Avro, and XSD — see SURVEY.md §2.B.
"""

from spark_extensions_spark.schema.json_schema import (
    json_schema_to_spark,
    spark_to_json_schema,
)
from spark_extensions_spark.schema.avro import avro_to_spark, spark_to_avro
from spark_extensions_spark.schema.xsd import xsd_to_spark

__all__ = [
    "json_schema_to_spark",
    "spark_to_json_schema",
    "avro_to_spark",
    "spark_to_avro",
    "xsd_to_spark",
]
