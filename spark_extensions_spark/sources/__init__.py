"""Sources/sinks facade + cloud-safe commit configuration.

The reference implements no scans/sinks of its own (SURVEY.md §2.C — it
relies on Spark's readers/writers and only contributes object-store-safe
output committers as configuration). This module exposes the same
surface PySpark-natively.
"""

from spark_extensions_spark.sources.avro_file import read_avro, write_avro
from spark_extensions_spark.sources.warc import (
    read_wet,
    read_wet_strict,
    write_wet,
)
from spark_extensions_spark.sources.io import (
    cloud_committer_conf,
    read_table,
    overwrite_partitions,
    write_table,
    kafka_stream_reader,
    kafka_writer,
)

__all__ = [
    "read_avro",
    "read_wet",
    "read_wet_strict",
    "write_wet",
    "write_avro",
    "read_table",
    "overwrite_partitions",
    "write_table",
    "cloud_committer_conf",
    "kafka_stream_reader",
    "kafka_writer",
]
