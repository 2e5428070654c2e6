"""Structured Streaming operators: windowed/session aggregation, streaming
dedup, stream-stream joins, custom stateful ops, deterministic replay.

The reference's streaming surface is inherited from Spark (SURVEY.md §2.E
"Streaming"); its own code only adds the Kafka codec path. This module
exposes the full streaming operator set PySpark-natively and adds an
``available_now`` replay harness for deterministic tests.
"""

from spark_extensions_spark.streaming.ops import (
    read_stream_parquet,
    ROCKSDB_PROVIDER,
    read_state,
    read_state_metadata,
    run_available_now,
    run_available_now_to_dir,
    run_foreach_batch,
    session_aggregate,
    stream_stream_join,
    streaming_dedup,
    windowed_aggregate,
)
from spark_extensions_spark.streaming.stateful import running_aggregate

__all__ = [
    "read_stream_parquet",
    "ROCKSDB_PROVIDER",
    "read_state",
    "read_state_metadata",
    "run_available_now",
    "run_available_now_to_dir",
    "run_foreach_batch",
    "windowed_aggregate",
    "session_aggregate",
    "streaming_dedup",
    "stream_stream_join",
    "running_aggregate",
]
