"""Arrow IPC (Feather v2) file source/sink.

Spark has no built-in reader for Arrow IPC files, yet they are the
lingua franca of the Python data ecosystem (pyarrow/polars/pandas
`read_feather`).  The Spark-first shape mirrors sources/avro_file.py:

Read path: list files with the ``binaryFile`` source (metadata only —
content is never shipped through a row), fan the paths out one task per
file, and parse each file with pyarrow inside ``mapInPandas`` —
Arrow-batched both on disk and on the wire, so decode is a zero-copy
handoff.  Arrow IPC files are record-batch streams; a single giant
file could additionally be split at batch boundaries (the OCF splitter
pattern) — not needed for the many-files layouts exports produce.

Write path: one IPC file per partition via ``foreachPartition``
(pyarrow RecordBatchFileWriter), plain ``open()`` I/O — local/NFS
paths, like the Avro OCF sink.

Reference scope note: the reference has no Arrow file surface; this
extends SURVEY.md §2.C (file scans/sinks) with the interchange format
training pipelines actually hand to loaders.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as pa_ipc

from pyspark.sql import DataFrame, SparkSession


def write_arrow_ipc(
    df: DataFrame,
    path: str,
    batch_rows: int = 4096,
) -> None:
    """Write one Arrow IPC (Feather v2) file per partition under
    ``path``.  Executor-side ``open()`` I/O; empty partitions write
    nothing."""
    os.makedirs(path, exist_ok=True)
    schema_json = df.schema.json()

    from pyspark.sql.types import StructType
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = StructType.fromJson(__import__("json").loads(schema_json))
    arrow_schema = to_arrow_schema(spark_schema)

    def write_partition(rows) -> None:
        buf = [row.asDict(recursive=True) for row in rows]
        if not buf:
            return
        pdf = pd.DataFrame(buf, columns=[f.name for f in spark_schema.fields])
        table = pa.Table.from_pandas(
            pdf, schema=arrow_schema, preserve_index=False
        )
        fname = os.path.join(path, f"part-{uuid.uuid4().hex[:12]}.arrow")
        with pa.OSFile(fname, "wb") as sink:
            with pa_ipc.new_file(sink, arrow_schema) as out:
                for batch in table.to_batches(max_chunksize=batch_rows):
                    out.write_batch(batch)

    df.foreachPartition(write_partition)


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Arrow IPC files: one task per file, pyarrow
    decode inside mapInPandas (Arrow on disk → Arrow on the wire)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrow")
        .load(path)
        .select("path")
    )
    # schema from the first file (driver-side metadata-only open)
    first = files.limit(1).collect()
    if not first:
        raise ValueError(f"no .arrow files under {path}")
    local0 = first[0].path.removeprefix("file:")
    with pa.memory_map(local0, "r") as src:
        arrow_schema = pa_ipc.open_file(src).schema
    from pyspark.sql.pandas.types import from_arrow_schema

    spark_schema = from_arrow_schema(arrow_schema)

    # one task per file: repartition the path list
    n = files.count()
    paths = files.repartition(max(1, n))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                local = p.removeprefix("file:")
                with pa.memory_map(local, "r") as src:
                    table = pa_ipc.open_file(src).read_all()
                yield table.to_pandas()

    return paths.mapInPandas(parse, spark_schema)
