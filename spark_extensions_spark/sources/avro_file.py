"""Avro Object Container File source/sink on the pure-Python codec.

This container does not ship the spark-avro JVM connector, so the
``avro`` format row of SURVEY §2.E is served by a DataFrame-native
reader/writer over the public Avro 1.11 container spec:

``Obj\\x01`` magic → file-metadata map (``avro.schema`` JSON,
``avro.codec``: null | deflate) → 16-byte sync marker → blocks of
``(count, byte_size, records…, sync)``.

Read path: ``spark.read.format("binaryFile")`` lists and splits files
across tasks (one task per file — Avro blocks are not sub-split here;
at scale write many files), then ``mapInPandas`` decodes each file with
:mod:`spark_extensions_spark.schema.avro_codec`, honoring classic
writer→reader schema resolution when ``reader_schema`` is given.

Write path: each partition serializes to one ``part-*.avro`` container
(deflate optional) via ``foreachPartition``. Plain ``open()`` I/O —
local/NFS paths; object stores need a Hadoop-FS shim here.
"""

from __future__ import annotations

import io
import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from spark_extensions_spark.schema.avro import avro_to_spark, spark_to_avro
from spark_extensions_spark.schema.avro_codec import (
    _read_long,
    _write_long,
    make_encoder,
)

MAGIC = b"Obj\x01"


def _read_header(buf: bytes) -> tuple[dict, bytes, int]:
    """Returns (metadata, sync_marker, offset_after_header)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    mv = memoryview(buf)
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(mv, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(mv, pos)  # block byte size, unused
        for _ in range(n):
            klen, pos = _read_long(mv, pos)
            key = bytes(mv[pos : pos + klen]).decode("utf-8")
            pos += klen
            vlen, pos = _read_long(mv, pos)
            meta[key] = bytes(mv[pos : pos + vlen])
            pos += vlen
    sync = bytes(mv[pos : pos + 16])
    return meta, sync, pos + 16


def _iter_records(buf: bytes, decoder, codec: str):
    mv = memoryview(buf)
    meta, sync, pos = _read_header(buf)
    del meta
    total = len(buf)
    while pos < total:
        count, pos = _read_long(mv, pos)
        size, pos = _read_long(mv, pos)
        block = bytes(mv[pos : pos + size])
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        if bytes(mv[pos : pos + 16]) != sync:
            raise ValueError("Avro container corrupt: sync marker mismatch")
        pos += 16
        bmv = memoryview(block)
        bpos = 0
        for _ in range(count):
            rec, bpos = decoder(bmv, bpos)
            yield rec


def read_avro(
    spark: SparkSession,
    path: str,
    reader_schema: dict | str | None = None,
) -> DataFrame:
    """Read Avro container files into a DataFrame.

    ``reader_schema`` (Avro JSON) activates schema resolution against
    each file's writer schema; default reads with the writer schema of
    the first file.
    """
    import pandas as pd

    from spark_extensions_spark.schema.avro_codec import _resolver

    first = (
        spark.read.format("binaryFile").load(path).limit(1).collect()
    )
    if not first:
        raise ValueError(f"no files at {path}")
    meta, _, _ = _read_header(bytes(first[0]["content"]))
    writer0 = json.loads(meta["avro.schema"])
    if reader_schema is None:
        reader = writer0
    elif isinstance(reader_schema, str):
        reader = json.loads(reader_schema)
    else:
        reader = reader_schema
    spark_type, _ = avro_to_spark(reader)
    if not isinstance(spark_type, StructType):
        raise ValueError("top-level Avro schema must be a record")
    field_names = [f.name for f in spark_type.fields]

    from spark_extensions_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        decoders: dict[str, object] = {}
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                buf = bytes(content)
                meta_f, _, _ = _read_header(buf)
                schema_key = meta_f["avro.schema"].decode("utf-8")
                codec = meta_f.get("avro.codec", b"null").decode("utf-8")
                dec = decoders.get(schema_key)
                if dec is None:
                    dec = _resolver(json.loads(schema_key), reader)
                    decoders[schema_key] = dec
                rows.extend(_iter_records(buf, dec, codec))
            yield pd.DataFrame(
                [[r.get(c) for c in field_names] for r in rows],
                columns=field_names,
            )

    return files.mapInPandas(parse, spark_type)


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "null",
    record_name: str = "topLevelRecord",
) -> None:
    """Write a DataFrame as Avro container files (one per partition).

    Deterministic layout: the 16-byte sync marker derives from the
    schema + partition id (reproducible bytes for identical input).
    """
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null|deflate")
    avro_schema = spark_to_avro(df.schema, nullable=False, record_name=record_name)
    schema_json = json.dumps(avro_schema)
    field_names = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    from pyspark import TaskContext

    def write_partition(rows) -> None:
        enc = make_encoder(avro_schema)
        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(f"{schema_json}:{pid}".encode()).digest()
        body = io.BytesIO()
        count = 0
        for row in rows:
            body.write(enc({c: row[c] for c in field_names}))
            count += 1
        if count == 0:
            return
        out = io.BytesIO()
        out.write(MAGIC)
        meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
        _write_long(out, len(meta))
        for k, v in meta.items():
            kb = k.encode()
            _write_long(out, len(kb))
            out.write(kb)
            _write_long(out, len(v))
            out.write(v)
        _write_long(out, 0)
        out.write(sync)
        block = body.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            block = comp.compress(block) + comp.flush()
        _write_long(out, count)
        _write_long(out, len(block))
        out.write(block)
        out.write(sync)
        with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as f:
            f.write(out.getvalue())

    df.foreachPartition(write_partition)
