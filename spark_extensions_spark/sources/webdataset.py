"""WebDataset-style tar shard sink/source.

Large multimodal training corpora ship as numbered tar shards whose
members are grouped by sample key (``{key}.txt``, ``{key}.json``,
``{key}.jpg`` …) — the WebDataset convention every major loader
(webdataset, torchdata, NeMo) consumes.  Spark has no tar codec; the
Spark-first shape mirrors sources/avro_file.py:

Write: one tar per partition via ``foreachPartition`` (stdlib
``tarfile``, plain ``open()`` I/O), members emitted in sorted-key
order with fixed metadata (mtime 0, uid/gid 0) so shard bytes are
REPRODUCIBLE — same input, same bytes, same content hash (the
transfer-receipt property write_shards establishes for parquet).

Read: ``binaryFile`` lists the shards (content IS shipped here — tar
members cannot be range-split, shards are sized for that, typically
100 MB–1 GB), one task per shard parses members back to rows with
``mapInPandas``.

Reference scope: extends §2.C (sources/sinks) with the
training-loader interchange format; no reference counterpart.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import uuid
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    text_col: str,
    meta_cols: list[str] | None = None,
) -> None:
    """Write one ``.tar`` shard per partition: per sample a
    ``{key}.txt`` member (the payload) and a ``{key}.json`` member
    (the metadata columns).  Deterministic bytes: members sorted by
    key, zeroed tar metadata."""
    os.makedirs(path, exist_ok=True)
    metas = meta_cols or []

    def write_partition(rows) -> None:
        buf = sorted(
            (
                (
                    str(r[key_col]),
                    "" if r[text_col] is None else str(r[text_col]),
                    {m: r[m] for m in metas},
                )
                for r in rows
            ),
            key=lambda t: t[0],
        )
        if not buf:
            return
        fname = os.path.join(path, f"shard-{uuid.uuid4().hex[:12]}.tar")
        with tarfile.open(fname, "w") as tar:
            for key, text, meta in buf:
                for suffix, payload in (
                    (".txt", text.encode("utf-8")),
                    (
                        ".json",
                        json.dumps(meta, sort_keys=True, default=str).encode(
                            "utf-8"
                        ),
                    ),
                ):
                    info = tarfile.TarInfo(name=key + suffix)
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(payload))

    df.foreachPartition(write_partition)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read tar shards back to ``(key string, text string, meta
    string)`` rows — one task per shard, stdlib tarfile parse inside
    mapInPandas."""
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    n = shards.select("path").count()
    if n == 0:
        raise ValueError(f"no .tar shards under {path}")
    shards = shards.repartition(n)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                samples: dict[str, dict[str, str]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        key, suffix = m.name.rsplit(".", 1)
                        data = tar.extractfile(m).read().decode("utf-8")
                        samples.setdefault(key, {})[suffix] = data
                yield pd.DataFrame(
                    [
                        {
                            "key": k,
                            "text": v.get("txt", ""),
                            "meta": v.get("json", "{}"),
                        }
                        for k, v in sorted(samples.items())
                    ],
                    columns=["key", "text", "meta"],
                )

    return shards.select("content").mapInPandas(
        parse, "key string, text string, meta string"
    )
