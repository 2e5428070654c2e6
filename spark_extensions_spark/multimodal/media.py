"""Opaque-binary media columns + mapInPandas processing stages.

Design for 100 TB of media:

- content is an opaque ``binary`` column; metadata (mime, dims,
  duration…) is a typed struct column so Catalyst can filter/prune on it
  WITHOUT touching the bytes (e.g. ``WHERE meta.mime = 'image/png' AND
  meta.width >= 512`` prunes before any decode);
- every per-item transformation is ``mapInPandas`` (Arrow batches,
  iterator form) so one Python worker processes a whole batch per call
  and Spark sizes partitions independently of row width
  (``spark.sql.files.maxPartitionBytes`` governs scan splits);
- decode stubs: the container has no PIL/ffmpeg, so ``_decode_impl``
  raises ``NotImplementedError`` unless ``deterministic_fake=True``,
  which derives reproducible pixel stats/frames from the bytes alone —
  keeping schema contracts and partitioning behavior testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_METADATA_TYPE = StructType(
    [
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("size_bytes", LongType(), True),
    ]
)


def attach_media_metadata(
    df: DataFrame,
    content_col: str = "content",
    mime: Column | str | None = None,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Add the typed metadata struct next to a binary content column.

    Cheap fields (size) compute JVM-side; format fields default to null
    until a decode stage fills them.
    """
    mime_col = (
        F.lit(None).cast("string")
        if mime is None
        else (F.lit(mime) if isinstance(mime, str) else mime)
    )
    null_i = F.lit(None).cast("int")
    return df.withColumn(
        meta_col,
        F.struct(
            mime_col.alias("mime"),
            null_i.alias("width"),
            null_i.alias("height"),
            null_i.alias("n_channels"),
            F.lit(None).cast("long").alias("duration_ms"),
            null_i.alias("sample_rate"),
            null_i.alias("n_frames"),
            F.length(F.col(content_col)).cast("long").alias("size_bytes"),
        ),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decode: pseudo image stats derived from a
    sha256 of the bytes. STUB for the real codec (see module doc)."""
    h = hashlib.sha256(content).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 3
    rng = np.frombuffer(h * 4, dtype=np.uint8).astype(np.float32)
    mean_px = rng[: channels] / 255.0
    return width, height, channels, mean_px


def _decode_impl(content: bytes, deterministic_fake: bool):
    if deterministic_fake:
        return _fake_decode(content)
    raise NotImplementedError(
        "Real image decode needs PIL/opencv, which this container does not "
        "ship. Wire the decoder here; the Spark plumbing is complete."
    )


DECODED_SCHEMA_EXTRA = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("mean_pixel", ArrayType(FloatType()), True),
    ]
)


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode stage: adds width/height/n_channels/mean_pixel columns.

    Arrow-batched ``mapInPandas`` — one Python call per batch, all input
    columns pass through untouched.
    """
    out_schema = StructType(
        list(df.schema.fields) + list(DECODED_SCHEMA_EXTRA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_impl(bytes(c), deterministic_fake)
                if c is not None
                else (None, None, None, None)
                for c in pdf[content_col]
            ]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in decoded]
            pdf["height"] = [d[1] for d in decoded]
            pdf["n_channels"] = [d[2] for d in decoded]
            pdf["mean_pixel"] = [d[3] for d in decoded]
            yield pdf

    return df.mapInPandas(run, out_schema)


def resize_image(
    df: DataFrame,
    target_width: int,
    target_height: int,
    content_col: str = "content",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize stage: rewrites the binary column; records new dims.

    The fake path re-frames the original bytes with a header carrying the
    target dims (stable, size-preserving) so downstream schema/partition
    behavior matches a real resize.
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("resized_width", IntegerType(), True),
            StructField("resized_height", IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = b"RSZ1" + target_width.to_bytes(2, "big") + target_height.to_bytes(2, "big")
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "Real resize needs an image library; see module doc."
                )
            pdf = pdf.copy()
            pdf[content_col] = [
                None if c is None else header + bytes(c) for c in pdf[content_col]
            ]
            pdf["resized_width"] = target_width
            pdf["resized_height"] = target_height
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_n_ms: int,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row
    explosion happens inside mapInPandas — no driver involvement).

    Output: id columns + frame_idx + frame_ts_ms + frame (binary).
    """
    ids = id_cols or []
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [
            StructField("frame_idx", IntegerType(), True),
            StructField("frame_ts_ms", LongType(), True),
            StructField("frame", df.schema[content_col].dataType, True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                content = rec[content_col]
                if content is None:
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "Real frame extraction needs ffmpeg; see module doc."
                    )
                # fake: duration derived from content hash, frames are
                # byte slices — deterministic row counts for testing
                h = hashlib.sha256(bytes(content)).digest()
                duration_ms = 1000 + int.from_bytes(h[:2], "big") % 9000
                n = max(1, duration_ms // every_n_ms)
                for i in range(n):
                    rows.append(
                        {
                            **{c: rec[c] for c in ids},
                            "frame_idx": i,
                            "frame_ts_ms": i * every_n_ms,
                            "frame": bytes(content)[:64] + i.to_bytes(4, "big"),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=ids + ["frame_idx", "frame_ts_ms", "frame"],
            )

    return df.mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    dim: int = 64,
    content_col: str = "content",
    out_col: str = "embedding",
) -> DataFrame:
    """Feature extraction: binary content → fixed-dim float vector.

    Deterministic sha256-seeded projection — a stand-in with the exact
    schema/batch shape of a real encoder (swap ``_embed`` for a model
    call; the Arrow batch boundary is where a GPU batch would sit).
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(FloatType()), True)]
    )

    def _embed(content: bytes) -> np.ndarray:
        h = hashlib.sha256(content).digest()
        seed = int.from_bytes(h[:8], "big") % (2**32)
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim).astype(np.float32)
        return v / np.linalg.norm(v)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                None if c is None else _embed(bytes(c)) for c in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)
