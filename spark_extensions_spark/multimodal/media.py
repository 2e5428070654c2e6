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


# ---------------------------------------------------------------------
# Perceptual hash (pHash): DCT low-frequency signature + banded dedup
# ---------------------------------------------------------------------

_PHASH_N = 32  # fake-decode raster side
_PHASH_K = 8  # low-frequency block side (64-bit hash)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (float64), computed once per worker."""
    i = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i[None, :] + 1) * i[:, None] / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT_M = _dct_matrix(_PHASH_N)


def phash_from_pixels(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a 32x32 grayscale raster.

    2-D DCT (two float64 matmuls), take the top-left 8x8 low-frequency
    block minus the DC term, threshold each coefficient against the
    block median — the standard pHash construction. Pure numpy,
    bit-deterministic.
    """
    coef = _DCT_M @ pixels.astype(np.float64) @ _DCT_M.T
    block = coef[:_PHASH_K, :_PHASH_K].flatten()
    block = block[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h  # 63 significant bits — fits a signed int64


def _fake_pixels(content: bytes) -> np.ndarray:
    """Deterministic fake 32x32 grayscale raster from sha256(content).

    STUB for the real decode+resize (no image libs in this container);
    same role as _fake_decode — near-duplicate *pixels* only arise
    from identical bytes, which the tests exploit.
    """
    seed = hashlib.sha256(content).digest()
    blocks = [
        hashlib.sha256(seed + i.to_bytes(4, "big")).digest()
        for i in range((_PHASH_N * _PHASH_N) // 32)
    ]
    buf = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    return buf.reshape(_PHASH_N, _PHASH_N).astype(np.float64)


def phash_images(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "phash",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Add a 64-bit perceptual-hash column via Arrow-batched mapInPandas.

    The only Python stage in the pipeline (it IS the decode path);
    everything downstream (banding, candidate join, hamming filter)
    stays JVM-side. Real codecs slot in at ``_fake_pixels``.
    """
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            vals = []
            for c in pdf[content_col]:
                if c is None:
                    vals.append(None)
                elif not deterministic_fake:
                    raise NotImplementedError(
                        "Real image decode needs PIL/opencv; the fake "
                        "path exercises the full Spark plumbing."
                    )
                else:
                    vals.append(phash_from_pixels(_fake_pixels(bytes(c))))
            pdf[out_col] = pd.Series(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, out_schema)


def phash_candidates(
    df: DataFrame,
    id_col: str,
    hash_col: str = "phash",
    bands: int = 4,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs by banded pHash matching.

    LSH-style: split the 64-bit hash into ``bands`` equal bit-bands;
    pairs sharing ANY band collide (guaranteed for hamming < bands by
    pigeonhole), then the exact ``bit_count(xor)`` hamming filter
    verifies. All JVM-side: band explode, one self-join on (band id,
    band bits), xor/popcount built-ins — never an all-pairs scan.
    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    # the hash column feeds BOTH sides of the self-join: truncate the
    # lineage so the (Python) hashing stage materializes once, not per
    # alias
    df = df.localCheckpoint(eager=False)
    banded = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col(hash_col), i * width
                        ).bitwiseAND(F.lit(mask)).alias("bits"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "h", F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.expr("bit_count(a.h ^ b.h)").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def audio_segments(
    df: DataFrame,
    window_ms: int,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Audio segmentation: one output row per fixed-length window of
    the decoded waveform — the ASR/audio-tagging prep stage (the audio
    member of the image-decode / video-frame-sample family). Row
    explosion happens inside mapInPandas: Arrow batches in and out, no
    driver involvement, the schema is declared up front so the 100 TB
    plumbing (partitioning, batch shapes, binary payloads) is real.

    Real decoding needs soundfile/ffmpeg (absent in this container) —
    gated behind ``deterministic_fake``, which derives sample-rate and
    duration from the content hash exactly like the video fake, so
    segment counts/offsets are reproducible and oracle-checkable.

    Output: id columns + seg_idx + seg_start_ms + seg_len_ms +
    samples (binary).
    """
    ids = id_cols or []
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [
            StructField("seg_idx", IntegerType(), True),
            StructField("seg_start_ms", LongType(), True),
            StructField("seg_len_ms", IntegerType(), True),
            StructField("samples", df.schema[content_col].dataType, True),
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
                        "Real audio decode needs soundfile/ffmpeg; "
                        "see module doc."
                    )
                h = hashlib.sha256(bytes(content)).digest()
                duration_ms = 500 + int.from_bytes(h[2:4], "big") % 29500
                n = max(1, -(-duration_ms // window_ms))  # ceil
                for i in range(n):
                    start = i * window_ms
                    seg_len = min(window_ms, duration_ms - start)
                    rows.append(
                        {
                            **{c: rec[c] for c in ids},
                            "seg_idx": i,
                            "seg_start_ms": start,
                            "seg_len_ms": seg_len,
                            "samples": bytes(content)[:32]
                            + i.to_bytes(4, "big"),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=ids
                + ["seg_idx", "seg_start_ms", "seg_len_ms", "samples"],
            )

    return df.mapInPandas(run, out_schema)
