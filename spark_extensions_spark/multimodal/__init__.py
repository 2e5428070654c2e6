"""Multimodal (image/audio/video) column handling for training-data
pipelines at 100 TB scale.

Convention: media rides as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages. The heavy codecs (PIL/ffmpeg) are
NOT in this container, so the pixel-level decode is a clearly-marked
stub — the Spark-side plumbing (schemas, batching, partition sizing,
UDF signatures) is real and tested.
"""

from spark_extensions_spark.multimodal.media import (
    MEDIA_METADATA_TYPE,
    attach_media_metadata,
    decode_image,
    extract_features,
    frame_sample,
    audio_segments,
    phash_images,
    phash_candidates,
    resize_image,
)

__all__ = [
    "MEDIA_METADATA_TYPE",
    "attach_media_metadata",
    "decode_image",
    "resize_image",
    "frame_sample",
    "extract_features",
    "audio_segments",
    "phash_images",
    "phash_candidates",
]
