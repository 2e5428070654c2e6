"""t2 query registry, batch 27: perceptual-hash image dedup.

Registered into the shared registry (imported from queries23 at module
end). Same determinism rules as the queries.py docstring.

``multimodal_phash`` completes the multimodal dedup story: binary
content → 64-bit DCT perceptual hash (the ONLY Python stage — it IS
the decode path, Arrow-batched mapInPandas over the deterministic fake
raster; real codecs slot in at multimodal/media.py:_fake_pixels) →
JVM-side banded LSH self-join + bit_count hamming filter
(multimodal/media.py:phash_images, phash_candidates).

Oracle note: the fake raster is sha256-derived, so near-duplicate
PIXELS arise only from identical bytes — the candidate set provably
equals the exact-duplicate pairs (a random 64-bit pair passes the
hamming<=8 + band gate with p < 1e-8; deterministic fixtures make the
check stable), giving the pipeline a full hash-checked oracle. With a
real codec the same plan finds visually-near images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.multimodal.media import (
    phash_candidates,
    phash_images,
)


@_register(
    "multimodal_phash",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000000000, text FROM documents WHERE doc_id < 20
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS hamming
    FROM corpus a JOIN corpus b
      ON a.text = b.text AND a.doc_id < b.doc_id
    """,
    doc="Perceptual-hash image dedup over binary content "
    "(multimodal/media.py:phash_images + phash_candidates): DCT pHash "
    "in one Arrow-batched Python stage, then banded LSH self-join + "
    "bit_count hamming, all JVM-side — never an all-pairs scan. The "
    "corpus is augmented with 20 re-keyed byte-identical docs (a "
    "re-crawl), which the pipeline must — and provably does — find.",
)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    # re-key offset 1e12: far beyond any scaled fixture's id range —
    # the old 1e6 offset COLLIDED with make_sf1's doc_id stride (1e6),
    # creating duplicate ids whose pair counts diverged between the
    # engines on the round-10 skewed fixture (distinct pairs vs
    # duplicate join rows)
    corpus = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 1000000000000).alias("doc_id"), "text"
        )
    )
    media = corpus.select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    hashed = phash_images(media, deterministic_fake=True).select(
        "doc_id", "phash"
    )
    return phash_candidates(hashed, "doc_id").select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )

from spark_extensions_spark import queries25  # noqa: E402,F401  (registration side effect)
