"""Training-data export: balanced shard writing with a verifiable
manifest.

The last step of a curation pipeline materializes the corpus as N
balanced shards (so downstream loaders stream them in parallel) plus a
manifest recording, per shard, the row count, token total, and a
content hash — the receipt that lets the training side verify the
transfer without re-reading the data.

Shard assignment is the deterministic ``md5(key)`` bucket (same family
as ``operators/sampling.py``): reproducible across runs and cluster
layouts, and balanced to within sampling noise regardless of key
distribution. The write is ONE hash repartition on the shard id +
``partitionBy`` (each shard directory receives exactly its rows); the
manifest is one groupBy over the same assignment — at 100 TB both are
single-shuffle jobs, and the manifest can run before the write as an
admission check.

Reference scope note: the reference has no export surface — this is
part of the LLM-data-pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_extensions_spark.operators.sampling import hash_bucket


def shard_assignment(
    key_col: str, n_shards: int, salt: str = "shard"
) -> Column:
    """Deterministic shard id in ``[0, n_shards)`` for a key."""
    return (hash_bucket(key_col, salt, 1 << 60) % n_shards).cast("int")


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    token_col: Column | str | None = None,
    salt: str = "shard",
) -> DataFrame:
    """Per-shard manifest: rows, token total, order-insensitive content
    hash (md5 over the sorted key list — engine-portable and stable
    under any physical row order)."""
    tok = (
        F.lit(0)
        if token_col is None
        else (F.col(token_col) if isinstance(token_col, str) else token_col)
    )
    assigned = df.select(
        shard_assignment(key_col, n_shards, salt).alias("shard"),
        F.col(key_col).cast("string").alias("__k"),
        tok.cast("bigint").alias("__tok"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("__k")), ",")
        ).alias("content_hash"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "shard",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_shards`` balanced shard directories
    (``shard=K/``), one hash repartition + partitioned write."""
    assigned = df.withColumn(
        "shard", shard_assignment(key_col, n_shards, salt)
    )
    (
        assigned.repartition(n_shards, "shard")
        .write.format(fmt)
        .mode(mode)
        .partitionBy("shard")
        .save(path)
    )
