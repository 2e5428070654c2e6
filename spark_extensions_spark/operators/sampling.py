"""Deterministic sampling / split operators for training-data pipelines.

A 100 TB corpus needs *reproducible* sampling: the same row must land in
the same split on every run, on any cluster layout, with no driver-side
randomness. Everything here derives from ``md5(key || ':' || salt)`` —
portable across engines (the DuckDB oracles use the identical hex math),
stable across Spark versions (no ``rand()``, no partition-dependent
seeds), and uniform enough that split sizes concentrate tightly around
their weights.

Scale notes:

- :func:`hash_bucket` / :func:`hash_split` are pure row-local
  projections — zero shuffle, fully codegen'd; they compose with any
  downstream write (e.g. ``partitionBy("split")``).
- :func:`stratified_cap` shuffles once on the group key (the window
  partition). Hot groups concentrate on one task; for pathological
  skew (one group ≫ executor memory) pre-thin with
  :func:`hash_bucket` percent-filters before the window.

Reference scope note: the reference library (smart-data-lake/
spark-extensions) has no sampling surface — this module is part of the
LLM-data-pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Buckets per unit weight: splits resolve to integer thresholds out of
# this many buckets, so weights are honored to 0.01%.
RESOLUTION = 10_000

# 15 hex chars = 60 bits: fits signed int64 (ANSI mode throws on
# overflow) while keeping bucket assignment effectively uniform.
_HEX_CHARS = 15


def hash_bucket(key_col: str, salt: str = "", n_buckets: int = RESOLUTION) -> Column:
    """Deterministic uniform bucket in ``[0, n_buckets)`` from a key.

    ``bucket = int64(md5(key ':' salt)[:15 hex]) % n_buckets`` — the salt
    decorrelates independent sampling decisions made over the same key
    (e.g. split assignment vs. percent-subsampling).
    """
    return F.expr(
        f"cast(conv(substring(md5(concat(cast({key_col} as string), "
        f"':', '{salt}')), 1, {_HEX_CHARS}), 16, 10) as bigint) % {n_buckets}"
    )


def hash_bucket_duck(
    key_col: str, salt: str = "", n_buckets: int = RESOLUTION
) -> str:
    """DuckDB SQL fragment computing exactly :func:`hash_bucket`."""
    return (
        f"('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':' || '{salt}'), "
        f"1, {_HEX_CHARS}))::BIGINT % {n_buckets}"
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) per split, in declaration
    order; the last split absorbs rounding remainder so bounds always
    cover ``RESOLUTION`` exactly."""
    total = sum(weights.values())
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bounds.append((name, round(acc * RESOLUTION)))
    bounds.append((names[-1], RESOLUTION))
    return bounds


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/…) by key hash.

    Row-local, zero-shuffle, reproducible: re-running on different
    partitioning/cluster sizes yields byte-identical assignments, and a
    key keeps its split when the dataset grows (only the salt changes
    assignments).
    """
    bucket = hash_bucket(key_col, salt)
    expr: Column = None  # type: ignore[assignment]
    for name, bound in split_thresholds(weights):
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr)


def hash_split_case_duck(
    key_col: str, weights: dict[str, float], salt: str = "split"
) -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    bucket = hash_bucket_duck(key_col, salt)
    arms = "".join(
        f" WHEN {bucket} < {bound} THEN '{name}'"
        for name, bound in split_thresholds(weights)
    )
    return f"CASE{arms} END"


def stratified_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap",
    out_col: str | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic hash
    order (a reproducible uniform sample within each group).

    The hash order makes the selection independent of input row order —
    the same rows survive on any cluster. One shuffle on ``group_col``;
    tiebreak on the key itself makes the window order total.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, salt, 1 << 60), F.col(key_col)
    )
    ranked = df.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") <= cap)
    if out_col is None:
        return kept.drop("__rn")
    return kept.withColumnRenamed("__rn", out_col)
