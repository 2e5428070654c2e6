"""Time-series regularization: per-key gap-filled grids + forward fill.

Event streams land irregularly; downstream feature pipelines want a
dense regular grid per key (one row per minute/hour, missing points
carried forward). The Spark-first shape: per-key ``sequence()`` between
the key's min and max bucket (row-local explode — the grid never
shuffles as raw rows), left-join the observed buckets, then one
``last(..., ignorenulls)`` window pass for the forward fill.

100 TB notes: the grid size is bounded by (span / step) per key, not by
the event count — explode happens after the per-key min/max aggregate,
so the join is grid × bucketed-events, both hash-partitioned on the
key. The forward-fill window shuffles once on the key; no driver state.

Reference scope note: the reference has no time-series surface — this
is part of the pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_grid(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 minute",
    trunc_unit: str = "minute",
) -> DataFrame:
    """Dense per-key time grid with forward-filled values.

    Buckets events to ``trunc_unit``, aggregates one value per bucket
    (``max`` — exact and order-free, unlike a double ``avg``), generates
    every bucket between each key's first and last event with
    ``sequence()``, and forward-fills missing buckets from the last
    observed one. Output: ``(key, bucket_ts, value, filled flag)``.
    """
    bucketed = (
        events.select(
            F.col(key_col),
            F.date_trunc(trunc_unit, F.col(ts_col)).alias("bucket_ts"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(F.max("__v").alias("__v"))
    )
    spans = bucketed.groupBy(key_col).agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}")
            )
        ).alias("bucket_ts"),
    )
    joined = grid.join(bucketed, [key_col, "bucket_ts"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.last("__v", ignorenulls=True).over(w).alias(value_col),
        F.col("__v").isNull().alias("filled"),
    )
