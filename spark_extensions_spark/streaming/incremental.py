"""Streaming upsert sink: micro-batch MERGE into a versioned parquet
target.

The reference's host project historizes/deduplicates incremental loads
into lake tables; with Structured Streaming the same contract becomes a
``foreachBatch`` sink that MERGEs each micro-batch into the target
(Spark's file sinks are append-only, so upserts always go through
foreachBatch + a table format). Plain parquet has no ACID layer, so
this implements the minimal safe pattern explicitly:

- each batch writes a COMPLETE new snapshot under ``<dir>/v=<batchId>``
  (never in place — readers of the current version are unaffected);
- a ``_CURRENT`` marker file is atomically renamed into place pointing
  at the new version;
- batch replays (Spark re-runs a batch after failure with the SAME
  batch_id) simply overwrite their own version dir and re-point the
  marker — idempotent, exactly-once net effect.

Merge semantics: with ``order_cols`` the survivor per key is the
``order_cols``-max row across target ∪ batch — last-WRITE-wins by the
*data's* ordering, so out-of-order batches cannot regress a key and
the result is independent of how the stream was chopped into batches
(the property the replay test pins). Without ``order_cols`` it is
plain arrival-order upsert (:func:`merge_upsert`, source wins).

At 100 TB you'd use an ACID table format's MERGE for this; the operator
keeps that seam explicit: :func:`merge_batch_fn` is the logic,
``snapshot_dir`` layout is the fallback transport. Full-snapshot
rewrite per batch is the parquet cost — fine for dimension-sized
targets (the usual upsert case); fact-scale appends use the plain file
sink instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_extensions_spark.operators.incremental import merge_upsert

CURRENT_MARKER = "_CURRENT"


def _current_version(target_dir: str) -> int | None:
    marker = os.path.join(target_dir, CURRENT_MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="ascii") as fh:
        return int(fh.read().strip())


def read_upsert_table(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the current committed snapshot of an upsert target."""
    v = _current_version(target_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {target_dir}")
    return spark.read.parquet(os.path.join(target_dir, f"v={v}"))


def latest_per_key(
    df: DataFrame, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """One survivor per key: the ``order_cols``-descending-max row.

    ``order_cols`` must make the order total within a key (end with a
    unique column, e.g. an event id) or survivors are ambiguous.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_batch_fn(
    target_dir: str,
    keys: list[str],
    order_cols: list[str] | None = None,
):
    """Build a ``foreachBatch`` function that upserts each micro-batch
    into ``target_dir`` (see module docstring for semantics/layout)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        v = _current_version(target_dir)
        if order_cols is not None:
            cand = batch
            if v is not None:
                cand = spark.read.parquet(
                    os.path.join(target_dir, f"v={v}")
                ).unionByName(batch)
            merged = latest_per_key(cand, keys, order_cols)
        elif v is None:
            merged = batch
        else:
            current = spark.read.parquet(
                os.path.join(target_dir, f"v={v}")
            )
            merged = merge_upsert(current, batch, keys)
        out = os.path.join(target_dir, f"v={batch_id}")
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(target_dir, f"{CURRENT_MARKER}.tmp")
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(target_dir, CURRENT_MARKER))

    return fn


def scd2_batch_fn(
    target_dir: str,
    keys: list[str],
    tracked: list[str],
    order_cols: list[str],
    op_col: str = "op",
):
    """Build a ``foreachBatch`` function that applies each CDC
    micro-batch to a VERSIONED SCD2 history under ``target_dir`` —
    the streaming end of the historization chain
    (snapshot_diff / a CDC feed → scd2_apply_changes → time-travelable
    history), with the same atomic ``_CURRENT``-marker commit and
    replay idempotence as merge_batch_fn (a retried batch_id
    overwrites its own output; ``load_version = batch_id + 1`` so the
    init load keeps version 0... the marker flips last).

    Each batch is first collapsed to ONE change per key
    (latest_per_key over ``order_cols`` — CDC feeds deliver multiple
    ops per key per batch); ``op_col`` rows carry I/U/D.
    """
    from spark_extensions_spark.operators.incremental import (
        scd2_apply_changes,
        scd2_init,
    )

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        changes = latest_per_key(batch, keys, order_cols)
        v = _current_version(target_dir)
        if v is None:
            upserts = changes.filter(F.col(op_col) != "D").select(
                *(keys + tracked)
            )
            hist = scd2_init(upserts, keys, tracked, 0)
        else:
            current = spark.read.parquet(os.path.join(target_dir, f"v={v}"))
            hist = scd2_apply_changes(
                current,
                changes.select(*(keys + tracked + [op_col])),
                keys,
                tracked,
                batch_id + 1,
                op_col=op_col,
            )
        out = os.path.join(target_dir, f"v={batch_id}")
        hist.write.mode("overwrite").parquet(out)
        tmp = os.path.join(target_dir, f"{CURRENT_MARKER}.tmp")
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(target_dir, CURRENT_MARKER))

    return fn
