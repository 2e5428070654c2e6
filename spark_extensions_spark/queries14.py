"""t2 query registry, batch 17: incremental-load operators (CDC / SCD2).

Registered into the shared registry (imported from queries13 at module
end). Same determinism rules as the queries.py docstring.

The reference ships inside SmartDataLakeBuilder, whose core use case is
incremental lake loading; these queries verify the
``operators/incremental.py`` layer — snapshot CDC diff, deduplicating
merge-upsert, and SCD2 historization — fully hash-checked against
set-algebra DuckDB oracles. Both engines construct the "new snapshot"
deterministically from the ``customer`` table (modulo-keyed deletes /
updates / inserts), so the oracle needs no extra fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.operators.incremental import (
    merge_upsert,
    scd2_apply,
    scd2_init,
    snapshot_diff,
)

# Deterministic synthetic "next snapshot" of customer, built identically
# on both engines: keys %37==0 deleted, %5==0 get acctbal+100, and
# %53==0 spawn an inserted key shifted by 1e6 with a zero balance.
_SNAP_SQL = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 37 <> 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey,
         CAST(0.0 AS DOUBLE) AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 53 = 0
"""

_BASE_SQL = "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer"


def _base_and_snap(spark: SparkSession, sf_dir: str):
    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select("c_custkey", "c_acctbal", "c_mktsegment")
    updated = base.filter(F.col("c_custkey") % 37 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + F.lit(100.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    inserted = base.filter(F.col("c_custkey") % 53 == 0).select(
        (F.col("c_custkey") + F.lit(1000000)).alias("c_custkey"),
        F.lit(0.0).cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )
    return base, updated.unionByName(inserted)


@_register(
    "cdc_snapshot_diff",
    f"""
    WITH base AS ({_BASE_SQL}), snap AS ({_SNAP_SQL})
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
                THEN 'U'
                WHEN n.c_custkey IS NOT NULL THEN 'I' ELSE 'D'
           END AS change_type,
           o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal,
           o.c_mktsegment AS old_c_mktsegment,
           n.c_mktsegment AS new_c_mktsegment
    FROM base o FULL OUTER JOIN snap n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR (o.c_acctbal IS DISTINCT FROM n.c_acctbal)
       OR (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
    """,
    doc="Change-data-capture between two full snapshots "
    "(operators/incremental.py:snapshot_diff): ONE full-outer join on "
    "the business key + null-safe column compare -> I/U/D change set; "
    "unchanged keys dropped. The minimal CDC plan — with bucketed "
    "tables the exchange disappears. Oracle: the same set algebra in "
    "ANSI SQL (IS DISTINCT FROM).",
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, snap = _base_and_snap(spark, sf_dir)
    return snapshot_diff(
        base, snap, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
    )


@_register(
    "merge_upsert",
    f"""
    WITH base AS ({_BASE_SQL}), snap AS ({_SNAP_SQL}),
    changes AS (
      SELECT * FROM snap n
      WHERE NOT EXISTS (
        SELECT 1 FROM base o
        WHERE o.c_custkey = n.c_custkey
          AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
          AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
      )
    )
    SELECT o.c_custkey, o.c_acctbal, o.c_mktsegment
    FROM base o
    WHERE NOT EXISTS
      (SELECT 1 FROM changes n WHERE n.c_custkey = o.c_custkey)
    UNION ALL
    SELECT c_custkey, c_acctbal, c_mktsegment FROM changes
    """,
    doc="Deduplicating MERGE INTO (operators/incremental.py:"
    "merge_upsert): upsert a CDC change set (the changed/new rows of "
    "the snapshot) into the target — left-anti join keeps unmatched "
    "target rows, union brings the source in; source wins per key. "
    "One shuffle, broadcastable for small change sets (the common "
    "incremental case). Oracle: NOT EXISTS anti-join + UNION ALL.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, snap = _base_and_snap(spark, sf_dir)
    changes = snap.alias("n").join(
        base.alias("o"),
        [
            F.col("n.c_custkey") == F.col("o.c_custkey"),
            F.col("n.c_acctbal").eqNullSafe(F.col("o.c_acctbal")),
            F.col("n.c_mktsegment").eqNullSafe(F.col("o.c_mktsegment")),
        ],
        "left_anti",
    )
    return merge_upsert(base, changes, ["c_custkey"])


@_register(
    "scd2_history",
    f"""
    WITH base AS ({_BASE_SQL}), snap AS ({_SNAP_SQL}),
    changed AS (
      SELECT o.c_custkey,
             o.c_acctbal AS old_bal, o.c_mktsegment AS old_seg,
             n.c_acctbal AS new_bal, n.c_mktsegment AS new_seg,
             (o.c_acctbal IS DISTINCT FROM n.c_acctbal
              OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment) AS chg
      FROM base o JOIN snap n ON o.c_custkey = n.c_custkey
    )
    SELECT c_custkey, old_bal AS c_acctbal, old_seg AS c_mktsegment,
           CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
           TRUE AS is_current
    FROM changed WHERE NOT chg
    UNION ALL
    SELECT c_custkey, old_bal, old_seg, CAST(1 AS BIGINT),
           CAST(2 AS BIGINT), FALSE
    FROM changed WHERE chg
    UNION ALL
    SELECT c_custkey, new_bal, new_seg, CAST(2 AS BIGINT),
           CAST(NULL AS BIGINT), TRUE
    FROM changed WHERE chg
    UNION ALL
    SELECT o.c_custkey, o.c_acctbal, o.c_mktsegment, CAST(1 AS BIGINT),
           CAST(2 AS BIGINT), FALSE
    FROM base o
    WHERE NOT EXISTS (SELECT 1 FROM snap n WHERE n.c_custkey = o.c_custkey)
    UNION ALL
    SELECT n.c_custkey, n.c_acctbal, n.c_mktsegment, CAST(2 AS BIGINT),
           CAST(NULL AS BIGINT), TRUE
    FROM snap n
    WHERE NOT EXISTS (SELECT 1 FROM base o WHERE o.c_custkey = n.c_custkey)
    """,
    doc="SCD2 historization (operators/incremental.py:scd2_apply): "
    "bootstrap history at load 1, apply the next snapshot at load 2 — "
    "unchanged rows stay open, changed rows close at 2 and reopen with "
    "snapshot values, deleted keys close, new keys open. Plan: open-"
    "slice filter (pushed to scan) + ONE full-outer join + one inline "
    "generate emitting 0-2 rows/key; no window over history, no "
    "driver state. Oracle: the five cases as UNION ALL set algebra.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, snap = _base_and_snap(spark, sf_dir)
    hist = scd2_init(
        base, ["c_custkey"], ["c_acctbal", "c_mktsegment"], load_version=1
    )
    return scd2_apply(
        hist,
        snap,
        ["c_custkey"],
        ["c_acctbal", "c_mktsegment"],
        load_version=2,
    )


from spark_extensions_spark import queries15  # noqa: E402,F401  (registration side effect)
