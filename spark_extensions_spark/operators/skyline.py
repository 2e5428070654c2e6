"""Distributed 2-D skyline (Pareto frontier) as pure window algebra.

The skyline of a point set under (minimize x, maximize y): the rows no
other row dominates, where p' dominates p iff x' <= x AND y' >= y with
at least one strict. The classic formulation is a quadratic NOT EXISTS
self-join (that IS the independent DuckDB oracle); the distributed
shape used here is the standard two-phase prune (Borzsony, Kossmann &
Stocker, ICDE 2001 "The Skyline Operator"):

1. **Local prune** — hash-bucket the rows and remove everything
   dominated WITHIN its bucket. Any point dominated by a bucket-mate
   is dominated globally, so this is a safe filter; it is computed
   with two PARTITIONED window passes (no shuffle beyond the bucket
   hash, no cross-bucket traffic).
2. **Global pass** — the same two windows over the survivors. For a
   2-D skyline the per-bucket survivor count is the bucket's own
   skyline size (expected O(log n) per bucket for independently
   distributed dimensions), so the global stage's single-partition
   sort sees #buckets · E[skyline] rows — bounded in practice and
   documented at the call site, the same contract as the other
   post-prune global sorts (ks_statistic).

Dominance via windows, with integer x and y:

    best_before(p) = MAX(y) OVER (ORDER BY x
                                  RANGE UNBOUNDED PRECEDING TO 1 PRECEDING)
    best_same(p)   = MAX(y) OVER (PARTITION BY x)

    p survives  ⟺  (best_before IS NULL OR best_before < y)
                    AND best_same = y

(the strictly-earlier window catches x' < x with y' >= y; the same-x
window catches y' > y; duplicates of an undominated point all survive,
exactly as NOT EXISTS keeps them).

Reference scope note: the reference engine has no analytic-operator
layer; this extends the beyond-reference analytics family
(SURVEY.md §2.F).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune(df: DataFrame, x: str, y: str, bucket: str | None) -> DataFrame:
    """One dominance-prune pass; partitioned by ``bucket`` when given,
    global otherwise."""
    if bucket is not None:
        w_before = (
            Window.partitionBy(bucket)
            .orderBy(x)
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_same = Window.partitionBy(bucket, x)
    else:
        # bounded input by the two-phase contract: only per-bucket
        # skyline survivors reach the global pass
        w_before = Window.orderBy(x).rangeBetween(
            Window.unboundedPreceding, -1
        )
        w_same = Window.partitionBy(x)
    best_before = F.max(y).over(w_before)
    best_same = F.max(y).over(w_same)
    return df.withColumn("__bb", best_before).withColumn(
        "__bs", best_same
    ).where(
        (F.col("__bb").isNull() | (F.col("__bb") < F.col(y)))
        & (F.col("__bs") == F.col(y))
    ).drop("__bb", "__bs")


def skyline_2d(
    df: DataFrame, x: str, y: str, n_buckets: int = 32
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``x``, maximize ``y``) Pareto
    frontier. ``x`` and ``y`` must be integer-valued (bucketize /
    fixed-point continuous measures first). Preserves all input
    columns; ties (duplicate frontier points) all survive.

    Rows with a NULL coordinate are EXCLUDED (dominance is undefined
    against NULL: the window comparisons silently dropped them while
    a NOT EXISTS oracle keeps them — review finding, round 6 wave 3 —
    so the contract is now explicit and the oracle generator filters
    identically)."""
    df = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    bucketed = df.withColumn(
        "__bkt", F.pmod(F.xxhash64(F.col(x), F.col(y)), F.lit(n_buckets))
    )
    local = _prune(bucketed, x, y, "__bkt").drop("__bkt")
    return _prune(local, x, y, None)


def skyline_oracle_sql(src_sql: str, x: str, y: str) -> str:
    """Independent DuckDB oracle: the literal NOT EXISTS dominance
    definition (quadratic — oracle-scale only)."""
    return f"""
    WITH src AS (
      SELECT * FROM ({src_sql})
      WHERE {x} IS NOT NULL AND {y} IS NOT NULL
    )
    SELECT * FROM src p
    WHERE NOT EXISTS (
      SELECT 1 FROM src q
      WHERE q.{x} <= p.{x} AND q.{y} >= p.{y}
        AND (q.{x} < p.{x} OR q.{y} > p.{y})
    )
    """
