"""Window-algebra operators for aggregates Spark's WindowExec cannot
run natively (DISTINCT window aggregates, SPARK-30396).

The RUNNING (unbounded-preceding) distinct count is a first-occurrence
flag sum (``queries42.py:q_window_running_distinct``).  The SLIDING
frame is genuinely harder — a first-occurrence flag is frame-relative,
so no single flag column works.  :func:`sliding_count_distinct` solves
it with interval-stab algebra instead:

An occurrence of value v at position i is *the last occurrence of v
inside the frame ending at j* iff  i ≤ j < next_pos(i), and it lies in
a width-k frame iff  j < i + k.  Each row therefore contributes +1 to
exactly the positions  j ∈ [i, min(next_pos(i), i+k) − 1], and the
sliding distinct count at j is the number of stabbing intervals — a
difference array (+1 at interval start, −1 one past the end) followed
by one prefix sum.

Everything is per-key partitioned window algebra + one equi-join: no
UDF, no per-row state, no frame re-scan (the naive collect_set-per-
frame is O(n·k) memory and unbounded row width).

Reference scope note: the reference engine inherits windows from
Spark and has no distinct-window surface; this extends the
beyond-reference relational family (SURVEY.md §2.E/F).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_count_distinct(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    k: int,
) -> DataFrame:
    """Exact COUNT(DISTINCT ``value_col``) over the frame ``ROWS
    BETWEEN k-1 PRECEDING AND CURRENT ROW`` per partition.

    Returns the input's partition/order columns plus ``pos`` (the
    1-based position in frame order) and ``win_distinct`` (BIGINT).

    NULL values are EXCLUDED from the count, matching SQL
    COUNT(DISTINCT) — NULL rows still appear in the output with the
    distinct count of the non-NULL values in their frame (review
    finding, round 6 wave 3: partitioning by the value column groups
    all NULLs together, which would have counted them as one value).

    Scale shape: three windows partitioned by key (position numbering,
    next-occurrence lead, final prefix sum) + one (key, pos)-keyed
    aggregate/join for the difference array.  Work per row is O(1);
    no stage holds a frame's values in memory, so ``k`` can be large
    (the collect_set emulation dies there).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w_pos = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    pos = df.select(
        *partition_cols,
        *order_cols,
        F.col(value_col).alias("__v"),
    ).withColumn("pos", F.row_number().over(w_pos).cast("bigint"))
    # every row (NULL or not) keeps an output position; only non-NULL
    # occurrences emit coverage intervals
    pos = pos.localCheckpoint(eager=False)
    occ = pos.where(F.col("__v").isNotNull())
    w_val = Window.partitionBy(*partition_cols, "__v").orderBy("pos")
    spans = occ.withColumn("__next", F.lead("pos").over(w_val)).select(
        *partition_cols,
        F.col("pos").alias("__start"),
        F.least(
            F.coalesce(F.col("__next"), F.lit(1 << 62)),
            F.col("pos") + F.lit(k),
        ).alias("__end_excl"),
    )
    deltas = (
        spans.select(
            *partition_cols,
            F.explode(
                F.array(
                    F.struct(
                        F.col("__start").alias("p"),
                        F.lit(1).alias("d"),
                    ),
                    F.struct(
                        F.col("__end_excl").alias("p"),
                        F.lit(-1).alias("d"),
                    ),
                )
            ).alias("__e"),
        )
        .select(*partition_cols, F.col("__e.p").alias("p"), F.col("__e.d").alias("d"))
        .groupBy(*partition_cols, "p")
        .agg(F.sum("d").alias("delta"))
    )
    w_run = (
        Window.partitionBy(*partition_cols)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        pos.alias("s")
        .join(
            deltas.alias("t"),
            # eqNullSafe: Window.partitionBy groups NULL keys into one
            # partition, so a NULL-key partition is real — null-unsafe
            # equality here would drop ALL its deltas (win_distinct=0),
            # diverging from SQL PARTITION BY semantics (ADVICE r6).
            [F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}")) for c in partition_cols]
            + [F.col("s.pos") == F.col("t.p")],
            "left",
        )
        .select(
            *[F.col(f"s.{c}") for c in partition_cols],
            *[F.col(f"s.{c}") for c in order_cols],
            F.col("s.pos").alias("pos"),
            F.coalesce(F.col("t.delta"), F.lit(0)).alias("__delta"),
        )
    )
    return joined.withColumn(
        "win_distinct",
        F.sum("__delta").over(w_run).cast("bigint"),
    ).drop("__delta")
