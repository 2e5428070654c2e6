"""Generalized row-pattern matching (MATCH_RECOGNIZE-style) as pure
window algebra — the sequential-pattern primitive Spark lacks as
dedicated syntax, without a per-row UDF.

Reference parity note: the reference inherits Spark's relational
surface (SURVEY.md §2.E) and has no MATCH_RECOGNIZE either; this is
the beyond-reference analytics layer (VERDICT r5 #8). The fixed
lead()-chain form (`queries25.py:q_analytic_pattern_match`) is the
degenerate exactly-one-middle case and is pinned equivalent in
tests/test_operators.py.

Pattern shape supported: ``A B{min,max} C`` per partition under a
TOTAL order — a start row satisfying ``A``, a bounded-or-unbounded run
of rows all satisfying ``B``, then an end row satisfying ``C``
(``B*`` = ``{0,∞}``, ``B+`` = ``{1,∞}``, fixed chain = ``{1,1}``).

Match semantics (deterministic, declarative — documented rather than
imperative NFA semantics):

- an end row ``c`` (satisfying C) binds the LATEST start row ``a``
  (satisfying A) strictly before it;
- the match exists iff every row strictly between ``a`` and ``c``
  satisfies B, the count of those rows is within ``[min_mid,
  max_mid]``, and (optionally) ``ts(c) - ts(a) <= within_seconds``;
- one match per start row: the FIRST qualifying ``c`` wins.

Scale shape: ONE window shuffle on (partition, order) — three running
windows (row position, cumulative non-B count, last-A state via
``last(..., ignorenulls)``) plus a per-(partition, start) dedup window
whose input is already one row per candidate end. No join, no UDF, no
state growth beyond the window sort: at 100 TB this is exactly one
repartition by the pattern partition key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def match_pattern(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    start: Column,
    mid: Column,
    end: Column,
    id_col: str,
    ts_col: str | None = None,
    min_mid: int = 0,
    max_mid: int | None = None,
    within_seconds: int | None = None,
) -> DataFrame:
    """Match ``start mid{min,max} end`` per partition; see module
    docstring for the exact semantics.

    Output: ``(*partition_cols, start_id, end_id, n_mid)`` —
    ``n_mid`` is the matched middle-run length. All exact integers /
    input column types.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wcur = w.rowsBetween(Window.unboundedPreceding, 0)
    annotated = df.select(
        *partition_cols,
        *[c for c in order_cols if c not in partition_cols],
        F.col(id_col).alias("__id"),
        *([F.col(ts_col).alias("__ts")] if ts_col else []),
        start.alias("__is_a"),
        mid.alias("__is_b"),
        end.alias("__is_c"),
    )
    pos = F.row_number().over(w)
    nonb_cum = F.sum(
        F.when(~F.col("__is_b"), 1).otherwise(0)
    ).over(wcur)
    staged = annotated.select(
        "*",
        pos.alias("__pos"),
        nonb_cum.alias("__nonb"),
        # running last-A state: position, non-B prefix count, id (and
        # ts) AT the latest preceding A row — last(ignorenulls) over
        # the same frame keeps the three perfectly consistent
        F.last(F.when(F.col("__is_a"), pos), ignorenulls=True)
        .over(wprev)
        .alias("__a_pos"),
        F.last(F.when(F.col("__is_a"), nonb_cum), ignorenulls=True)
        .over(wprev)
        .alias("__a_nonb"),
        F.last(F.when(F.col("__is_a"), F.col("__id")), ignorenulls=True)
        .over(wprev)
        .alias("__a_id"),
        *(
            [
                F.last(
                    F.when(F.col("__is_a"), F.col("__ts")),
                    ignorenulls=True,
                )
                .over(wprev)
                .alias("__a_ts")
            ]
            if ts_col
            else []
        ),
    )
    # rows strictly between a and c are all B  <=>  the non-B prefix
    # count just before c equals the one at a (a itself is included in
    # __a_nonb whether or not it is B, and excluded from "between" on
    # both sides — exact integer algebra, no per-row state machine)
    nonb_before_c = F.col("__nonb") - F.when(
        ~F.col("__is_b"), 1
    ).otherwise(0)
    n_mid = F.col("__pos") - F.col("__a_pos") - 1
    cond = (
        F.col("__is_c")
        & F.col("__a_pos").isNotNull()
        & (nonb_before_c == F.col("__a_nonb"))
        & (n_mid >= F.lit(min_mid))
    )
    if max_mid is not None:
        cond = cond & (n_mid <= F.lit(max_mid))
    if within_seconds is not None:
        if ts_col is None:
            raise ValueError("within_seconds requires ts_col")
        # exact integer microseconds (unix_timestamp truncates to
        # seconds while DuckDB's epoch() keeps a fractional double —
        # micros are the portable comparison)
        cond = cond & (
            F.unix_micros("__ts") - F.unix_micros("__a_ts")
            <= F.lit(int(within_seconds) * 1_000_000).cast("long")
        )
    candidates = staged.filter(cond)
    # one match per start row: first qualifying end wins. Input here is
    # one row per candidate end — already pattern-sparse, never the
    # corpus
    wdedup = Window.partitionBy(*partition_cols, "__a_pos").orderBy(
        "__pos"
    )
    return (
        candidates.select(
            "*", F.row_number().over(wdedup).alias("__rk")
        )
        .filter(F.col("__rk") == 1)
        .select(
            *partition_cols,
            F.col("__a_id").alias("start_id"),
            F.col("__id").alias("end_id"),
            n_mid.cast("int").alias("n_mid"),
        )
    )


def match_pattern_oracle_sql(
    source_sql: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    start_sql: str,
    mid_sql: str,
    end_sql: str,
    id_col: str,
    ts_col: str | None = None,
    min_mid: int = 0,
    max_mid: int | None = None,
    within_seconds: int | None = None,
) -> str:
    """DuckDB twin of :func:`match_pattern` — the identical window
    algebra (LAST_VALUE ... IGNORE NULLS is DuckDB's spelling of
    Spark's last(ignorenulls)); every compared quantity is an exact
    integer."""
    parts = ", ".join(partition_cols)
    order = ", ".join(order_cols)
    frame_prev = (
        f"PARTITION BY {parts} ORDER BY {order} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    frame_cur = (
        f"PARTITION BY {parts} ORDER BY {order} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    ts_sel = f", {ts_col} AS __ts" if ts_col else ""
    a_ts_sel = (
        f""",
             LAST_VALUE(CASE WHEN __is_a THEN __ts END IGNORE NULLS)
               OVER ({frame_prev}) AS __a_ts"""
        if ts_col
        else ""
    )
    conds = [
        "__is_c",
        "__a_pos IS NOT NULL",
        "(__nonb - CASE WHEN NOT __is_b THEN 1 ELSE 0 END) = __a_nonb",
        f"(__pos - __a_pos - 1) >= {min_mid}",
    ]
    if max_mid is not None:
        conds.append(f"(__pos - __a_pos - 1) <= {max_mid}")
    if within_seconds is not None:
        conds.append(
            "(epoch_us(__ts) - epoch_us(__a_ts)) <= "
            f"{int(within_seconds) * 1_000_000}"
        )
    return f"""
    WITH mp_src AS ({source_sql}),
    mp_flag AS (
      SELECT {parts}, {order}, {id_col} AS __id{ts_sel},
             ({start_sql}) AS __is_a,
             ({mid_sql}) AS __is_b,
             ({end_sql}) AS __is_c
      FROM mp_src
    ),
    mp_run AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY {parts} ORDER BY {order})
               AS __pos,
             SUM(CASE WHEN NOT __is_b THEN 1 ELSE 0 END)
               OVER ({frame_cur}) AS __nonb
      FROM mp_flag
    ),
    mp_state AS (
      SELECT *,
             LAST_VALUE(CASE WHEN __is_a THEN __pos END IGNORE NULLS)
               OVER ({frame_prev}) AS __a_pos,
             LAST_VALUE(CASE WHEN __is_a THEN __nonb END IGNORE NULLS)
               OVER ({frame_prev}) AS __a_nonb,
             LAST_VALUE(CASE WHEN __is_a THEN __id END IGNORE NULLS)
               OVER ({frame_prev}) AS __a_id{a_ts_sel}
      FROM mp_run
    ),
    mp_cand AS (
      SELECT *
      FROM mp_state
      WHERE {' AND '.join(conds)}
    )
    SELECT {parts}, __a_id AS start_id, __id AS end_id,
           CAST(__pos - __a_pos - 1 AS INT) AS n_mid
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY {parts}, __a_pos
                                ORDER BY __pos) AS __rk
      FROM mp_cand
    ) WHERE __rk = 1
    """
