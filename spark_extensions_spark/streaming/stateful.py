"""Arbitrary stateful streaming via ``applyInPandasWithState``.

The reference inherits Spark's ``flatMapGroupsWithState`` surface
(SURVEY.md §2.E "Streaming — stateful"); the PySpark-native equivalent is
``GroupedData.applyInPandasWithState`` — per-key state in the StateStore,
Arrow-batched user logic, watermark-driven timeouts.

``running_aggregate`` is the canonical instance: a per-key running
aggregate (count/sum over selected columns) emitted on every trigger,
with state that expires via event-time timeout once the watermark passes
``state_ttl`` — bounded state at any scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def running_aggregate(
    stream: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    ts_col: str,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Per-key running count + sums, updated each micro-batch.

    Output schema: key columns (string-compatible as-is), ``n_events``
    (long) and one ``sum_<col>`` (double) per requested column.
    """
    out_schema = StructType()
    key_struct = stream.select(*key_cols).schema
    for f in key_struct.fields:
        out_schema.add(f.name, f.dataType, True)
    out_schema.add("n_events", "long", True)
    for c in sum_cols:
        out_schema.add(f"sum_{c}", "double", True)

    state_schema = StructType()
    state_schema.add("n", "long", True)
    for c in sum_cols:
        state_schema.add(f"s_{c}", "double", True)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prior = list(state.get) if state.exists else [0] + [0.0] * len(sum_cols)
        n = prior[0]
        sums = list(prior[1:])
        for pdf in pdfs:
            n += len(pdf)
            for i, c in enumerate(sum_cols):
                sums[i] += float(pdf[c].sum())
        state.update((n, *sums))
        row = dict(zip([f.name for f in key_struct.fields], key))
        row["n_events"] = n
        for i, c in enumerate(sum_cols):
            row[f"sum_{c}"] = sums[i]
        yield pd.DataFrame([row])

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_state(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Per-key RECURSIVE EWMA (y = α·x + (1-α)·y_prev) with exact
    integer state — the stateful-streaming twin of the batch
    ``operators/timeseries.py:ewma`` truncated-window form.

    The recursion runs in scaled integer arithmetic with floor
    division: ``y' = (alpha_num·x + (alpha_den-alpha_num)·y) div
    alpha_den`` over ``x = round(value·scale)`` — every step exact, so
    the result is bit-identical to any replay AND to a recursive-CTE
    oracle, with no float accumulation drift.  State per key: one
    (y_int, n) tuple — bounded at any scale.

    Rows are processed in (ts, id) order *within* each micro-batch;
    cross-batch order must be non-decreasing in event time per key
    (true for keyed, per-partition-ordered sources like Kafka; the
    availableNow parquet replay delivers one batch).  Output per
    trigger: (key, n_events, ewma double).
    """
    key_field = stream.select(key_col).schema.fields[0]
    out_schema = StructType()
    out_schema.add(key_field.name, key_field.dataType, True)
    out_schema.add("n_events", "long", True)
    out_schema.add("ewma", "double", True)

    state_schema = StructType()
    state_schema.add("y", "long", True)
    state_schema.add("n", "long", True)

    beta = alpha_den - alpha_num

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        y, n = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, id_col])
        for v in batch[value_col]:
            x = int(round(float(v) * scale))
            if y is None:
                y = x
            else:
                y = (alpha_num * x + beta * y) // alpha_den
            n += 1
        state.update((int(y), int(n)))
        yield pd.DataFrame(
            [{key_field.name: key[0], "n_events": n, "ewma": y / scale}]
        )

    return (
        stream.withWatermark(ts_col, "1 hour")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def pattern_match_state(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    start_col: str,
    mid_col: str,
    end_col: str,
    min_mid: int = 0,
    max_mid: int | None = None,
    within_seconds: int | None = None,
) -> DataFrame:
    """Streaming CEP: the stateful twin of
    ``operators/patterns.py:match_pattern`` (A B{min,max} C per key).

    The batch operator's declarative semantics (latest A binds, all
    rows strictly between must be B, first qualifying C wins and
    consumes the A) reduce to a 3-field sequential recurrence per key —
    ``(a_id, a_ts_us, n_mid)`` — processed in (ts, id) order:

    1. a qualifying C closes the open A (emit, consume);
    2. an A row (re)opens state — the latest A supersedes;
    3. otherwise a B row extends the middle run, any other row
       invalidates the open A (it could never sit strictly between).

    Equivalence with the batch window algebra is pinned in
    tests/test_patterns.py. State per key is three longs — bounded at
    any scale, no buffered rows (contrast stream-stream joins). Rows
    must arrive in event-time order per key across micro-batches (the
    Kafka-partition / availableNow-replay contract, same as
    :func:`ewma_state`); ``start_col``/``mid_col``/``end_col`` are
    boolean columns the caller computes upstream.
    """
    key_field = stream.select(key_col).schema.fields[0]
    id_field = stream.select(id_col).schema.fields[0]
    # state carries a_id in a LONG slot — reject non-integral id types
    # up front with a clear error instead of a ValueError inside the
    # executor's pandas worker (the batch twin accepts any orderable id)
    if id_field.dataType.simpleString() not in (
        "tinyint", "smallint", "int", "bigint",
    ):
        raise TypeError(
            "pattern_match_state requires an integral id_col (state "
            f"stores it as long); got {id_field.dataType.simpleString()}"
            " — use the batch match_pattern for non-integral ids"
        )
    out_schema = StructType()
    out_schema.add(key_field.name, key_field.dataType, True)
    out_schema.add("start_id", id_field.dataType, True)
    out_schema.add("end_id", id_field.dataType, True)
    out_schema.add("n_mid", "integer", True)

    state_schema = StructType()
    state_schema.add("a_id", "long", True)
    state_schema.add("a_ts_us", "long", True)
    state_schema.add("n_mid", "long", True)

    within_us = (
        int(within_seconds) * 1_000_000
        if within_seconds is not None
        else None
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        a_id, a_ts_us, n_mid = (
            state.get if state.exists else (None, None, None)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, id_col])
        out = []

        def tri(v):
            # three-valued boolean: None/NaN stays None (SQL NULL)
            if v is None or (isinstance(v, float) and v != v):
                return None
            return bool(v)

        for row in batch.itertuples(index=False):
            rid = getattr(row, id_col)
            ts_us = int(
                pd.Timestamp(getattr(row, ts_col)).value // 1000
            )
            # SQL three-valued logic, matching the batch window algebra
            # exactly: a NULL start/end predicate never starts/closes
            # (WHEN NULL falls through), and a NULL mid predicate does
            # NOT break the run (the batch non-B counter adds 1 only
            # when NOT is_b is TRUE, i.e. only on a definite False)
            is_a = tri(getattr(row, start_col)) is True
            is_c = tri(getattr(row, end_col)) is True
            b_breaks = tri(getattr(row, mid_col)) is False
            if (
                is_c
                and a_id is not None
                and n_mid >= min_mid
                and (max_mid is None or n_mid <= max_mid)
                and (
                    within_us is None or ts_us - a_ts_us <= within_us
                )
            ):
                out.append(
                    {
                        key_field.name: key[0],
                        "start_id": a_id,
                        "end_id": rid,
                        "n_mid": int(n_mid),
                    }
                )
                a_id = None
            if is_a:
                a_id, a_ts_us, n_mid = int(rid), ts_us, 0
            elif a_id is not None:
                if b_breaks:
                    a_id = None
                else:
                    # n_mid mirrors the batch POSITION difference: every
                    # non-breaking row strictly between a and c counts,
                    # including NULL-mid rows
                    n_mid += 1
        if a_id is None:
            state.update((None, None, None))
        else:
            state.update((int(a_id), int(a_ts_us), int(n_mid)))
        yield pd.DataFrame(
            out,
            columns=[key_field.name, "start_id", "end_id", "n_mid"],
        )

    return (
        stream.withWatermark(ts_col, "1 hour")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_distinct_state(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming running COUNT(DISTINCT ``value_col``) per key — the
    stateful twin of the batch first-occurrence-flag window
    (``queries42.py:q_window_running_distinct``), emitting one row per
    input event with the distinct count up to and including it.

    State per key is the SET of seen values, serialized as one
    JSON-encoded sorted list — bounded by the per-key value
    DOMAIN (event types, languages, ...), not the event count; this is
    the streaming analogue of the batch operator's "distinct window
    aggregates don't exist in Spark" workaround.  NULL values are
    excluded from the count (SQL COUNT(DISTINCT) semantics, matching
    the batch form and the DuckDB oracle), but NULL rows still emit.

    Rows must arrive in event-time order per key across micro-batches
    (the Kafka-partition / availableNow-replay contract shared by
    :func:`ewma_state` / :func:`pattern_match_state`).
    """
    key_field = stream.select(key_col).schema.fields[0]
    id_field = stream.select(id_col).schema.fields[0]
    out_schema = StructType()
    out_schema.add(key_field.name, key_field.dataType, True)
    out_schema.add(id_field.name, id_field.dataType, True)
    out_schema.add("run_types", "long", True)

    state_schema = StructType()
    state_schema.add("seen", "string", True)

    # JSON, not a separator-joined blob: a separator encoding loses
    # the {''} state (empty blob is falsy) and splits values that
    # contain the separator byte (review finding, round 6)
    import json as _json

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (blob,) = state.get if state.exists else (None,)
        seen = set(_json.loads(blob)) if blob else set()
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, id_col])
        out = []
        for row in batch.itertuples(index=False):
            v = getattr(row, value_col)
            if v is not None and not (isinstance(v, float) and v != v):
                seen.add(str(v))
            out.append(
                {
                    key_field.name: key[0],
                    id_field.name: getattr(row, id_col),
                    "run_types": len(seen),
                }
            )
        state.update((_json.dumps(sorted(seen)),))
        yield pd.DataFrame(out, columns=[
            key_field.name, id_field.name, "run_types",
        ])

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
