"""t2 query registry, batch 26: stateful streaming EWMA.

Registered into the shared registry (imported from queries22 at module
end). Same determinism rules as the queries.py docstring.

``streaming_ewma`` closes the loop between the streaming layer and the
time-series layer: the RECURSIVE per-key EWMA
(streaming/stateful.py:ewma_state) runs in exact scaled-integer
arithmetic — y' = (3x + 7y) div 10 — so the availableNow replay is
bit-identical to a recursive-CTE DuckDB oracle; the hash check covers
the full float output, not just counts (unlike streaming_running_agg,
whose float sums are tolerance-checked in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_extensions_spark.queries import _register


@_register(
    "streaming_ewma",
    """
    WITH RECURSIVE seq AS (
      SELECT user_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    ),
    r AS (
      SELECT user_id, rn, x AS y FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             CAST((3 * s.x + 7 * r.y - ((3 * s.x + 7 * r.y) % 10)) / 10
                  AS BIGINT) AS y
      FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(MAX(rn) AS BIGINT) AS n_events,
           CAST(arg_max(y, rn) AS DOUBLE) / 100.0 AS ewma
    FROM r GROUP BY user_id
    """,
    doc="Stateful streaming recursive EWMA "
    "(streaming/stateful.py:ewma_state): per-key y' = (3x + 7y) div 10 "
    "in exact scaled-integer state via applyInPandasWithState, "
    "availableNow replay to a memory sink — bit-identical to the "
    "recursive-CTE oracle (full float surface hash-checked).",
)
def q_streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.queries2 import _events_stream_path
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import ewma_state

    stream = read_stream_parquet(spark, _events_stream_path(spark, sf_dir))
    out = ewma_state(stream, "user_id", "ts", "event_id", "value")
    return run_available_now(out, output_mode="update", state_partitions=8)

from spark_extensions_spark import queries24  # noqa: E402,F401  (registration side effect)
