"""t2 query registry, batch 10: streaming joins/state + stat surface.

Registered into the shared registry (imported from queries6 at module
end). Same determinism rules as the queries.py docstring.

Streaming determinism note: both streaming queries replay the events
fixture through ``trigger(availableNow=True)``. The stream-source dir
is written by ``_events_stream_path`` with far fewer files than the
default ``maxFilesPerTrigger`` (1000), so the replay is a SINGLE
micro-batch: stream-stream join state never expires mid-run and the
stateful running aggregate emits exactly one final row per key —
making both exactly equal to their batch twins, which is what the
DuckDB oracles compute. (Multi-batch replays are exercised separately
in tests/test_streaming.py with maxFilesPerTrigger=1.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t, dsum, dsum_duck


@_register(
    "streaming_join",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
    """,
    doc="Stream-stream inner join (click->purchase attribution within "
    "10 minutes): both sides watermarked, join condition carries the "
    "event-time bound so Spark can expire buffered state. At scale the "
    "watermark bound is what keeps join state finite — without it both "
    "streams buffer forever. Single-batch availableNow replay == batch "
    "join (see module docstring); oracle is that batch join.",
)
def q_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.queries2 import _events_stream_path
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
        stream_stream_join,
    )

    path = _events_stream_path(spark, sf_dir)
    clicks = (
        read_stream_parquet(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        read_stream_parquet(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = stream_stream_join(
        clicks,
        purchases,
        on=F.col("c_user") == F.col("p_user"),
        left_ts="c_ts",
        right_ts="p_ts",
        watermark_delay="1 hour",
        time_bound=(F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 minutes")),
    )
    return run_available_now(
        joined.select(
            F.col("c_user").alias("user_id"), "click_id", "purchase_id"
        ),
        state_partitions=8,
    )


@_register(
    "streaming_running_agg",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="Arbitrary stateful streaming op: applyInPandasWithState "
    "running per-key event count (streaming/stateful.py). State is one "
    "tuple per key (bounded), updated per micro-batch; the final "
    "single-batch snapshot equals the batch GROUP BY. Counts only in "
    "the oracle-checked surface — the float running sums are checked "
    "with tolerance in tests (pandas pairwise summation vs sequential "
    "fold differ in the last ulp, below the hash-exact bar).",
)
def q_streaming_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.queries2 import _events_stream_path
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
        running_aggregate,
    )

    stream = read_stream_parquet(spark, _events_stream_path(spark, sf_dir))
    out = running_aggregate(
        stream, ["user_id"], ["value"], ts_col="ts", watermark_delay="1 hour"
    )
    return run_available_now(
        out.select("user_id", "n_events"),
        output_mode="update",
        state_partitions=8,
    )


@_register(
    "stat_crosstab",
    """
    SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag_l_linestatus,
           CAST(count_if(l_linestatus = 'F') AS BIGINT) AS F,
           CAST(count_if(l_linestatus = 'O') AS BIGINT) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="df.stat.crosstab contingency table (pair counts, one column "
    "per distinct right-hand value). Oracle: conditional counts.",
)
def q_stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.stat.crosstab("l_returnflag", "l_linestatus")


@_register(
    "window_ignore_nulls",
    """
    SELECT l_orderkey, l_linenumber,
           first_value(CASE WHEN l_discount > 0.05 THEN l_extendedprice END
                       IGNORE NULLS)
             OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_extendedprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_disc_price,
           last_value(CASE WHEN l_discount > 0.05 THEN l_extendedprice END
                      IGNORE NULLS)
             OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_extendedprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_disc_price,
           lead(l_linenumber, 1, -1)
             OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice)
             AS next_ln,
           lag(l_linenumber, 2, -1)
             OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice)
             AS prev2_ln
    FROM lineitem
    """,
    doc="Window analytic functions with IGNORE NULLS (first/last value "
    "over the full frame) and lead/lag with explicit defaults. The "
    "ORDER BY includes a tiebreaker so frames are total-ordered on "
    "both engines.",
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    disc_price = F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first_value(disc_price, ignoreNulls=True).over(full).alias(
            "first_disc_price"
        ),
        F.last_value(disc_price, ignoreNulls=True).over(full).alias(
            "last_disc_price"
        ),
        F.lead("l_linenumber", 1, -1).over(w).alias("next_ln"),
        F.lag("l_linenumber", 2, -1).over(w).alias("prev2_ln"),
    )


@_register(
    "agg_try_arith",
    f"""
    SELECT l_returnflag,
           {dsum_duck('l_quantity', 'try_qty_sum')},
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(l_quantity), 6) AS try_qty_avg,
           CAST(SUM(l_orderkey) AS BIGINT) AS try_key_sum
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="ANSI-safe aggregation: try_sum (NULL on overflow instead of "
    "raising — this session runs spark.sql.ansi.enabled=true, so the "
    "try_ forms are the scale-safe idiom), with the average derived as "
    "try_sum/count so the formula text matches the oracle exactly. No "
    "overflow in range: results equal the plain aggregates; the "
    "decimal-sum determinism contract applies as usual.",
)
def q_agg_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "cast(round(try_sum(cast(l_quantity as decimal(18,4))), 2) as double)"
        ).alias("try_qty_sum"),
        F.expr(
            "round(cast(try_sum(cast(l_quantity as decimal(18,4))) as double)"
            " / count(l_quantity), 6)"
        ).alias("try_qty_avg"),
        F.expr("cast(try_sum(l_orderkey) as bigint)").alias("try_key_sum"),
    )


from spark_extensions_spark import queries8  # noqa: E402,F401  (registration side effect)
