"""t2 query registry, batch 12: ANSI try_* surface, masking/map-parse
strings, and grouped-map applyInPandas.

Registered into the shared registry (imported from queries8 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t


@_register(
    "try_battery",
    """
    SELECT p_partkey,
           TRY_CAST(p_name AS INT) AS bad_int,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_int,
           CAST(TRY_CAST(CAST(p_size AS VARCHAR) AS DECIMAL(3,0)) AS INT) AS num_fmt,
           (string_split(p_type, ' '))[99] AS elem_oob,
           (string_split(p_type, ' '))[1] AS elem_ok,
           try_strptime(p_brand, '%Y-%m-%d %H:%M:%S') AS bad_ts,
           try_strptime('2020-01-02 03:04:05', '%Y-%m-%d %H:%M:%S') AS good_ts
    FROM part
    """,
    doc="ANSI-mode error-safe battery: try_cast, try_element_at, "
    "try_to_timestamp — with spark.sql.ansi.enabled=true (this "
    "engine's default) the non-try forms THROW on malformed input, so "
    "the try_ family is the production idiom for dirty data at scale. "
    "Each function exercised on both a failing and a succeeding input.",
)
def q_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    toks = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_name as int)").alias("bad_int"),
        F.expr("try_cast(cast(p_size as string) as int)").alias("good_int"),
        F.try_to_number(F.col("p_size").cast("string"), F.lit("999"))
        .cast("int")
        .alias("num_fmt"),
        F.try_element_at(toks, F.lit(99)).alias("elem_oob"),
        F.try_element_at(toks, F.lit(1)).alias("elem_ok"),
        F.expr("try_to_timestamp(p_brand, 'yyyy-MM-dd HH:mm:ss')").alias("bad_ts"),
        F.expr(
            "try_to_timestamp('2020-01-02 03:04:05', 'yyyy-MM-dd HH:mm:ss')"
        ).alias("good_ts"),
    )


@_register(
    "string_battery4",
    """
    WITH t AS (SELECT p_partkey, p_name, p_brand, p_size,
                      'q:' || (p_size % 10) || ',k:' || (p_partkey % 5) AS kv
               FROM part)
    SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(p_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
           array_to_string(list_transform(
             list_sort(string_split(kv, ',')),
             s -> string_split(s, ':')[1] || '=' || string_split(s, ':')[2]), ',')
             AS kv_map,
           chr(65 + p_size % 26) AS size_chr,
           'a' || repeat(' ', p_size % 3) || 'b' AS spaced
    FROM t
    """,
    doc="String battery 4: mask (PII-shaped redaction: upper->X, "
    "lower->x, digit->n), str_to_map parsed from a delimited string "
    "(serialized key-sorted for the oracle), char/chr, space. The "
    "oracle rebuilds mask from chained regexp_replace.",
)
def q_string_battery4(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    m = F.expr(
        "str_to_map(concat('q:', cast(p_size % 10 as string), "
        "',k:', cast(p_partkey % 5 as string)), ',', ':')"
    )
    ser = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.map_keys(m)),
            lambda k: F.concat(k, F.lit("="), F.element_at(m, k)),
        ),
    )
    return p.select(
        "p_partkey",
        F.expr("mask(p_name)").alias("masked"),
        ser.alias("kv_map"),
        F.expr("char(65 + p_size % 26)").alias("size_chr"),
        F.concat(
            F.lit("a"), F.expr("space(p_size % 3)"), F.lit("b")
        ).alias("spaced"),
    )


@_register(
    "grouped_apply_summary",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv
    FROM events GROUP BY user_id
    """,
    doc="Grouped-map applyInPandas: one pandas DataFrame per user_id -> "
    "one summary row (count, first/last event time, sorted distinct "
    "types). All outputs exact (counts, min/max, sorted strings) so the "
    "Python path hash-matches the SQL oracle. The grouped-map shuffle "
    "is one hash exchange on the group key — same shape as groupBy — "
    "with Arrow batching amortizing the Python boundary.",
)
def q_grouped_apply_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = _t(spark, sf_dir, "events")["events"]

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "first_ts": [pdf["ts"].min()],
                "last_ts": [pdf["ts"].max()],
                "types_csv": [",".join(sorted(set(pdf["event_type"])))],
            }
        )

    from spark_extensions_spark.session import expansion_width

    # pin the grouped-map exchange's width: AQE coalesces it by bytes
    # (3 tasks at sf0.1) while the cost is per-GROUP python calls the
    # byte estimate cannot see; the keyed repartition replaces the
    # exchange the groupBy would insert anyway
    return (
        ev.repartition(expansion_width(spark), "user_id")
        .groupBy("user_id")
        .applyInPandas(
            summarize,
            "user_id long, n_events long, first_ts timestamp_ntz, "
            "last_ts timestamp_ntz, types_csv string",
        )
    )


from spark_extensions_spark import queries10  # noqa: E402,F401  (registration side effect)
