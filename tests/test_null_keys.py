"""NULL-partition-key fixtures for operators that compute per-key
results (Window.partitionBy / groupBy treat NULL as a real group) and
join them back on the key — the sliding_count_distinct class bug
(VERDICT r7 #7): a null-unsafe equi-join never matches the NULL group,
silently dropping or nulling its rows.  Each test pins the NULL-group
rows surviving with correct values.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_gapfill_grid_null_key_keeps_values(spark):
    from spark_extensions_spark.operators.timeseries import gapfill_grid

    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    rows = []
    for key in ["a", None]:
        rows.append(Row(k=key, ts=t0, v=10.0))
        rows.append(Row(k=key, ts=t0 + datetime.timedelta(minutes=2), v=30.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill_grid(df, "k", "ts", "v", step="1 minute")
    got = {
        (r["k"], r["bucket_ts"].minute): (r["v"], r["filled"])
        for r in out.collect()
    }
    # both series: 3 buckets, middle forward-filled from minute 0
    for key in ["a", None]:
        assert got[(key, 0)] == (10.0, False)
        assert got[(key, 1)] == (10.0, True)
        assert got[(key, 2)] == (30.0, False)
    assert len(got) == 6


def test_grouped_running_sum_null_group_rows_survive(spark):
    from spark_extensions_spark.operators.sampling import (
        grouped_running_sum,
    )

    rows = [
        Row(g="x", o=1, v=5),
        Row(g="x", o=2, v=7),
        Row(g=None, o=1, v=11),
        Row(g=None, o=2, v=13),
    ]
    df = spark.createDataFrame(rows, "g string, o int, v int")
    out = grouped_running_sum(df, "g", ["o"], "v", num_partitions=3)
    got = {(r["g"], r["o"]): r["running_sum"] for r in out.collect()}
    assert got == {
        ("x", 1): 5,
        ("x", 2): 12,
        (None, 1): 11,
        (None, 2): 24,
    }


def test_temperature_sample_null_group_rows_survive(spark):
    from spark_extensions_spark.operators.sampling import temperature_sample

    rows = [Row(g="x", id=i) for i in range(20)] + [
        Row(g=None, id=100 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, id int")
    # target >= total rows -> keep fraction capped at 1: every row,
    # including the NULL group's, must survive the threshold join
    out = temperature_sample(df, "g", "id", alpha=0.5, target_total=1000)
    assert out.count() == 40
    assert out.where(F.col("g").isNull()).count() == 20
    assert set(out.columns) == {"g", "id"}
