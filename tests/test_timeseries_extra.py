"""EWMA / rolling z-score / OHLC resample vs numpy twins."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from spark_extensions_spark.operators.timeseries import (
    ewma,
    resample_ohlc,
    rolling_zscore,
)


def _series(spark, vals, key="k"):
    rows = [
        (key, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", i, float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "key string, ts_s string, id bigint, val double"
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"), "id", "val")


def test_ewma_matches_numpy(spark):
    vals = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 8.0, 15.0, 10.0, 12.0]
    df = _series(spark, vals)
    out = (
        ewma(df, "key", "ts", "id", "val", alpha=0.3, k=8)
        .orderBy("ts")
        .collect()
    )
    alpha, k = 0.3, 8
    for t, row in enumerate(out):
        ws = [alpha * (1 - alpha) ** i for i in range(k) if t - i >= 0]
        xs = [vals[t - i] for i in range(k) if t - i >= 0]
        ref = sum(w * x for w, x in zip(ws, xs)) / sum(ws)
        assert abs(row.ewma - ref) < 1e-8, t


def test_ewma_first_row_is_value(spark):
    df = _series(spark, [42.0, 50.0])
    out = ewma(df, "key", "ts", "id", "val").orderBy("ts").collect()
    assert abs(out[0].ewma - 42.0) < 1e-9


def test_rolling_zscore_flags_spike(spark):
    rng = np.random.RandomState(0)
    vals = list(np.round(rng.normal(50, 2, 40), 2))
    vals[30] = 90.0  # injected spike
    df = _series(spark, vals)
    out = (
        rolling_zscore(df, "key", "ts", "id", "val", k=20)
        .orderBy("ts")
        .collect()
    )
    assert out[0].z is None and out[2].z is None  # warm-up
    flagged = [i for i, r in enumerate(out) if r.is_anomaly]
    assert 30 in flagged
    assert len(flagged) <= 3  # baseline noise stays unflagged
    # z matches a numpy twin at the spike
    prior = np.round(np.array(vals[10:30]) * 100)
    m, sd = prior.mean(), prior.std(ddof=1)
    ref = (vals[30] * 100 - m) / sd
    assert abs(out[30].z - ref) < 1e-6


def test_ohlc_matches_reference(spark):
    rows = [
        ("u", "2024-01-01 01:00:00", 1, 10.0),
        ("u", "2024-01-01 05:00:00", 2, 30.0),
        ("u", "2024-01-01 09:00:00", 3, 5.0),
        ("u", "2024-01-01 23:00:00", 4, 20.0),
        ("u", "2024-01-02 01:00:00", 5, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts_s string, id bigint, val double"
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"), "id", "val")
    out = {
        str(r.bucket_ts): r
        for r in resample_ohlc(df, "key", "ts", "id", "val").collect()
    }
    d1 = out["2024-01-01 00:00:00"]
    assert (d1.open, d1.high, d1.low, d1.close, d1.n) == (10.0, 30.0, 5.0, 20.0, 4)
    d2 = out["2024-01-02 00:00:00"]
    assert (d2.open, d2.close, d2.n) == (7.0, 7.0, 1)
