"""t2 query registry, batch 23: time-series feature operators.

Registered into the shared registry (imported from queries19 at module
end). Same determinism rules as the queries.py docstring.

Extends the time-series layer (operators/timeseries.py — gapfill
landed in batch 18) with the classic per-key feature passes, all ONE
window shuffle, no UDF:

- ``ts_ewma``: fixed-window EWMA over the last 8 points — weights as
  shared repr() literals, fixed-order lag sum.
- ``ts_anomaly``: rolling z-score vs the previous 20 points from exact
  integer-scaled frame sums; |z| > 3 anomaly flags.
- ``ts_resample``: per-user daily OHLC downsample via min_by/max_by on
  the (ts, event_id) total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.operators.timeseries import (
    ewma,
    ewma_oracle_sql,
    ohlc_oracle_sql,
    resample_ohlc,
    rolling_zscore,
    zscore_oracle_sql,
)


@_register(
    "ts_ewma",
    ewma_oracle_sql("events", "user_id", "ts", "event_id", "value"),
    doc="Per-user fixed-window EWMA (operators/timeseries.py:ewma): "
    "alpha*(1-alpha)^i weights over the last 8 observations as a "
    "fixed-order lag sum — one window shuffle, weights injected as "
    "shared IEEE literals, renormalized at the series head.",
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return ewma(ev, "user_id", "ts", "event_id", "value")


@_register(
    "ts_anomaly",
    zscore_oracle_sql("events", "user_id", "ts", "event_id", "value"),
    doc="Rolling z-score anomaly flags (operators/timeseries.py:"
    "rolling_zscore): per-user baseline over the 20 PRECEDING points "
    "from exact integer-scaled frame sums (order-free), |z|>3 flag; "
    "one window shuffle, shared sqrt formula.",
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return rolling_zscore(ev, "user_id", "ts", "event_id", "value")


@_register(
    "ts_resample",
    ohlc_oracle_sql("events", "user_id", "ts", "event_id", "value"),
    doc="Per-user daily OHLC downsample (operators/timeseries.py:"
    "resample_ohlc): open/close by min_by/max_by on the (ts, event_id) "
    "total order, high/low/count — one hash aggregate, no arithmetic.",
)
def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return resample_ohlc(ev, "user_id", "ts", "event_id", "value")

from spark_extensions_spark import queries21  # noqa: E402,F401  (registration side effect)
