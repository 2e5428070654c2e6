"""Inline observation metrics (operators/observe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_extensions_spark.operators.observe import (
    MetricPoint,
    metrics_row,
    run_noop,
)


def test_multi_point_observation(spark):
    """Two metric points at different plan positions materialize from
    ONE noop execution and agree with directly-computed values."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    scan = MetricPoint("scan")
    kept = MetricPoint("kept")
    observed = scan.attach(df, F.count(F.lit(1)).alias("n"))
    filtered = kept.attach(
        observed.filter(F.col("bucket") < 3),
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("sum_id"),
    )
    run_noop(filtered)
    assert scan.metrics == {"n": 1000}
    expect_sum = sum(i for i in range(1000) if i % 10 < 3)
    assert kept.metrics == {"n": 300, "sum_id": expect_sum}
    row = metrics_row(spark, scan, kept).collect()[0]
    assert row["scan_n"] == 1000
    assert row["kept_n"] == 300
    assert row["kept_sum_id"] == expect_sum


def test_observation_is_single_pass(spark):
    """The observed metrics come from the job's own pass: no extra
    jobs are submitted beyond the one noop action (job-count pinned
    via the status tracker)."""
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    df = spark.range(100000)
    p = MetricPoint("one_pass")
    run_noop(p.attach(df, F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")))
    assert p.metrics["n"] == 100000
    after = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after - before <= 1
